"""Build the native IO/runtime extension (C++, CPython C API).

    python setup.py build_ext --inplace
"""

import numpy as np
from setuptools import Extension, find_packages, setup

setup(
    name="raytrace_tpu",
    version="0.1.0",
    packages=find_packages(include=["raytrace_tpu*"]),
    ext_modules=[
        Extension(
            "raytrace_native",
            sources=["native/raytrace_native.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
            language="c++",
        )
    ],
)
