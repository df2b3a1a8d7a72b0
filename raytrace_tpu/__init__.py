"""raytrace_tpu: a TPU-native rebuild of the RayTrace miniapp capabilities.

Public API surface mirroring ``src/RayTrace.h``:

* :func:`create_image`   -- near-field + far-field image from a work unit
* :func:`calc_ray`       -- single-ray propagation (diagnostic)
* :func:`calc_ray_path`  -- ray trajectories + running intensity (diagnostic)
* :func:`calc_seed`      -- seed spectrum at a phase-space point
* :func:`load_input` / :func:`save_input` -- byte-exact ``.dat`` snapshot IO

float64 must be available for image accumulation parity with the reference's
double buffers, so importing this package enables jax x64 mode; all
performance-critical arrays declare explicit (mostly float32) dtypes.
"""

import jax

jax.config.update("jax_enable_x64", True)

from raytrace_tpu.io.loader import load_input, save_input, scale_problem  # noqa: E402
from raytrace_tpu.models.ray_tracer import create_image  # noqa: E402
from raytrace_tpu.api import calc_ray, calc_ray_path, calc_seed  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "create_image", "calc_ray", "calc_ray_path", "calc_seed",
    "load_input", "save_input", "scale_problem",
]
