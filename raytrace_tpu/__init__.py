"""raytrace_tpu: a TPU-native rebuild of the RayTrace miniapp capabilities.

Public API surface mirroring ``src/RayTrace.h``:

* :func:`create_image`   -- near-field + far-field image from a work unit
* :func:`create_image_stream` -- overlapped executor over independent work
  units (serving mode; no reference analogue)
* :func:`calc_ray`       -- single-ray propagation (diagnostic)
* :func:`calc_ray_path`  -- ray trajectories + running intensity (diagnostic)
* :func:`calc_seed`      -- seed spectrum at a phase-space point
* :func:`load_input` / :func:`save_input` -- byte-exact ``.dat`` snapshot IO

float64 must be available for image accumulation parity with the reference's
double buffers, so importing this package enables jax x64 mode; all
performance-critical arrays declare explicit (mostly float32) dtypes.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# persistent XLA/Mosaic compilation cache: first-call compiles of the
# pipelines cost 30-90 s (tunneled TPU); caching them on disk makes every
# later process cold-start in seconds. Keyed on the HLO hash, so code
# changes miss safely. Opt out with RAYTRACE_NO_COMPILE_CACHE=1 or point
# elsewhere with RAYTRACE_COMPILE_CACHE_DIR.
def _host_tag() -> str:
    """Fingerprint of this host's CPU features AND the jax version. XLA:CPU
    cache entries are AOT machine code compiled for the build process's
    exact TARGET config; loading them under a different one warns loudly
    and can SIGILL/segfault. Observed twice: (1) a cache populated on an
    AMX-capable host crashed a later run on a plain-AVX512 host; (2) a
    cache whose entries carried +prefer-no-scatter/+prefer-no-gather
    pseudo-features (a different XLA version's target config on the SAME
    cpuinfo) warned per load and segfaulted a 30-case fuzz sweep after
    thousands of loads (LLVM 'Cannot allocate memory' -> SIGSEGV). Keying
    the dir on cpuinfo + jax version makes a foreign cache invisible
    instead of fatal."""
    import jax as _jax
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:
        import platform as _pf
        feats = _pf.machine() or "unknown"
    import hashlib
    return hashlib.sha1(
        (feats + _jax.__version__).encode()).hexdigest()[:10]


if os.environ.get("RAYTRACE_NO_COMPILE_CACHE") != "1":
    _cache_dir = os.path.join(os.environ.get(
        "RAYTRACE_COMPILE_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")), _host_tag())
    try:
        # XLA:CPU AOT results embed host machine features and warn loudly
        # (potential SIGILL) when loaded on a different host; the jax-level
        # executable cache alone captures the 30-90 s Mosaic/XLA wins.
        # This knob must be set BEFORE the cache dir: on an older jax
        # without it, enabling the dir anyway would persist host-specific
        # AOT code -- the exact hazard the knob exists to prevent -- so a
        # failure here must leave the cache off entirely.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
    except Exception:  # older jax without the knobs: run uncached
        pass

from raytrace_tpu.io.loader import load_input, save_input, scale_problem  # noqa: E402
from raytrace_tpu.models.ray_tracer import (  # noqa: E402
    create_image, create_image_stream)
from raytrace_tpu.api import calc_ray, calc_ray_path, calc_seed  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "create_image", "create_image_stream",
    "calc_ray", "calc_ray_path", "calc_seed",
    "load_input", "save_input", "scale_problem",
]
