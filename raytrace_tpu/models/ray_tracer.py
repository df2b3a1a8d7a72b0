"""``create_image`` orchestration: ray-list generation, backend dispatch,
chunked device execution, failure handling.

TPU rebuild of ``RayTrace::create_image`` (src/RayTraceImage.cpp:227-434):

* limits + uniform-grid validation (RayTraceImage.cpp:229-264)
* ray-list generation with the N_start/N_parallel stride-decomposition
  contract (RayTraceImage.cpp:277-328)
* method dispatch -> backend registry {"lax", "pallas", ...} instead of the
  reference's compile-time backend zoo (cpu/threads/OpenMP/Cuda/...)
* per-ray failure codes -> bitmask -> failed-ray dump -> abort
  (RayTraceImage.cpp:427-430)

Execution model: rays are processed in fixed-size chunks by one jitted
pipeline (trace -> seed -> amplify -> bin) whose partial images accumulate on
device in float64. Chunking bounds both memory ([B, K] spectra) and the
divergence of the batched while loops.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.models.problem import (
    DeviceBeam, DeviceGain, DeviceSeed, prepare_beam, prepare_gain, prepare_seed,
)
from raytrace_tpu.ops import binning, seed as seed_ops, spectrum, stepper
from raytrace_tpu.structures import CreateImageProblem
from raytrace_tpu.utils import errors as err_util
from raytrace_tpu.utils.timer import profiler

__all__ = ["create_image", "generate_ray_indices", "BACKENDS", "N_MAX", "K_MAX"]

N_MAX = 20   # max length segments (RayTraceImageHelper.h:29)
K_MAX = 100  # max frequencies (RayTraceImageHelper.h:30)

#: backend registry: name -> chunk-pipeline factory. Populated below and by
#: raytrace_tpu.ops.pallas_kernel at import time.
BACKENDS: dict[str, Callable] = {}


def _check_grid(n: int, d: float, grid: np.ndarray) -> bool:
    """Uniform-spacing check at 1e-12*d tolerance (check_grid,
    src/RayTraceImage.cpp:220-226)."""
    diffs = np.diff(np.asarray(grid, np.float64))
    return bool(np.any(np.abs(diffs - d) > 1e-12 * d))


def generate_ray_indices(problem: CreateImageProblem) -> np.ndarray:
    """Global flat ray indices honoring the stride contract: worker takes
    ``ijkm = N_start + it * N_parallel`` (RayTraceImage.cpp:300-328)."""
    beam = problem.seed_beam if problem.seed is not None else problem.euv_beam
    Nt = beam.nx * beam.ny * beam.na * beam.nb
    skip = problem.N_parallel
    offset = problem.N_start
    its = np.arange(Nt // skip + 1, dtype=np.int64)
    ijkm = offset + its * skip
    return ijkm[ijkm < Nt]


def _unflatten_rays(ijkm, dims):
    """b-fastest unflatten of the 4-D ray-grid index
    (RayTraceImage.cpp:309-313)."""
    nx, ny, na, nb = dims
    m = ijkm % nb
    k = (ijkm // nb) % na
    j = (ijkm // (na * nb)) % ny
    i = ijkm // (ny * na * nb)
    return i.astype(jnp.int32), j.astype(jnp.int32), k.astype(jnp.int32), m.astype(jnp.int32)


def _lax_chunk_pipeline(N: int, dz: float, K: int, method: int, use_emis: bool,
                        dims: tuple, scale: float, spectrum_dtype, c: float = 0.5):
    """Build the jitted per-chunk pipeline for the lax backend."""

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=())
    def run_chunk(image_acc, iang_acc, ijkm, valid, ray_grids, gain: DeviceGain,
                  dseed, beam: DeviceBeam):
        i, j, k, m = _unflatten_rays(ijkm, dims)
        gx, gy, ga, gb = ray_grids
        rays = {
            "x": gx[i].astype(jnp.float32),
            "y": gy[j].astype(jnp.float32),
            "a": ga[k].astype(jnp.float32),
            "b": gb[m].astype(jnp.float32),
        }
        res = stepper.trace_batch(rays, N, dz, gain, method, c=c, use_emis=use_emis)
        B = ijkm.shape[0]
        if dseed is None:
            Iv0 = jnp.zeros((B, K), dtype=spectrum_dtype)
        else:
            if method == 1:
                sx, sy = res.exit_x, res.exit_y
                sa, sb = res.exit_a, res.exit_b
            else:
                sx, sy, sa, sb = rays["x"], rays["y"], rays["a"], rays["b"]
            Iv0 = seed_ops.calc_seed_batch(dseed, sx, sy, sa, sb, K)
            # escaped rays carry no seed (RayTraceImageHelper.h:523)
            Iv0 = jnp.where(res.escaped[:, None], 0.0, Iv0).astype(spectrum_dtype)
        Iv = spectrum.amplify(res, Iv0, gain, N, use_emis, dtype=spectrum_dtype)
        # failure taxonomy (RayTraceImageHelper.h:514-594)
        neg = jnp.any(Iv < 0.0, axis=1)
        nan = jnp.any(Iv != Iv, axis=1)
        code = jnp.where(res.perp, -1, jnp.where(neg, -2, jnp.where(nan, -3, 0)))
        code = jnp.where(valid, code, 0).astype(jnp.int32)
        ok = valid & (code == 0)
        img_p, ang_p = binning.bin_images(Iv, res, rays, beam, method, scale, ok)
        failure_bits = (
            jnp.where(jnp.any(code == -1), jnp.uint32(1 << 1), jnp.uint32(0))
            | jnp.where(jnp.any(code == -2), jnp.uint32(1 << 2), jnp.uint32(0))
            | jnp.where(jnp.any(code == -3), jnp.uint32(1 << 3), jnp.uint32(0))
        )
        return image_acc + img_p, iang_acc + ang_p, failure_bits, code

    return run_chunk


BACKENDS["lax"] = _lax_chunk_pipeline


def create_image(problem: CreateImageProblem, compute_method: str = "auto",
                 chunk_size: int = 131072, spectrum_dtype=jnp.float64,
                 devices=None, failed_ray_path: str = "Failed_RayTrace_rays.dat",
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Compute the near-field image and far-field angular image.

    Returns ``(image, I_ang)`` as float64 numpy arrays in the reference's
    flat layouts ``image[nv*(i1+i2*nx)+iv]`` and ``I_ang[i3+i4*na]``; they
    are also stored on ``problem.image`` / ``problem.I_ang``.
    """
    if problem.N > N_MAX:
        raise err_util.RayTraceError("Exceeded maximum number of length segments")
    if problem.euv_beam.nv >= K_MAX:
        raise err_util.RayTraceError("Exceeded maximum number of frequencies")
    profiler.start("create_image")

    beam = problem.euv_beam
    # uniform-grid validation (RayTraceImage.cpp:243-264)
    for g, d, nm in ((beam.x, beam.dx, "x"), (beam.y, beam.dy, "y"),
                     (beam.a, beam.da, "a"), (beam.b, beam.db, "b")):
        if _check_grid(len(g), d, g):
            raise err_util.RayTraceError(
                "Only uniform grid spacings are currently supported (euv_beam)")
    if problem.seed_beam is not None:
        sb = problem.seed_beam
        for g, d in ((sb.x, sb.dx), (sb.y, sb.dy), (sb.a, sb.da), (sb.b, sb.db)):
            if _check_grid(len(g), d, g):
                raise err_util.RayTraceError(
                    "Only uniform grid spacings are currently supported (seed_beam)")
        if (beam.y[0] >= 0.0) != (sb.y[0] >= 0.0):
            raise err_util.RayTraceError(
                "Negitive y positions in seed_beam or euv_beam, but not both")

    # method + scale selection (RayTraceImage.cpp:277-299)
    if problem.seed is not None:
        method = 2
        src = problem.seed_beam
        scale = (src.dx * src.dy * src.da * src.db) / (beam.dx * beam.dy)
        timer_name = "propagate_seed"
    else:
        method = 1
        src = beam
        scale = 1.0
        timer_name = "propagate_ASE"
    dims = (src.nx, src.ny, src.na, src.nb)

    compute_method = compute_method.lower()
    if compute_method == "auto":
        compute_method = "lax"
    if compute_method not in BACKENDS:
        raise err_util.RayTraceError(f"Unknown method: {compute_method}")
    timer_name += "-" + compute_method

    use_emis = problem.gain[0].E0 is not None and problem.seed is None
    K = beam.nv
    nx, ny, na, nb = beam.nx, beam.ny, beam.na, beam.nb

    # host -> device conversion of the problem tables. This is inside the
    # timed region on purpose: the reference re-uploads per call because the
    # production gain tables change every iteration (Readme.txt:43).
    gain_dev = prepare_gain(problem.gain)
    beam_dev = prepare_beam(beam)
    seed_dev = prepare_seed(problem.seed) if problem.seed is not None else None
    ray_grids = (
        jnp.asarray(np.asarray(src.x, np.float64)),
        jnp.asarray(np.asarray(src.y, np.float64)),
        jnp.asarray(np.asarray(src.a, np.float64)),
        jnp.asarray(np.asarray(src.b, np.float64)),
    )

    ijkm_all = generate_ray_indices(problem)
    B_total = len(ijkm_all)
    chunk = min(chunk_size, max(B_total, 1))

    pipeline = BACKENDS[compute_method](
        N=problem.N, dz=beam.dz, K=K, method=method, use_emis=use_emis,
        dims=dims, scale=scale, spectrum_dtype=spectrum_dtype)

    image = jnp.zeros((nx * ny, K), dtype=jnp.float64)
    i_ang = jnp.zeros((na * nb,), dtype=jnp.float64)
    failure_bits = np.uint32(0)
    failed_rays: list[np.ndarray] = []

    profiler.start(timer_name)
    n_chunks = math.ceil(B_total / chunk) if B_total else 0
    for ci in range(n_chunks):
        lo = ci * chunk
        hi = min(lo + chunk, B_total)
        idx = np.zeros(chunk, dtype=np.int64)
        idx[: hi - lo] = ijkm_all[lo:hi]
        valid = np.zeros(chunk, dtype=bool)
        valid[: hi - lo] = True
        image, i_ang, fb, codes = pipeline(
            image, i_ang, jnp.asarray(idx), jnp.asarray(valid),
            ray_grids, gain_dev, seed_dev, beam_dev)
        fb = np.uint32(fb)
        if fb != 0:
            failure_bits |= fb
            codes = np.asarray(codes)
            bad = np.nonzero(codes < 0)[0]
            for bidx in bad[: err_util.N_FAILED_MAX]:
                gi, gj, gk, gm = np.asarray(_unflatten_rays(idx[bidx], dims))
                failed_rays.append(np.array(
                    [src.x[gi], src.y[gj], src.a[gk], src.b[gm]], np.float32))
    image.block_until_ready()
    profiler.stop(timer_name)

    # failure path (RayTraceImage.cpp:427-430)
    if failure_bits != 0:
        for msg in err_util.failure_messages(int(failure_bits)):
            print(msg)
        err_util.write_failures(failed_ray_path, int(failure_bits),
                                np.array(failed_rays), method, problem.N,
                                beam.dz, problem.gain)
        profiler.stop("create_image")
        raise err_util.RayTraceError("Some rays failed")

    # to reference layouts: image[nv*(i1+i2*nx)+iv] (cell-major rows of K)
    image_np = np.asarray(image, dtype=np.float64).reshape(-1)
    i_ang_np = np.asarray(i_ang, dtype=np.float64)
    problem.image = image_np
    problem.I_ang = i_ang_np
    profiler.stop("create_image")
    return image_np, i_ang_np
