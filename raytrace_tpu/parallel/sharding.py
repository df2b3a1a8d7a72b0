"""Multi-chip ``create_image``: shard_map over a device mesh.

The reference's multi-device story (SURVEY.md section 2.4):

* "Cuda-MultiGPU": one thread per GPU, each GPU a contiguous ray chunk,
  host-side image sum (src/RayTraceImage.cpp:396-405);
* production MPI: stride decomposition of rays across ranks
  (N_start/N_parallel) + MPI_Allreduce of the image buffers
  (src/RayTraceStructures.cpp:1603-1646).

TPU-native equivalent: rays are stride-decomposed across a 1-D mesh exactly
like the MPI contract (device d of D takes rays d, d+D, 2D, ...), each device
runs the same trace/amplify/bin pipeline on its shard under ``shard_map``,
and the partial images meet in a ``jax.lax.psum`` that rides ICI. A 1-device
mesh degrades to the serial path (the no-MPI shim analogue).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from raytrace_tpu.models import ray_tracer
from raytrace_tpu.models.problem import prepare_beam, prepare_gain, prepare_seed
from raytrace_tpu.ops import fast_stepper, seed as seed_ops, stepper
from raytrace_tpu.parallel.mesh import RAY_AXIS
from raytrace_tpu.structures import CreateImageProblem
from raytrace_tpu.utils import errors as err_util
from raytrace_tpu.utils.timer import profiler

__all__ = ["create_image_sharded", "make_sharded_pipeline"]

_SHARDED_CACHE: dict = {}


def make_sharded_pipeline(cfg: dict, trace_fn, mesh: Mesh):
    """Jitted sharded chunk step.

    Ray indices are generated on device per shard: device d of D takes the
    stride indices it = lo + d, lo + d + D, ... exactly like the reference's
    MPI N_start/N_parallel contract nested inside the problem-level stride.
    Tables are replicated; images meet in a psum.
    """
    D = mesh.size
    dims = cfg["dims"]
    Nt = dims[0] * dims[1] * dims[2] * dims[3]
    offset = cfg["N_start"]
    skip = cfg["N_parallel"]
    chunk = cfg["chunk"]
    per_dev = chunk // D
    it_max = Nt // skip

    def worker(it0, ray_grids, trace_tables, gv_tables, dseed, beam):
        d = jax.lax.axis_index(RAY_AXIS).astype(jnp.int64)
        it = it0 + d + jnp.arange(per_dev, dtype=jnp.int64) * D
        ijkm = offset + it * skip
        valid = (it <= it_max) & (ijkm < Nt)
        ijkm = jnp.where(valid, ijkm, 0)
        img_p, ang_p, code = ray_tracer.chunk_core(
            cfg, trace_fn, ijkm, valid, ray_grids, trace_tables, gv_tables,
            dseed, beam)
        # image reduction over ICI -- the psum analogue of the reference's
        # MPI_Allreduce(DOUBLE, SUM) image reduce
        img = jax.lax.psum(img_p, RAY_AXIS)
        ang = jax.lax.psum(ang_p, RAY_AXIS)
        bits3 = jnp.stack([
            jnp.any(code == -1), jnp.any(code == -2), jnp.any(code == -3)])
        bits3 = jax.lax.psum(bits3.astype(jnp.int32), RAY_AXIS)
        return img, ang, bits3, code

    sharded = shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(RAY_AXIS)),
        check_vma=False,
    )

    @jax.jit
    def run(image_acc, iang_acc, fail3_acc, it0, ray_grids,
            trace_tables, gv_tables, dseed, beam):
        img, ang, bits3, code = sharded(it0, ray_grids, trace_tables,
                                        gv_tables, dseed, beam)
        return image_acc + img, iang_acc + ang, fail3_acc + bits3, code

    return run


def create_image_sharded(problem: CreateImageProblem, mesh: Mesh,
                         compute_method: str = "auto",
                         chunk_size: int = 524288,
                         spectrum_dtype=jnp.float32, c: float = 0.5,
                         failed_ray_path: str = "Failed_RayTrace_rays.dat",
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Multi-chip create_image over a ray-sharded mesh.

    Every device computes a stride-decomposed share of the rays; the returned
    images are the psum-reduced totals (identical on every device), matching
    the single-device result to float64 summation order.
    """
    beam = problem.euv_beam
    D = mesh.size
    profiler.start("create_image-sharded")

    if problem.seed is not None:
        method = 2
        src = problem.seed_beam
        scale = (src.dx * src.dy * src.da * src.db) / (beam.dx * beam.dy)
    else:
        method = 1
        src = beam
        scale = 1.0
    dims = (src.nx, src.ny, src.na, src.nb)
    use_emis = problem.gain[0].E0 is not None and problem.seed is None
    uniform = fast_stepper.is_uniform(problem.gain)
    backend = ray_tracer._resolve_backend(compute_method, uniform)
    K = beam.nv
    nx, ny, na, nb = beam.nx, beam.ny, beam.na, beam.nb

    if backend == "lax":
        ft = fast_stepper.pack_fast_tables(problem.gain, use_emis)
        trace_tables = ft.tx
        fast_meta = (ft.meta, ft.nch, ft.ny_cells)
        gv_tables = jnp.asarray(np.stack([
            np.asarray(g.gv, np.float32).reshape(-1, K)
            for g in problem.gain[1:]]))
    else:
        trace_tables = prepare_gain(problem.gain)
        fast_meta = None
        gv_tables = trace_tables.gv[1:]
    beam_dev = prepare_beam(beam)
    if problem.seed is None:
        seed_dev = None
    else:
        seed_full = prepare_seed(problem.seed)
        if method == 2:
            seed_dev = seed_ops.make_entry_seed_tables(
                seed_full, (src.x, src.y, src.a, src.b), K)
        else:
            seed_dev = seed_full
    ray_grids = tuple(jnp.asarray(np.asarray(g, np.float64))
                      for g in (src.x, src.y, src.a, src.b))

    Nt = dims[0] * dims[1] * dims[2] * dims[3]
    skip = problem.N_parallel
    B_total = len(range(problem.N_start, Nt, skip)) if problem.N_start < Nt else 0
    # chunk must split evenly across devices
    chunk = min(chunk_size, max(B_total, 1))
    chunk = max(D, (chunk // D) * D)

    cfg_key = ("sharded", id(mesh), backend, problem.N, float(beam.dz), K,
               method, use_emis, dims, float(scale),
               str(jnp.dtype(spectrum_dtype)), float(c), chunk,
               problem.N_start, problem.N_parallel, fast_meta)
    if cfg_key not in _SHARDED_CACHE:
        cfg = dict(N=problem.N, dz=float(beam.dz), K=K, method=method,
                   use_emis=use_emis, dims=dims, scale=float(scale),
                   spectrum_dtype=spectrum_dtype, c=float(c), dense=False,
                   chunk=chunk, N_start=problem.N_start,
                   N_parallel=problem.N_parallel, fast_meta=fast_meta)
        if backend == "lax":
            meta, nch, nyc = fast_meta

            def trace_fn(rays, tx):
                ftl = fast_stepper.FastTables(tx=tx, meta=meta, nch=nch,
                                              ny_cells=nyc)
                return fast_stepper.trace_batch_fast(
                    rays, cfg["N"], cfg["dz"], ftl, method, c=c,
                    use_emis=use_emis)
        else:
            def trace_fn(rays, tables):
                return stepper.trace_batch(rays, cfg["N"], cfg["dz"], tables,
                                           method, c=c, use_emis=use_emis)
        _SHARDED_CACHE[cfg_key] = make_sharded_pipeline(cfg, trace_fn, mesh)
    pipeline = _SHARDED_CACHE[cfg_key]

    image = jnp.zeros((nx * ny, K), dtype=jnp.float64)
    i_ang = jnp.zeros((na * nb,), dtype=jnp.float64)
    fail3 = jnp.zeros((3,), dtype=jnp.int32)

    n_chunks = math.ceil(B_total / chunk) if B_total else 0
    codes_chunks = []
    for ci in range(n_chunks):
        lo = ci * chunk
        image, i_ang, fail3, codes = pipeline(
            image, i_ang, fail3, jnp.int64(lo), ray_grids, trace_tables,
            gv_tables, seed_dev, beam_dev)
        codes_chunks.append((lo, codes))
    image.block_until_ready()
    fail3_np = np.asarray(fail3)
    profiler.stop("create_image-sharded")

    if np.any(fail3_np > 0):
        bits = 0
        for bpos, cnt in zip((1, 2, 3), fail3_np):
            if cnt > 0:
                bits = err_util.set_bit(bpos, bits)
        failed = []
        for lo, codes in codes_chunks:
            codes = np.asarray(codes)
            for bidx in np.nonzero(codes < 0)[0][: err_util.N_FAILED_MAX]:
                # shard s, slot r -> it = lo + (bidx % per_dev)*D + s ... the
                # gathered codes are concatenated per shard
                per_dev = chunk // D
                s, r = divmod(int(bidx), per_dev)
                it = lo + s + r * D
                gidx = problem.N_start + it * problem.N_parallel
                gi, gj, gk, gm = (np.asarray(v) for v in
                                  ray_tracer._unflatten_rays(
                                      jnp.asarray(gidx), dims))
                failed.append(np.array(
                    [src.x[gi], src.y[gj], src.a[gk], src.b[gm]], np.float32))
        for msg in err_util.failure_messages(bits):
            print(msg)
        err_util.write_failures(failed_ray_path, bits, np.array(failed),
                                method, problem.N, beam.dz, problem.gain)
        raise err_util.RayTraceError("Some rays failed")

    image_np = np.asarray(image, dtype=np.float64).reshape(-1)
    i_ang_np = np.asarray(i_ang, dtype=np.float64)
    problem.image = image_np
    problem.I_ang = i_ang_np
    return image_np, i_ang_np
