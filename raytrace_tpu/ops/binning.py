"""Image binning: deposit per-ray spectra into the near-field image and the
far-field angular image.

TPU rebuild of the scatter-add accumulation in ``RayTraceImageCPULoop``
(src/RayTraceImageCPU.cpp:37-68):

* backward (ASE, method 1) rays bin at their *entry* coordinates;
* forward (seeded, method 2) rays bin at their *exit* coordinates with the
  angle sign flipped and y mirrored onto a half-plane beam grid;
* ``getIndex`` = half-cell-shifted first-greater search, -1 (reject) outside
  the half-cell-padded extent (src/RayTraceImageCPU.cpp:11-16);
* image[nv*(i1 + i2*nx) + iv] += Iv*scale, I_ang[i3 + i4*na] += sum 2 dv Iv.

Instead of per-ray atomics the deposit is a ``segment_sum`` over computed
flat bin ids (invalid/failed rays go to a trash bin), which XLA lowers to a
single sorted scatter-add -- the TPU analogue of the reference threads
backend's privatized buffers + merge (src/RayTraceImage.cpp:100-133).
Accumulation is float64 like the reference's double image buffers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytrace_tpu.models.problem import DeviceBeam
from raytrace_tpu.ops.interp import find_first_single

__all__ = ["get_index", "bin_images", "bin_images_dense"]


def bin_images_dense(Iv, beam: DeviceBeam, ok):
    """Dense binning for full-grid backward (ASE) chunks.

    When the ray list enumerates the complete (x, y, a, b) grid in natural
    order (N_start=0, N_parallel=1, method 1), every ray bins at its *entry*
    coordinates, so ``getIndex`` is the identity: the near-field deposit is a
    pure reduction over the angular block and the far-field deposit a
    reduction over the spatial block -- no scatter at all. The chunk must
    cover whole (na x nb) blocks.

    Returns (img_rows [cells_chunk, K] f64 in i-major cell order,
    i_ang_part [na*nb] f64 in reference k + m*na order).
    """
    na = beam.a.shape[0]
    nb = beam.b.shape[0]
    B, K = Iv.shape
    blk = na * nb
    cells = B // blk
    contrib = jnp.where(ok[:, None], Iv, 0.0).astype(jnp.float64)
    img_rows = contrib.reshape(cells, blk, K).sum(axis=1)
    tmp = contrib @ (2.0 * beam.dv)                       # [B]
    ang_km = tmp.reshape(cells, na, nb).sum(axis=0)       # [k, m]
    i_ang_part = ang_km.T.reshape(-1)                     # flat k + m*na
    return img_rows, i_ang_part


def get_index(grid, d, y):
    """Vectorized ``getIndex`` (RayTraceImageCPU.cpp:11-16): nearest-cell
    index via findfirstsingle(grid, y - d/2); -1 outside the padded extent."""
    y = jnp.asarray(y, jnp.float64)
    n = grid.shape[0]
    idx = find_first_single(grid, y - 0.5 * d)
    bad = (y < grid[0] - 0.5 * d) | (y > grid[n - 1] + 0.5 * d)
    return jnp.where(bad, -1, idx)


def bin_images(Iv, res, rays, beam: DeviceBeam, method: int, scale, valid):
    """Deposit a batch into (image, I_ang) partial sums.

    ``Iv``: [B, K]; ``res``: TraceResult; ``rays``: dict of [B] entry coords;
    ``valid``: [B] bool (failed rays are excluded, the reference ``continue``s
    on error). Returns (image [nx*ny, K] f64, I_ang [na*nb] f64) partials in
    cell-major layout; the orchestrator transposes to the reference layout.
    """
    nx, ny = beam.x.shape[0], beam.y.shape[0]
    na, nb = beam.a.shape[0], beam.b.shape[0]

    if method == 1:
        # backward: bin at the entry coordinates
        bx, by = rays["x"], rays["y"]
        ba, bb = rays["a"], rays["b"]
    else:
        # forward: bin at exit, angles negated, y mirrored for half-plane beams
        bx = res.exit_x
        by = res.exit_y
        ba = -res.exit_a
        bb = -res.exit_b
        by = jnp.where(beam.y0_nonneg & (by < 0), -by, by)

    i1 = get_index(beam.x, beam.dx, bx)
    i2 = get_index(beam.y, beam.dy, by)
    i3 = get_index(beam.a, beam.da, ba)
    i4 = get_index(beam.b, beam.db, bb)

    # near-field image: cell id i1 + i2*nx, trash bin for invalid. The
    # scatter runs in the spectrum dtype (per-chunk partial sums; ~2.9e-7
    # relative in f32 at 500k rays/chunk) and accumulates across chunks in
    # the caller's float64 buffers.
    img_ok = valid & (i1 >= 0) & (i2 >= 0)
    img_bin = jnp.where(img_ok, i1 + i2 * nx, nx * ny)
    contrib = Iv * jnp.asarray(scale, Iv.dtype)
    image = jax.ops.segment_sum(contrib, img_bin, num_segments=nx * ny + 1)[:-1]

    # far-field: sum_v 2 dv Iv then scatter into i3 + i4*na
    ang_ok = valid & (i3 >= 0) & (i4 >= 0)
    ang_bin = jnp.where(ang_ok, i3 + i4 * na, na * nb)
    tmp = Iv @ (2.0 * beam.dv).astype(Iv.dtype)
    i_ang = jax.ops.segment_sum(tmp, ang_bin, num_segments=na * nb + 1)[:-1]
    return image.astype(jnp.float64), i_ang.astype(jnp.float64)
