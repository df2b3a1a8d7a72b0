"""Pallas TPU deposit kernel: scatter-free image binning on the MXU.

The near-field deposit ``image[c, k] += sum_{b: bin[b]==c} Iv[b, k]`` is the
TPU analogue of the reference's atomicAdd scatter (src/RayTraceImageCuda.cu:
37-48, atomicAdd2 CAS loop). XLA's segment_sum lowering materializes a
[B, cells] one-hot (or a sorted scatter) through HBM; this kernel instead
processes one 1024-ray tile per grid step with everything on chip:

* the transposed one-hot ``ohT[c, b] = (bin[b] == c)`` is built in VMEM in
  bfloat16 (0/1 exact, ~3 MB per tile) and never touches HBM;
* ``Iv`` is split into three bfloat16 planes by exact bit-masking
  (truncation: the top 16 bits of an f32 are its truncated bfloat16), so
  hi + mid + lo recovers the f32 value to ~2^-25 relative;
* three MXU matmuls [C, 1024] @ [1024, K] accumulate into a float32 [C, K]
  VMEM-resident output block (constant index_map keeps it on chip across
  the whole grid; adding the one-hot's exact zeros costs no rounding, so
  the effective f32 accumulation depth equals rays-per-cell, same as the
  reference's double scatter at f32 precision).

HBM traffic per chunk = read Iv + bins once, write [C, K] once -- the
minimum possible for this deposit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["deposit_tiles", "split_bf16x3", "DEPOSIT_TILE"]

DEPOSIT_TILE = 1024  # rays per grid step (one (8,128) trace tile)


def split_bf16x3(x):
    """Exact bfloat16 triple of a float32 array: hi + mid + lo == x.

    Split by bit-masking (truncation): the top 16 bits of an f32 ARE its
    truncated bfloat16, so each plane is exact and the residual subtraction
    cannot be algebraically simplified away (XLA folds the rounding-based
    split ``x - f32(bf16(x))`` to zero). Shared by every MXU consumer of
    exact-f32-via-bf16 matmuls (this kernel, binning._deposit_matmul).
    """
    def trunc(v):
        t = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(v, jnp.uint32)
            & jnp.uint32(0xFFFF0000), jnp.float32)
        return t, t.astype(jnp.bfloat16)

    hi32, hi = trunc(x)
    r1 = x - hi32
    mid32, mid = trunc(r1)
    lo = (r1 - mid32).astype(jnp.bfloat16)
    return hi, mid, lo


#: VMEM headroom for the per-block one-hot + resident output block (the
#: 16 MiB scoped budget also holds the streamed planes and the bins array)
_DEPOSIT_VMEM_BUDGET = 8 * 2 ** 20


def _c_block(C: int, K: int) -> int:
    """Cell-block height: the largest multiple of 8 whose one-hot
    ([c_blk, TILE] bf16) plus resident output block ([c_blk, K_pad] f32)
    fits the VMEM budget. Small images (every shipped workload at scale 1)
    get a single block -- the original kernel layout."""
    kpad = -(-K // 128) * 128
    per_row = DEPOSIT_TILE * 2 + kpad * 4
    c_blk = max(8, min(C, _DEPOSIT_VMEM_BUDGET // per_row))
    return -(-c_blk // 8) * 8 if c_blk >= C else (c_blk // 8) * 8


def _deposit_kernel(bins_ref, hi_ref, mid_ref, lo_ref, out_ref, *, c_blk):
    cb = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bins = bins_ref[pl.ds(t, 1), :]                       # [1, TILE] i32
    cell_ids = (cb * c_blk
                + jax.lax.broadcasted_iota(jnp.int32, (c_blk, DEPOSIT_TILE),
                                           0))
    ohT = (cell_ids == jnp.broadcast_to(bins, (c_blk, DEPOSIT_TILE))
           ).astype(jnp.bfloat16)                         # [c_blk, TILE]
    acc = out_ref[:]
    for plane_ref in (hi_ref, mid_ref, lo_ref):
        acc = acc + jax.lax.dot_general(
            ohT, plane_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("C", "interpret"))
def deposit_tiles(contrib, bins, C: int, interpret: bool = False):
    """MXU deposit: out[c] = sum over rays b with bins[b] == c of contrib[b].

    ``contrib``: [B, K] float32 (B divisible by DEPOSIT_TILE);
    ``bins``: [B] int32 in [0, C). Returns [C, K] float32.

    Large images (C beyond the VMEM budget, e.g. the 6000-cell grids a
    -scale=16 run produces) are tiled over cell blocks: grid (CB, T) with
    T innermost, so each output block stays VMEM-resident across the whole
    ray sweep while the planes re-stream once per cell block.
    """
    B, K = contrib.shape
    assert B % DEPOSIT_TILE == 0
    T = B // DEPOSIT_TILE

    c_blk = _c_block(C, K)
    n_cb = -(-C // c_blk)
    c_pad = n_cb * c_blk

    hi, mid, lo = split_bf16x3(contrib)
    bins2 = bins.reshape(T, DEPOSIT_TILE)

    def imap_plane(cb, t):
        t32 = jnp.asarray(t, jnp.int32)
        return (t32, t32 * 0)

    def imap_out(cb, t):
        cb32 = jnp.asarray(cb, jnp.int32)
        return (cb32, cb32 * 0)

    def imap_fixed(cb, t):
        t32 = jnp.asarray(t, jnp.int32)
        return (t32 * 0, t32 * 0)

    # the whole [T, TILE] bins array rides along resident (256 KB at 64
    # tiles); Mosaic forbids (1, TILE) blocks (sublane dim < 8), so the
    # kernel dynamic-slices its row instead
    bin_spec = pl.BlockSpec((T, DEPOSIT_TILE), imap_fixed,
                            memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((DEPOSIT_TILE, K), imap_plane,
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((c_blk, K), imap_out, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_deposit_kernel, c_blk=c_blk),
        grid=(n_cb, T),
        out_shape=jax.ShapeDtypeStruct((c_pad, K), jnp.float32),
        in_specs=[bin_spec, plane_spec, plane_spec, plane_spec],
        out_specs=out_spec,
        interpret=interpret,
    )(bins2, hi, mid, lo)
    return out if c_pad == C else out[:C]
