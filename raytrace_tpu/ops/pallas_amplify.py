"""Fused log-gain accumulation for the seeded spectrum path (Pallas TPU).

The gain-only amplification (``RayTrace_calc_ray`` fast path,
src/common/RayTraceImageHelper.h:569-581) needs, per ray and per
(segment, sub-length), the lineshape row ``gv[seg][ivl]`` of the *last*
cell the ray visited -- a [B, K] row-gather from a [cells, K] table. XLA
lowers those 6 gathers at ~15% of HBM peak and they dominate the seeded
amplify stage (measured: ~2.7 ms of the per-65536-ray-chunk amplify,
ROADMAP.md lever 1).

This kernel replaces the gathers with the TPU-native formulation:

* rays in a block are coherent (natural grid order), so their final cell
  ids cluster; per (block, term) the *host-side XLA prologue* computes the
  min/max cell id and the kernel loops over at most a few ``W``-cell
  windows (the per-block window base/count arrive via scalar prefetch --
  no in-kernel cross-lane reductions);
* within a window the row fetch is a one-hot matmul on the MXU:
  ``onehot[R, W] @ gv_window[W, K]``. Each one-hot row has exactly one
  nonzero, so the matmul is an *exact* row fetch;
* the f32 tables ride the MXU as an exact bf16 triple
  (hi + mid + lo reconstructs every float32 exactly: 3 x 8 mantissa
  bits >= 24), so three bf16 passes replace one ~6-pass f32 matmul;
* the stacked triple lives in HBM (``pl.ANY``) and is copied to a VMEM
  scratch ONCE on the first grid step: streaming it through the block
  pipeline re-DMAs it every step (measured +1.35 ms per extra table);
* the per-term two-float MAC (Dekker split product + Knuth two-sum,
  the same error-free transforms as ops/spectrum.py) runs in-kernel,
  so only the [B, K] (hi, lo) log-gain pair returns to XLA.

The result carries the same ~1e-7 relative accuracy as
``spectrum.amplify``'s float32 gain-only path (both track the float64
log-gain to ~1 ulp; measured 1.2e-13 absolute worst case on TPU). It is
not bit-identical to the XLA path: each compiler contracts the
split-product error expression's mul-adds into fmas differently, which
perturbs the (hi, lo) representation by +-1 ulp while leaving the
represented value's accuracy unchanged. The arithmetic Veltkamp split
used here is the Mosaic-friendly (bitcast-free) equivalent of the XLA
path's masked split: both produce the exact same error-free (p, err)
product pair.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["PackedGv", "pack_gv", "log_gain_fused"]

f32 = jnp.float32
bf16 = jnp.bfloat16

_W = 128     # cells per one-hot window
_KP = 128    # padded lineshape width (reference K_MAX = 100 < 128)


class PackedGv(NamedTuple):
    """Lineshape tables split into an exact bf16 triple + the f32 original.

    ``gv`` stays available so every non-fused consumer (emissivity path,
    f64 mode, lax backends) is oblivious to the packing.
    """

    gv: jax.Array    # [nseg, cells, K] f32 (unpadded original)
    tab: jax.Array   # [3, nseg, CP, KP] bf16 stacked hi/mid/lo triple


def _pad16(n: int) -> int:
    return ((n + 15) // 16) * 16


def pack_gv(gv: jax.Array) -> PackedGv:
    """Split [nseg, cells, K] f32 tables into the exact bf16 triple.

    Runs as three rounding subtractions in XLA (call it once per
    ``create_image``, outside the chunk scan): hi = bf16(v),
    mid = bf16(v - hi), lo = bf16(v - hi - mid); v == hi + mid + lo
    exactly for every normal float32 v.
    """
    nseg, cells, K = gv.shape
    if K > _KP:
        raise ValueError(f"K={K} exceeds the padded lineshape width {_KP}")
    CP = max(_pad16(cells), _W)
    g = jnp.pad(gv, ((0, 0), (0, CP - cells), (0, _KP - K)))
    hi = g.astype(bf16)
    r1 = g - hi.astype(f32)
    mid = r1.astype(bf16)
    lo = (r1 - mid.astype(f32)).astype(bf16)
    return PackedGv(gv=gv, tab=jnp.stack([hi, mid, lo]))


def _vsplit(a):
    """Arithmetic (Veltkamp) 12|12-bit split: a = ah + al exactly.

    The 4097 multiply overflows to inf for |a| >= ~8.3e34, so the split is
    exact only below that bound -- comfortably beyond any physical gvl/gain
    magnitude here, but not a universal equivalent of a masked bit-split."""
    c = a * f32(4097.0)
    ah = c - (c - a)
    return ah, a - ah


def _split_prod(a, b):
    """Error-free product: a * b = p + err exactly (Dekker)."""
    ah, al = _vsplit(a)
    bh, bl = _vsplit(b)
    p = a * b
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# Knuth two-sum shared with the XLA spectrum path (identical expression;
# Mosaic lowers the same jnp ops)
from raytrace_tpu.ops.spectrum import _two_sum  # noqa: E402


def _loggain_kernel(win_ref, idx_ref, gvl_ref, tab_hbm,
                    ohi_ref, olo_ref, tab_v, sem, *, R, T, nsub, W, CP):
    b = pl.program_id(0)

    # the stacked bf16 triple is copied HBM -> VMEM scratch once and stays
    # resident for every grid step (sequential grid on one core)
    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(tab_hbm, tab_v, sem)
        cp.start()
        cp.wait()

    idxf = idx_ref[:]    # [R, T] f32 (exact small ints)
    gvl = gvl_ref[:]     # [R, T] f32
    # concrete-layout zeros (iota-derived, not splat: see pallas_kernel.py);
    # Mosaic's tpu.iota is integer-only, so build i32 and convert
    zfull = jax.lax.broadcasted_iota(
        jnp.int32, (R, _KP), 1).astype(f32) * f32(0.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1).astype(f32)
    dn = (((1,), (0,)), ((), ()))

    acc_hi = zfull
    acc_lo = zfull
    for t in range(T):
        seg = t // nsub
        idx_t = idxf[:, t:t + 1]                     # [R, 1]
        # per-(block, term) window base/count precomputed in XLA and
        # scalar-prefetched: no in-kernel cross-lane reductions
        base0 = win_ref[b, t, 0]
        nw = win_ref[b, t, 1]

        def win_body(j, row, seg=seg, idx_t=idx_t, base0=base0):
            w0 = base0 + j * W                       # nominal window start
            # slab start clamped so the slice stays in bounds; the one-hot
            # match below is against the *clamped* absolute position while
            # window membership uses the nominal bounds, so windows stay
            # disjoint and clamped windows still cover every valid id
            w0c = jnp.minimum(w0, CP - W)
            w0f = w0.astype(f32)
            inr = (idx_t >= w0f) & (idx_t < w0f + f32(W))
            oh = jnp.where((idx_t - w0c.astype(f32)) == iota,
                           f32(1.0), f32(0.0))
            oh = jnp.where(inr, oh, f32(0.0)).astype(bf16)
            # base0, W and CP are all 16-aligned, so w0c is too; assert it
            # for Mosaic's bf16 sublane-alignment check
            w0i = pl.multiple_of(w0c, 16)
            # one nonzero per one-hot row + exact bf16 triple => the summed
            # row reconstructs the f32 table value exactly
            r = zfull
            for m in range(3):
                s = tab_v[m, seg, pl.ds(w0i, W), :]  # [W, KP] bf16
                r = r + jax.lax.dot_general(oh, s, dn,
                                            preferred_element_type=f32)
            return row + r

        row = jax.lax.fori_loop(0, nw, win_body, zfull)
        p, pe = _split_prod(gvl[:, t:t + 1], row)
        acc_hi, e = _two_sum(acc_hi, p)
        acc_lo = acc_lo + (e + pe)
    ohi_ref[:] = acc_hi
    olo_ref[:] = acc_lo


def _pick_block(B: int) -> int:
    # 2048 exceeds the 16 MB VMEM budget by ~56 KB (block pipeline +
    # resident 4.25 MB table scratch); 1024 measures the same throughput
    for R in (1024, 512, 256):
        if B % R == 0:
            return R
    raise ValueError(f"B={B} is not a multiple of 256")


@functools.partial(jax.jit, static_argnames=("T", "nsub", "W", "CP",
                                             "interpret"))
def _log_gain_jit(idx, gvl, tab, T, nsub, W, CP, interpret):
    B = idx.shape[0]
    R = _pick_block(B)
    nblocks = B // R

    # per-(block, term) window base (16-aligned for the bf16 sublane slice)
    # and count, computed here so the kernel does no cross-lane reductions.
    # Lanes with gvl == 0 (escaped rays park at ivl = 0, zero-gain cells)
    # contribute nothing whatever row they fetch, so the windows only need
    # to cover lanes with nonzero gvl -- excluded lanes simply miss every
    # window and read 0. Without this, one escaped ray (ivl = 0) in a block
    # whose live rays sit near cell ~2700 would force ~CP/W windows.
    idx3 = idx.astype(jnp.int32).reshape(nblocks, R, T)
    live = gvl.reshape(nblocks, R, T) != 0
    mn = jnp.min(jnp.where(live, idx3, jnp.int32(2 ** 30)), axis=1)
    mx = jnp.max(jnp.where(live, idx3, jnp.int32(-1)), axis=1)
    base = (jnp.clip(mn, 0, max(CP - W, 0)) // 16) * 16
    nw = jnp.where(mx >= mn, (mx - base) // W + 1, 0)
    win = jnp.stack([base, nw], axis=-1)        # [nblocks, T, 2] i32

    def _imap2(b, win_ref):
        b32 = jnp.asarray(b, jnp.int32)
        return (b32, b32 * 0)

    ray_spec = pl.BlockSpec((R, T), _imap2, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((R, _KP), _imap2, memory_space=pltpu.VMEM)
    kernel = functools.partial(_loggain_kernel, R=R, T=T, nsub=nsub, W=W,
                               CP=CP)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[ray_spec, ray_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM(tab.shape, bf16),
                        pltpu.SemaphoreType.DMA(())],
    )
    ohi, olo = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, _KP), jnp.float32),
                   jax.ShapeDtypeStruct((B, _KP), jnp.float32)),
        interpret=interpret,
    )(win, idx, gvl, tab)
    return ohi, olo


def log_gain_fused(ivl, gvl, packed: PackedGv, nsub: int,
                   interpret: bool | None = None):
    """Two-float total log-gain Sum_t gvl[:, t] * gv[seg(t)][ivl[:, t], :].

    ``ivl``/``gvl``: [B, nseg, nsub] from the trace; returns (hi, lo)
    [B, K] f32 with hi + lo tracking the float64 accumulation to ~1 ulp
    (same accuracy class as spectrum.amplify's f32 path). ``B`` must be a
    multiple of 256 (guaranteed on the pallas backend: chunks are
    (8, 128)-tile multiples).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = ivl.shape[0]
    nseg = packed.tab.shape[1]
    K = packed.gv.shape[2]
    T = nseg * nsub
    CP = packed.tab.shape[2]
    idx = ivl.reshape(B, T).astype(jnp.float32)
    gvl2 = gvl.reshape(B, T).astype(jnp.float32)
    hi, lo = _log_gain_jit(idx, gvl2, packed.tab, T, nsub, _W, CP,
                           bool(interpret))
    return hi[:, :K], lo[:, :K]
