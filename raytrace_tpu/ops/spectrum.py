"""Spectral amplification: closed-form integration of dI/dz = j + g I.

TPU rebuild of the per-ray spectrum loops in ``RayTrace_calc_ray``
(src/common/RayTraceImageHelper.h:534-581):

* emissivity path (ASE): per (segment, sub-length) the lineshape row
  ``gv[cell]`` scales the path-integrated gain/emissivity and the intensity
  is updated with the closed form ``I = j/g (e^{g}-1) + I e^{g}`` with a
  2nd-order Taylor branch for |g| < 1e-3;
* gain-only fast path (seeded): the total log-gain is accumulated first and
  a single ``exp`` applied (RayTraceImageHelper.h:569-581).

Precision: the reference computes this in double. ``dtype=float64``
reproduces that (f64 is emulated on TPU; ~0.2 s per ASE_small call).
``dtype=float32`` uses a two-float exponential instead: ``exp`` amplifies
*argument* rounding by a factor of |g| (d exp/exp = dg), so a plain float32
exp of a float32 log-gain is off by ~|g|*6e-8 relative -- up to ~1e-5 for
the brightest rays, which is what the 5e-6 golden norm gate sees. Computing
``g`` exactly (f32*f32 products are exact in f64), splitting g = hi + lo,
and evaluating ``exp32(hi) * (1 + lo)`` keeps the relative error at ~1e-7
independent of |g| at float32 cost.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytrace_tpu.ops.stepper import TraceResult

__all__ = ["amplify"]


_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _exp_fast(g64):
    """Unbiased ~1.5e-7-relative exp at float32 cost.

    The TPU float32 exp intrinsic carries a systematic ~-1e-6 relative bias
    (measured), which compounds across the per-sub-length amplification
    chain and shows up in the golden norm gate. This version does its own
    range reduction in (cheap) f64 adds/mults -- g = n ln2 + f with
    |f| <= ln2/2 -- evaluates e^f with an f32 Horner Taylor (degree 7,
    truncation 5e-9), and scales by 2^n exactly via ldexp.
    """
    n = jnp.round(g64 * _LOG2E)
    f = (g64 - n * _LN2).astype(jnp.float32)
    e = jnp.float32(1.0) + f / 7
    for k in (6, 5, 4, 3, 2, 1):
        e = jnp.float32(1.0) + (f / k) * e
    return jnp.ldexp(e, n.astype(jnp.int32))


def _expm1_fast(g64):
    """Unbiased expm1 companion: direct polynomial when |g| <= ln2/2 (no
    cancellation), exp-1 otherwise (where it is well-conditioned)."""
    small = jnp.abs(g64) <= 0.5 * _LN2
    f = jnp.where(small, g64, 0.0).astype(jnp.float32)
    e = jnp.float32(1.0) + f / 7
    for k in (6, 5, 4, 3, 2):
        e = jnp.float32(1.0) + (f / k) * e
    poly = f * e  # f(1 + f/2(1 + f/3(...)))
    return jnp.where(small, poly,
                     _exp_fast(jnp.where(small, 1.0, g64)) - jnp.float32(1.0))


def amplify(res: TraceResult, Iv0, gv, N: int, use_emis: bool,
            dtype=jnp.float64):
    """Apply the amplification ODE along each ray's recorded path.

    ``Iv0``: [B, K] initial (seed) intensity, already zeroed for escaped
    rays. ``gv``: [N-1, cells, K] float32 lineshape tables for segments
    1..N-1 (segment 0 is never read: the kernel always uses the
    high-energy-side segment, RayTraceImageHelper.h:430-441).
    Returns [B, K] of ``dtype``.
    """
    nseg = max(N - 1, 0)
    B, K = Iv0.shape
    dtype = jnp.dtype(dtype)
    f32_mode = dtype == jnp.float32
    Iv = Iv0.astype(dtype)
    if nseg == 0:
        return Iv

    if use_emis:
        for i in range(nseg):
            gv_seg = gv[i]  # [cells, K] f32
            for isub in range(res.gvl.shape[2]):
                gv_row = gv_seg[res.ivl[:, i, isub]]  # [B, K] f32
                # f32*f32 is exact in f64; the ODE needs the log-gain to
                # full precision because exp() amplifies argument error
                gl64 = (res.gvl[:, i, isub, None].astype(jnp.float64)
                        * gv_row.astype(jnp.float64))
                el = res.evl[:, i, isub, None].astype(dtype) * gv_row.astype(dtype)
                gl = gl64.astype(dtype)
                small = jnp.abs(gl) < 1e-3
                gl_safe = jnp.where(small, 1.0, gl)
                if f32_mode:
                    gl64z = jnp.where(small, 0.0, gl64)
                    exp_gl = _exp_fast(gl64z)
                    em1 = _expm1_fast(gl64z)
                else:
                    exp_gl = jnp.exp(jnp.where(small, 0.0, gl))
                    em1 = exp_gl - 1.0
                big = el / gl_safe * em1 + Iv * exp_gl
                taylor = el * (1.0 + 0.5 * gl * (1.0 + 0.3333333333 * gl)) \
                    + Iv * (1.0 + gl * (1.0 + 0.5 * gl))
                Iv = jnp.where(small, taylor, big)
        return Iv

    # gain-only fast path: accumulate the total log-gain, one exp
    gl_tot = jnp.zeros((B, K), dtype=jnp.float64)
    for i in range(nseg):
        gv_seg = gv[i]
        for isub in range(res.gvl.shape[2]):
            gv_row = gv_seg[res.ivl[:, i, isub]]
            gl_tot = gl_tot + (res.gvl[:, i, isub, None].astype(jnp.float64)
                               * gv_row.astype(jnp.float64))
    if f32_mode:
        return Iv * _exp_fast(gl_tot)
    return Iv * jnp.exp(gl_tot)
