"""Spectral amplification: closed-form integration of dI/dz = j + g I.

TPU rebuild of the per-ray spectrum loops in ``RayTrace_calc_ray``
(src/common/RayTraceImageHelper.h:534-581):

* emissivity path (ASE): per (segment, sub-length) the lineshape row
  ``gv[cell]`` scales the path-integrated gain/emissivity and the intensity
  is updated with the closed form ``I = j/g (e^{g}-1) + I e^{g}`` with a
  2nd-order Taylor branch for |g| < 1e-3;
* gain-only fast path (seeded): the total log-gain is accumulated first and
  a single ``exp`` applied (RayTraceImageHelper.h:569-581).

The per-ray row gather from ``gv`` is the only table access; everything else
is dense [B, K] arithmetic. ``dtype`` selects float64 (reference parity;
the reference uses double here) or float32 (fast path -- validated against
the golden images at the same 5e-6 gate).
"""

from __future__ import annotations

import jax.numpy as jnp

from raytrace_tpu.ops.stepper import TraceResult

__all__ = ["amplify"]


def amplify(res: TraceResult, Iv0, gv, N: int, use_emis: bool,
            dtype=jnp.float64):
    """Apply the amplification ODE along each ray's recorded path.

    ``Iv0``: [B, K] initial (seed) intensity, already zeroed for escaped
    rays. ``gv``: [N, cells, K] float32 lineshape tables (cell-major rows,
    the only gain data the spectrum needs). Returns [B, K] of ``dtype``.
    """
    nseg = max(N - 1, 0)
    B, K = Iv0.shape
    Iv = Iv0.astype(dtype)
    if nseg == 0:
        return Iv

    if use_emis:
        for i in range(nseg):
            gv_seg = gv[i + 1]  # [cells, K] f32
            for isub in range(res.gvl.shape[2]):
                gv_row = gv_seg[res.ivl[:, i, isub]].astype(dtype)  # [B, K]
                gl = res.gvl[:, i, isub, None].astype(dtype) * gv_row
                el = res.evl[:, i, isub, None].astype(dtype) * gv_row
                small = jnp.abs(gl) < 1e-3
                # guard exp against the small branch's operands
                exp_gl = jnp.exp(jnp.where(small, 0.0, gl))
                gl_safe = jnp.where(small, 1.0, gl)
                big = el / gl_safe * (exp_gl - 1.0) + Iv * exp_gl
                taylor = el * (1.0 + 0.5 * gl * (1.0 + 0.3333333333 * gl)) \
                    + Iv * (1.0 + gl * (1.0 + 0.5 * gl))
                Iv = jnp.where(small, taylor, big)
        return Iv

    # gain-only fast path
    gl_tot = jnp.zeros((B, K), dtype=dtype)
    for i in range(nseg):
        gv_seg = gv[i + 1]
        for isub in range(res.gvl.shape[2]):
            gv_row = gv_seg[res.ivl[:, i, isub]].astype(dtype)
            gl_tot = gl_tot + res.gvl[:, i, isub, None].astype(dtype) * gv_row
    return Iv * jnp.exp(gl_tot)
