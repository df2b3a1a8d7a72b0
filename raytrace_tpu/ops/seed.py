"""Seed-beam intensity evaluation (TPU rebuild of ``calc_seed_inline``,
src/common/RayTraceImageHelper.h:230-247).

The seed profile is separable: ``I(x,y,a,b,v) = f0 fx(x) fy(y) fa(a) fb(b) fv(v)``
with each factor pchip-interpolated on its own grid. The monotone-hermite
gradients are precomputed per interval on the host
(:func:`raytrace_tpu.ops.interp.pchip_coefficients`), so the device
evaluation is a gather + cubic polynomial.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytrace_tpu.models.problem import DeviceSeed
from raytrace_tpu.ops.interp import pchip_eval

__all__ = ["calc_seed_batch", "calc_seed_factor"]


def calc_seed_factor(seed: DeviceSeed, x, y, a, b):
    """Scalar seed weight ``f`` at phase-space points (without the frequency
    profile): the product of the four pchip factors, clamped to >= 0 and
    zeroed outside the table's box (RayTraceImageHelper.h:234-244)."""
    pts = (x, y, a, b)
    inside = jnp.ones(jnp.shape(x), dtype=bool)
    f = seed.f0
    for axis in range(4):
        p = jnp.asarray(pts[axis], jnp.float64)
        inside = inside & (p >= seed.lo[axis]) & (p <= seed.hi[axis])
        f = f * pchip_eval(seed.xs[axis], seed.fs[axis],
                           seed.g1s[axis], seed.g2s[axis], p)
    f = jnp.maximum(f, 0.0)
    return jnp.where(inside, f, 0.0)


def calc_seed_batch(seed: DeviceSeed, x, y, a, b, K: int):
    """Full seed spectrum [B, K]: factor * frequency profile f[4]."""
    f = calc_seed_factor(seed, x, y, a, b)
    return f[:, None] * seed.fv[None, :K]
