"""Unit tests for the fused pallas log-gain kernel (ops/pallas_amplify.py).

The kernel replaces spectrum.amplify's XLA row-gathers for the seeded
gain-only path (RayTraceImageHelper.h:569-581). Gates:

* the bf16-triple table split reconstructs every float32 exactly;
* the one-hot MXU windowed fetch is an exact row gather;
* the in-kernel two-float accumulation tracks the float64 log-gain to
  ~1 ulp (same accuracy class as the XLA two-float path -- bitwise
  equality across compilers is not defined because fma contraction of
  the split-product error term differs per backend).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytrace_tpu.ops import pallas_amplify as pa
from raytrace_tpu.ops import spectrum as sp
from raytrace_tpu.ops.stepper import TraceResult


def _mk(B=1024, nseg=2, nsub=3, cells=2756, K=82, seed=0, spread=None):
    rng = np.random.default_rng(seed)
    if spread is None:
        ivl = rng.integers(0, cells, size=(B, nseg, nsub)).astype(np.int32)
    else:
        # clustered ids (coherent rays): random center per block +- spread
        ivl = np.empty((B, nseg, nsub), np.int32)
        for b0 in range(0, B, 256):
            c0 = int(rng.integers(0, cells))
            ivl[b0:b0 + 256] = np.clip(
                c0 + rng.integers(-spread, spread, size=(256, nseg, nsub)),
                0, cells - 1)
    gvl = (rng.standard_normal((B, nseg, nsub)) * 0.1).astype(np.float32)
    gv = (rng.standard_normal((nseg, cells, K)) * 0.5).astype(np.float32)
    return ivl, gvl, gv


def test_bf16_triple_exact():
    _, _, gv = _mk()
    packed = pa.pack_gv(jnp.asarray(gv))
    hi, mid, lo = (packed.tab[i].astype(np.float32) for i in range(3))
    rec = hi + mid + lo
    nseg, cells, K = gv.shape
    assert np.array_equal(np.asarray(rec)[:, :cells, :K], gv)
    # padding stays zero so out-of-range ids can never contaminate
    assert not np.any(np.asarray(rec)[:, cells:, :])


@pytest.mark.parametrize("spread", [None, 40])
def test_onehot_fetch_exact(spread):
    """gvl = 1 turns the kernel into a pure row gather; it must be exact
    (one nonzero per one-hot row => the matmul does no summation)."""
    ivl, _, gv = _mk(spread=spread)
    B = ivl.shape[0]
    ones = np.ones((B, 1, 1), np.float32)
    packed = pa.pack_gv(jnp.asarray(gv[:1]))
    hi, lo = pa.log_gain_fused(jnp.asarray(ivl[:, :1, :1]),
                               jnp.asarray(ones), packed, 1)
    assert np.array_equal(np.asarray(hi), gv[0][ivl[:, 0, 0]])
    assert not np.any(np.asarray(lo))


@pytest.mark.parametrize("spread", [None, 40])
def test_two_float_accuracy_vs_f64(spread):
    ivl, gvl, gv = _mk(spread=spread)
    B, nseg, nsub = ivl.shape
    K = gv.shape[2]
    packed = pa.pack_gv(jnp.asarray(gv))
    hi, lo = pa.log_gain_fused(jnp.asarray(ivl), jnp.asarray(gvl), packed,
                               nsub)
    tot = np.zeros((B, K))
    for i in range(nseg):
        for isub in range(nsub):
            tot += (gvl[:, i, isub, None].astype(np.float64)
                    * gv[i][ivl[:, i, isub]].astype(np.float64))
    got = np.asarray(hi).astype(np.float64) + np.asarray(lo)
    # ~1 ulp of the largest term magnitude
    assert np.abs(got - tot).max() < 2e-7


def test_fused_amplify_end_to_end_golden(monkeypatch):
    """Opt-in e2e: the seeded golden fixture passes with the fused kernel
    wired through the whole pipeline (RAYTRACE_FUSED_AMPLIFY=1)."""
    import os
    from raytrace_tpu import create_image, load_input
    from raytrace_tpu.utils.stats import check_ans

    monkeypatch.setenv("RAYTRACE_FUSED_AMPLIFY", "1")
    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "golden_seed.dat")
    problem, image0, i_ang0 = load_input(fix)
    image, i_ang = create_image(problem, "pallas")
    assert check_ans(image0, i_ang0, image, i_ang)


def test_amplify_dispatch_matches_xla():
    """spectrum.amplify with packed_gv agrees with the XLA path to the
    two-float accuracy bound (exp amplifies log-gain error by |gl|<~1)."""
    ivl, gvl, gv = _mk(B=512, seed=3)
    B, nseg, nsub = ivl.shape
    K = gv.shape[2]
    rng = np.random.default_rng(5)
    Iv0 = rng.random((B, K)).astype(np.float32)
    res = TraceResult(gvl=jnp.asarray(gvl), evl=jnp.zeros_like(jnp.asarray(gvl)),
                      ivl=jnp.asarray(ivl), exit_x=None, exit_y=None,
                      exit_a=None, exit_b=None, escaped=None, perp=None)
    ref = sp.amplify(res, jnp.asarray(Iv0), jnp.asarray(gv), nseg + 1, False,
                     dtype=jnp.float32)
    packed = pa.pack_gv(jnp.asarray(gv))
    fused = sp.amplify(res, jnp.asarray(Iv0), jnp.asarray(gv), nseg + 1,
                       False, dtype=jnp.float32, packed_gv=packed)
    r, f = np.asarray(ref), np.asarray(fused)
    rel = np.abs(r - f) / (np.abs(r) + 1e-30)
    assert rel.max() < 1e-6
