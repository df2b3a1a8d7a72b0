"""Interpolation/search primitives vs the scalar oracle."""

import numpy as np
import pytest

import raytrace_tpu  # noqa: F401
import jax.numpy as jnp
from raytrace_tpu.ops import interp, oracle


def test_find_first_single_matches_oracle():
    rng = np.random.default_rng(0)
    grid = np.sort(rng.random(37))
    ys = np.concatenate([rng.random(100), grid[[0, 5, 36]],
                         [grid[0] - 1, grid[-1] + 1]])
    got = np.asarray(interp.find_first_single(jnp.asarray(grid), jnp.asarray(ys)))
    want = [oracle.find_first_single(grid, y) for y in ys]
    assert np.array_equal(got, want)


def test_find_index_matches_oracle():
    rng = np.random.default_rng(1)
    grid = np.sort(rng.random(106))
    ys = np.concatenate([rng.random(200) * 1.2 - 0.1, grid[[0, 50, 105]]])
    got = np.asarray(interp.find_index(jnp.asarray(grid), jnp.asarray(ys)))
    want = [oracle.find_index(grid, y) for y in ys]
    assert np.array_equal(got, want)


def test_pchip_matches_oracle():
    rng = np.random.default_rng(2)
    xi = np.sort(rng.random(25)) * 10
    yi = np.cumsum(rng.normal(size=25))  # mixed monotone/non-monotone
    g1, g2 = interp.pchip_coefficients(xi, yi)
    xs = np.concatenate([rng.uniform(-1, 11, 300), xi])
    got = np.asarray(interp.pchip_eval(
        jnp.asarray(xi), jnp.asarray(yi), jnp.asarray(g1), jnp.asarray(g2),
        jnp.asarray(xs)))
    want = np.array([oracle.interp_pchip(xi, yi, x) for x in xs])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_pchip_two_points_linear():
    xi = np.array([0.0, 1.0])
    yi = np.array([2.0, 4.0])
    g1, g2 = interp.pchip_coefficients(xi, yi)
    got = np.asarray(interp.pchip_eval(
        jnp.asarray(xi), jnp.asarray(yi), jnp.asarray(g1), jnp.asarray(g2),
        jnp.asarray([0.25, 0.5, 2.0])))
    np.testing.assert_allclose(got, [2.5, 3.0, 6.0], rtol=1e-14)


def test_bilinear():
    v = np.asarray(interp.bilinear(
        jnp.float32(0.25), jnp.float32(0.5),
        jnp.float32(1.0), jnp.float32(2.0), jnp.float32(3.0), jnp.float32(4.0)))
    assert v == pytest.approx(0.5 * 1.25 + 0.5 * 3.25)


def test_interp_linear():
    xi = jnp.asarray(np.array([0.0, 1.0, 3.0]))
    yi = jnp.asarray(np.array([0.0, 2.0, 4.0]))
    got = np.asarray(interp.interp_linear(xi, yi, jnp.asarray([0.5, 2.0])))
    np.testing.assert_allclose(got, [1.0, 3.0])
