"""Math utility library tests (the reference's interp namespace, U2)."""

import numpy as np
import pytest

import raytrace_tpu  # noqa: F401
from raytrace_tpu.ops import mathlib as ml


def test_interp_linear():
    xi = np.array([0.0, 1.0, 3.0])
    yi = np.array([0.0, 2.0, 4.0])
    assert ml.interp_linear(xi, yi, 0.5) == pytest.approx(1.0)
    assert ml.interp_linear(xi, yi, 2.0) == pytest.approx(3.0)
    # linear extrapolation
    assert ml.interp_linear(xi, yi, 4.0) == pytest.approx(5.0)


def test_bilinear_trilinear_exact_on_linear_fields():
    x1 = np.linspace(0, 1, 5)
    x2 = np.linspace(0, 2, 7)
    f = x1[:, None] * 2 + x2[None, :] * 3 + 1
    got = ml.bilinear(x1, x2, f, 0.33, 1.21)
    assert got == pytest.approx(0.33 * 2 + 1.21 * 3 + 1, rel=1e-12)

    x3 = np.linspace(-1, 1, 4)
    f3 = (x1[:, None, None] + 2 * x2[None, :, None] + 3 * x3[None, None, :])
    got = ml.trilinear(x1, x2, x3, f3, 0.4, 0.9, 0.1)
    assert got == pytest.approx(0.4 + 2 * 0.9 + 3 * 0.1, rel=1e-12)


def test_n_linear_matches_trilinear():
    rng = np.random.default_rng(0)
    grids = [np.sort(rng.random(5)) for _ in range(3)]
    f = rng.random((5, 5, 5))
    pt = [0.4, 0.5, 0.45]
    a = ml.n_linear(grids, f, pt)
    b = ml.trilinear(grids[0], grids[1], grids[2], f, *pt)
    assert a == pytest.approx(b, rel=1e-12)


def test_quicksort_dual_and_unique():
    x = np.array([3.0, 1.0, 2.0, 1.0])
    y = np.array([30, 10, 20, 11])
    xs, ys = ml.quicksort(x, y)
    assert np.array_equal(xs, [1.0, 1.0, 2.0, 3.0])
    assert np.array_equal(ys, [10, 11, 20, 30])
    assert np.array_equal(ml.unique(x), [1.0, 2.0, 3.0])


def test_unique_index_maps():
    """The (Y, I, J) overload contract (interp.hpp:411-436): X[I[j]] == Y[j]
    and Y[J[i]] == X[i]."""
    rng = np.random.default_rng(7)
    x = rng.integers(0, 10, size=37).astype(np.float64)
    y, i_map, j_map = ml.unique_index(x)
    assert np.array_equal(y, np.unique(x))
    assert np.array_equal(x[i_map], y)
    assert np.array_equal(y[j_map], x)
    # degenerate cases
    y1, i1, j1 = ml.unique_index(np.array([5.0]))
    assert np.array_equal(y1, [5.0]) and i1[0] == 0 and j1[0] == 0


def test_calc_width_gaussian():
    """FWHM of a Gaussian should come back as ~2.355 sigma."""
    sigma = 0.7
    x = np.linspace(-10, 10, 4001)
    y = np.exp(-0.5 * (x / sigma) ** 2)
    w = ml.calc_width(x, y)
    assert w == pytest.approx(2.3548 * sigma, rel=2e-2)


def test_bisection():
    root = ml.bisection(lambda x: x ** 3 - 2.0, 0.0, 2.0)
    assert root == pytest.approx(2.0 ** (1 / 3), rel=1e-8)


def test_fast_pow():
    x = np.array([0.5, 1.7, 42.0], np.float32)
    got = ml.fast_pow(x, 1.5)
    np.testing.assert_allclose(got, x.astype(np.float64) ** 1.5, rtol=1e-3)


def test_integration():
    f = lambda x: np.sin(x)
    exact = 2.0  # integral of sin over [0, pi]
    assert ml.integrate_simpson(f, 0.0, np.pi, 200) == pytest.approx(exact, rel=1e-8)
    assert ml.integrate_adaptive(f, 0.0, np.pi) == pytest.approx(exact, rel=1e-9)
    assert ml.integrate_midpoint(f, 0.0, np.pi, 2001) == pytest.approx(exact, rel=1e-5)


def test_pio_streams(capsys):
    from raytrace_tpu.utils import pio
    pio.printp("hello %d\n", 42)
    captured = capsys.readouterr()
    assert "hello 42" in captured.out
    assert pio.stringf("%s-%d", "a", 1) == "a-1"


def test_calc_width_reference_semantics():
    """The reference minimizes the 76.0968%-energy window over every
    starting sample (interp.cpp:190-198) -- an asymmetric profile must get
    the narrowest window, not the mean-centered one."""
    x = np.linspace(0.0, 10.0, 2001)
    # sharp peak near 2 + broad shelf: narrowest 76% window hugs the peak
    y = np.exp(-0.5 * ((x - 2.0) / 0.2) ** 2) + 0.02
    w = ml.calc_width(x, y)
    assert 0 < w < 8.0
    assert w < ml._calc_width_centered(x, y) + 1e-9
    # reference error returns
    assert ml.calc_width([1.0], [1.0]) == -1.0
    assert ml.calc_width([0.0, 1.0], [1.0, -1.0]) == -1.0
    assert ml.calc_width([1.0, 0.5], [1.0, 1.0]) == -1.0
    assert ml.calc_width([0.0, 1.0], [0.0, 0.0]) == -1.0


def test_fast_exp_avg_geomean():
    """fast_exp_avg = exp2(sum ai*log2 xi): the log-domain weighted average
    (interp.hpp:502-533), NOT a linear lerp."""
    ai = np.array([0.5, 0.5])
    xi = np.array([4.0, 16.0])
    got = ml.fast_exp_avg(ai, xi)
    assert got == pytest.approx(8.0, rel=1e-3)  # geometric mean
    # single value with weight 1: identity up to polynomial error
    assert ml.fast_exp_avg([1.0], [7.3]) == pytest.approx(7.3, rel=1e-3)


def test_get_interp_ratio_log():
    assert ml.get_interp_ratio(0.0, 4.0, 1.0) == pytest.approx(0.25)
    assert ml.get_interp_ratio(0.0, 4.0, 9.0) == 1.0  # clamped
    assert ml.get_interp_ratio(0.0, 4.0, 9.0, extrap=True) == pytest.approx(2.25)
    r = ml.get_interp_ratio(1.0, 100.0, 10.0, use_log=True)
    assert r == pytest.approx(0.5, abs=2e-3)


def test_fast_pow_reference_bit_semantics():
    """fast_pow mirrors the reference's IEEE-754 expression graph
    (interp.hpp:475-498): +0 base and exponent-underflow return exactly 0,
    accuracy ~1e-3 in the normal range."""
    assert ml.fast_pow(0.0, 2.0) == 0.0
    assert ml.fast_pow(1e-300, 2.0) == 0.0  # w < -1022 underflow path
    x = np.array([0.001, 0.5, 1.7, 42.0, 1e20])
    np.testing.assert_allclose(ml.fast_pow(x, 1.5), x ** 1.5, rtol=2e-3)
    np.testing.assert_allclose(ml.fast_pow(x, -0.7), x ** -0.7, rtol=2e-3)


def test_native_quicksort_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 40, 5000).astype(np.float64)
    y = x * 2.0 + 0.25  # key-linked payload: pairing must survive the sort
    xs, ys = ml.quicksort(x, y)
    assert np.array_equal(xs, np.sort(x))
    assert np.allclose(ys, xs * 2.0 + 0.25)
    assert np.array_equal(ml.unique(x), np.unique(x))


def test_bisection_reference_protocol():
    """The modified bisection keeps every evaluation and proposes via
    bisection_coeff (midpoint -> uneven boundary step -> pchip inverse
    interpolation, interp.cpp:205-268)."""
    root = ml.bisection(lambda x: x ** 3 - 2.0, 0.0, 2.0, tol1=1e-13,
                        tol2=1e-13)
    assert root == pytest.approx(2.0 ** (1 / 3), rel=1e-9)
    # boundary-hugging root exercises the 80/20 uneven branch
    root = ml.bisection(lambda x: np.tanh(50 * (x - 0.02)), 0.0, 1.0,
                        tol1=1e-12, tol2=1e-10)
    assert root == pytest.approx(0.02, abs=1e-8)
    with pytest.raises(ValueError):
        ml.bisection(lambda x: 1.0 + x * x, -1.0, 1.0)
    y, (lo, hi) = ml.bisection_coeff([0.0, 1.0], [-1.0, 1.0])
    assert lo == 0.0 and hi == 1.0 and y == 0.5


def test_integrate_nested():
    # int_0^1 int_0^2 x*y dy dx = (1/2)*(2) = 1
    v = ml.integrate_adaptive_2d(lambda x, y: x * y, (0.0, 1.0, 0.0, 2.0))
    assert v == pytest.approx(1.0, rel=1e-8)
    v3 = ml.integrate_adaptive_3d(
        lambda x, y, z: x + y + z, (0.0, 1.0, 0.0, 1.0, 0.0, 1.0))
    assert v3 == pytest.approx(1.5, rel=1e-6)


def test_findfirst_variants():
    X = np.array([1.0, 3.0, 5.0, 7.0])
    Y = np.array([0.0, 3.0, 4.0, 8.0])
    # loop/single semantics: first index with X >= y, len(X) on miss
    assert np.array_equal(ml.find_first_loop(X, Y), [0, 1, 2, 4])
    # hash boundary quirk: above-the-table queries return len(X) - 1
    assert np.array_equal(ml.find_first_hash(X, Y), [0, 1, 2, 3])
    # loop variant is scan-order first on UNSORTED tables
    Xu = np.array([5.0, 1.0, 3.0])
    assert np.array_equal(ml.find_first_loop(Xu, np.array([2.0, 9.0])),
                          [0, 3])
