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
