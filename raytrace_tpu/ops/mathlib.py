"""General math utilities: the TPU rebuild of the reference's ``interp``
namespace (src/AtomicModel/interp.{h,hpp,cpp}, SURVEY.md U2).

The reference ships a header math library used across the full production
app: grid interpolation (bilinear/trilinear/N-linear), FWHM estimation,
a modified bisection root finder, fast power/exp approximations, and
midpoint/Simpson/adaptive-Simpson quadrature. These are the vectorized
equivalents; scalar-loop algorithms (quicksort with index tracking,
findfirst variants) map onto numpy primitives with identical results.

All functions accept numpy or jax arrays; pure-host utilities use numpy.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "interp_linear", "bilinear", "trilinear", "n_linear",
    "quicksort", "unique", "calc_width", "bisection",
    "fast_pow", "fast_exp_avg", "get_interp_ratio",
    "integrate_midpoint", "integrate_simpson", "integrate_adaptive",
]


# ---------------------------------------------------------------------------
# grid interpolation (interp.cpp:9-93, interp.hpp:48-62)
# ---------------------------------------------------------------------------

def _bracket(xi, x):
    """Interval index in [1, len(xi)-1] (findfirstsingle clamped)."""
    xi = np.asarray(xi)
    i = np.searchsorted(xi, x, side="left")
    return np.clip(i, 1, len(xi) - 1)


def interp_linear(xi, yi, x):
    """1-D linear interpolation with linear extrapolation at the ends
    (interp::interp_linear, interp.cpp:9-22)."""
    xi = np.asarray(xi, np.float64)
    yi = np.asarray(yi, np.float64)
    x = np.asarray(x, np.float64)
    i = _bracket(xi, x)
    dx = (x - xi[i - 1]) / (xi[i] - xi[i - 1])
    return (1.0 - dx) * yi[i - 1] + dx * yi[i]


def bilinear(x1, x2, f, y1, y2):
    """Full-grid bilinear interpolation f(x1, x2) -> points (y1, y2)
    (interp::bilinear, interp.cpp:26-56). ``f`` shaped [len(x1), len(x2)]."""
    x1 = np.asarray(x1, np.float64)
    x2 = np.asarray(x2, np.float64)
    f = np.asarray(f, np.float64).reshape(len(x1), len(x2))
    i = _bracket(x1, y1)
    j = _bracket(x2, y2)
    dx = (np.asarray(y1) - x1[i - 1]) / (x1[i] - x1[i - 1])
    dy = (np.asarray(y2) - x2[j - 1]) / (x2[j] - x2[j - 1])
    return ((1 - dx) * (1 - dy) * f[i - 1, j - 1] + dx * (1 - dy) * f[i, j - 1]
            + (1 - dx) * dy * f[i - 1, j] + dx * dy * f[i, j])


def trilinear(x1, x2, x3, f, y1, y2, y3):
    """Full-grid trilinear interpolation (interp::trilinear,
    interp.cpp:60-93). ``f`` shaped [len(x1), len(x2), len(x3)]."""
    x1, x2, x3 = (np.asarray(v, np.float64) for v in (x1, x2, x3))
    f = np.asarray(f, np.float64).reshape(len(x1), len(x2), len(x3))
    i = _bracket(x1, y1)
    j = _bracket(x2, y2)
    k = _bracket(x3, y3)
    dx = (np.asarray(y1) - x1[i - 1]) / (x1[i] - x1[i - 1])
    dy = (np.asarray(y2) - x2[j - 1]) / (x2[j] - x2[j - 1])
    dz = (np.asarray(y3) - x3[k - 1]) / (x3[k] - x3[k - 1])
    out = 0.0
    for di, wx in ((0, 1 - dx), (1, dx)):
        for dj, wy in ((0, 1 - dy), (1, dy)):
            for dk, wz in ((0, 1 - dz), (1, dz)):
                out = out + wx * wy * wz * f[i - 1 + di, j - 1 + dj, k - 1 + dk]
    return out


def n_linear(grids, f, point):
    """N-dimensional multilinear interpolation (interp::n_linear,
    interp.hpp:48-62)."""
    grids = [np.asarray(g, np.float64) for g in grids]
    f = np.asarray(f, np.float64).reshape([len(g) for g in grids])
    nd = len(grids)
    idx = [int(_bracket(g, p)) for g, p in zip(grids, point)]
    w = [(point[d] - grids[d][idx[d] - 1])
         / (grids[d][idx[d]] - grids[d][idx[d] - 1]) for d in range(nd)]
    out = 0.0
    for corner in range(1 << nd):
        sel = tuple(idx[d] - 1 + ((corner >> d) & 1) for d in range(nd))
        weight = 1.0
        for d in range(nd):
            weight *= w[d] if (corner >> d) & 1 else (1.0 - w[d])
        out += weight * f[sel]
    return out


# ---------------------------------------------------------------------------
# sorting (interp.hpp:146-436) -- numpy-native with identical semantics
# ---------------------------------------------------------------------------

def quicksort(x, y=None):
    """Sort x ascending; optionally co-sort a payload array (the dual-array
    quicksort, interp.hpp:146-358). Returns (x_sorted[, y_sorted])."""
    x = np.asarray(x)
    order = np.argsort(x, kind="stable")
    if y is None:
        return x[order]
    return x[order], np.asarray(y)[order]


def unique(x):
    """Sort + deduplicate (interp::unique, interp.hpp:361-436)."""
    return np.unique(np.asarray(x))


# ---------------------------------------------------------------------------
# FWHM via 76% energy width (interp::calc_width, interp.cpp:157-201)
# ---------------------------------------------------------------------------

def calc_width(x, y):
    """Gaussian-equivalent FWHM of a profile: the width of the window
    centered on the distribution mean that contains 76.1% of the energy
    (erf(2 sqrt(ln 2) sigma) for a Gaussian), scaled to FWHM."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    tot = np.trapezoid(y, x)
    if tot <= 0:
        return 0.0
    mean = np.trapezoid(x * y, x) / tot
    target = 0.7610640039796869  # erf(sqrt(ln 2)) -- central mass of a
    # Gaussian within +-FWHM/2

    def frac(w):
        lo, hi = mean - 0.5 * w, mean + 0.5 * w
        xs = np.linspace(lo, hi, 513)
        ys = np.interp(xs, x, y, left=0.0, right=0.0)
        return np.trapezoid(ys, xs) / tot

    span = x[-1] - x[0]
    lo, hi = 0.0, 2.0 * span
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if frac(mid) < target:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------
# modified bisection root finder (interp::bisection, interp.cpp:205-268)
# ---------------------------------------------------------------------------

def bisection(fn, lb, ub, tol1=1e-12, tol2=1e-12, max_iter=200):
    """Find x in [lb, ub] with fn(x) = 0, assuming a sign change over the
    bracket. Uses the reference's secant-accelerated bisection: each step
    tries the secant point, clamped into the current bracket."""
    f_lb = fn(lb)
    f_ub = fn(ub)
    if f_lb == 0:
        return lb
    if f_ub == 0:
        return ub
    if np.sign(f_lb) == np.sign(f_ub):
        raise ValueError("bisection: no sign change over the bracket")
    for _ in range(max_iter):
        # secant proposal, clamped away from the bracket edges
        x = lb - f_lb * (ub - lb) / (f_ub - f_lb)
        x = min(max(x, lb + 0.01 * (ub - lb)), ub - 0.01 * (ub - lb))
        f = fn(x)
        if abs(f) <= tol2 or (ub - lb) <= tol1:
            return x
        if np.sign(f) == np.sign(f_lb):
            lb, f_lb = x, f
        else:
            ub, f_ub = x, f
    return 0.5 * (lb + ub)


# ---------------------------------------------------------------------------
# fast approximate pow/exp (interp.hpp:475-576)
# ---------------------------------------------------------------------------

def fast_pow(x, p):
    """Approximate x**p via exp2(p*log2(x)) in float32 -- the bit-twiddling
    trick the reference uses, expressed with explicit f32 transcendentals
    (same ~1e-3 relative accuracy class)."""
    x = np.asarray(x, np.float32)
    return np.exp2(np.float32(p) * np.log2(x)).astype(np.float32)


def fast_exp_avg(x, y, w):
    """Approximate exp-weighted running average x*(1-w) + y*w in f32
    (interp::fast_exp_avg's role in the production app)."""
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    return x + np.float32(w) * (y - x)


def get_interp_ratio(x, lo, hi):
    """Normalized interpolation coordinate of x in [lo, hi], clamped to
    [0, 1] (interp::get_interp_ratio)."""
    r = (np.asarray(x, np.float64) - lo) / (hi - lo)
    return np.clip(r, 0.0, 1.0)


# ---------------------------------------------------------------------------
# quadrature (interp.hpp:582-695)
# ---------------------------------------------------------------------------

def integrate_midpoint(fn, a, b, n=101):
    """Midpoint rule."""
    h = (b - a) / n
    xs = a + (np.arange(n) + 0.5) * h
    return float(np.sum([fn(x) for x in xs]) * h)


def integrate_simpson(fn, a, b, n=100):
    """Composite Simpson rule (n even)."""
    n = n + (n % 2)
    xs = np.linspace(a, b, n + 1)
    ys = np.array([fn(x) for x in xs])
    h = (b - a) / n
    return float(h / 3 * (ys[0] + ys[-1] + 4 * ys[1:-1:2].sum()
                          + 2 * ys[2:-1:2].sum()))


def integrate_adaptive(fn, a, b, tol=1e-10, max_depth=30):
    """Adaptive Simpson quadrature (interp's adaptive integrator)."""

    def simpson(fa, fm, fb, a_, b_):
        return (b_ - a_) / 6 * (fa + 4 * fm + fb)

    def recurse(a_, b_, fa, fm, fb, whole, eps, depth):
        m = 0.5 * (a_ + b_)
        lm, rm = 0.5 * (a_ + m), 0.5 * (m + b_)
        flm, frm = fn(lm), fn(rm)
        left = simpson(fa, flm, fm, a_, m)
        right = simpson(fm, frm, fb, m, b_)
        if depth <= 0 or abs(left + right - whole) <= 15 * eps:
            return left + right + (left + right - whole) / 15
        return (recurse(a_, m, fa, flm, fm, left, eps / 2, depth - 1)
                + recurse(m, b_, fm, frm, fb, right, eps / 2, depth - 1))

    m = 0.5 * (a + b)
    fa, fm, fb = fn(a), fn(m), fn(b)
    return float(recurse(a, b, fa, fm, fb, simpson(fa, fm, fb, a, b),
                         tol, max_depth))
