"""End-to-end create_image vs a brute-force oracle deposit on a small
synthetic problem, plus failure-path and API-surface tests."""

import numpy as np
import pytest

import raytrace_tpu
import jax.numpy as jnp
from raytrace_tpu import calc_ray, calc_ray_path, calc_seed, create_image
from raytrace_tpu.ops import oracle
from raytrace_tpu.testing import synthetic_problem
from raytrace_tpu.utils.errors import RayTraceError


def _oracle_images(p, method):
    """Brute-force reference deposit using the scalar oracle."""
    b = p.euv_beam
    src = p.seed_beam if method == 2 else b
    scale = 1.0
    if method == 2:
        scale = (src.dx * src.dy * src.da * src.db) / (b.dx * b.dy)
    image = np.zeros(b.nx * b.ny * b.nv)
    i_ang = np.zeros(b.na * b.nb)

    def get_index(grid, d, y):
        if y < grid[0] - 0.5 * d or y > grid[-1] + 0.5 * d:
            return -1
        return oracle.find_first_single(grid, y - 0.5 * d)

    for i in range(src.nx):
        for j in range(src.ny):
            for k in range(src.na):
                for m in range(src.nb):
                    ray = (np.float32(src.x[i]), np.float32(src.y[j]),
                           np.float32(src.a[k]), np.float32(src.b[m]))
                    res = oracle.calc_ray(ray, p.N, b.dz, p.gain,
                                          p.seed if method == 2 else None,
                                          b.nv, method)
                    assert res.error == 0
                    if method == 1:
                        bx, by, ba, bb_ = ray
                    else:
                        bx, by = res.ray_out[0], res.ray_out[1]
                        ba, bb_ = -res.ray_out[2], -res.ray_out[3]
                        if by < 0 and b.y[0] >= 0:
                            by = -by
                    i1 = get_index(b.x, b.dx, bx)
                    i2 = get_index(b.y, b.dy, by)
                    i3 = get_index(b.a, b.da, ba)
                    i4 = get_index(b.b, b.db, bb_)
                    if i1 >= 0 and i2 >= 0:
                        base = b.nv * (i1 + i2 * b.nx)
                        image[base:base + b.nv] += res.Iv * scale
                    if i3 >= 0 and i4 >= 0:
                        i_ang[i3 + i4 * b.na] += float(np.sum(2.0 * b.dv * res.Iv))
    return image, i_ang


# tolerance note: trajectories through the refracting column amplify 1-ulp
# arithmetic differences between implementations (the oracle is plain-python
# IEEE f32, the steppers XLA f32); at the synthetic's weak gradients the
# residual image-level jitter is ~1e-3 -- see raytrace_tpu/testing.py.
_JITTER_TOL = 2e-3


@pytest.mark.parametrize("backend", ["lax", "lax-exact"])
def test_ase_vs_oracle(backend):
    p = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5)
    want_img, want_ang = _oracle_images(p, 1)
    img, ang = create_image(p, backend, chunk_size=4096)
    assert np.linalg.norm(img - want_img) / np.linalg.norm(want_img) < _JITTER_TOL
    assert np.linalg.norm(ang - want_ang) / np.linalg.norm(want_ang) < _JITTER_TOL


def test_seeded_vs_oracle():
    p = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5, seeded=True)
    want_img, want_ang = _oracle_images(p, 2)
    img, ang = create_image(p, "lax", chunk_size=4096)
    assert np.linalg.norm(img - want_img) / max(np.linalg.norm(want_img), 1e-300) < _JITTER_TOL
    assert np.linalg.norm(ang - want_ang) / max(np.linalg.norm(want_ang), 1e-300) < _JITTER_TOL


def test_dense_multi_chunk_matches_single_chunk():
    """Regression: the dense deposit's dynamic row window must not clamp on
    the final partial chunk (chunk smaller than the image rows)."""
    p1 = synthetic_problem(nx=10, ny=7, na=5, nb=4)
    img1, ang1 = create_image(p1, "lax", chunk_size=10 * 7 * 5 * 4,
                              deposit="dense")
    p2 = synthetic_problem(nx=10, ny=7, na=5, nb=4)
    img2, ang2 = create_image(p2, "lax", chunk_size=3 * 5 * 4 + 5,
                              deposit="dense")  # unaligned chunks
    assert np.linalg.norm(img1 - img2) / np.linalg.norm(img1) < 1e-12
    assert np.linalg.norm(ang1 - ang2) / np.linalg.norm(ang1) < 1e-12
    # scatter and dense deposits agree at f32 summation level -- both
    # halves of the output
    p3 = synthetic_problem(nx=10, ny=7, na=5, nb=4)
    img3, ang3 = create_image(p3, "lax", deposit="scatter")
    assert np.linalg.norm(img1 - img3) / np.linalg.norm(img1) < 2e-6
    assert np.linalg.norm(ang1 - ang3) / np.linalg.norm(ang1) < 2e-6


def test_stride_decomposition_contract():
    """N_start/N_parallel stride workers partition the full result."""
    full = synthetic_problem()
    img_full, ang_full = create_image(full, "lax")
    img_sum = np.zeros_like(img_full)
    ang_sum = np.zeros_like(ang_full)
    P = 3
    for w in range(P):
        pw = synthetic_problem()
        pw.N_start = w
        pw.N_parallel = P
        img_w, ang_w = create_image(pw, "lax")
        img_sum += img_w
        ang_sum += ang_w
    # the full run uses the dense-reduction deposit while stride workers use
    # the f32 scatter deposit, so agreement is at float32 summation level
    assert np.linalg.norm(img_sum - img_full) / np.linalg.norm(img_full) < 2e-6
    assert np.linalg.norm(ang_sum - ang_full) / np.linalg.norm(ang_full) < 2e-6


def test_failure_path(tmp_path):
    """A near-perpendicular ray triggers error -1 -> failed-ray dump + abort
    (RayTraceImage.cpp:427-430)."""
    p = synthetic_problem()
    p.euv_beam.a = p.euv_beam.a + 1500.0  # tan(1.5 rad) -> s_z^2 < 0.01
    dump = tmp_path / "failed.dat"
    with pytest.raises(RayTraceError):
        create_image(p, "lax", failed_ray_path=str(dump))
    assert dump.exists() and dump.stat().st_size > 0


def test_failure_dump_roundtrip_and_replay(tmp_path):
    """The failed-ray dump is machine-readable and the failure REPRODUCES:
    read_failures inverts write_failures field-for-field, and re-tracing
    the captured rays through the scalar oracle re-raises the same error
    code -- the offline-repro loop the reference's dump exists for
    (write_failures, src/RayTraceImage.cpp:140-183)."""
    from raytrace_tpu.ops import oracle
    from raytrace_tpu.utils.errors import read_failures

    p = synthetic_problem()
    p.euv_beam.a = p.euv_beam.a + 1500.0
    dump = tmp_path / "failed.dat"
    with pytest.raises(RayTraceError):
        create_image(p, "lax", failed_ray_path=str(dump))

    rays, method, N, dz, gains = read_failures(str(dump))
    assert method == 1 and N == p.N and dz == float(p.euv_beam.dz)
    assert rays.shape[1] == 4 and rays.shape[0] >= 1
    assert len(gains) == p.N
    for g, src in zip(gains, p.gain):
        assert (g.Nx, g.Ny, g.Nv) == (src.Nx, src.Ny, src.Nv)
        np.testing.assert_array_equal(g.n, np.asarray(src.n).reshape(-1))
        np.testing.assert_array_equal(g.g0, np.asarray(src.g0).reshape(-1))
    # every captured ray reproduces its failure under the oracle
    K = gains[1].Nv
    for x, y, a, b in rays:
        res = oracle.calc_ray((x, y, a, b), N, dz, gains, None, K, method)
        assert res.error == -1
    # and the CLI-style tool drives the same path end-to-end
    import os as _os
    import subprocess
    import sys as _sys
    r = subprocess.run(
        [_sys.executable, "tools/replay_failed_rays.py", str(dump)],
        capture_output=True, text=True, timeout=300,
        cwd=_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "error -1" in r.stdout


def test_limits():
    p = synthetic_problem()
    p.N = 25
    with pytest.raises(RayTraceError):
        create_image(p)


def test_non_uniform_euv_grid_rejected():
    p = synthetic_problem()
    p.euv_beam.x = p.euv_beam.x.copy()
    p.euv_beam.x[3] += 1e-3
    with pytest.raises(RayTraceError):
        create_image(p)


def test_calc_ray_api():
    p = synthetic_problem()
    b = p.euv_beam
    err, Iv, ray_out = calc_ray((b.x[2], b.y[1], b.a[1], b.b[1]), p.N, b.dz,
                                p.gain, None, b.nv, 1)
    assert err == 0 and Iv.shape == (b.nv,) and np.all(np.isfinite(Iv))
    assert np.all(np.isfinite(ray_out))


def test_calc_seed_api():
    p = synthetic_problem(seeded=True)
    Iv = calc_seed(p.seed, 2.5e-3, 1.0e-3, 0.0, 0.0)
    assert Iv.shape == (p.euv_beam.nv,)
    assert np.all(Iv >= 0) and Iv.max() > 0
    # outside the table box -> zero
    Iv0 = calc_seed(p.seed, 1.0, 0.0, 0.0, 0.0)
    assert np.all(Iv0 == 0)


def test_calc_ray_path_api():
    p = synthetic_problem()
    b = p.euv_beam
    n_err, xr, yr, ir = calc_ray_path(
        b.x[:2], b.y[:2], b.a[:1], b.b[:1], p.N, b.dz, p.gain, None,
        b.nv, b.dv, 1)
    n_st = 3 * (p.N - 1) + 1
    assert xr.shape == (2, 2, 1, 1, n_st)
    assert n_err == 0
    # stations should move: the trajectory is non-constant
    assert np.ptp(xr[0, 0, 0, 0]) > 0
    # running intensity is finite and non-negative at the last station
    assert np.all(np.isfinite(ir)) and ir[..., -1].min() >= 0


def test_single_segment_problem():
    """N=1 means no propagation segments: image is just the (zero) seedless
    spectrum -- the pipeline must not crash on the empty-loop edge. A
    'pallas' request falls back to the lax tier (the kernel's per-segment
    outputs are zero-width at N<=1; found by fuzzing)."""
    for method in ("lax", "pallas"):
        p = synthetic_problem(N=1)
        img, ang = create_image(p, method)
        assert img.shape == (p.euv_beam.nx * p.euv_beam.ny * p.euv_beam.nv,)
        assert np.all(img == 0.0) and np.all(ang == 0.0)


def test_single_frequency_problem():
    """nv=1 (K=1): degenerate spectrum axis through the whole pipeline
    (generator crash at nv=1 found by fuzzing)."""
    want_img, want_ang = _oracle_images(
        synthetic_problem(nx=2, ny=2, na=2, nb=2, nv=1), 1)
    img, ang = create_image(
        synthetic_problem(nx=2, ny=2, na=2, nb=2, nv=1), "lax",
        chunk_size=1024)
    assert np.linalg.norm(img - want_img) / np.linalg.norm(want_img) < _JITTER_TOL
    assert np.linalg.norm(ang - want_ang) / np.linalg.norm(want_ang) < _JITTER_TOL


def test_reference_method_aliases():
    """The reference's compute_method names are accepted as aliases."""
    p = synthetic_problem()
    img_cpu, _ = create_image(p, "cpu")       # -> lax-exact
    p2 = synthetic_problem()
    img_thr, _ = create_image(p2, "threads")  # -> lax
    assert np.linalg.norm(img_cpu - img_thr) / np.linalg.norm(img_cpu) < 2e-3


def test_matmul_deposit_matches_scatter():
    """The one-hot MXU deposit (bf16 triple-split) agrees with segment_sum
    to ~1e-7 relative on both method families."""
    for seeded in (False, True):
        p1 = synthetic_problem(seeded=seeded)
        img_s, ang_s = create_image(p1, "lax", deposit="scatter")
        p2 = synthetic_problem(seeded=seeded)
        img_m, ang_m = create_image(p2, "lax", deposit="matmul")
        rel = np.linalg.norm(img_m - img_s) / max(np.linalg.norm(img_s), 1e-300)
        rel_a = np.linalg.norm(ang_m - ang_s) / max(np.linalg.norm(ang_s), 1e-300)
        assert rel < 5e-7 and rel_a < 5e-7, (seeded, rel, rel_a)


def test_deposit_kernel_cell_blocking():
    """The pallas MXU deposit kernel handles images past the single-block
    VMEM envelope by tiling over cell blocks (a -scale=16 image has ~6000
    cells; the single-block kernel OOMed scoped VMEM there). Interpreted
    on CPU against segment_sum, forcing multi-block via a tiny budget."""
    import jax
    from raytrace_tpu.ops import deposit_kernel as dk

    rng = np.random.default_rng(7)
    B, K = 2048, 52
    for C in (257, 6001):
        contrib = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
        bins = jnp.asarray(rng.integers(0, C, size=B).astype(np.int32))
        want = jax.ops.segment_sum(contrib, bins, num_segments=C)
        got = dk.deposit_tiles(contrib, bins, C, interpret=True)
        assert got.shape == (C, K)
        rel = (np.linalg.norm(np.asarray(got) - np.asarray(want))
               / np.linalg.norm(np.asarray(want)))
        assert rel < 5e-7, (C, rel)
        # force the multi-block path even at small C
        blk = dk._c_block(C, K)
        if C > blk:
            assert blk % 8 == 0 and blk < C  # genuine multi-block case


def test_two_float_spectrum_matches_f64():
    """The f32 two-float amplification (Dekker products + two-sum + (hi,lo)
    exp) tracks the f64 reference chain to ~1e-7 relative norms."""
    import jax.numpy as jnp

    for seeded in (False, True):
        p32 = synthetic_problem(seeded=seeded)
        img32, ang32 = create_image(p32, "lax", spectrum_dtype=jnp.float32)
        p64 = synthetic_problem(seeded=seeded)
        img64, ang64 = create_image(p64, "lax", spectrum_dtype=jnp.float64)
        rel = np.linalg.norm(img32 - img64) / max(np.linalg.norm(img64), 1e-300)
        assert rel < 1e-6, (seeded, rel)
        rel_a = (np.linalg.norm(ang32 - ang64)
                 / max(np.linalg.norm(ang64), 1e-300))
        assert rel_a < 1e-6, (seeded, rel_a)


def test_exp_fast2_accuracy():
    """(hi, lo)-pair exp: ~1e-7 relative over the production gain range."""
    import jax.numpy as jnp
    from raytrace_tpu.ops.spectrum import (_exp_fast2, _expm1_fast2,
                                           _split_prod, _two_sum)

    rng = np.random.default_rng(3)
    a = rng.uniform(-1.3, 1.3, 4096).astype(np.float32)
    b = rng.uniform(0.0, 1.0, 4096).astype(np.float32)
    # accumulate 6 products like the seeded path
    hi = np.zeros(4096, np.float32)
    lo = np.zeros(4096, np.float32)
    ref = np.zeros(4096, np.float64)
    for s in range(6):
        aa = np.roll(a, s).astype(np.float32)
        p, pe = _split_prod(jnp.asarray(aa), jnp.asarray(b))
        h2, e = _two_sum(jnp.asarray(hi), p)
        hi = np.asarray(h2)
        lo = np.asarray(jnp.asarray(lo) + (e + pe))
        ref += aa.astype(np.float64) * b.astype(np.float64)
    # the pair reproduces the f64 sum almost exactly
    assert np.abs(hi.astype(np.float64) + lo - ref).max() < 1e-10
    got = np.asarray(_exp_fast2(jnp.asarray(hi), jnp.asarray(lo)), np.float64)
    rel = np.abs(got - np.exp(ref)) / np.exp(ref)
    assert rel.max() < 5e-7, rel.max()
    gm1 = np.asarray(_expm1_fast2(jnp.asarray(hi), jnp.asarray(lo)), np.float64)
    rel1 = np.abs(gm1 - np.expm1(ref)) / np.maximum(np.abs(np.expm1(ref)), 1e-12)
    assert rel1.max() < 1e-6, rel1.max()


def test_many_segments_pallas_matches_lax():
    """N > 3 through the pallas backend: the kernel's fori segment loop
    (SMEM-scalar geometry) must agree with the lax backend at any segment
    count up to the reference's N_MAX. A python-unrolled kernel was O(N) in
    compiled program size and Mosaic compile time exploded past N ~ 5."""
    p1 = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5, N=7)
    img_l, ang_l = create_image(p1, "lax")
    p2 = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5, N=7)
    img_p, ang_p = create_image(p2, "pallas")
    assert np.linalg.norm(img_p - img_l) / np.linalg.norm(img_l) < _JITTER_TOL
    assert np.linalg.norm(ang_p - ang_l) / np.linalg.norm(ang_l) < _JITTER_TOL


def _has_escapes(p, method):
    """True if some ray's oracle walk stops early: a zero gvl row with a
    nonzero row elsewhere can only mean escape (the synthetic's g0 is
    strictly positive everywhere on the grid)."""
    b = p.euv_beam
    src = p.seed_beam if method == 2 else b
    for i in (0, src.nx - 1):
        for j in (0, src.ny - 1):
            for k in range(src.na):
                for m in range(src.nb):
                    ray = (np.float32(src.x[i]), np.float32(src.y[j]),
                           np.float32(src.a[k]), np.float32(src.b[m]))
                    res = oracle.calc_ray(ray, p.N, b.dz, p.gain,
                                          p.seed if method == 2 else None,
                                          b.nv, method)
                    rows = np.abs(res.gvl[: p.N - 1]).sum(axis=1)
                    if np.any(rows == 0.0) and np.any(rows > 0.0):
                        return True
    return False


from raytrace_tpu.testing import physical_gain as _physical_gain  # noqa: E402


@pytest.mark.parametrize("backend", ["lax", "lax-exact", "pallas"])
def test_n20_ase_with_escapes_vs_oracle(backend):
    """N = N_MAX = 20 segments (RayTraceImageHelper.h:29) end-to-end against
    the scalar oracle, with real mid-path escapes (+-10 mrad over 0.95 cm
    walks off the 7e-3 cm gain grid). refraction_free: escape timing is a
    discontinuity, so lockstep trajectories keep it implementation-
    deterministic while still exercising the fori segment loop, the escape
    logic, and the 19-segment amplification chain."""
    p = _physical_gain(synthetic_problem(nx=5, ny=3, na=4, nb=3, nv=5,
                                         N=20, refraction_free=True))
    assert _has_escapes(p, 1), "geometry no longer produces escapes"
    want_img, want_ang = _oracle_images(p, 1)
    p2 = _physical_gain(synthetic_problem(nx=5, ny=3, na=4, nb=3, nv=5,
                                          N=20, refraction_free=True))
    img, ang = create_image(p2, backend, chunk_size=4096)
    assert np.linalg.norm(img - want_img) / np.linalg.norm(want_img) < _JITTER_TOL
    assert np.linalg.norm(ang - want_ang) / max(np.linalg.norm(want_ang), 1e-300) < _JITTER_TOL


@pytest.mark.parametrize("backend", ["lax", "pallas"])
def test_n20_full_plane_ase_vs_oracle(backend):
    """N=20 with the abs_y mirror OFF (full-plane grids): the un-mirrored
    escape ranges and index walk at maximum segment count."""
    p = _physical_gain(synthetic_problem(nx=5, ny=4, na=4, nb=3, nv=5,
                                         N=20, refraction_free=True,
                                         full_plane=True))
    want_img, want_ang = _oracle_images(p, 1)
    p2 = _physical_gain(synthetic_problem(nx=5, ny=4, na=4, nb=3, nv=5,
                                          N=20, refraction_free=True,
                                          full_plane=True))
    img, ang = create_image(p2, backend, chunk_size=4096)
    assert np.linalg.norm(img - want_img) / np.linalg.norm(want_img) < _JITTER_TOL


@pytest.mark.parametrize("backend", ["lax", "pallas"])
def test_n20_seeded_vs_oracle(backend):
    """Seeded (forward, method 2) at N=20 against the oracle: entry-seed
    evaluation + 19-segment gain-only amplification + exit binning, with
    escapes zeroing the seed exactly like the oracle."""
    p = _physical_gain(synthetic_problem(nx=5, ny=3, na=4, nb=3, nv=5,
                                         N=20, seeded=True,
                                         refraction_free=True))
    assert _has_escapes(p, 2), "geometry no longer produces escapes"
    want_img, want_ang = _oracle_images(p, 2)
    p2 = _physical_gain(synthetic_problem(nx=5, ny=3, na=4, nb=3, nv=5,
                                          N=20, seeded=True,
                                          refraction_free=True))
    img, ang = create_image(p2, backend, chunk_size=4096)
    assert np.linalg.norm(img - want_img) / max(np.linalg.norm(want_img), 1e-300) < _JITTER_TOL
    assert np.linalg.norm(ang - want_ang) / max(np.linalg.norm(want_ang), 1e-300) < _JITTER_TOL


def test_backward_seeded_chunk_core_matches_oracle():
    """The backward-with-seed branch of chunk_core (method 1 + RaySeed
    evaluated at the EXIT coordinates, the kernel capability of
    RayTraceImageHelper.h:523-533 exposed by the calc_ray surface). Not
    reachable from create_image (seeded problems always run forward,
    matching the reference), so drive chunk_core directly with a method-1
    cfg and compare against the scalar oracle.

    refraction_free: exit coordinates feed the (sharp) seed profile, so
    trajectory chaos would amplify 1-ulp stepper differences well past the
    usual jitter tolerance; the lockstep regime keeps the micro-step
    sequences identical (see testing.synthetic_problem)."""
    import jax.numpy as jnp
    from raytrace_tpu.models import ray_tracer
    from raytrace_tpu.models.problem import prepare_beam, prepare_seed
    from raytrace_tpu.ops import fast_stepper

    p = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5, seeded=True,
                          refraction_free=True)
    b = p.euv_beam

    # oracle: backward propagation, seed at exit coords, binned at entry
    def get_index(grid, d, y):
        if y < grid[0] - 0.5 * d or y > grid[-1] + 0.5 * d:
            return -1
        return oracle.find_first_single(grid, y - 0.5 * d)

    want = np.zeros(b.nx * b.ny * b.nv)
    want_ang = np.zeros(b.na * b.nb)
    for i in range(b.nx):
        for j in range(b.ny):
            for k in range(b.na):
                for m in range(b.nb):
                    ray = (np.float32(b.x[i]), np.float32(b.y[j]),
                           np.float32(b.a[k]), np.float32(b.b[m]))
                    res = oracle.calc_ray(ray, p.N, b.dz, p.gain, p.seed,
                                          b.nv, 1)
                    assert res.error == 0
                    i1 = get_index(b.x, b.dx, ray[0])
                    i2 = get_index(b.y, b.dy, ray[1])
                    i3 = get_index(b.a, b.da, ray[2])
                    i4 = get_index(b.b, b.db, ray[3])
                    if i1 >= 0 and i2 >= 0:
                        base = b.nv * (i1 + i2 * b.nx)
                        want[base:base + b.nv] += res.Iv
                    if i3 >= 0 and i4 >= 0:
                        want_ang[i3 + i4 * b.na] += float(
                            np.sum(2.0 * b.dv * res.Iv))

    # chunk_core with a direct method-1 cfg and the device-seed pytree
    ft = fast_stepper.pack_fast_tables(p.gain, False)
    gv_tables = ray_tracer._stack_gv(p.gain, b.nv)
    dims = (b.nx, b.ny, b.na, b.nb)
    cfg = dict(N=p.N, dz=float(b.dz), K=b.nv, method=1, use_emis=False,
               dims=dims, scale=1.0, dense=False,
               spectrum_dtype=jnp.float32)

    def trace_fn(rays, tx):
        ftl = fast_stepper.FastTables(tx=tx, meta=ft.meta, nch=ft.nch,
                                      ny_cells=ft.ny_cells)
        return fast_stepper.trace_batch_fast(rays, p.N, float(b.dz), ftl, 1,
                                             c=0.5, use_emis=False)

    Nt = b.nx * b.ny * b.na * b.nb
    ijkm = jnp.arange(Nt, dtype=jnp.int64)
    valid = jnp.ones((Nt,), bool)
    ray_grids = tuple(jnp.asarray(np.asarray(g, np.float64))
                      for g in (b.x, b.y, b.a, b.b))
    img_p, ang_p, code = ray_tracer.chunk_core(
        cfg, trace_fn, ijkm, valid, ray_grids, ft.tx, gv_tables,
        prepare_seed(p.seed), prepare_beam(b))
    assert np.all(np.asarray(code) == 0)
    got = np.asarray(img_p, np.float64).reshape(-1)
    got_ang = np.asarray(ang_p, np.float64)
    assert np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-300) < _JITTER_TOL
    assert np.linalg.norm(got_ang - want_ang) / max(np.linalg.norm(want_ang), 1e-300) < _JITTER_TOL


def test_wide_gain_grid_pallas_matches_lax_exact():
    """Nx=256 x Ny=52 gain grids -- wider than the 128-lane shuffle table,
    so the pallas kernel's multi-slab fetch path (k1 -> (slab, lane), row
    j*nslab + slab) engages. Cross-backend gate vs lax-exact (the
    general-geometry reference backend), ASE + seeded.

    The lax fast backend's own envelope (Nx-1 <= 128) must now resolve
    independently: 'lax' on this problem silently falls back to lax-exact
    while 'pallas' runs the real kernel."""
    from raytrace_tpu.models.ray_tracer import _resolve_backend
    from raytrace_tpu.ops import pallas_kernel as pk

    p = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5,
                          gain_nx=256, gain_ny=52)
    assert _resolve_backend("pallas", True, False) == "pallas"
    assert _resolve_backend("lax", True, False) == "lax-exact"
    pg = pk.pack_gain_tables(p.gain, True)
    assert pg.nslab == 2
    want_img, want_ang = _oracle_images(p, 1)
    for backend in ("lax-exact", "pallas"):
        p2 = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5,
                               gain_nx=256, gain_ny=52)
        img, ang = create_image(p2, backend, chunk_size=4096)
        rel = np.linalg.norm(img - want_img) / np.linalg.norm(want_img)
        assert rel < _JITTER_TOL, (backend, rel)
        rel_a = np.linalg.norm(ang - want_ang) / np.linalg.norm(want_ang)
        assert rel_a < _JITTER_TOL, (backend, rel_a)


def test_wide_gain_grid_seeded_pallas_matches_lax_exact():
    p1 = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5, seeded=True,
                           gain_nx=256, gain_ny=52)
    img_l, ang_l = create_image(p1, "lax-exact", chunk_size=4096)
    p2 = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5, seeded=True,
                           gain_nx=256, gain_ny=52)
    img_p, ang_p = create_image(p2, "pallas", chunk_size=4096)
    assert np.linalg.norm(img_p - img_l) / max(np.linalg.norm(img_l), 1e-300) < _JITTER_TOL


def test_nonuniform_gain_pallas_matches_oracle():
    """Strongly non-uniform (power-warped) gain grids at the performance
    tier: the pallas kernel's in-kernel findindex bisection + per-cell
    geometry channels vs the scalar oracle and lax-exact (the reference's
    arbitrary-grid envelope, RayTraceImageHelper.h:472-494)."""
    from raytrace_tpu.ops import pallas_kernel as pk

    p = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5,
                          non_uniform_gain=0.5)
    assert pk.fits_pallas(p.gain, True)
    pg = pk.pack_gain_tables(p.gain, True)
    assert pg.nonuniform and pg.nslab == 1
    want_img, want_ang = _oracle_images(p, 1)
    for backend in ("lax-exact", "pallas"):
        p2 = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5,
                               non_uniform_gain=0.5)
        img, ang = create_image(p2, backend, chunk_size=4096)
        rel = np.linalg.norm(img - want_img) / np.linalg.norm(want_img)
        assert rel < _JITTER_TOL, (backend, rel)
        rel_a = np.linalg.norm(ang - want_ang) / np.linalg.norm(want_ang)
        assert rel_a < _JITTER_TOL, (backend, rel_a)


def test_nonuniform_gain_seeded_pallas_matches_lax_exact():
    p1 = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5, seeded=True,
                           non_uniform_gain=0.4)
    img_l, ang_l = create_image(p1, "lax-exact", chunk_size=4096)
    p2 = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5, seeded=True,
                           non_uniform_gain=0.4)
    img_p, ang_p = create_image(p2, "pallas", chunk_size=4096)
    assert np.linalg.norm(img_p - img_l) / max(np.linalg.norm(img_l), 1e-300) < _JITTER_TOL


def test_mixed_y_mirror_falls_back():
    """Mixed per-segment y-mirror conventions (one grid spanning negative
    y among half-plane ones) are outside the pallas envelope (the mirror
    flag is compile-time in the hot loop): backend resolution must fall
    back to lax-exact instead of the kernel raising NotImplementedError."""
    from raytrace_tpu.ops import pallas_kernel as pk

    p = synthetic_problem(nx=6, ny=4, na=4, nb=3, nv=5)
    g = p.gain[1]
    g.y = np.linspace(-2.45e-3, 2.45e-3, g.Ny)
    assert not pk.fits_pallas(p.gain, True)
    img, ang = create_image(p, "pallas", chunk_size=4096)  # no raise
    assert np.all(np.isfinite(img))


def test_over_envelope_gain_grid_falls_back():
    """A uniform grid whose channel tables exceed the pallas VMEM budget
    must resolve to lax-exact (never raise mid-call) -- for 'auto' AND for
    an explicit 'pallas' request, matching the silent-fallback semantics
    of the other envelope gates."""
    from raytrace_tpu.models.ray_tracer import _resolve_backend
    from raytrace_tpu.ops import pallas_kernel as pk

    p = synthetic_problem(nx=4, ny=3, na=3, nb=2, nv=4, N=12,
                          gain_nx=1000, gain_ny=120)
    assert not pk.fits_pallas(p.gain, True)  # 12*16*120*8*128*4 > 8 MiB
    assert _resolve_backend("pallas", False, False) == "lax-exact"
    assert _resolve_backend("auto", False, False) == "lax-exact"
    # end-to-end: no ValueError from pack_gain_tables
    img, ang = create_image(p, "pallas", chunk_size=512)
    assert np.all(np.isfinite(img))


def test_narrow_gain_grid_packing_unchanged():
    """The Nx <= 129 fast path: nslab == 1 and the packed table layout is
    bit-identical to the pre-multi-slab layout (row j holds y-row j)."""
    from raytrace_tpu.ops import pallas_kernel as pk

    p = synthetic_problem()
    pg = pk.pack_gain_tables(p.gain, True)
    assert pg.nslab == 1
    g = p.gain[0]
    n = np.asarray(g.n, np.float64).reshape(g.Ny, g.Nx)
    # channel 0 = n1 corner (cell [j, i] -> n[j, i])
    got = np.asarray(pg.tables[0, 0, : g.Ny - 1, : g.Nx - 1])
    assert np.array_equal(got, n[:-1, :-1].astype(np.float32))


def test_full_plane_ase_all_backends():
    """absy = False (grids span negative y): the un-mirrored index walk,
    gradient handling, escape range, and binning paths. The shipped inputs
    are all half-plane, so without this the mirror-off branches are dead
    code in the test suite (RayTraceImageHelper.h:325-336 mirrors only when
    y[0] >= 0)."""
    p = synthetic_problem(nx=6, ny=5, na=4, nb=3, nv=5, full_plane=True)
    want_img, want_ang = _oracle_images(p, 1)
    for backend in ("lax", "lax-exact", "pallas"):
        p2 = synthetic_problem(nx=6, ny=5, na=4, nb=3, nv=5, full_plane=True)
        img, ang = create_image(p2, backend, chunk_size=4096)
        rel = np.linalg.norm(img - want_img) / np.linalg.norm(want_img)
        assert rel < _JITTER_TOL, (backend, rel)


def test_full_plane_seeded_pallas_matches_lax():
    p1 = synthetic_problem(nx=6, ny=5, na=4, nb=3, nv=5, seeded=True,
                           full_plane=True)
    img_l, ang_l = create_image(p1, "lax")
    p2 = synthetic_problem(nx=6, ny=5, na=4, nb=3, nv=5, seeded=True,
                           full_plane=True)
    img_p, ang_p = create_image(p2, "pallas")
    assert np.linalg.norm(img_p - img_l) / max(np.linalg.norm(img_l), 1e-300) < _JITTER_TOL


def test_stream_matches_per_call():
    """create_image_stream yields exactly what per-call create_image returns
    for each work unit (mixed ASE/seeded, distinct tables per call), in
    order, and stores results on each problem."""
    from raytrace_tpu import create_image_stream

    def make(i):
        seeded = i % 2 == 1
        p = synthetic_problem(nx=5, ny=4, na=3, nb=3, nv=4, seeded=seeded,
                              rng=100 + i)
        return p

    want = []
    for i in range(4):
        p = make(i)
        want.append(create_image(p, "lax", chunk_size=2048))

    probs = [make(i) for i in range(4)]
    got = list(create_image_stream(probs, "lax", chunk_size=2048))
    assert len(got) == 4
    for i, ((gi, ga), (wi, wa)) in enumerate(zip(got, want)):
        assert np.array_equal(gi, wi), i
        assert np.array_equal(ga, wa), i
        assert np.array_equal(probs[i].image, wi)
        assert np.array_equal(probs[i].I_ang, wa)


def test_stream_depth_one_and_empty():
    from raytrace_tpu import create_image_stream

    assert list(create_image_stream([], "lax")) == []
    p = synthetic_problem(nx=5, ny=4, na=3, nb=3, nv=4, rng=3)
    want_img, want_ang = create_image(
        synthetic_problem(nx=5, ny=4, na=3, nb=3, nv=4, rng=3), "lax",
        chunk_size=2048)
    (img, ang), = create_image_stream([p], "lax", chunk_size=2048, depth=1)
    assert np.array_equal(img, want_img) and np.array_equal(ang, want_ang)
    with pytest.raises(RayTraceError):
        list(create_image_stream([p], depth=0))


def test_stream_failure_propagates(tmp_path):
    """A failing call surfaces at its yield position; earlier results are
    still delivered (the stream is lazy -- consume to dispatch)."""
    from raytrace_tpu import create_image_stream

    good = synthetic_problem(nx=5, ny=4, na=3, nb=3, nv=4, rng=1)
    bad = synthetic_problem(nx=5, ny=4, na=3, nb=3, nv=4, rng=2)
    bad.euv_beam.a = bad.euv_beam.a + 1500.0  # s_z^2 < 0.01 -> error -1
    dump = tmp_path / "failed.dat"
    gen = create_image_stream([good, bad], "lax", chunk_size=2048,
                              failed_ray_path=str(dump))
    img, ang = next(gen)
    assert np.isfinite(img).all()
    with pytest.raises(RayTraceError):
        list(gen)
    assert dump.exists() and dump.stat().st_size > 0


def test_stream_depth_bounds_dispatch(monkeypatch):
    """depth bounds dispatched-but-unread calls: with depth=2 the first
    result must be yielded after exactly 2 dispatches (the documented
    in-flight device-memory bound)."""
    from raytrace_tpu.models import ray_tracer

    calls = []
    real_prepare = ray_tracer.prepare_pipeline

    def counting_prepare(*a, **kw):
        calls.append(1)
        return real_prepare(*a, **kw)

    monkeypatch.setattr(ray_tracer, "prepare_pipeline", counting_prepare)
    probs = [synthetic_problem(nx=4, ny=3, na=2, nb=2, nv=3, rng=i)
             for i in range(4)]
    gen = ray_tracer.create_image_stream(probs, "lax", chunk_size=1024,
                                         depth=2)
    next(gen)
    assert len(calls) == 2
    rest = list(gen)
    assert len(calls) == 4 and len(rest) == 3


def test_resolve_method_reports_envelope_fallback():
    """resolve_method names the backend that actually runs: the lax fast
    backend's one-hot lane tables cap the gain grid width, so a wide grid
    resolves to lax-exact while pallas covers it via multi-slab tables."""
    from raytrace_tpu.models.ray_tracer import resolve_method

    p = synthetic_problem(nx=4, ny=3, na=2, nb=2, nv=3)
    assert resolve_method(p, "lax") == "lax"
    assert resolve_method(p, "cpu") == "lax-exact"  # reference alias
    wide = synthetic_problem(nx=4, ny=3, na=2, nb=2, nv=3, gain_nx=200)
    assert resolve_method(wide, "lax") == "lax-exact"
    assert resolve_method(wide, "lax-exact") == "lax-exact"


def test_backward_seeded_direct_cfg():
    """The reference kernel supports method=1 WITH a seed: backward trace,
    seed evaluated at the exit position/angles (RayTraceImageHelper.h:
    523-529). create_image never drives it (a seeded work unit forces
    method 2, matching the reference harness), so the batched branch
    (chunk_post's calc_seed_batch at exit coords) is covered here directly
    against the scalar oracle, which implements the same contract
    (ops/oracle.py calc_ray method-1 seed path)."""
    import jax.numpy as jnp

    from raytrace_tpu.models import ray_tracer
    from raytrace_tpu.models.problem import (prepare_beam, prepare_gain,
                                             prepare_seed)
    from raytrace_tpu.ops import stepper as st

    p = synthetic_problem(nx=4, ny=3, na=3, nb=2, nv=4, seeded=True, rng=5)
    beam = p.euv_beam
    dims = (beam.nx, beam.ny, beam.na, beam.nb)
    tables = prepare_gain(p.gain)
    cfg = dict(N=p.N, dz=float(beam.dz), K=beam.nv, method=1,
               use_emis=False, dims=dims, scale=1.0,
               spectrum_dtype=jnp.float32, c=0.5, dense=False,
               fast_meta=None)

    def trace_fn(rays, tbl):
        return st.trace_batch(rays, cfg["N"], cfg["dz"], tbl, 1, c=0.5,
                              use_emis=False)

    ray_grids = tuple(jnp.asarray(np.asarray(g, np.float64))
                      for g in (beam.x, beam.y, beam.a, beam.b))
    Nt = dims[0] * dims[1] * dims[2] * dims[3]
    ijkm = jnp.asarray(np.arange(Nt, dtype=np.int64))
    valid = jnp.ones((Nt,), dtype=bool)
    img, ang, code = ray_tracer.chunk_core(
        cfg, trace_fn, ijkm, valid, ray_grids, tables, tables.gv[1:],
        prepare_seed(p.seed), prepare_beam(beam))
    assert np.all(np.asarray(code) == 0)

    # brute-force oracle deposit: method 1 bins at the ENTRY coords
    want = np.zeros((beam.nx * beam.ny, beam.nv))
    for i in range(beam.nx):
        for j in range(beam.ny):
            for k in range(beam.na):
                for m in range(beam.nb):
                    ray = (np.float32(beam.x[i]), np.float32(beam.y[j]),
                           np.float32(beam.a[k]), np.float32(beam.b[m]))
                    res = oracle.calc_ray(ray, p.N, beam.dz, p.gain, p.seed,
                                          beam.nv, 1)
                    assert res.error == 0
                    want[i + j * beam.nx] += res.Iv
    got = np.asarray(img).reshape(beam.ny * beam.nx, beam.nv)
    # chunk_core's scatter image is [nx*ny, K] with rows i + j*nx
    d = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert d < 5e-3, d
    # the seed actually contributed (the branch is live, not zeros)
    p0 = synthetic_problem(nx=4, ny=3, na=3, nb=2, nv=4, seeded=True, rng=5)
    img0, _, _ = ray_tracer.chunk_core(
        cfg, trace_fn, ijkm, valid, ray_grids, prepare_gain(p0.gain),
        tables.gv[1:], None, prepare_beam(beam))
    assert np.linalg.norm(np.asarray(img) - np.asarray(img0)) > 0


def test_chunked_scan_memory_flat(monkeypatch):
    """The scale envelope's memory story (Readme.txt:46-49 problem sizing):
    the whole-call pipeline is a lax.scan over fixed-size ray chunks, so
    compiled TEMP memory is set by the chunk, not the ray count. Quadruple
    the rays (na*nb x4) at a fixed chunk and the compiled temp footprint
    must stay ~flat -- the compile-time companion of bench.py's measured
    hbm_after_scale* telemetry on real hardware."""
    from raytrace_tpu.models.ray_tracer import prepare_pipeline

    # single-jit: one program to audit (monkeypatch restores any
    # pre-existing value; a manual set/del would clobber it)
    monkeypatch.setenv("RAYTRACE_NO_SPLIT", "1")
    temps = {}
    rays = {}
    for tag, (na, nb) in {"1x": (8, 8), "4x": (16, 16)}.items():
        p = synthetic_problem(nx=8, ny=5, na=na, nb=nb, nv=6)
        prep = prepare_pipeline(p, "lax", chunk_size=2048)
        assert not prep.cfg["split"]
        d = prep.cfg["dims"]
        rays[tag] = d[0] * d[1] * d[2] * d[3]
        ma = prep.pipeline.lower(*prep.operands).compile().memory_analysis()
        temps[tag] = int(ma.temp_size_in_bytes)
    assert rays["4x"] >= 4 * rays["1x"]
    # flat up to small per-chunk bookkeeping, nowhere near the 4x ray
    # growth. The 1.6x headroom absorbs XLA temp-allocation drift across
    # versions (padding/scratch policy changes); a true per-ray temp would
    # show up as ~4x, far outside this band, so the guard stays meaningful
    # even if an XLA upgrade shifts the constant.
    assert temps["4x"] <= 1.6 * temps["1x"], temps
