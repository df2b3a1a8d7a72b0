#!/usr/bin/env python
"""Per-stage COMPUTE breakdown of a create_image call on the real TPU.

bench_ase_breakdown.py attributes wall time to link stages (upload / rtt /
readback / compute); this tool splits the *compute* stage itself:

* ``trace``    -- the pallas stepper over all chunks (ray gen included)
* ``post``     -- seed + amplify + deposit (full minus trace-only)
* ``full``     -- the whole pipeline (same scanner protocol)

plus a deposit-strategy A/B (scatter vs matmul vs dense where legal): the
auto policy's measured basis was ASE_small (13 chunks) and seed_small; at
other scales the tradeoff may flip, so measure before trusting it.

Protocol: S pipeline executions inside ONE jit over distinct per-step
tables (the scan-differencing that removes all link cost and defeats the
tunnel's whole-jit result cache; ROADMAP.md "Benchmarking on this rig").

Usage:
  python tools/bench_stage_breakdown.py [input.dat] [scale] [method] [S]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INPUT = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/ASE_small.dat"
SCALE = float(sys.argv[2]) if len(sys.argv) > 2 else 16.0
S = int(sys.argv[4]) if len(sys.argv) > 4 else 4
assert S >= 2, "scan-differencing needs S >= 2 (per-call = (tS - t1)/(S-1))"


def _best(fn, n, *, prep=None):
    ts = []
    for i in range(n):
        arg = prep(i) if prep is not None else None
        t0 = time.perf_counter()
        fn(arg)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0]


def main():
    import jax
    import jax.numpy as jnp

    from raytrace_tpu import load_input
    from raytrace_tpu.io.loader import scale_problem
    from raytrace_tpu.models import ray_tracer as rt

    method = sys.argv[3] if len(sys.argv) > 3 else (
        "pallas" if jax.default_backend() == "tpu" else "lax")
    problem, _, _ = load_input(INPUT)
    if SCALE != 1.0:
        scale_problem(problem, SCALE)

    prep = rt.prepare_pipeline(problem, method)
    cfg = prep.cfg
    assert not cfg.get("split"), (
        "stage breakdown assumes the single-jit pipeline; set "
        "RAYTRACE_NO_SPLIT=1 for ASE_small-class inputs")
    pack, tt, gv, seed_dev, beam_dev = prep.operands
    pack_h = np.asarray(pack)
    tt_h = np.asarray(tt)
    gv_h = np.asarray(gv)

    trace_fn = rt.make_pallas_trace_fn(cfg) if cfg and "pallas_meta" in cfg \
        and cfg["pallas_meta"] is not None else None
    if method != "pallas" or trace_fn is None:
        raise SystemExit("stage breakdown currently targets the pallas "
                         "backend (the production TPU path)")
    chunk_indices = rt._make_chunk_indices(cfg)
    n_chunks = cfg["n_chunks"]

    # ---- scanners: S reps inside one jit over distinct per-step tables ----
    def scan_full(S_):
        def scanner(pack_in, tts, gvs):
            def body(acc, xs):
                t, g = xs
                img, ang, fail, _codes = prep.pipeline(pack_in, t, g,
                                                       seed_dev, beam_dev)
                return acc + img.sum() + ang.sum(), None
            out, _ = jax.lax.scan(body, jnp.float64(0.0), (tts, gvs))
            return out
        return jax.jit(scanner)

    def scan_trace(S_):
        def scanner(pack_in, tts):
            ray_grids_u, _beam, _ds = rt.unpack_bundle(cfg, pack_in)

            def body(acc, t):
                def cbody(a2, ci):
                    ijkm, _v, _it = chunk_indices(ci)
                    res = rt.chunk_trace(cfg, trace_fn, ijkm, ray_grids_u, t)
                    # consume every output so nothing is dead-code-eliminated
                    s = (res.gvl.astype(jnp.float64).sum()
                         + res.evl.astype(jnp.float64).sum()
                         + res.ivl.sum().astype(jnp.float64)
                         + res.exit_x.astype(jnp.float64).sum()
                         + res.escaped.sum().astype(jnp.float64))
                    return a2 + s, None
                a3, _ = jax.lax.scan(cbody, acc,
                                     jnp.arange(n_chunks, dtype=jnp.int32))
                return a3, None
            out, _ = jax.lax.scan(body, jnp.float64(0.0), tts)
            return out
        return jax.jit(scanner)

    def stack_t(S_, r):
        f = 1.0 + 1e-6 * r
        return np.stack([tt_h * np.float32(f + 1e-6 * s) for s in range(S_)])

    def stack_g(S_, r):
        f = 1.0 + 1e-6 * r
        return np.stack([gv_h * np.float32(f + 1e-6 * s) for s in range(S_)])

    def measure(runner, mk_args, label):
        rs = runner(S)
        r1 = runner(1)
        float(rs(*mk_args(S, 0)))   # compile
        float(r1(*mk_args(1, 0)))
        ts = _best(lambda a: float(rs(*a)), 5,
                   prep=lambda i: mk_args(S, i + 1))
        t1 = _best(lambda a: float(r1(*a)), 5,
                   prep=lambda i: mk_args(1, i + 1))
        per = (ts - t1) / (S - 1)
        print(f"  {label}: {per*1e3:.1f} ms/call", file=sys.stderr)
        return per

    # prefix scanners for the amplify/bin split: preamp = trace + seed
    # init; prebin = trace + seed + amplify (everything but binning). All
    # consume their outputs into the f64 accumulator so nothing is DCE'd.
    # => seed = preamp - trace, amplify = prebin - preamp,
    #    bin = full - prebin (same scan-differencing protocol throughout).
    from raytrace_tpu.ops import pallas_amplify, spectrum
    from raytrace_tpu.ops import seed as seed_ops

    def _seed_iv0(res, ijkm, ray_grids_u):
        rays, (i_, j_, k_, m_) = rt._chunk_rays(cfg, ijkm, ray_grids_u)
        B = ijkm.shape[0]
        K = cfg["K"]
        sdt = jnp.dtype(cfg["spectrum_dtype"])
        if seed_dev is None:
            return jnp.zeros((B, K), dtype=sdt)
        if isinstance(seed_dev, seed_ops.EntrySeedTables):
            iv0 = seed_ops.calc_seed_entry(seed_dev, i_, j_, k_, m_, K)
        elif cfg["method"] == 1:
            iv0 = seed_ops.calc_seed_batch(seed_dev, res.exit_x, res.exit_y,
                                           res.exit_a, res.exit_b, K)
        else:
            iv0 = seed_ops.calc_seed_batch(seed_dev, rays["x"], rays["y"],
                                           rays["a"], rays["b"], K)
        return jnp.where(res.escaped[:, None], 0.0, iv0).astype(sdt)

    def _prefix_scanner(with_amplify):
        def mk(S_):
            def scanner(pack_in, tts, gvs):
                ray_grids_u, _beam, _ds = rt.unpack_bundle(cfg, pack_in)

                def body(acc, xs):
                    t, g = xs

                    def cbody(a2, ci):
                        ijkm, _v, _it = chunk_indices(ci)
                        res = rt.chunk_trace(cfg, trace_fn, ijkm,
                                             ray_grids_u, t)
                        iv0 = _seed_iv0(res, ijkm, ray_grids_u)
                        if with_amplify:
                            if isinstance(g, pallas_amplify.PackedGv):
                                iv = spectrum.amplify(
                                    res, iv0, g.gv, cfg["N"],
                                    cfg["use_emis"],
                                    dtype=cfg["spectrum_dtype"],
                                    packed_gv=g)
                            else:
                                iv = spectrum.amplify(
                                    res, iv0, g, cfg["N"], cfg["use_emis"],
                                    dtype=cfg["spectrum_dtype"])
                        else:
                            iv = iv0
                        s = (iv.astype(jnp.float64).sum()
                             + res.gvl.astype(jnp.float64).sum()
                             + res.exit_x.astype(jnp.float64).sum())
                        return a2 + s, None
                    a3, _ = jax.lax.scan(cbody, acc,
                                         jnp.arange(n_chunks,
                                                    dtype=jnp.int32))
                    return a3, None
                out, _ = jax.lax.scan(body, jnp.float64(0.0), (tts, gvs))
                return out
            return jax.jit(scanner)
        return mk

    full = measure(scan_full,
                   lambda s_, r: (pack_h, stack_t(s_, r), stack_g(s_, r)),
                   "full pipeline")
    trace = measure(scan_trace, lambda s_, r: (pack_h, stack_t(s_, r)),
                    "trace only")
    preamp = measure(_prefix_scanner(False),
                     lambda s_, r: (pack_h, stack_t(s_, r), stack_g(s_, r)),
                     "trace+seed")
    prebin = measure(_prefix_scanner(True),
                     lambda s_, r: (pack_h, stack_t(s_, r), stack_g(s_, r)),
                     "trace+seed+amplify")

    # ---- deposit A/B inside the same protocol ----
    dep_results = {}
    for dep in ("scatter", "matmul"):
        if cfg["bin_deposit"] == dep:
            dep_results[dep] = full
            continue
        prep_d = rt.prepare_pipeline(problem, method, deposit=dep)

        def scan_dep(S_, _prep=prep_d):
            def scanner(pack_in, tts, gvs):
                def body(acc, xs):
                    t, g = xs
                    img, ang, fail, _codes = _prep.pipeline(
                        pack_in, t, g, seed_dev, beam_dev)
                    return acc + img.sum() + ang.sum(), None
                out, _ = jax.lax.scan(body, jnp.float64(0.0), (tts, gvs))
                return out
            return jax.jit(scanner)

        dep_results[dep] = measure(
            scan_dep, lambda s_, r: (pack_h, stack_t(s_, r), stack_g(s_, r)),
            f"full, deposit={dep}")

    b = problem.euv_beam
    n_rays = (cfg["dims"][0] * cfg["dims"][1] * cfg["dims"][2]
              * cfg["dims"][3])
    print(json.dumps({
        "input": os.path.basename(INPUT), "scale": SCALE, "method": method,
        "n_rays": int(n_rays), "n_chunks": int(n_chunks),
        "chunk": int(cfg["chunk"]), "nv": int(b.nv),
        "bin_deposit_auto": cfg["bin_deposit"],
        "compute_full_s": round(full, 4),
        "compute_trace_s": round(trace, 4),
        "compute_post_s": round(full - trace, 4),
        "compute_preamp_s": round(preamp, 4),
        "compute_prebin_s": round(prebin, 4),
        "compute_seed_s": round(preamp - trace, 4),
        "compute_amplify_s": round(prebin - preamp, 4),
        "compute_bin_s": round(full - prebin, 4),
        **{f"compute_full_{k}_s": round(v, 4) for k, v in
           dep_results.items()},
    }, indent=1))


if __name__ == "__main__":
    main()


