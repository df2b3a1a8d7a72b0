#!/usr/bin/env python
"""ASE per-call cost breakdown on the real (tunneled) TPU.

BENCH shows ASE_small at ~0.13 s/call while the chip computes it in far
less; this tool attributes the per-call wall time to its stages so the
optimization target is explicit:

* ``host_prep``   -- host-side packing (prepare_pipeline, numpy only)
* ``upload``      -- host->device transfer of the per-call operands
* ``rtt``         -- fixed per-dispatch link round trip (tiny jit call)
* ``compute``     -- pure device compute per call, measured by the
                     scan-over-distinct-inputs protocol (S pipeline
                     executions inside ONE jit with distinct per-step
                     tables; differencing S vs 1 removes all link cost --
                     see the result-cache trap note in ROADMAP.md)
* ``readback``    -- device->host fetch of the f64 image + I_ang
* ``e2e``         -- the real create_image call (best/median of 9)

Every timed rep feeds fresh (perturbed) data so the tunnel's whole-jit
result cache cannot serve any measurement.

Usage: python tools/bench_ase_breakdown.py [input.dat] [method]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INPUT = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/ASE_small.dat"


def _best(fn, n, *, prep=None):
    ts = []
    for i in range(n):
        arg = prep(i) if prep is not None else None
        t0 = time.perf_counter()
        fn(arg)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0], ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from raytrace_tpu import create_image, load_input
    from raytrace_tpu.models.ray_tracer import prepare_pipeline

    method = sys.argv[2] if len(sys.argv) > 2 else (
        "pallas" if jax.default_backend() == "tpu" else "lax")
    problem, image0, i_ang0 = load_input(INPUT)

    # ---- e2e (the real protocol; perturb the gain tables per rep so the
    # tunnel's whole-jit result cache cannot serve a timed call) ----
    create_image(problem, method)  # warmup / compile

    def _perturb(_i):
        # factor must survive f32 rounding: 1 + 1e-9 rounds to exactly
        # 1.0f (f32 spacing at 1.0 is ~1.2e-7) and would leave every rep
        # bitwise identical -- the exact result-cache trap this protocol
        # exists to avoid. 1 + 1e-5 matches testing.perturbed_problems.
        for g in problem.gain:
            g.g0 = (np.asarray(g.g0, np.float32)
                    * np.float32(1.00001)).astype(np.float32)

    e2e_best, e2e_med = _best(lambda _: create_image(problem, method), 9,
                              prep=_perturb)

    # ---- host prep (pure numpy packing -- no device cache involved) ----
    prep_best, prep_med = _best(lambda _: prepare_pipeline(problem, method),
                                9)
    prep = prepare_pipeline(problem, method)
    pack, tt, gv, seed_dev, beam_dev = prep.operands
    assert seed_dev is None and beam_dev is None, "ASE packed-call layout"
    pack_h = np.asarray(pack)
    tt_h = np.asarray(tt)
    gv_h = np.asarray(gv)
    nbytes = pack_h.nbytes + tt_h.nbytes + gv_h.nbytes

    # ---- fixed per-dispatch round trip (tiny jit, fresh input each rep) ----
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(np.float32(0.0)))  # compile
    rtt_best, rtt_med = _best(
        lambda a: np.asarray(tiny(a)), 15,
        prep=lambda i: np.float32(i))

    # ---- upload (distinct data every rep; block until resident) ----
    def _upload(arrs):
        res = jax.device_put(arrs)
        jax.block_until_ready(res)

    up_best, up_med = _best(
        _upload, 9,
        prep=lambda i: (pack_h * (1.0 + 1e-9 * i),
                        tt_h * np.float32(1.0 + 1e-6 * i),
                        gv_h * np.float32(1.0 + 1e-6 * i)))

    # ---- readback (distinct resident f64 images) ----
    img_rows = prep.cfg["img_rows"]
    K = prep.cfg["K"]
    resident = [jax.block_until_ready(jax.device_put(
        np.full((img_rows, K), 1.0 + i, np.float64))) for i in range(9)]
    rb_best, rb_med = _best(lambda b: np.asarray(b), 9,
                            prep=lambda i: resident[i])

    # ---- pure compute: S pipeline executions inside ONE jit ----
    def make_scanner(S):
        def scanner(pack_in, tts, gvs):
            def body(acc, xs):
                t, g = xs
                img, ang, fail, _codes = prep.pipeline(pack_in, t, g,
                                                       None, None)
                return acc + img.sum() + ang.sum() + fail.astype(
                    jnp.float64) * 0, None
            out, _ = jax.lax.scan(body, jnp.float64(0.0), (tts, gvs))
            return out
        return jax.jit(scanner)

    def stack_pert(S, r):
        # distinct per-step AND per-rep tables
        f = 1.0 + 1e-6 * r
        return (np.stack([tt_h * np.float32(f + 1e-6 * s)
                          for s in range(S)]),
                np.stack([gv_h * np.float32(f + 1e-6 * s)
                          for s in range(S)]))

    S = 6
    run_s = make_scanner(S)
    run_1 = make_scanner(1)
    float(run_s(pack_h, *stack_pert(S, 0)))   # compile
    float(run_1(pack_h, *stack_pert(1, 0)))
    ts_best, _ = _best(lambda a: float(run_s(pack_h, *a)), 7,
                       prep=lambda i: stack_pert(S, i + 1))
    t1_best, _ = _best(lambda a: float(run_1(pack_h, *a)), 7,
                       prep=lambda i: stack_pert(1, i + 1))
    compute = (ts_best - t1_best) / (S - 1)

    accounted = prep_best + up_best + rtt_best + compute + rb_best
    print(json.dumps({
        "input": os.path.basename(INPUT), "method": method,
        "e2e_best_s": round(e2e_best, 4), "e2e_median_s": round(e2e_med, 4),
        "host_prep_s": round(prep_best, 4),
        "upload_s": round(up_best, 4), "upload_median_s": round(up_med, 4),
        "upload_bytes": int(nbytes),
        "rtt_s": round(rtt_best, 4), "rtt_median_s": round(rtt_med, 4),
        "compute_s": round(compute, 4),
        "readback_s": round(rb_best, 4),
        "readback_median_s": round(rb_med, 4),
        "sum_of_stages_s": round(accounted, 4),
        "unattributed_s": round(e2e_best - accounted, 4),
    }, indent=1))


if __name__ == "__main__":
    main()
