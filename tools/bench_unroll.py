#!/usr/bin/env python
"""TPU A/B: trace-kernel cost vs FL_UNROLL (micro-steps per while round).

The pallas stepper takes FL_UNROLL micro-steps per while round to amortize
the round overhead (cross-lane cond reduction + carry re-yield) against
masked idle steps in the tail (ops/pallas_kernel.py FL_UNROLL notes; the
lever that cut ASE-class trace ~24%). The best factor depends on the
per-round body cost, so re-sweep after any micro-step-body change.

Protocol (ROADMAP.md "Benchmarking on this rig"): trace-only scanner --
S pipeline executions inside ONE jit over distinct per-step tables
(scan-differencing removes link cost and defeats the tunnel's whole-jit
result cache); unroll factors interleaved rep-by-rep so link weather
cancels; best-of compared. Outputs are bitwise identical across unrolls
(per-lane step sequences unchanged), so this is timing-only.

Usage: python tools/bench_unroll.py [input.dat] [scale] [S] [reps] [u1,u2,...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INPUT = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/ASE_small.dat"
SCALE = float(sys.argv[2]) if len(sys.argv) > 2 else 16.0
S = int(sys.argv[3]) if len(sys.argv) > 3 else 4
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 4
UNROLLS = ([int(u) for u in sys.argv[5].split(",")] if len(sys.argv) > 5
           else [4, 6, 8])


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from raytrace_tpu import load_input
    from raytrace_tpu.io.loader import scale_problem
    from raytrace_tpu.models import ray_tracer as rt
    from raytrace_tpu.ops import pallas_kernel as pk

    problem, _, _ = load_input(INPUT)
    if SCALE != 1.0:
        scale_problem(problem, SCALE)

    prep = rt.prepare_pipeline(problem, "pallas")
    cfg = prep.cfg
    pack, tt, gv, _seed_dev, _beam_dev = prep.operands
    pack_h = np.asarray(pack)
    tt_h = np.asarray(tt)
    chunk_indices = rt._make_chunk_indices(cfg)
    n_chunks = cfg["n_chunks"]
    orig_trace_tiles = pk.trace_tiles

    def scanner_for(unroll, S_):
        # route the unroll override through the module hook make_pallas_
        # trace_fn resolves at call time (trace_tiles' own default binds
        # FL_UNROLL at def time, so patching the constant would be a no-op)
        pk.trace_tiles = functools.partial(orig_trace_tiles,
                                           fl_unroll=unroll)
        try:
            trace_fn = rt.make_pallas_trace_fn(cfg)

            def scanner(pack_in, tts):
                ray_grids_u, _beam, _ds = rt.unpack_bundle(cfg, pack_in)

                def body(acc, t):
                    def cbody(a2, ci):
                        ijkm, _v, _it = chunk_indices(ci)
                        res = rt.chunk_trace(cfg, trace_fn, ijkm,
                                             ray_grids_u, t)
                        s = (res.gvl.astype(jnp.float64).sum()
                             + res.evl.astype(jnp.float64).sum()
                             + res.ivl.sum().astype(jnp.float64)
                             + res.exit_x.astype(jnp.float64).sum()
                             + res.escaped.sum().astype(jnp.float64))
                        return a2 + s, None
                    a3, _ = jax.lax.scan(cbody, acc,
                                         jnp.arange(n_chunks,
                                                    dtype=jnp.int32))
                    return a3, None
                out, _ = jax.lax.scan(body, jnp.float64(0.0), tts)
                return out
            f = jax.jit(scanner)
            # compile while the patch is live (tracing happens here)
            f(pack_h, np.stack([tt_h] * S_)).block_until_ready()
            return f
        finally:
            pk.trace_tiles = orig_trace_tiles

    def stack_t(r):
        f = 1.0 + 1e-6 * r
        return np.stack([tt_h * np.float32(f + 1e-6 * s) for s in range(S)])

    fns = {}
    for u in UNROLLS:
        print(f"compiling unroll={u} (S={S} and S=1)...", file=sys.stderr)
        fns[u] = (scanner_for(u, S), scanner_for(u, 1))

    best = {u: [] for u in UNROLLS}
    checks = {}
    r = 0
    for rep in range(REPS):
        for u in UNROLLS:  # interleaved: weather cancels across unrolls
            fs, f1 = fns[u]
            xs = stack_t(r := r + 1)
            t0 = time.perf_counter()
            v = float(fs(pack_h, xs))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(f1(pack_h, xs[:1]))
            t1 = time.perf_counter() - t0
            best[u].append((ts - t1) / (S - 1))
            checks.setdefault(r, v)
    out = {"input": os.path.basename(INPUT), "scale": SCALE, "S": S,
           "reps": REPS, "default": pk.FL_UNROLL}
    for u in UNROLLS:
        out[f"trace_s_u{u}_best"] = round(min(best[u]), 4)
        out[f"trace_s_u{u}_med"] = round(sorted(best[u])[len(best[u]) // 2],
                                         4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
