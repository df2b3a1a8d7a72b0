#!/usr/bin/env python
"""TPU A/B: trace-kernel cost vs loop structure x unroll.

The pallas stepper takes fl_unroll micro-steps per while round to amortize
the round overhead against masked idle steps in the tail, and supports two
loop structures (ops/pallas_kernel.py KERNEL_STRUCTURE: "nested" syncs the
tile at every cell boundary, "merged" folds the fetch into the micro-step
loop). Both knobs only change lane scheduling; re-sweep after any
micro-step-body change.

Protocol (ROADMAP.md "Benchmarking on this rig"): trace-only scanner --
S pipeline executions inside ONE jit over distinct per-step tables
(scan-differencing removes link cost and defeats the tunnel's whole-jit
result cache); variants interleaved rep-by-rep so link weather cancels;
best-of compared. Per-lane step sequences are identical across variants,
so this is timing-only.

Usage: python tools/bench_unroll.py [input.dat] [scale] [S] [reps] \
           [variant,...]   with variant = U (default structure) or
                            STRUCTURE:U, e.g. merged:3,nested:6
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
assert S >= 2, "scan-differencing needs S >= 2 (per-call = (tS - t1)/(S-1))"


def _parse_variant(v):
    if ":" in v:
        s, u = v.split(":")
        return (s, int(u))
    return (None, int(v))


VARIANTS = ([_parse_variant(u) for u in sys.argv[5].split(",")]
            if len(sys.argv) > 5
            else [("nested", 6), ("merged", 2), ("merged", 3), ("merged", 4)])


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

    def scanner_for(variant, S_):
        structure, unroll = variant
        # route the override through the module hook make_pallas_trace_fn
        # resolves at call time (trace_tiles' own default binds the module
        # constants at def time, so patching those would be a no-op)
        pk.trace_tiles = functools.partial(orig_trace_tiles,
                                           fl_unroll=unroll,
                                           structure=structure)
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

    def tag(v):
        s, u = v
        return f"{s or 'default'}:u{u}"

    fns = {}
    for v in VARIANTS:
        print(f"compiling {tag(v)} (S={S} and S=1)...", file=sys.stderr)
        fns[v] = (scanner_for(v, S), scanner_for(v, 1))

    best = {v: [] for v in VARIANTS}
    for rep in range(REPS):
        # one perturbed input stack per rep, SHARED by all variants: the
        # checksums are then comparable (per-rep cross-variant gate below).
        # Different variants are different executables, so the tunnel's
        # whole-jit result cache cannot serve one variant's value to another.
        xs = stack_t(rep + 1)
        vals = {}
        for v in VARIANTS:  # interleaved: weather cancels across variants
            fs, f1 = fns[v]
            t0 = time.perf_counter()
            vals[v] = float(fs(pack_h, xs))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(f1(pack_h, xs[:1]))
            t1 = time.perf_counter() - t0
            best[v].append((ts - t1) / (S - 1))
        # cross-variant value gate: unroll variants within a structure are
        # bitwise equal; nested vs merged differ by FMA-contraction ulps
        # (amplified by the chaotic trajectories), so gate at 1e-4 relative
        # on the full-workload checksum -- loose enough for reassociation,
        # tight enough to catch a wrong-kernel or wrong-mask regression
        ref_v = next(iter(vals.values()))
        for v, val in vals.items():
            rel = abs(val - ref_v) / max(abs(ref_v), 1e-30)
            assert rel < 1e-4, (
                f"variant {tag(v)} checksum diverges: {val} vs {ref_v} "
                f"(rel {rel:.2e}) -- the timing comparison is off a "
                "wrong result")
    out = {"input": os.path.basename(INPUT), "scale": SCALE, "S": S,
           "reps": REPS,
           "default": f"{pk.KERNEL_STRUCTURE}:u"
                      f"{pk.MERGED_UNROLL if pk.KERNEL_STRUCTURE == 'merged' else pk.FL_UNROLL}"}
    for v in VARIANTS:
        out[f"trace_s_{tag(v)}_best"] = round(min(best[v]), 4)
        out[f"trace_s_{tag(v)}_med"] = round(
            sorted(best[v])[len(best[v]) // 2], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
