#!/usr/bin/env python
"""TPU A/B: trace-kernel cost vs vector-tile height (TILE_ROWS).

The roofline (tools/vpu_probe.py + tools/roofline.py) measured the
merged-loop micro-step as LATENCY-bound: a dependent (8,128) f32 FMA
costs ~13.4 ns while 8 independent chains stream at ~0.49 ns/op -- the
VPU has ~15-27x idle ILP under a serial dependency chain. The stepper's
micro-step is one near-serial chain over (TILE_ROWS, 128) arrays, so
raising TILE_ROWS from 8 to 16/32 turns every op into 2/4 independent
vreg ops -- latency hiding with zero semantic change (per-lane sequences
are ray-local and unchanged; only scheduling groups more rays per tile).

The trade: a taller tile pays max-over-more-lanes divergence (census
tile utilization drops with tile size) and more carry state (register
pressure / spills). This tool measures the net on the real workloads.

Protocol: same as tools/bench_unroll.py -- trace-only scanner,
scan-differencing over distinct per-step tables, variants interleaved
rep-by-rep, per-rep cross-variant checksum gate.

Usage: python tools/bench_tile_rows.py [input.dat] [scale] [S] [reps] \
           [rows,...]    e.g. 8,16,32
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
# variants: "rows", "rows:structure" or "rows:structure:unroll",
# e.g. 16,32:merged-thin,32:merged-thin:4
def _parse_variant(tok):
    parts = tok.split(":")
    rows = int(parts[0])
    st = parts[1] if len(parts) > 1 and parts[1] else None
    u = int(parts[2]) if len(parts) > 2 else None
    return rows, st, u


ROWS = ([_parse_variant(r) for r in sys.argv[5].split(",")]
        if len(sys.argv) > 5
        else [(8, None, None), (16, None, None), (32, None, None)])
assert S >= 2


def main():
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
    pack, tt, _gv, _sd, _bd = prep.operands
    pack_h = np.asarray(pack)
    tt_h = np.asarray(tt)
    chunk_indices = rt._make_chunk_indices(cfg)
    n_chunks = cfg["n_chunks"]
    rows0, tile0 = pk.TILE_ROWS, pk.TILE

    struct0 = pk.KERNEL_STRUCTURE
    unroll0 = pk.MERGED_UNROLL

    def scanner_for(variant, S_):
        rows, structure, unroll = variant
        # the kernel and the tiling helpers read the module constants at
        # trace time, so patching them specializes the whole build; input
        # shapes differ per variant, so jit caches cannot cross-serve
        # (structure/unroll additionally key _trace_tiles_jit static args)
        pk.TILE_ROWS, pk.TILE = rows, rows * pk.TILE_LANES
        if structure is not None:
            pk.KERNEL_STRUCTURE = structure
        if unroll is not None:
            pk.MERGED_UNROLL = unroll
        try:
            assert cfg["chunk"] % pk.TILE == 0, (cfg["chunk"], pk.TILE)
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
            f(pack_h, np.stack([tt_h] * S_)).block_until_ready()
            return f
        finally:
            pk.TILE_ROWS, pk.TILE = rows0, tile0
            pk.KERNEL_STRUCTURE = struct0
            pk.MERGED_UNROLL = unroll0

    def stack_t(r):
        f = 1.0 + 1e-6 * r
        return np.stack([tt_h * np.float32(f + 1e-6 * s) for s in range(S)])

    def _tag(variant):
        rows, structure, unroll = variant
        return (f"rows{rows}" + (f":{structure}" if structure else "")
                + (f":u{unroll}" if unroll else ""))

    fns = {}
    for v in ROWS:
        print(f"compiling {_tag(v)} (S={S} and S=1)...", file=sys.stderr)
        fns[v] = (scanner_for(v, S), scanner_for(v, 1))

    best = {v: [] for v in ROWS}
    for rep in range(REPS):
        xs = stack_t(rep + 1)
        vals = {}
        for v in ROWS:
            fs, f1 = fns[v]
            t0 = time.perf_counter()
            vals[v] = float(fs(pack_h, xs))
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(f1(pack_h, xs[:1]))
            t1 = time.perf_counter() - t0
            best[v].append((ts - t1) / (S - 1))
        ref_v = next(iter(vals.values()))
        for v, val in vals.items():
            rel = abs(val - ref_v) / max(abs(ref_v), 1e-30)
            assert rel < 1e-4, (
                f"{_tag(v)} checksum diverges: {val} vs {ref_v} "
                f"(rel {rel:.2e})")
    out = {"input": os.path.basename(INPUT), "scale": SCALE, "S": S,
           "reps": REPS, "structure": pk.KERNEL_STRUCTURE,
           "unroll": pk.MERGED_UNROLL}
    for v in ROWS:
        out[f"trace_s_{_tag(v)}_best"] = round(min(best[v]), 4)
        out[f"trace_s_{_tag(v)}_med"] = round(
            sorted(best[v])[len(best[v]) // 2], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
