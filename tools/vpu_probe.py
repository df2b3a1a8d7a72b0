#!/usr/bin/env python
"""Empirical VPU cost anchors for the roofline (tools/roofline.py).

Public v5e specs pin the MXU (197 bf16 TFLOP/s) and HBM (819 GB/s) but
not the VPU's effective f32 issue rate for the dependency-chain-heavy,
(8,128)-shaped op stream the trace kernel runs. Rather than argue from an
assumed clock and ALU count, measure it on the real chip:

* ``fma_dep_ns``   -- ns per *dependent* (8,128) f32 FMA (x = x*a+b chained;
                      latency-bound: the stepper's micro-step is a near-
                      serial dependency chain, so this is its floor regime)
* ``fma_ind4/8_ns``-- ns per FMA with 4/8 independent chains (throughput
                      regime; the gap to _dep is the available ILP headroom)
* ``div_extra_ns`` -- marginal ns of swapping one dependent FMA for a
                      divide (the micro-step runs 5 divides)
* ``gather_ns``    -- ns per (8,128) lane-shuffle gather (tpu.dynamic_gather
                      via a tiny pallas kernel, the kernel's fetch primitive)

Protocol: K iterations inside one jit (lax.scan / fori), scan-differenced
(K2 vs K1) so dispatch and link cost cancel; inputs perturbed per rep so
the tunnel's result cache never serves a timed call.

Usage: python tools/vpu_probe.py [reps]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
# scan iterations (differenced). The tunneled link adds ~25 ms of noise
# per dispatch, so the K2-K1 compute delta must be >= ~100 ms to measure:
# at ~1-4 ns per (8,128) op, 1M iterations x 32 ops ~= 0.1-1 s.
K1, K2 = 100_000, 1_000_000
INNER = 32                # ops per scan iteration (python-unrolled)


def main():
    import jax
    import jax.numpy as jnp

    f32 = jnp.float32

    def timed(fn, *args):
        """best-of-REPS wall seconds of fn(*args) with fresh data."""
        ts = []
        for r in range(REPS):
            pert = [a * np.float32(1.0 + 1e-6 * (r + 1)) for a in args]
            jargs = [jnp.asarray(a) for a in pert]
            jax.block_until_ready(jargs)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*jargs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    x0 = np.random.default_rng(0).random((8, 128), np.float32) * 0.1 + 1.0
    a0 = x0 * np.float32(0.9999)
    b0 = x0 * np.float32(1e-6)

    def chain(K, nchains, use_div=0):
        @jax.jit
        def f(x, a, b):
            xs = [x + f32(i) * f32(1e-7) for i in range(nchains)]

            def body(i, xs):
                out = []
                for c, xc in enumerate(xs):
                    for j in range(INNER):
                        if use_div and c == 0 and j < use_div:
                            xc = a / xc + b
                        else:
                            xc = xc * a + b
                    out.append(xc)
                return out

            xs = jax.lax.fori_loop(0, K, body, xs)
            s = xs[0]
            for xc in xs[1:]:
                s = s + xc
            return s.sum()
        return f

    out = {"platform": jax.default_backend(), "inner": INNER,
           "k": [K1, K2], "reps": REPS}

    for name, nch, nd in [("fma_dep", 1, 0), ("fma_ind4", 4, 0),
                          ("fma_ind8", 8, 0), ("div1_dep", 1, 8)]:
        f1, f2 = chain(K1, nch, nd), chain(K2, nch, nd)
        float(f1(jnp.asarray(x0), jnp.asarray(a0), jnp.asarray(b0)))
        float(f2(jnp.asarray(x0), jnp.asarray(a0), jnp.asarray(b0)))
        t1 = timed(f1, x0, a0, b0)
        t2 = timed(f2, x0, a0, b0)
        per_op = (t2 - t1) / ((K2 - K1) * INNER * nch)
        out[f"{name}_ns"] = round(per_op * 1e9, 3)
    # div1_dep replaced 8 of 32 chain ops with divides
    out["div_extra_ns"] = round(
        (out["div1_dep_ns"] * INNER - out["fma_dep_ns"] * (INNER - 8))
        / 8 - out["fma_dep_ns"], 3)

    # lane-shuffle gather probe: a pallas kernel doing K dependent
    # dynamic_gathers from an (8,128)-broadcast table row
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from raytrace_tpu.ops.pallas_kernel import _lane_gather

        def gk(K):
            def kern(tab_ref, idx_ref, o_ref):
                tab = tab_ref[:]
                idx = idx_ref[:]

                def body(i, v):
                    g = _lane_gather(tab, (idx + v.astype(jnp.int32)
                                           % jnp.int32(1)) % jnp.int32(128))
                    return v + g
                o_ref[:] = jax.lax.fori_loop(
                    0, K, body, jnp.zeros((8, 128), jnp.float32))

            return jax.jit(pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=jax.default_backend() != "tpu"))

        tab = np.random.default_rng(1).random((8, 128), np.float32)
        idx = np.arange(1024, dtype=np.int32).reshape(8, 128) % 128
        g1, g2 = gk(K1), gk(K2)
        np.asarray(g1(jnp.asarray(tab), jnp.asarray(idx)))
        np.asarray(g2(jnp.asarray(tab), jnp.asarray(idx)))
        ts = []
        for r in range(REPS):
            t = tab * np.float32(1.0 + 1e-6 * (r + 1))
            ta, ia = jnp.asarray(t), jnp.asarray(idx)
            jax.block_until_ready((ta, ia))
            t0 = time.perf_counter()
            np.asarray(g2(ta, ia))
            tb = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(g1(ta, ia))
            tc = time.perf_counter() - t0
            ts.append((tb - tc) / (K2 - K1))
        out["gather_ns"] = round(min(ts) * 1e9, 3)
    except Exception as e:
        out["gather_error"] = repr(e)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
