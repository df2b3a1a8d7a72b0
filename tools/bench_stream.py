#!/usr/bin/env python
"""A/B bench: sequential create_image vs create_image_stream.

Protocol (ROADMAP.md "Benchmarking on this rig"): every call gets DISTINCT
gain tables (a tiny per-call g0 scale) so the tunnel's whole-jit result
cache never serves a measurement, and the sequential/streamed arms are
interleaved per round so link weather cancels. Reported per-call seconds =
wall time of the whole arm / number of calls.

Usage: python tools/bench_stream.py [input.dat] [n_calls] [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytrace_tpu import create_image, create_image_stream  # noqa: E402
from raytrace_tpu.testing import perturbed_problems as make_problems  # noqa: E402


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/ASE_small.dat"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    # warmup both arms (JIT compile + tunnel)
    for p in make_problems(path, 2, 999):
        create_image(p)
    list(create_image_stream(make_problems(path, 2, 998)))

    seq, strm = [], []
    for r in range(rounds):
        probs = make_problems(path, n, 2 * r)
        t0 = time.perf_counter()
        for p in probs:
            create_image(p)
        seq.append((time.perf_counter() - t0) / n)

        probs = make_problems(path, n, 2 * r + 1)
        t0 = time.perf_counter()
        for _ in create_image_stream(probs):
            pass
        strm.append((time.perf_counter() - t0) / n)
        print(f"round {r}: seq {seq[-1]:.4f} s/call   stream {strm[-1]:.4f} "
              f"s/call", flush=True)

    print(f"sequential: best {min(seq):.4f}  med {sorted(seq)[len(seq)//2]:.4f}")
    print(f"streamed:   best {min(strm):.4f}  med {sorted(strm)[len(strm)//2]:.4f}")


if __name__ == "__main__":
    main()
