#!/usr/bin/env python
"""Interleaved stream-vs-sync weather diagnosis (the round-5 recipe that
root-caused the r04 ASE stream "regression" -- ROADMAP.md).

Per round (interleaved so link weather cancels): a depth-4 ASE stream at
(16,128) tiles, the same at (8,128) (tile-shape exoneration arm), three
sync calls, and adjacent rtt probes. Prints one JSON line per round with
fill + per-yield walls, then a summary. Steady-state yields are the
weather-immune statistic; sync best-of is the link-exposed one.

Usage: python tools/stream_diag.py   (real TPU; ~10 min)
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
from raytrace_tpu import create_image, create_image_stream, load_input
from raytrace_tpu.testing import perturbed_problems
from raytrace_tpu.ops import pallas_kernel as pk
from raytrace_tpu.models import ray_tracer as rt

PATH = "/root/reference/ASE_small.dat"
N_UNITS = 6
ROUNDS = 4
DEPTH = 4

def rtt_probe():
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(np.float32(0.0)))
    ts = []
    for i in range(5):
        t0 = time.perf_counter(); np.asarray(tiny(np.float32(i)))
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 4)

def stream_round(salt, rows):
    r0, t0_ = pk.TILE_ROWS, pk.TILE
    pk.TILE_ROWS, pk.TILE = rows, rows * pk.TILE_LANES
    try:
        units = perturbed_problems(PATH, N_UNITS, salt=salt)
        t0 = time.perf_counter(); marks = []
        for _ in create_image_stream(units, "pallas", depth=DEPTH):
            marks.append(time.perf_counter())
        return {"fill": round(marks[0]-t0, 4),
                "yields": [round(b-a, 4) for a, b in zip(marks, marks[1:])],
                "percall": round((marks[-1]-t0)/N_UNITS, 4)}
    finally:
        pk.TILE_ROWS, pk.TILE = r0, t0_

def sync_round(salt):
    units = perturbed_problems(PATH, 3, salt=salt)
    ts = []
    for p in units:
        t0 = time.perf_counter()
        create_image(p, "pallas")
        ts.append(round(time.perf_counter()-t0, 4))
    return ts

# warmups
for _ in create_image_stream(perturbed_problems(PATH, 2, salt=999), "pallas", depth=DEPTH):
    pass
r0, t0_ = pk.TILE_ROWS, pk.TILE
pk.TILE_ROWS, pk.TILE = 8, 8*128
try:
    for _ in create_image_stream(perturbed_problems(PATH, 2, salt=998), "pallas", depth=DEPTH):
        pass
finally:
    pk.TILE_ROWS, pk.TILE = r0, t0_
p0, _, _ = load_input(PATH); create_image(p0, "pallas")

out = []
for r in range(ROUNDS):
    row = {"round": r, "rtt0": rtt_probe()}
    row["stream16"] = stream_round(100 + r, 16)
    row["stream8"] = stream_round(200 + r, 8)
    row["sync16"] = sync_round(300 + r)
    row["rtt1"] = rtt_probe()
    out.append(row)
    print(json.dumps(row), flush=True)
print(json.dumps({"summary": {
    "stream16_best_percall": min(x["stream16"]["percall"] for x in out),
    "stream8_best_percall": min(x["stream8"]["percall"] for x in out),
    "sync_best": min(min(x["sync16"]) for x in out),
    "stream16_steady_med": float(np.median([y for x in out for y in x["stream16"]["yields"]])),
    "stream8_steady_med": float(np.median([y for x in out for y in x["stream8"]["yields"]])),
}}))
