#!/usr/bin/env python3
"""Fit per-leg wall-vs-corpus-size exponents from three same-code bench runs.

Usage: python3 tools/scale_exponents.py sf01.json sf1.json sf10.json
Each file is one graft.Bench JSON line (possibly [info]-prefixed). Uses the
BEST pass per leg (the contamination-robust statistic the STATUS tables use)
and fits log(wall) ~ a + b*log(ndocs) over the three points; also prints the
last-decade exponent (sf1 -> sf10) separately, since small-SF points sit on
the fixed per-job floor.
"""
import sys, json, math

SIZES = [5_000, 50_000, 500_000]  # documents per corpus tier


def load(path):
    line = open(path).read().strip()
    if line.startswith("[info] "):
        line = line[len("[info] "):]
    d = json.loads(line)
    return {q: min(p) for q, p in d["passes"].items()}


runs = [load(p) for p in sys.argv[1:4]]
legs = [q for q in runs[0] if all(q in r for r in runs)]
print(f"{'leg':<24} {'sf0.1':>8} {'sf1':>8} {'sf10':>8} {'b(3pt)':>7} {'b(last)':>8}")
for q in sorted(legs):
    ys = [r[q] for r in runs]
    lx = [math.log(n) for n in SIZES]
    ly = [math.log(y) for y in ys]
    n = 3
    mx, my = sum(lx) / n, sum(ly) / n
    b3 = sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / sum((x - mx) ** 2 for x in lx)
    blast = (ly[2] - ly[1]) / (lx[2] - lx[1])
    print(f"{q:<24} {ys[0]:>8.3f} {ys[1]:>8.3f} {ys[2]:>8.3f} {b3:>7.2f} {blast:>8.2f}")
