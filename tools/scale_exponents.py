#!/usr/bin/env python3
"""Fit per-leg wall-vs-corpus-size exponents from same-code bench runs.

Usage: python3 tools/scale_exponents.py ndocs1:file1.json ndocs2:file2.json ...
   or: python3 tools/scale_exponents.py sf01.json sf1.json sf10.json
(the legacy 3-arg form assumes 5k/50k/500k documents). Each file is one
graft.Bench JSON line (possibly [info]-prefixed). Uses the BEST pass per
leg (the contamination-robust statistic the STATUS tables use) and fits
log(wall) ~ a + b*log(ndocs) over all points; also prints the last-decade
exponent (the two largest sizes), since small-SF points sit on the fixed
per-job floor.
"""
import sys, json, math

LEGACY_SIZES = [5_000, 50_000, 500_000]  # documents per legacy corpus tier


def load(path):
    line = open(path).read().strip()
    if line.startswith("[info] "):
        line = line[len("[info] "):]
    d = json.loads(line)
    return {q: min(p) for q, p in d["passes"].items()}


if all(":" in a for a in sys.argv[1:]):
    pairs = sorted((int(a.split(":", 1)[0]), a.split(":", 1)[1]) for a in sys.argv[1:])
    sizes = [n for n, _ in pairs]
    runs = [load(p) for _, p in pairs]
else:
    sizes = LEGACY_SIZES
    runs = [load(p) for p in sys.argv[1:4]]

legs = [q for q in runs[0] if all(q in r for r in runs)]
hdr = " ".join(f"{n:>9}" for n in sizes)
print(f"{'leg':<24} {hdr} {'b(fit)':>7} {'b(last)':>8}")
for q in sorted(legs):
    ys = [r[q] for r in runs]
    lx = [math.log(n) for n in sizes]
    ly = [math.log(y) for y in ys]
    n = len(lx)
    mx, my = sum(lx) / n, sum(ly) / n
    bfit = sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / sum((x - mx) ** 2 for x in lx)
    blast = (ly[-1] - ly[-2]) / (lx[-1] - lx[-2])
    cells = " ".join(f"{y:>9.3f}" for y in ys)
    print(f"{q:<24} {cells} {bfit:>7.2f} {blast:>8.2f}")
