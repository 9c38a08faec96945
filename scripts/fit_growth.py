#!/usr/bin/env python3
"""Growth-curve exponent fits (VERDICT r11 #7): read per-query medians
from three bench JSON files at known scale factors and least-squares-fit
log(t) = a + b*log(sf) per query. b is the empirical scaling exponent:
~1 linear, ~2 quadratic. Dev tool (bench tier), never oracle-gated.

Usage: python3 scripts/fit_growth.py sf:file [sf:file ...] q1 q2 ...
e.g.:  python3 scripts/fit_growth.py 0.1:bench_full.json \
         0.3:bench_subset.sf0.3.json 1:bench_subset.sf1.json \
         q120_containment q209 q121 q130 q90
"""
import json, math, sys

points, queries = [], []
for a in sys.argv[1:]:
    if ":" in a and a.split(":")[0].replace(".", "").isdigit():
        sf, f = a.split(":", 1)
        points.append((float(sf), json.load(open(f))["queries"]))
    else:
        queries.append(a)

print(f"{'query':28s} " + " ".join(f"sf{sf:g}".rjust(8) for sf, _ in points)
      + "  exponent")
for q in queries:
    xs, ys, ts = [], [], []
    for sf, qs in points:
        t = next((v for k, v in qs.items() if k.startswith(q)), None)
        ts.append(t)
        if t and t > 0:
            xs.append(math.log(sf)); ys.append(math.log(t))
    if len(xs) >= 2:
        n = len(xs); mx, my = sum(xs)/n, sum(ys)/n
        b = sum((x-mx)*(y-my) for x, y in zip(xs, ys)) / sum((x-mx)**2 for x in xs)
    else:
        b = float("nan")
    print(f"{q:28s} " + " ".join((f"{t:8.2f}" if t else "   —    ") for t in ts)
          + f"  {b:6.2f}")
