#!/usr/bin/env python3
"""Per-query scale-growth report: compares two Bench detail dumps
(bench_detail.json) taken at different scale factors and prints the
cold-time growth ratio per query, flagging anything super-linear.

Usage: python3 tools/growth.py <detail_small.json> <detail_big.json> [scale]
scale = the data-size ratio between the two runs (default 10).

A ratio well ABOVE `scale` means the query's cost grew faster than its
input — a candidate-pair explosion, a collapsed-partition sort, or a
fixed-K structure outgrown by the data. Sub-scale ratios are normal for
queries dominated by fixed costs (session setup, tiny dimension tables,
K-row collects)."""
import json, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
scale = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qs = small["queries"]
qb = big["queries"]
rows = []
for name in sorted(qs):
    if name not in qb or qs[name] <= 0 or qb[name] <= 0:
        continue
    # in-sequence cold timings under ~0.15s are dominated by per-query
    # session overhead; their ratios are noise either way
    ratio = qb[name] / max(qs[name], 1e-9)
    rows.append((ratio, name, qs[name], qb[name]))

rows.sort(reverse=True)
total_s = sum(r[2] for r in rows)
total_b = sum(r[3] for r in rows)
print(f"total: {total_s:.1f}s -> {total_b:.1f}s  ({total_b/total_s:.2f}x at {scale:.0f}x data)")
print(f"{'ratio':>7}  {'small':>8}  {'big':>8}  query")
flagged = []
for ratio, name, s, b in rows:
    flag = ""
    if ratio > scale and b > 1.0 and s > 0.15:
        flag = "  <-- SUPER-LINEAR"
        flagged.append(name)
    print(f"{ratio:7.2f}  {s:8.3f}  {b:8.3f}  {name}{flag}")
print()
if flagged:
    print("super-linear (ratio > scale, big > 1s, small > 0.15s):")
    for n in flagged:
        print(" ", n)
    sys.exit(1)
print("no super-linear queries above the noise floor")
