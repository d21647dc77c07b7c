#!/usr/bin/env python3
"""Compare bench_full.json (sf0.1) against bench_full_sf1.json (sf1, 10x
the rows) and print a markdown scaling table: per-query ratio, flagging
anything whose growth exceeds ~linear (ratio > 10 with headroom for
fixed overheads).

Usage: python3 scripts/scaling_table.py [flag_ratio=13]
"""
import json, sys

FLAG = float(sys.argv[1]) if len(sys.argv) > 1 else 13.0

small = json.load(open("bench_full.json"))
big = json.load(open("bench_full_sf1.json"))
qs, qb = small["queries"], big["queries"]
common = sorted(set(qs) & set(qb))

rows = []
for q in common:
    a, b = qs[q], qb[q]
    ratio = b / a if a > 0 else float("inf")
    rows.append((q, a, b, ratio))

print(f"| query | sf0.1 s | sf1 s | x | flag |")
print("|---|---|---|---|---|")
flagged = []
for q, a, b, r in sorted(rows, key=lambda t: -t[3]):
    f = "SUPERLINEAR" if r > FLAG and b > 1.0 else ""
    if f:
        flagged.append(q)
    print(f"| {q} | {a:.2f} | {b:.2f} | {r:.1f} | {f} |")
print()
print(f"total sf0.1 {small['value']:.1f}s -> sf1 {big['value']:.1f}s "
      f"(x{big['value']/small['value']:.1f} for 10x rows); "
      f"flagged (> x{FLAG} and > 1s at sf1): {flagged}")
