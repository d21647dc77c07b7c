#!/usr/bin/env python3
"""Merge oracle_sql.json files (later files win per key) — for assembling
a full-registry oracle map when a large-SF dump was completed in subset
passes. Usage: merge_oracle.py OUT IN1 IN2 [IN3...]"""
import json
import sys

out, ins = sys.argv[1], sys.argv[2:]
merged = {}
for p in ins:
    with open(p) as f:
        d = json.load(f)
    print(f"{p}: {len(d)} entries")
    merged.update(d)
with open(out, "w") as f:
    json.dump(merged, f, indent=0)
print(f"{out}: {len(merged)} entries")
