#!/bin/bash
# Round-11 scaling evidence (VERDICT r10 task 7 / r9 stretch 8): 4-point
# log-log fits for the two heavy dedup queries never fitted —
# dedup_minhash_delta_stored (stored banded index: write increment +
# pruned probe + ledger) and dedup_excise_spans (token-level anti-join +
# document reassembly).
#
# Same hardening as scaling_r9.sh: set -e aborts on a failed leg, the
# JSON line is the LAST metric match, every leg's file is checked
# non-empty before the fit step runs.
#
# Usage: bash scripts/scaling_r11.sh   (writes target/scaling_r11/*.json)
set -eu
cd "$(dirname "$0")/.."
OUT=target/scaling_r11
mkdir -p "$OUT"

Q="dedup_minhash_delta_stored dedup_excise_spans"

run() { # run <tag> <sfdir>
  local tag=$1 sfdir=$2
  echo "=== $tag ==="
  env SPARK_GRAFT_SF_DIR="$sfdir" \
    sbt -batch "runMain graft.Bench $Q" 2>&1 \
    | grep -oE '\{"metric".*\}' | tail -n1 > "$OUT/$tag.json"
  [ -s "$OUT/$tag.json" ] || { echo "leg $tag produced no metric line" >&2; exit 1; }
  cat "$OUT/$tag.json"
}

run r11_sf01 /root/testdata/sf0.1
run r11_sf03 target/sf03
run r11_sf1  target/sf1
run r11_sf3  target/sf3

python3 - <<'EOF'
import json, math, statistics
out = "target/scaling_r11"
def load(tag):
    with open(f"{out}/{tag}.json") as f:
        return json.load(f)["queries"]
legs = [(1.0, load("r11_sf01")), (3.0, load("r11_sf03")),
        (10.0, load("r11_sf1")), (30.0, load("r11_sf3"))]
print("\n--- 4-point log-log fits (sf0.1 / sf0.3 / sf1 / sf3) ---")
for q in sorted(legs[0][1]):
    xs = [math.log(s) for s, _ in legs]
    ys = [math.log(t[q]) for _, t in legs]
    mx, my = statistics.mean(xs), statistics.mean(ys)
    slope = sum((x-mx)*(y-my) for x, y in zip(xs, ys)) / sum((x-mx)**2 for x in xs)
    tail = (ys[3]-ys[2]) / (xs[3]-xs[2])
    ts = " / ".join(f"{t[q]:.2f}" for _, t in legs)
    print(f"{q}: {ts} s  exponent={slope:.2f} tail(sf1->sf3)={tail:.2f}")
EOF
