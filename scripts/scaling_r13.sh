#!/bin/bash
# Round-13 scaling evidence: 3-point log-log fit for the re-parameterized
# sim_lsh_rp (SF-aware band width, band count pinned at 4) next to its
# self-sizing twin sim_lsh_rp_auto — the r12 weak flag's exponent was
# ~quadratic (measured x61 at 10x SF, infeasible at sf3); the fixture
# should now sit in the same linear band as the auto twin.
#
# Usage: bash scripts/scaling_r13.sh   (writes target/scaling_r13/*.json)
set -eu
cd "$(dirname "$0")/.."
OUT=target/scaling_r13
mkdir -p "$OUT"

Q="sim_lsh_rp sim_lsh_rp_auto"

run() { # run <tag> <sfdir>
  local tag=$1 sfdir=$2
  echo "=== $tag ==="
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BENCH_OUT="$OUT/$tag.full.json" \
    sbt -batch "runMain graft.Bench $Q" 2>&1 \
    | grep -oE '\{"metric".*\}' | tail -n1 > "$OUT/$tag.json"
  [ -s "$OUT/$tag.json" ] || { echo "leg $tag produced no metric line" >&2; exit 1; }
  cat "$OUT/$tag.json"
}

run r13_sf01 /root/testdata/sf0.1
run r13_sf1  target/sf1
run r13_sf3  target/sf3

python3 - <<'PYEOF'
import json, math, statistics
out = "target/scaling_r13"
def load(tag):
    with open(f"{out}/{tag}.json") as f:
        return json.load(f)["queries"]
legs = [(1.0, load("r13_sf01")), (10.0, load("r13_sf1")), (30.0, load("r13_sf3"))]
print("\n--- 3-point log-log fits (sf0.1 / sf1 / sf3) ---")
for q in sorted(legs[0][1]):
    xs = [math.log(s) for s, _ in legs]
    ys = [math.log(t[q]) for _, t in legs]
    mx, my = statistics.mean(xs), statistics.mean(ys)
    slope = sum((x-mx)*(y-my) for x, y in zip(xs, ys)) / sum((x-mx)**2 for x in xs)
    tail = (ys[2]-ys[1]) / (xs[2]-xs[1])
    ts = " / ".join(f"{t[q]:.2f}" for _, t in legs)
    print(f"{q}: {ts} s  exponent={slope:.2f} tail(sf1->sf3)={tail:.2f}")
PYEOF
