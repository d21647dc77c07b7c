#!/bin/bash
# Round-8 scaling evidence (VERDICT r7 task 4): 4-point log-log fits for
# the two heaviest registry pipelines at sf0.1 / sf0.3 / sf1 / sf3. The
# r7 3-point fits gave exponents 0.31/0.37 — sublinear, i.e. still
# fixed-cost-dominated through sf1 — so the sf3 (30x) point is the first
# datum that can expose a hidden superlinear stage in the data-dominated
# regime. Also fits the rebuilt dedup_simhash (64-bit, sharded bands).
#
# Usage: bash scripts/scaling_r8.sh   (writes target/scaling_r8/*.json)
set -u
cd "$(dirname "$0")/.."
OUT=target/scaling_r8
mkdir -p "$OUT"

Q="pipeline_training_corpus pipeline_semdedup_embeddings dedup_simhash"

run() { # run <tag> <sfdir>
  local tag=$1 sfdir=$2
  echo "=== $tag ==="
  env SPARK_GRAFT_SF_DIR="$sfdir" \
    sbt -batch "runMain graft.Bench $Q" 2>&1 \
    | grep -oE '\{"metric".*\}' > "$OUT/$tag.json"
  cat "$OUT/$tag.json"
}

run pipe_sf01 /root/testdata/sf0.1
run pipe_sf03 target/sf03
run pipe_sf1  target/sf1
run pipe_sf3  target/sf3

python3 - <<'EOF'
import json, math, statistics
out = "target/scaling_r8"
def load(tag):
    with open(f"{out}/{tag}.json") as f:
        return json.load(f)["queries"]
legs = [(1.0, load("pipe_sf01")), (3.0, load("pipe_sf03")),
        (10.0, load("pipe_sf1")), (30.0, load("pipe_sf3"))]
print("\n--- 4-point log-log fits (sf0.1 / sf0.3 / sf1 / sf3) ---")
for q in sorted(legs[0][1]):
    xs = [math.log(s) for s, _ in legs]
    ys = [math.log(t[q]) for _, t in legs]
    mx, my = statistics.mean(xs), statistics.mean(ys)
    slope = sum((x-mx)*(y-my) for x, y in zip(xs, ys)) / sum((x-mx)**2 for x in xs)
    # tail exponent: the sf1->sf3 segment alone, the data-dominated signal
    tail = (ys[3]-ys[2]) / (xs[3]-xs[2])
    ts = " / ".join(f"{t[q]:.2f}" for _, t in legs)
    print(f"{q}: {ts} s  exponent={slope:.2f} tail(sf1->sf3)={tail:.2f}")
EOF
