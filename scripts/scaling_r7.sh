#!/bin/bash
# Round-7 scaling evidence (VERDICT r6 task 6): 3-point log-log fits for
# the two heaviest registry pipelines — pipeline_training_corpus (the
# most expensive query, a Gopher→decontaminate→exact→PPJoin→CC→split
# composition in one plan) and pipeline_semdedup_embeddings (IVF-blocked
# embedding near-dup) — at sf0.1 / sf0.3 / sf1 on identical code.
#
# Usage: bash scripts/scaling_r7.sh   (writes target/scaling_r7/*.json)
set -u
cd "$(dirname "$0")/.."
OUT=target/scaling_r7
mkdir -p "$OUT"

Q="pipeline_training_corpus pipeline_semdedup_embeddings"

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

python3 - <<'EOF'
import json, math, statistics
out = "target/scaling_r7"
def load(tag):
    with open(f"{out}/{tag}.json") as f:
        return json.load(f)["queries"]
t01, t03, t1 = load("pipe_sf01"), load("pipe_sf03"), load("pipe_sf1")
print("\n--- 3-point log-log fits (sf0.1 / sf0.3 / sf1) ---")
for q in sorted(t01):
    xs = [math.log(1.0), math.log(3.0), math.log(10.0)]
    ys = [math.log(t01[q]), math.log(t03[q]), math.log(t1[q])]
    mx, my = statistics.mean(xs), statistics.mean(ys)
    slope = sum((x-mx)*(y-my) for x, y in zip(xs, ys)) / sum((x-mx)**2 for x in xs)
    print(f"{q}: {t01[q]:.2f} / {t03[q]:.2f} / {t1[q]:.2f} s  exponent={slope:.2f}")
EOF
