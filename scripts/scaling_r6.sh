#!/bin/bash
# Round-6 scaling evidence (VERDICT r5 tasks 1 + 3), driver-side tool.
#
# Part A — per-branch containment numbers: dedup_containment with the
# cost-based kernel PINNED to each branch (dense N² microkernel vs
# one-sided prefix index) at BOTH sf0.1 and sf1, so the crossover claim
# is auditable from one artifact instead of mixing branches across SFs.
# The bottom-k sketch path (the deployed 100 TB containment) rides along.
#
# Part B — 3-point scaling fit for the three families sitting just under
# the 13× flag line (minhash ×11.7, simhash ×10.0, pii_redact ×12.2):
# sf0.1 → sf0.3 → sf1 gives a log-log slope per query, separating
# "linear with a big constant" from "superlinear".
#
# Usage: bash scripts/scaling_r6.sh   (writes target/scaling_r6/*.json)
set -u
cd "$(dirname "$0")/.."
OUT=target/scaling_r6
mkdir -p "$OUT"

run() { # run <tag> <sfdir> <extra-env...> -- <queries...>
  local tag=$1 sfdir=$2; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $tag ==="
  env SPARK_GRAFT_SF_DIR="$sfdir" "${envs[@]}" \
    sbt -batch "runMain graft.Bench $*" 2>&1 \
    | grep -oE '\{"metric".*\}' > "$OUT/$tag.json"
  cat "$OUT/$tag.json"
}

BIG=1000000000

# Part A: containment per-branch (dense pinned / prefix pinned), both SFs
run contain_dense_sf01  /root/testdata/sf0.1 SPARK_GRAFT_DENSE_CUTOFF=$BIG -- dedup_containment dedup_containment_bottomk
run contain_prefix_sf01 /root/testdata/sf0.1 SPARK_GRAFT_DENSE_CUTOFF=0    -- dedup_containment dedup_containment_bottomk
run contain_prefix_sf1  target/sf1           SPARK_GRAFT_DENSE_CUTOFF=0    -- dedup_containment dedup_containment_bottomk
run contain_dense_sf1   target/sf1           SPARK_GRAFT_DENSE_CUTOFF=$BIG -- dedup_containment

# Part B: 3-point scaling for the ×10–12 tail
Q="dedup_minhash_lsh dedup_simhash text_pii_redact"
run tail_sf01 /root/testdata/sf0.1 GRAFT_DUMMY=1 -- $Q
run tail_sf03 target/sf03          GRAFT_DUMMY=1 -- $Q
run tail_sf1  target/sf1           GRAFT_DUMMY=1 -- $Q

python3 - <<'EOF'
import json, math, glob, os
out = "target/scaling_r6"
def load(tag):
    with open(f"{out}/{tag}.json") as f:
        return json.load(f)["queries"]
print("\n--- Part A: containment per-branch (sec, min-of-2) ---")
d01, p01 = load("contain_dense_sf01"), load("contain_prefix_sf01")
p1, d1 = load("contain_prefix_sf1"), load("contain_dense_sf1")
for q in ("dedup_containment",):
    print(f"{q}: dense {d01[q]:.2f}->{d1[q]:.2f} (x{d1[q]/d01[q]:.1f})  "
          f"prefix {p01[q]:.2f}->{p1[q]:.2f} (x{p1[q]/p01[q]:.1f})")
q = "dedup_containment_bottomk"
print(f"{q}: {p01[q]:.2f}->{p1[q]:.2f} (x{p1[q]/p01[q]:.1f})")
print("\n--- Part B: 3-point log-log slope (10x rows = sf0.1->sf1) ---")
t01, t03, t1 = load("tail_sf01"), load("tail_sf03"), load("tail_sf1")
import statistics
for q in ("dedup_minhash_lsh", "dedup_simhash", "text_pii_redact"):
    xs = [math.log(1.0), math.log(3.0), math.log(10.0)]
    ys = [math.log(t01[q]), math.log(t03[q]), math.log(t1[q])]
    mx, my = statistics.mean(xs), statistics.mean(ys)
    slope = sum((x-mx)*(y-my) for x, y in zip(xs, ys)) / sum((x-mx)**2 for x in xs)
    print(f"{q}: {t01[q]:.2f} / {t03[q]:.2f} / {t1[q]:.2f} s  exponent={slope:.2f}")
EOF
