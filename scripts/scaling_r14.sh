#!/bin/bash
# Round-14 scaling evidence: 3-point log-log fit for the exact-CC chain
# (dedup_components — PPJoin candidate gen + blocked cogroup verify + CC)
# and the verify-rewrite flagship dedup_ppjoin_jaccard, at sf1/sf3/sf10.
# r13's one-box ceiling was the attach-join verify's ~150 GB wide sort at
# sf10; the demand-driven cogroup verify should make the sf10 leg finite
# and the fit report how far from linear the (quadratic-candidate) chain
# runs on this fixed-vocabulary corpus.
#
# The committed SCALING_r14.json is MACHINE-PRODUCED by the Python block
# below (git_head embedded, sf axis recorded exactly as run) — ADVICE r13
# flagged the hand-assembled r13 artifact's transcription drift.
#
# Usage: bash scripts/scaling_r14.sh   (writes SCALING_r14.json)
set -eu
cd "$(dirname "$0")/.."
OUT=target/scaling_r14
mkdir -p "$OUT"

Q="dedup_components dedup_ppjoin_jaccard"

run() { # run <tag> <sfdir>
  local tag=$1 sfdir=$2
  echo "=== $tag ==="
  # SPARK_DRIVER_MEM=48g: the sf10 leg (500k docs, 354M candidate pairs
  # through the cogroup verify) GC-thrashes for hours at the 8g default —
  # same heap the sf10/sf30 probes use.
  # GRAFT_BENCH_PASSES=1 on EVERY leg: min-of-2 doubles a multi-minute
  # sf10 query for noise-shedding the duration no longer justifies, and
  # a fit needs the same pass protocol on all three points of the axis.
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_BENCH_OUT="$OUT/$tag.full.json" \
    SPARK_DRIVER_MEM=48g GRAFT_BENCH_PASSES=1 \
    sbt -batch "runMain graft.Bench $Q" 2>&1 \
    | grep -oE '\{"metric".*\}' | tail -n1 > "$OUT/$tag.json"
  [ -s "$OUT/$tag.json" ] || { echo "leg $tag produced no metric line" >&2; exit 1; }
  cat "$OUT/$tag.json"
}

run r14_sf1  target/sf1
run r14_sf3  target/sf3
run r14_sf10 target/sf10

python3 - <<'PYEOF'
import json, math, statistics, subprocess
out = "target/scaling_r14"
sfs = [("r14_sf1", 1.0), ("r14_sf3", 3.0), ("r14_sf10", 10.0)]
legs = []
passes = None
for tag, sf in sfs:
    with open(f"{out}/{tag}.json") as f:
        leg = json.load(f)
    legs.append((sf, leg["queries"]))
    passes = leg.get("passes", passes)
git_head = subprocess.run(["git", "rev-parse", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
fits = {}
print("\n--- 3-point log-log fits (sf1 / sf3 / sf10) ---")
for q in sorted(legs[0][1]):
    xs = [math.log(s) for s, _ in legs]
    ys = [math.log(t[q]) for _, t in legs]
    mx, my = statistics.mean(xs), statistics.mean(ys)
    slope = sum((x-mx)*(y-my) for x, y in zip(xs, ys)) / sum((x-mx)**2 for x in xs)
    tail = (ys[2]-ys[1]) / (xs[2]-xs[1])
    fits[q] = {"sec": {str(s): t[q] for s, t in legs},
               "exponent": round(slope, 3),
               "tail_sf3_to_sf10": round(tail, 3)}
    ts = " / ".join(f"{t[q]:.2f}" for _, t in legs)
    print(f"{q}: {ts} s  exponent={slope:.2f} tail(sf3->sf10)={tail:.2f}")
with open("SCALING_r14.json", "w") as f:
    json.dump({"metric": "scaling_fit_r14",
               "sf_axis": [sf for _, sf in sfs], "passes": passes,
               "queries": fits, "git_head": git_head}, f, indent=1)
print("\nwrote SCALING_r14.json (machine-produced)")
PYEOF
