#!/bin/bash
# Round-13 stretch (VERDICT r12 task 7): sf10 ceiling-adjacent spot-sweep.
#
# The detcast adjudication ceilings predict every routed/allowed class is
# value-safe far beyond sf10 (the lowest ceiling is the o_totalprice-cents
# class at ~sf4e4, and the r12 implicit-conversion work moved the q7/q8
# long-wrap to ~sf4e3). This probe value-checks the 25 queries that OWN
# ceiling-adjacent sites — money-cent sums (f13/f4/events_*), the
# half-sample and CUSUM xi-sums, the curated-corpus quality sum,
# gini/AUC/lift, the int128 revenue family, and the dedup/CC tails — at
# sf10, where those predictions are cheapest to falsify.
#
# Usage: bash scripts/sf10_probe.sh   (writes CORRECTNESS_sf10_spot.json)
set -eu
cd "$(dirname "$0")/.."

SF=target/sf10
OUT=target/verify_sf10
# gate on the completion sentinel, not the directory: a partially-written
# target/sf10 from a killed generator run would otherwise silently
# value-check against truncated data
if [ ! -f "$SF/.complete" ]; then
  rm -rf "$SF"
  python3 scripts/gen_sf1.py /root/testdata/sf0.1 "$SF" 100
  touch "$SF/.complete"
fi

PROBE="f13_zero_fill_grid events_tumbling_hourly events_session_windows \
events_last_touch_attribution f4_unpivot_measures pipeline_curated_corpus \
stats_cusum_changepoint stats_halfsample_ci events_rfm_segments \
q1_pricing_summary q3_top_revenue_orders q5_region_revenue \
q6_forecast_revenue_sql q18_large_volume_customers rollup_revenue \
cube_order_priority q7_nation_volume q8_market_share stats_gini_revenue \
stats_auc_quality stats_lift_deciles dedup_exact dedup_components \
dedup_cluster_sizes dedup_keep_best_quality"

env SPARK_GRAFT_CPUS=24 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Verify $SF $OUT $PROBE"

# sweep mode: per-oracle timeout on, which also turns on the DuckDB
# thread-cap defaults and the detcast ceiling audit at sf10. 3600 s cap:
# the exact-CC trio's naive twins (post squared, grouped by pair) are the
# heaviest legs at ~13 min each at threads=16 (r14 measured)
env GRAFT_ORACLE_TIMEOUT=3600 GRAFT_CHECK_JSON=CORRECTNESS_sf10_spot.json \
  GRAFT_DUCKDB_PRAGMAS="SET threads=16;SET temp_directory='target/.duck_tmp'" \
  python3 scripts/check.py "$SF" "$OUT"
