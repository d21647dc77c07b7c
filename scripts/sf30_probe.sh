#!/bin/bash
# Round-14 stretch (VERDICT r13 task 4, option A): sf30 ceiling-decade
# slice — value-check the money-cent ceiling OWNERS at 3x the largest
# prior sweep, one decade below the lowest re-adjudicated ceiling.
#
# Round 14's boundary check (scripts/test_ceiling_boundary.py) measured
# the f4-unpivot cents sum at 3.18e13 per sf1 and re-adjudicated its
# ceiling from the mis-sized sf1e5 down to sf2.5e2. sf30 probes that
# entry's REAL dataset behavior ~8x below the re-derived edge (measured
# max sum ~9.5e14 at sf30 vs 2^53~9.0e15), plus the o_totalprice-cents
# (sf4e4) and event-cents (sf1e5) classes and the int128 revenue family.
# The exact-CC/dedup tails are excluded: their naive DuckDB twins are
# candidate-quadratic (~13 min at sf10 -> multi-hour at sf30), and their
# values were cleared at sf10 by the trio sweep; the decade probe here
# targets the ARITHMETIC ceilings, which live in the cents/revenue sums.
#
# Usage: bash scripts/sf30_probe.sh   (writes CORRECTNESS_sf30_spot.json)
set -eu
cd "$(dirname "$0")/.."

SF=target/sf30
OUT=target/verify_sf30
# gate on the completion sentinel, not the directory (ADVICE r13)
if [ ! -f "$SF/.complete" ]; then
  rm -rf "$SF"
  python3 scripts/gen_sf1.py /root/testdata/sf0.1 "$SF" 300
  touch "$SF/.complete"
fi

PROBE="f13_zero_fill_grid f4_unpivot_measures events_tumbling_hourly \
events_session_windows events_last_touch_attribution q1_pricing_summary \
q3_top_revenue_orders q5_region_revenue q6_forecast_revenue_sql \
q18_large_volume_customers rollup_revenue cube_order_priority \
q7_nation_volume q8_market_share stats_gini_revenue stats_lift_deciles \
stats_cusum_changepoint stats_halfsample_ci events_rfm_segments"

env SPARK_GRAFT_CPUS=24 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Verify $SF $OUT $PROBE"

# sweep mode: threads=16 matches the sf10 probe (no OOM-class twins in
# this cents/revenue slice; the thread cap exists for operator-buffer
# heavy dedup twins, which are excluded here)
env GRAFT_ORACLE_TIMEOUT=3600 GRAFT_CHECK_JSON=CORRECTNESS_sf30_spot.json \
  GRAFT_DUCKDB_PRAGMAS="SET threads=16;SET temp_directory='target/.duck_tmp'" \
  python3 scripts/check.py "$SF" "$OUT"
