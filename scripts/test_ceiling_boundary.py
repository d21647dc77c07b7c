#!/usr/bin/env python3
"""Falsify the detcast SF ceilings AT THE EDGE (VERDICT r13 task 4,
option B: boundary fixtures instead of an sf30 data slice).

Two claims are machine-checked here:

1. PLACEMENT (measured, not adjudicated): for every SF-scaling ceiling
   owner among the lowest decades — f4 unpivot / f13 zero-fill order
   cents (ceiling 4e4), event cents (1e5), curated-quality 1e6-scale
   (2e5), half-sample xi-cents (1e6) — compute the ACTUAL max per-group
   integer sum the owning query produces on the real sf1 dataset, derive
   implied_ceiling = 2^53 / measured (the sums scale linearly with SF:
   fixed group keys — measure names, order statuses x a fixed date span,
   event types, the corpus-wide quality gate), and assert the ALLOW
   table's ceiling is (a) SAFE: ceiling <= implied (no swept SF below
   the ceiling can cross 2^53) and (b) HONEST: ceiling >= implied/30
   (not hiding more than ~a decade of slack).

2. EDGE BEHAVIOR (synthetic at-boundary fixtures): what actually breaks
   first past 2^53, demonstrated concretely in DuckDB through the exact
   oracle SQL shape `sum(CAST(floor(value*100+0.5) AS BIGINT)) / 1e2`:
   - at S = 2^53 the reported total is still EXACT cents;
   - at S = 2^53 + 1 the double can no longer represent the sum — two
     DIFFERENT exact sums report the SAME total (the silent value-class
     divergence the ceilings exist to keep out of sweeps);
   - DuckDB's direct HUGEINT->DOUBLE stays correctly rounded while the
     value fits one 64-bit limb (so between 2^53 and 2^64 the two
     engine legs still AGREE bit-for-bit — on the wrong-by-exactness
     value), and goes 1 ulp off the correctly-rounded result past
     2^64 (10^23 + 3, the detcast docstring's witness), where only the
     string route survives.

Exit 0 = every ceiling placed right and the edge behaves as documented.
"""
import sys
import duckdb

con = duckdb.connect()
TWO53 = 2 ** 53
fails = []


def check(name, cond, detail):
    tag = "ok" if cond else "FAIL"
    print(f"[{tag}] {name}: {detail}")
    if not cond:
        fails.append(name)


# ---------------------------------------------------------------------
# 1. measured ceiling placement on the real sf1 dataset
# ---------------------------------------------------------------------
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"

def rp(t):
    return f"read_parquet('{SF1}/{t}.parquet')"

# (ceiling in ALLOW, owner, max per-group bigint sum at sf1 — the exact
# grouping of the owning query)
placements = [
    (2.5e2, "f4_unpivot order/lineitem cents (RelationalQueries)",
     f"""SELECT max(s) FROM (
           SELECT sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s
           FROM (SELECT l_quantity AS value FROM {rp('lineitem')}
                 UNION ALL SELECT l_extendedprice FROM {rp('lineitem')}
                 UNION ALL SELECT l_discount FROM {rp('lineitem')}
                 UNION ALL SELECT l_tax FROM {rp('lineitem')})
           GROUP BY ALL)"""),
    (4e4, "f13_zero_fill per (date,status) order cents",
     f"""SELECT max(s) FROM (
           SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS s
           FROM {rp('orders')} GROUP BY CAST(o_orderdate AS DATE), o_orderstatus)"""),
    (1e5, "event cents per event_type (EventQueries)",
     f"""SELECT max(s) FROM (
           SELECT sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s
           FROM {rp('events')} GROUP BY event_type)"""),
    (2e5, "curated-corpus 1e6-scaled quality (DedupQueries)",
     f"""SELECT sum(CAST(floor((length(text) / 600.0) * 1e6 + 0.5) AS BIGINT))
         FROM {rp('documents')}"""),
]
for ceiling, owner, sql in placements:
    measured = con.sql(sql).fetchone()[0]
    implied = TWO53 / measured
    # f13's date grid is FIXED-span, so per-group mass grows linearly in
    # SF, same as the others; all four are linear extrapolations.
    # SAFETY is the hard gate (no swept SF below the ceiling may cross
    # 2^53); over-conservatism only warns — it wastes sweeps, not values.
    check(f"placement[{owner}]", ceiling <= implied,
          f"sf1 max group sum {measured:,} -> implied ceiling sf{implied:,.0f}, "
          f"ALLOW table says sf{ceiling:,.0f}")
    if ceiling < implied / 30:
        print(f"  [warn] {owner}: ceiling sf{ceiling:,.0f} is >30x more "
              f"conservative than measured (implied sf{implied:,.0f})")

# ---------------------------------------------------------------------
# 2. edge behavior at 2^53 through the oracle SQL shape
# ---------------------------------------------------------------------
def cents_total(target_sum):
    """Run the exact oracle fragment over a fixture whose cents sum to
    target_sum: (target_sum - 3) in one big row + 3 one-cent rows."""
    con.execute("CREATE OR REPLACE TABLE fx AS " +
                f"SELECT ({target_sum} - 3) / 100.0 AS value " +
                "UNION ALL SELECT 0.01 FROM range(3)")
    return con.sql("SELECT sum(CAST(floor(value * 100 + 0.5) AS BIGINT))"
                   " / 1e2 FROM fx").fetchone()[0]

# hold the big-row value exactly representable: (2^53 - 3) / 100 is not a
# double-exact operation, so build the sum from an integer-cents column
def cents_total_int(target_sum):
    con.execute("CREATE OR REPLACE TABLE fx AS "
                f"SELECT CAST({target_sum} - 3 AS BIGINT) AS c "
                "UNION ALL SELECT 1 FROM range(3)")
    return con.sql("SELECT sum(c) / 1e2 FROM fx").fetchone()[0]

at_edge = cents_total_int(TWO53)
check("edge[2^53 exact]", at_edge == TWO53 / 100.0,
      f"sum 2^53 reports {at_edge!r} (exact cents)")
over1 = cents_total_int(TWO53 + 1)
over2 = cents_total_int(TWO53 + 2)
check("edge[2^53+1 silently collapses]",
      over1 == at_edge and over2 != over1,
      f"sums 2^53 and 2^53+1 both report {over1!r} — two different exact "
      f"totals, one reported value (2^53+2 -> {over2!r})")

# single-limb HUGEINT->DOUBLE stays correctly rounded (so both engine
# legs AGREE between 2^53 and 2^64 — on the exactness-degraded value)...
probe = TWO53 * 1023 + 7  # ~9.2e18, still < 2^64
direct, routed = con.sql(
    f"SELECT CAST(h AS DOUBLE), CAST(CAST(h AS VARCHAR) AS DOUBLE) "
    f"FROM (SELECT CAST({probe} AS HUGEINT) AS h)").fetchone()
check("edge[single-limb hugeint conversion correctly rounded]",
      direct == routed == float(probe),
      f"{probe}: direct {direct!r} routed {routed!r} python {float(probe)!r}")
# ...and goes 1 ulp wrong past 2^64 (the detcast witness), where only
# the string route matches the correctly-rounded value
witness = 10 ** 23 + 3
direct, routed = con.sql(
    f"SELECT CAST(h AS DOUBLE), CAST(CAST(h AS VARCHAR) AS DOUBLE) "
    f"FROM (SELECT CAST({witness} AS HUGEINT) AS h)").fetchone()
check("edge[two-limb hugeint conversion diverges 1 ulp]",
      routed == float(witness) and direct != routed,
      f"10^23+3: direct {direct!r} vs routed/python {routed!r}")

print(f"\n{'PASS' if not fails else 'FAIL'} "
      f"({len(placements) + 4 - len(fails)} checks green)")
sys.exit(1 if fails else 0)
