#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run graft.Verify
first (sbt "runMain graft.Verify <sfDir> <outDir>"), then this script
compares each query's parquet output against its DuckDB oracle.

Usage: python3 scripts/check.py [sfDir] [outDir]
"""
import json, sys, glob, os, re, subprocess
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

# Sweep mode = a per-oracle timeout is set (GRAFT_ORACLE_TIMEOUT > 0);
# read it early because the default pragmas key off it.
TIMEOUT = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)

con = duckdb.connect()
# GRAFT_DUCKDB_PRAGMAS: semicolon-separated SET statements, overriding the
# defaults below. In SWEEP mode the thread cap is ON BY DEFAULT: the r12
# sf3 triage root-caused both stragglers (graph_kcore OOM ~100 GB,
# dedup_keep_best_quality > 900 s) to DuckDB's per-thread operator buffers
# at 32 threads — `SET threads=8` value-passed both, so heavy sweeps start
# there instead of rediscovering it. Spill goes to ./.tmp (gitignored).
pragmas = os.environ.get("GRAFT_DUCKDB_PRAGMAS")
if pragmas is None and TIMEOUT > 0:
    pragmas = "SET threads=8;SET temp_directory='.tmp'"
    print(f"[check] sweep-mode DuckDB defaults: {pragmas} "
          "(override with GRAFT_DUCKDB_PRAGMAS)")

def apply_pragmas(stmts):
    for stmt in (stmts or "").split(";"):
        if stmt.strip():
            con.execute(stmt)

apply_pragmas(pragmas)

# Per-query pragma overrides, sweep mode only: the global thread cap that
# fixes the OOM-class twins (operator buffers at 32 threads) makes the
# CPU-bound dedup_simhash twin ~4x slower — past the sweep budget. These
# queries get their own settings for THEIR oracle run only (the sweep
# defaults are re-applied right after), so a full-SF sweep passes
# first-try with no isolated-rerun provenance notes (r13 NOTES §6).
QUERY_PRAGMAS = {
    "dedup_simhash": "SET threads=24",  # list-comprehension-heavy, CPU-bound
}

# Sweep-mode ceiling audit: every detcast adjudication carries a numeric
# SF ceiling; sweeping at or above one means the boundedness argument no
# longer holds and a value divergence is EXPECTED, so fail before wasting
# the sweep (the r11 gini class, pre-discovered). SF parsed from the data
# dir name (…/sf3 → 3).
if TIMEOUT > 0:
    m = re.search(r"sf([0-9]*\.?[0-9]+)$", os.path.basename(sf.rstrip("/")))
    if m:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "detcast.py"),
             "--sf", m.group(1)]
            + sorted(glob.glob(f"{repo}/src/main/scala/graft/queries/*.scala")))
        if r.returncode != 0:
            sys.exit(f"[check] detcast ceiling audit FAILED at sf{m.group(1)} "
                     "— an adjudicated bound does not hold at this sweep SF; "
                     "route the oracle or re-adjudicate before sweeping")
    else:
        print(f"[check] WARNING: cannot parse an SF out of '{sf}' — "
              "detcast ceiling audit skipped")
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

# stale/partial-output guard: every oracle query must have a result dir
# (a missing one means Verify crashed on it, or outDir is stale)
missing = [n for n in oracle if not os.path.isdir(f"{out}/{n}")]

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

# Per-oracle wall-clock cap (seconds, set above) for large-SF sweeps: the
# ENGINE result is already on disk — a timeout marks the DuckDB twin as
# infeasible at this SF (reported separately, never a FAIL). 0 = no cap.
import threading
timeouts = []

fails, passes, skips, non_runs = [], [], [], []
for n in missing:
    # In sweep mode a missing result dir is an ENGINE NON-RUN at this SF
    # (resource ceiling or crash — the engine leg never produced output),
    # reported as its own class so downstream fail==0 readers don't treat
    # an infeasible leg as a value divergence. In gate mode it stays a
    # hard FAIL (Verify crashed or the outDir is stale).
    if TIMEOUT > 0:
        non_runs.append((n, "no result directory (engine leg did not run at this SF)"))
    else:
        fails.append((n, "no result directory (Verify failed or stale outDir)"))
for name in sorted(os.listdir(out)):
    d = f"{out}/{name}"
    if not os.path.isdir(d):
        continue
    got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")],
                    ignore_index=True)
    if name not in oracle:
        skips.append((name, len(got)))
        continue
    override = TIMEOUT > 0 and name in QUERY_PRAGMAS
    if override:
        print(f"[check] {name}: per-query pragmas '{QUERY_PRAGMAS[name]}'")
        apply_pragmas(QUERY_PRAGMAS[name])
    try:
        if TIMEOUT > 0:
            res = {}
            def work():
                try:
                    res["df"] = con.sql(oracle[name]).df()
                except Exception as e:
                    res["err"] = e
            th = threading.Thread(target=work, daemon=True)
            th.start()
            th.join(TIMEOUT)
            if th.is_alive():
                con.interrupt()
                th.join(30)
                timeouts.append(name)
                continue
            if "err" in res:
                raise res["err"]
            exp = res["df"]
        else:
            exp = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    finally:
        if override:
            apply_pragmas(pragmas)  # restore the sweep defaults
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        fails.append((name, f"columns differ: got {list(g.columns)} vs oracle {list(e.columns)}"))
        continue
    if len(g) != len(e):
        fails.append((name, f"row count: got {len(g)} vs oracle {len(e)}"))
        continue
    try:
        # check_dtype=True: the driver hashes dtype-sensitively (DuckDB
        # HUGEINT sums arrive as float64 and must be cast in the oracle SQL)
        pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
        passes.append(name)
    except AssertionError as ae:
        # show first differing rows
        diff = (g != e) & ~(g.isna() & e.isna())
        rows = diff.any(axis=1)
        idx = list(g.index[rows])[:3]
        msg = str(ae).splitlines()[0]
        detail = "; ".join(
            f"row {i}: got {g.loc[i].to_dict()} exp {e.loc[i].to_dict()}" for i in idx)
        fails.append((name, f"{msg} | {detail[:500]}"))

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"ROWS-ONLY {len(skips)}: {' '.join(n for n, _ in skips)}")
if TIMEOUT > 0:
    print(f"ORACLE-TIMEOUT {len(timeouts)} (> {TIMEOUT:.0f}s in DuckDB at "
          f"this SF): {' '.join(timeouts)}")
    print(f"NON-RUN {len(non_runs)} (engine leg produced no output at this "
          f"SF): {' '.join(n for n, _ in non_runs)}")
print(f"FAIL {len(fails)}")
for n, m in fails:
    print(f"  {n}: {m}")

# Optional driver-shaped JSON artifact (GRAFT_CHECK_JSON=<path>): one
# entry per query, same keys as CORRECTNESS_r{N}.json, with
# "oracle_timeout" marking an infeasible DuckDB twin at this SF.
if os.environ.get("GRAFT_CHECK_JSON"):
    fail_map = dict(fails)
    entries = {}
    for n in passes:
        entries[n] = {"rows_match": True, "schema_match": True,
                      "hash_match": True, "err": None}
    for n, rows in skips:
        entries[n] = {"rows_match": rows > 0, "schema_match": None,
                      "hash_match": None, "err": None, "rows_only": True}
    for n in timeouts:
        entries[n] = {"rows_match": None, "schema_match": None,
                      "hash_match": None, "err": None, "oracle_timeout": True}
    for n, m in non_runs:
        entries[n] = {"rows_match": None, "schema_match": None,
                      "hash_match": None, "err": m, "err_class": "non_run"}
    for n, m in fails:
        entries[n] = {"rows_match": False, "schema_match": False,
                      "hash_match": False, "err": m}
    with open(os.environ["GRAFT_CHECK_JSON"], "w") as f:
        json.dump({"sf": sf, "oracle_timeout_sec": TIMEOUT or None,
                   "pass": len(passes), "rows_only": len(skips),
                   "oracle_timeout": len(timeouts), "non_run": len(non_runs),
                   "fail": len(fails),
                   "queries": dict(sorted(entries.items()))}, f, indent=1)
sys.exit(1 if fails or non_runs else 0)
