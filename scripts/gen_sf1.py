#!/usr/bin/env python3
"""Dev-only sf1 generator for the headroom bench (VERDICT r3 task 9).

Scales sf0.1 10x by key-shifted replication: every fact/dim key is
offset by copy*stride so referential joins stay consistent, and each
copy's document tokens get a per-copy suffix so the corpus is 10x
DISTINCT text (a bigger corpus with the same duplication rate), not ten
byte-identical clones that would artificially inflate dedup buckets.
region/nation stay single-copy (true dims). Output schemas match
TESTDATA.md exactly. This is a driver-side tool, not library code.

Usage: python3 scripts/gen_sf1.py [src=/root/testdata/sf0.1] [dst=target/sf1]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
K = 1_000_000          # key stride per copy
KBIG = 10_000_000      # orderkey/event_id stride (they exceed 1M at sf>=1)
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()
con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS i")


def gen(table, select):
    con.execute(
        f"COPY (SELECT {select} "
        f"FROM read_parquet('{SRC}/{table}.parquet') CROSS JOIN copies "
        f") TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n}")


import os
os.makedirs(DST, exist_ok=True)

# true dims: single copy
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

gen("customer",
    f"c_custkey + i*{K} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
gen("supplier",
    f"s_suppkey + i*{K} AS s_suppkey, s_name, s_nationkey, s_acctbal")
gen("part",
    f"p_partkey + i*{K} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
gen("orders",
    f"o_orderkey + i*{KBIG} AS o_orderkey, o_custkey + i*{K} AS o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
gen("lineitem",
    f"l_orderkey + i*{KBIG} AS l_orderkey, l_partkey + i*{K} AS l_partkey, "
    f"l_suppkey + i*{K} AS l_suppkey, l_linenumber, l_quantity, "
    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
gen("events",
    f"event_id + i*{KBIG} AS event_id, ts, user_id + i*{K} AS user_id, "
    "event_type, value, props")
# per-copy token suffix keeps copies textually disjoint; n_chars re-derived
gen("documents",
    f"doc_id + i*{K} AS doc_id, "
    "CASE WHEN i = 0 THEN text ELSE array_to_string("
    "  list_transform(string_split(text, ' '), t -> t || 'x' || i::VARCHAR), ' ') "
    "END AS text, lang, source, "
    "length(CASE WHEN i = 0 THEN text ELSE array_to_string("
    "  list_transform(string_split(text, ' '), t -> t || 'x' || i::VARCHAR), ' ') "
    "END)::INT AS n_chars")
gen("embeddings",
    f"vec_id + i*{K} AS vec_id, embedding, label")
