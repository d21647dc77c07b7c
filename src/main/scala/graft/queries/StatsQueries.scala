package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{ProfileOps, TextOps}

/** Statistical / multi-dimensional aggregation coverage: grouping sets
  * (rollup), dispersion aggregates, exact percentiles, data profiling,
  * and the HLL sketch (rows-only — approx values are engine-specific).
  */
object StatsQueries {

  private val rollupQ = Q(
    "rollup_revenue",
    (s, dir) => {
      import s.implicits._
      val tt = Tables(s, dir)
      tt.orders
        .join(tt.customer, $"o_custkey" === $"c_custkey")
        .rollup($"c_mktsegment", $"o_orderstatus")
        .agg(round(sum($"o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n"))
        .select(coalesce($"c_mktsegment", lit("ALL")).as("segment"),
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          $"revenue", $"n")
        .orderBy($"segment", $"status")
    },
    Some("""SELECT coalesce(c_mktsegment, 'ALL') AS segment,
           |       coalesce(o_orderstatus, 'ALL') AS status,
           |       round(sum(o_totalprice), 2) AS revenue, count(*) AS n
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
           |ORDER BY segment, status""".stripMargin))

  private val dispersion = Q(
    "stats_dispersion",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_extendedprice"), 4).as("sd_price"),
          round(var_samp($"l_extendedprice"), 4).as("var_price"),
          round(min($"l_extendedprice"), 2).as("min_price"),
          round(max($"l_extendedprice"), 2).as("max_price"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |       round(stddev_samp(l_extendedprice), 4) AS sd_price,
           |       round(var_samp(l_extendedprice), 4) AS var_price,
           |       round(min(l_extendedprice), 2) AS min_price,
           |       round(max(l_extendedprice), 2) AS max_price
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  private val percentiles = Q(
    "stats_percentiles",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir).orders
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
        .orderBy($"o_orderstatus")
    },
    Some("""SELECT o_orderstatus,
           |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90
           |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  private val profileQ = Q(
    "profile_documents",
    (s, dir) => ProfileOps.profileLong(Tables(s, dir).documents,
        Seq("doc_id", "lang", "source", "n_chars"))
      .orderBy("column"),
    Some("""SELECT * FROM (
           |  SELECT 'doc_id' AS "column", sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS nulls,
           |         count(DISTINCT doc_id) AS n_distinct,
           |         min(doc_id)::VARCHAR AS min, max(doc_id)::VARCHAR AS max FROM documents
           |  UNION ALL
           |  SELECT 'lang', sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END),
           |         count(DISTINCT lang), min(lang), max(lang) FROM documents
           |  UNION ALL
           |  SELECT 'source', sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
           |         count(DISTINCT source), min(source), max(source) FROM documents
           |  UNION ALL
           |  SELECT 'n_chars', sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END),
           |         count(DISTINCT n_chars), min(n_chars)::VARCHAR, max(n_chars)::VARCHAR
           |  FROM documents)
           |ORDER BY "column"""".stripMargin))

  /** HLL++ distinct-token sketch per language — approx values differ
    * across engines by design, so NO oracle (driver records the weaker
    * rows-only check); the spec bounds the relative error instead. */
  private val sketch = Q(
    "text_token_sketch",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir).documents
        .select($"lang", explode(TextOps.tokens($"text")).as("token"))
        .groupBy($"lang")
        .agg(approx_count_distinct($"token", 0.05).as("approx_distinct_tokens"),
          count(lit(1)).as("n_tokens"))
        .orderBy($"lang")
    },
    None)

  def all: Seq[Q] = Seq(rollupQ, dispersion, percentiles, profileQ, sketch)
}
