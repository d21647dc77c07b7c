package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.core.Lineage.LineageOps
import graft.functions.Sum128.sum128
import graft.functions.SumSq128.sumSq128
import graft.functions.SumProd128.sumProd128
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
        .agg((sum(floor($"o_totalprice" * 100 + 0.5)) / 1e2).as("revenue"),
          count(lit(1)).as("n"))
        .select(coalesce($"c_mktsegment", lit("ALL")).as("segment"),
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          $"revenue", $"n")
        .orderBy($"segment", $"status")
    },
    Some("""SELECT coalesce(c_mktsegment, 'ALL') AS segment,
           |       coalesce(o_orderstatus, 'ALL') AS status,
           |       (CAST(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS STRING) AS DOUBLE) / 1e2) AS revenue, count(*) AS n
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
           |ORDER BY segment, status""".stripMargin),
    // exactness-rewrite cost pinned: 1.5x rerun trigger (NOTES_r10 §1)
    headline = true)

  private val dispersion = Q(
    "stats_dispersion",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(
          // exact integer moments in cents: n*Sum(c^2) - Sum(c)^2 via the
          // native 128-bit kernels (sumsq128 squares INSIDE the kernel in
          // 128-bit, so c^2 never rides a wrapping long multiply), then
          // ONE identical IEEE /-sqrt chain per engine
          (count(lit(1)).cast("decimal(38,0)") *
            sumSq128(floor($"l_extendedprice" * 100 + 0.5)) -
            sum128(floor($"l_extendedprice" * 100 + 0.5)) *
            sum128(floor($"l_extendedprice" * 100 + 0.5)))
            .cast("double").as("a"),
          count(lit(1)).as("cnt"),
          (floor((min($"l_extendedprice")) * 1e2 + 0.5) / 1e2).as("min_price"),
          (floor((max($"l_extendedprice")) * 1e2 + 0.5) / 1e2).as("max_price"))
        .select($"l_returnflag",
          (floor(sqrt($"a" / ($"cnt" * ($"cnt" - 1)) / 1e4) * 1e4 + 0.5) / 1e4)
            .as("sd_price"),
          (floor($"a" / ($"cnt" * ($"cnt" - 1)) / 1e4 * 1e4 + 0.5) / 1e4)
            .as("var_price"),
          $"min_price", $"max_price")
        .orderBy($"l_returnflag")
    },
    Some("""WITH c AS (SELECT l_returnflag,
           |             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c2,
           |             l_extendedprice
           |           FROM lineitem),
           |mo AS (SELECT l_returnflag,
           |         CAST(CAST(count(*) * sum(c2::HUGEINT * c2)
           |              - sum(c2) * sum(c2) AS STRING) AS DOUBLE) AS a,
           |         count(*) AS cnt,
           |         (floor((min(l_extendedprice)) * 1e2 + 0.5) / 1e2) AS min_price,
           |         (floor((max(l_extendedprice)) * 1e2 + 0.5) / 1e2) AS max_price
           |       FROM c GROUP BY l_returnflag)
           |SELECT l_returnflag,
           |       (floor(sqrt(a / (cnt * (cnt - 1)) / 1e4) * 1e4 + 0.5) / 1e4) AS sd_price,
           |       (floor(a / (cnt * (cnt - 1)) / 1e4 * 1e4 + 0.5) / 1e4) AS var_price,
           |       min_price, max_price
           |FROM mo ORDER BY l_returnflag""".stripMargin),
    // exactness-rewrite cost pinned: 1.5x rerun trigger (NOTES_r10 §1)
    headline = true)

  /** Exact interpolated percentiles via the `percentile` aggregate — the
    * MEASURED-cheapest exact form at every tested SF (ClawbackAB,
    * min-of-3, one JVM: aggregate 1.06 s vs the r14-draft rewrite's
    * 1.32 s at sf0.1; it also wins at sf1/sf10 because this corpus's
    * distinct-value count does not grow with SF, so the aggregate's
    * value→count maps stay bounded). The r13 watch-list 5.4× vs the
    * first 79-query-era baseline is host/suite context, not plan: the
    * aggregate form itself measures ~1 s isolated on the r14 box.
    * The aggregate's real ceiling is cardinality — its final merge
    * sorts a whole group's distinct values in ONE task — and past ~10⁷
    * distinct per group the deployed path is
    * [[ProfileOps.exactPercentiles]] (distributed-prefix ranks,
    * bit-identical output, PropertySpec percentile identity). */
  private val percentiles = Q(
    "stats_percentiles",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir).orders
        .groupBy($"o_orderstatus")
        .agg(expr("percentile(o_totalprice, 0.5)").as("p50_raw"),
             expr("percentile(o_totalprice, 0.9)").as("p90_raw"))
        .select($"o_orderstatus",
          (floor($"p50_raw" * 1e4 + 0.5) / 1e4).as("p50"),
          (floor($"p90_raw" * 1e4 + 0.5) / 1e4).as("p90"))
        .orderBy($"o_orderstatus")
    },
    Some("""SELECT o_orderstatus,
           |       (floor((quantile_cont(o_totalprice, 0.5)) * 1e4 + 0.5) / 1e4) AS p50,
           |       (floor((quantile_cont(o_totalprice, 0.9)) * 1e4 + 0.5) / 1e4) AS p90
           |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  private val profileQ = Q(
    "profile_documents",
    (s, dir) => ProfileOps.profileLong(Tables(s, dir).documents,
        Seq("doc_id", "lang", "source", "n_chars"))
      .orderBy("column"),
    Some("""SELECT * FROM (
           |  SELECT 'doc_id' AS "column", sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls,
           |         count(DISTINCT doc_id) AS n_distinct,
           |         min(doc_id)::VARCHAR AS min, max(doc_id)::VARCHAR AS max FROM documents
           |  UNION ALL
           |  SELECT 'lang', sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT,
           |         count(DISTINCT lang), min(lang), max(lang) FROM documents
           |  UNION ALL
           |  SELECT 'source', sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT,
           |         count(DISTINCT source), min(source), max(source) FROM documents
           |  UNION ALL
           |  SELECT 'n_chars', sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT,
           |         count(DISTINCT n_chars), min(n_chars)::VARCHAR, max(n_chars)::VARCHAR
           |  FROM documents)
           |ORDER BY "column"""".stripMargin))

  /** HLL++ distinct-token sketch per language. Approx values differ
    * across engines by design, so the raw sketch value can't be oracled —
    * instead the query emits the INVARIANT as data: the exact
    * count(distinct) (hash-checkable) and a boolean asserting the HLL
    * estimate is within 15% (= 3× the requested 5% rsd) of it, computed
    * in the same Spark plan. The DuckDB twin recomputes the exact count
    * and emits literal `true` — a hash match proves the bound held. */
  private val sketch = Q(
    "text_token_sketch",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir).documents
        .select($"lang", explode(TextOps.tokens($"text")).as("token"))
        .groupBy($"lang")
        .agg(
          approx_count_distinct($"token", 0.05).as("approx_d"),
          countDistinct($"token").as("exact_distinct_tokens"),
          count(lit(1)).as("n_tokens"))
        .select($"lang", $"exact_distinct_tokens",
          (abs($"approx_d" - $"exact_distinct_tokens").cast("double") /
            $"exact_distinct_tokens" <= 0.15).as("within_bound"),
          $"n_tokens")
        .orderBy($"lang")
    },
    Some("""SELECT lang,
           |       count(DISTINCT token)::BIGINT AS exact_distinct_tokens,
           |       true AS within_bound,
           |       count(*)::BIGINT AS n_tokens
           |FROM (SELECT lang, unnest(string_split(text,' ')) AS token
           |      FROM documents)
           |GROUP BY lang ORDER BY lang""".stripMargin))

  /** Approx percentiles — the 100 TB quantile path: `approx_percentile`
    * is a MERGEABLE rank sketch (map-side partials combine in bounded
    * memory), where exact `percentile` buffers every value per group.
    * Approx values are engine-specific by design, so the query emits the
    * INVARIANT as data: the exact rank of each estimate, counted with a
    * constant-memory conditional sum on a second scan, must lie within
    * ±0.05 quantile of its target (accuracy=1000 bounds rank error at
    * n/1000 per group — 50× inside the window). `rank(estimate) ∈
    * [0.45n, 0.55n]` is exactly "estimate between the exact p45/p55
    * values", proven with NO exact-percentile buffer anywhere in the plan.
    * The DuckDB twin emits literal `true` plus the (hash-checkable) group
    * count — a hash match proves the rank bound held. */
  private val approxPct = Q(
    "stats_approx_percentiles",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir).orders.select($"o_orderstatus", $"o_totalprice")
      // both estimates from ONE sketch (array percentage), broadcast back
      // into the rank-counting scan
      val est = o.groupBy($"o_orderstatus")
        .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.9), 1000)")
          .as("e"))
        .select($"o_orderstatus",
          element_at($"e", 1).as("p50a"), element_at($"e", 2).as("p90a"))
      o.join(broadcast(est), "o_orderstatus")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(when($"o_totalprice" <= $"p50a", 1L).otherwise(0L)).as("r50"),
          sum(when($"o_totalprice" <= $"p90a", 1L).otherwise(0L)).as("r90"))
        .select($"o_orderstatus",
          ($"r50" >= $"n" * 0.45 && $"r50" <= $"n" * 0.55).as("p50_in_bounds"),
          ($"r90" >= $"n" * 0.85 && $"r90" <= $"n" * 0.95).as("p90_in_bounds"),
          $"n")
        .orderBy($"o_orderstatus")
    },
    Some("""SELECT o_orderstatus,
           |       true AS p50_in_bounds, true AS p90_in_bounds,
           |       count(*) AS n
           |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  private val cubeQ = Q(
    "cube_order_priority",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir).orders
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"), $"n")
        .orderBy($"status", $"priority")
    },
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
           |       coalesce(o_orderpriority, 'ALL') AS priority,
           |       count(*) AS n
           |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
           |ORDER BY status, priority""".stripMargin),
    // exactness-rewrite cost pinned: 1.5x rerun trigger (NOTES_r10 §1)
    headline = true)

  /** Explicit GROUPING SETS (beyond rollup/cube): chosen set list with
    * grouping_id disambiguating which dimensions are aggregated-out —
    * NULL-valued dims vs 'ALL' rows are distinguishable only via the id. */
  private val groupingSets = Q(
    "groupingsets_revenue",
    (s, dir) => {
      val tt = Tables(s, dir)
      tt.orders.join(tt.customer, col("o_custkey") === col("c_custkey"))
        .createOrReplaceTempView("ord_cust_gs")
      s.sql("""SELECT coalesce(c_mktsegment, 'ALL') AS segment,
              |       coalesce(o_orderpriority, 'ALL') AS priority,
              |       CAST(grouping_id(c_mktsegment, o_orderpriority) AS INT)
              |         AS gid,
              |       (CAST(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS STRING) AS DOUBLE) / 1e2) AS revenue, count(*) AS n
              |FROM ord_cust_gs
              |GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority),
              |                        (c_mktsegment), ())
              |ORDER BY gid, segment, priority""".stripMargin)
    },
    Some("""SELECT coalesce(c_mktsegment, 'ALL') AS segment,
           |       coalesce(o_orderpriority, 'ALL') AS priority,
           |       grouping_id(c_mktsegment, o_orderpriority)::INT AS gid,
           |       (CAST(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS STRING) AS DOUBLE) / 1e2) AS revenue, count(*) AS n
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority),
           |                        (c_mktsegment), ())
           |ORDER BY gid, segment, priority""".stripMargin))

  /** Rank-family windows: quartile bucket (ntile) + percent_rank of each
    * customer's balance within its market segment. */
  private val ntileQ = Q(
    "window_ntile_percent_rank",
    (s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
      Tables(s, dir).customer
        .select($"c_mktsegment", $"c_custkey",
          (floor(($"c_acctbal") * 1e2 + 0.5) / 1e2).as("acctbal"),
          ntile(4).over(w).as("quartile"),
          (floor((percent_rank().over(w)) * 1e6 + 0.5) / 1e6).as("pct_rank"))
        .orderBy($"c_mktsegment", $"c_custkey")
    },
    Some("""SELECT c_mktsegment, c_custkey, (floor((c_acctbal) * 1e2 + 0.5) / 1e2) AS acctbal,
           |       (ntile(4) OVER w)::INT AS quartile,
           |       (floor((percent_rank() OVER w) * 1e6 + 0.5) / 1e6) AS pct_rank
           |FROM customer
           |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
           |ORDER BY c_mktsegment, c_custkey""".stripMargin))

  /** RANGE-frame window: per-user trailing-1-hour event-value sum, frame
    * defined on the time axis (not row counts) — every event in the
    * preceding hour contributes regardless of how many there are. */
  private val rangeFrame = Q(
    "window_range_frame",
    (s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables(s, dir).events
        .withColumn("trailing_1h_sum",
          (sum(floor($"value" * 100 + 0.5)).over(w) / 1e2))
        .select($"event_id", $"user_id", $"trailing_1h_sum")
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id,
           |       (sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER
           |         (PARTITION BY user_id ORDER BY epoch_us(ts)
           |          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) / 1e2)
           |         AS trailing_1h_sum
           |FROM events ORDER BY event_id""".stripMargin),
    // exactness-rewrite cost pinned: 1.5x rerun trigger (NOTES_r10 §1)
    headline = true)

  /** Equal-width histogram with data-driven bounds: the (min, max) row is
    * a one-row aggregate broadcast-cross-joined into the binning scan (no
    * driver collect), bin = floor((x−min)/width) clamped to the last bin.
    * `floor()` explicitly on both sides — Spark's double→int cast
    * truncates while DuckDB's rounds, so the cast form would diverge. */
  private val histogram = Q(
    "stats_histogram",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir).orders
      val bounds = o.agg(min($"o_totalprice").as("lo"),
        max($"o_totalprice").as("hi"))
      o.crossJoin(broadcast(bounds))
        .withColumn("bin",
          least(floor(($"o_totalprice" - $"lo") / (($"hi" - $"lo") / 20.0)),
            lit(19.0)).cast("long"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"),
          (floor((min($"o_totalprice")) * 1e2 + 0.5) / 1e2).as("bin_min"),
          (floor((max($"o_totalprice")) * 1e2 + 0.5) / 1e2).as("bin_max"))
        .orderBy($"bin")
    },
    Some("""WITH b AS (SELECT min(o_totalprice) lo, max(o_totalprice) hi
           |           FROM orders)
           |SELECT least(floor((o_totalprice - lo) / ((hi - lo) / 20.0)),
           |             19.0)::BIGINT AS bin,
           |       count(*) AS n,
           |       (floor((min(o_totalprice)) * 1e2 + 0.5) / 1e2) AS bin_min,
           |       (floor((max(o_totalprice)) * 1e2 + 0.5) / 1e2) AS bin_max
           |FROM orders, b GROUP BY bin ORDER BY bin""".stripMargin))

  /** Pearson correlation + sample covariance per group — the classic
    * two-column association stats, both mergeable co-moment aggregates
    * (map-side partials combine, same posture as stddev/var). Rounded at
    * 4dp like the dispersion query: co-moment accumulation order differs
    * across engines at ~1e-10 relative, far inside the rounding. */
  private val correlation = Q(
    "stats_correlation",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir).lineitem
        // exact integer co-moments (corr is scale-invariant, so cents in
        // place of currency change nothing; covar rescales by /100) —
        // the only floats are one identical IEEE chain per engine
        .select($"l_returnflag",
          floor($"l_quantity").as("qi"),
          floor($"l_extendedprice" * 100 + 0.5).as("pi"),
          floor($"l_discount" * 100 + 0.5).as("di"),
          floor($"l_tax" * 100 + 0.5).as("ti"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum128($"qi").as("sq"),
          sum128($"pi").as("sp"),
          sum128($"di").as("sd"),
          sum128($"ti").as("st"),
          // cross/second moments through the exact-128-bit-product
          // kernels: no per-row product can wrap a long, at any SF
          sumProd128($"qi", $"pi").as("sqp"),
          sumSq128($"qi").as("sqq"),
          sumSq128($"pi").as("spp"),
          sumProd128($"di", $"ti").as("sdt"),
          sumSq128($"di").as("sdd"),
          sumSq128($"ti").as("stt"))
        .select($"l_returnflag",
          (floor((($"n".cast("decimal(38,0)") * $"sqp" - $"sq" * $"sp").cast("double") /
            sqrt(($"n".cast("decimal(38,0)") * $"sqq" - $"sq" * $"sq").cast("double") *
                 ($"n".cast("decimal(38,0)") * $"spp" - $"sp" * $"sp").cast("double")))
            * 1e4 + 0.5) / 1e4).as("corr_qty_price"),
          (floor((($"n".cast("decimal(38,0)") * $"sqp" - $"sq" * $"sp").cast("double") /
            ($"n" * ($"n" - 1)) / 100) * 1e2 + 0.5) / 1e2).as("covar_qty_price"),
          (floor((($"n".cast("decimal(38,0)") * $"sdt" - $"sd" * $"st").cast("double") /
            sqrt(($"n".cast("decimal(38,0)") * $"sdd" - $"sd" * $"sd").cast("double") *
                 ($"n".cast("decimal(38,0)") * $"stt" - $"st" * $"st").cast("double")))
            * 1e4 + 0.5) / 1e4).as("corr_disc_tax"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH c AS (SELECT l_returnflag,
           |    CAST(floor(l_quantity) AS BIGINT) AS qi,
           |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pi,
           |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS di,
           |    CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS ti
           |  FROM lineitem),
           |mo AS (SELECT l_returnflag, count(*) AS n,
           |    sum(qi) AS sq, sum(pi) AS sp, sum(di) AS sd, sum(ti) AS st,
           |    sum(qi::HUGEINT * pi) AS sqp, sum(qi::HUGEINT * qi) AS sqq,
           |    sum(pi::HUGEINT * pi) AS spp, sum(di::HUGEINT * ti) AS sdt,
           |    sum(di::HUGEINT * di) AS sdd, sum(ti::HUGEINT * ti) AS stt
           |  FROM c GROUP BY l_returnflag)
           |SELECT l_returnflag,
           |  (floor((CAST(CAST(n * sqp - sq * sp AS STRING) AS DOUBLE) /
           |    sqrt(CAST(CAST(n * sqq - sq * sq AS STRING) AS DOUBLE) *
           |         CAST(CAST(n * spp - sp * sp AS STRING) AS DOUBLE))) * 1e4 + 0.5) / 1e4)
           |    AS corr_qty_price,
           |  (floor((CAST(CAST(n * sqp - sq * sp AS STRING) AS DOUBLE) /
           |    (n * (n - 1)) / 100) * 1e2 + 0.5) / 1e2) AS covar_qty_price,
           |  (floor((CAST(CAST(n * sdt - sd * st AS STRING) AS DOUBLE) /
           |    sqrt(CAST(CAST(n * sdd - sd * sd AS STRING) AS DOUBLE) *
           |         CAST(CAST(n * stt - st * st AS STRING) AS DOUBLE))) * 1e4 + 0.5) / 1e4)
           |    AS corr_disc_tax
           |FROM mo ORDER BY l_returnflag""".stripMargin),
    // exactness-rewrite cost pinned: 1.5x rerun trigger (NOTES_r10 §1)
    headline = true)

  /** Heavy hitters via count-min sketch, gated by invariant oracle: the
    * exact top-10 token counts (hash-checked) carry two in-plan booleans —
    * the CMS point estimate never undercounts (structural guarantee) and
    * overshoots by less than 5·N/width (generous vs the ε≈e/width expected
    * bound). The sketch is ONE fixed-size mergeable buffer (4×512 longs)
    * aggregated map-side — the 100 TB frequency path when an exact
    * per-token shuffle is too expensive; the probe is a pure column
    * expression over the broadcast sketch (no UDF — the aggregator's
    * bucket hash IS Spark's builtin `hash()`, spec-asserted). DuckDB twin
    * recomputes the exact top-10 and emits literal true. */
  private val heavyHitters = Q(
    "stats_heavy_hitters",
    (s, dir) => {
      import s.implicits._
      val depth = 4
      val width = 512
      val toks = Tables(s, dir).documents
        .select(explode(graft.operators.TextOps.tokens($"text")).as("token"))
        .cut(eager = false)
      val exactTop = toks.groupBy($"token").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token").limit(10)
      val cmsU = udaf(new graft.functions.CmsAggregator(depth, width))
      val cmsRow = toks.agg(cmsU($"token").as("cms"), count(lit(1)).as("nb"))
      val est = (0 until depth).map { r =>
        element_at($"cms", lit(r * width) +
          pmod(hash(concat($"token", lit(":" + r))), lit(width)) + 1)
      }.reduce(least(_, _))
      exactTop.crossJoin(broadcast(cmsRow))
        .withColumn("est", est)
        .select($"token", $"n",
          ($"est" >= $"n").as("no_undercount"),
          ($"est" <= $"n" + lit(5.0) * $"nb" / lit(width)).as("within_bound"))
        .orderBy($"n".desc, $"token")
    },
    Some("""SELECT token, count(*) AS n,
           |       true AS no_undercount, true AS within_bound
           |FROM (SELECT unnest(string_split(text,' ')) AS token FROM documents)
           |GROUP BY token ORDER BY n DESC, token LIMIT 10""".stripMargin))

  /** ROC AUC of a score against a binary label via the Mann–Whitney
    * U statistic — the scalable classifier-evaluation path (no threshold
    * sweep, no per-row global rank): first a hash aggregate to per-
    * DISTINCT-SCORE (pos, neg) counts, then one running-sum window over
    * those (cardinality = distinct scores, here bounded by 6dp rounding —
    * orders of magnitude below row count), then
    * U = Σ_s n⁺_s · (cum_neg_below + n⁻_s/2) and AUC = U / (n⁺·n⁻).
    * Ties contribute the half term exactly. Here: does the composite
    * quality score separate English documents from the rest? */
  private val aucQ = Q(
    "stats_auc_quality",
    (s, dir) => {
      import s.implicits._
      val byScore = Tables(s, dir).documents
        .select(($"lang" === "en").as("pos"),
          TextOps.qualityScore($"text").as("score"))
        .groupBy($"score")
        .agg(sum(when($"pos", 1L).otherwise(0L)).as("np"),
          sum(when(!$"pos", 1L).otherwise(0L)).as("nn"))
      val below = Window.orderBy($"score")
        .rowsBetween(Window.unboundedPreceding, -1)
      byScore
        .withColumn("cum_neg", coalesce(sum($"nn").over(below), lit(0L)))
        .agg(sum($"np").as("n_pos"), sum($"nn").as("n_neg"),
          sum($"np" * ($"cum_neg" + $"nn" / 2.0)).as("u"))
        .select($"n_pos", $"n_neg",
          (floor(($"u" / ($"n_pos" * $"n_neg")) * 1e6 + 0.5) / 1e6).as("auc"))
    },
    Some("""WITH scored AS (
           |  SELECT lang = 'en' AS pos,
           |    (floor((least(length(text)::DOUBLE/500.0, 1.0)*0.5
           |      + (1.0 - least((floor((length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE
           |                    / length(text)) * 1e6 + 0.5) / 1e6)*5.0, 1.0))*0.3
           |      + least((floor((len(list_filter(string_split(text,' '),
           |                t -> t IN ('the','a','of','and','to','in')))::DOUBLE
           |              / len(string_split(text,' '))) * 1e6 + 0.5) / 1e6)*4.0, 1.0)*0.2) * 1e6 + 0.5) / 1e6) AS score
           |  FROM documents),
           |by_score AS (
           |  SELECT score,
           |         sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS np,
           |         sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)::BIGINT AS nn
           |  FROM scored GROUP BY score),
           |cum AS (
           |  SELECT np, nn,
           |         coalesce(sum(nn) OVER (ORDER BY score
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |           AS cum_neg
           |  FROM by_score)
           |SELECT sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg,
           |       (floor((sum(np * (cum_neg + nn / 2.0))
           |             / (sum(np) * sum(nn))::VARCHAR::DOUBLE) * 1e6 + 0.5) / 1e6) AS auc
           |FROM cum""".stripMargin))

  /** Robust outlier detection — median / MAD (median absolute deviation),
    * the data-cleaning pass that survives the outliers it is hunting
    * (mean/stddev z-scores get dragged by the very tail they flag).
    * DEPLOYED form = the 100 TB memory posture (same pattern as
    * [[winsorize]]): median and MAD come from `approx_percentile` — a
    * MERGEABLE rank sketch whose map-side partials combine in bounded
    * memory — never from exact `percentile`, whose TypedImperativeAggregate
    * buffers every group value (the per-group buffer is the OOM at scale).
    * Sketch VALUES are engine-specific, so the query emits the INVARIANT
    * as data: the exact min/max rank of each sketch output, counted with
    * constant-memory conditional sums on the cut pass, must straddle the
    * 0.5 quantile within ±0.01n (accuracy=1000 bounds sketch rank error
    * at n/1000 — 10× inside the window; the `count(<) ≤ hi ∧ count(≤) ≥
    * lo` straddle is duplicate-safe where a single inclusive count is
    * not). `outliers_bounded` pins the cut logic itself: the 3·1.4826·mad
    * threshold can never flag more rows than lie beyond the MAD, an exact
    * subset identity independent of sketch error. The DuckDB twin emits
    * literal `true`s plus hash-checked exact columns (n, mean_raw). Exact
    * median/MAD values stay oracle-checked at oracle scale in [[madExact]].
    * Three scan+hash-agg passes over a constant-bounded group key
    * (event_type), group stats broadcast back into the scan each time —
    * no row-level shuffle anywhere. */
  private val madQ = Q(
    "stats_mad_outliers",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir).events.select($"event_type", $"value")
      val med = ev.groupBy($"event_type")
        .agg(expr("approx_percentile(value, 0.5, 1000)").as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy($"event_type")
        .agg(max($"med").as("med"),
          expr("approx_percentile(abs(value - med), 0.5, 1000)").as("mad"))
      ev.join(broadcast(mad), "event_type")
        .withColumn("dev", abs($"value" - $"med"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          (floor(sum(floor($"value" * 100 + 0.5)).cast("double") / count($"value") * 1e4 + 0.5) / 1e6).as("mean_raw"),
          sum(when($"value" < $"med", 1L).otherwise(0L)).as("med_lt"),
          sum(when($"value" <= $"med", 1L).otherwise(0L)).as("med_le"),
          sum(when($"dev" < $"mad", 1L).otherwise(0L)).as("mad_lt"),
          sum(when($"dev" <= $"mad", 1L).otherwise(0L)).as("mad_le"),
          sum(when($"dev" > lit(3.0) * lit(1.4826) * $"mad", 1L)
            .otherwise(0L)).as("n_outliers"))
        .select($"event_type", $"n", $"mean_raw",
          ($"med_lt" <= $"n" * 0.51 && $"med_le" >= $"n" * 0.49)
            .as("med_rank_ok"),
          ($"mad_lt" <= $"n" * 0.51 && $"mad_le" >= $"n" * 0.49)
            .as("mad_rank_ok"),
          ($"n_outliers" <= $"n" - $"mad_le").as("outliers_bounded"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(*)::BIGINT AS n,
           |       (floor(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::VARCHAR::DOUBLE / count(value) * 1e4 + 0.5) / 1e6) AS mean_raw,
           |       true AS med_rank_ok, true AS mad_rank_ok,
           |       true AS outliers_bounded
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Exact median/MAD — the value-level twin of [[madQ]], kept
    * oracle-checked at oracle scale: exact `percentile` buffers (full-group
    * buffer — fine at small SF, deliberately NOT the deployed path).
    * Median/MAD are rounded to 6dp BEFORE the cut predicate so the
    * boundary arithmetic is identical across engines. */
  private val madExact = Q(
    "stats_mad_exact",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir).events.select($"event_type", $"value")
      val med = ev.groupBy($"event_type")
        .agg((floor((expr("percentile(value, 0.5)")) * 1e6 + 0.5) / 1e6).as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy($"event_type")
        .agg(max($"med").as("med"),
          (floor((expr("percentile(abs(value - med), 0.5)")) * 1e6 + 0.5) / 1e6).as("mad"))
      ev.join(broadcast(mad), "event_type")
        .groupBy($"event_type")
        .agg(max($"med").as("med"), max($"mad").as("mad"),
          sum(when(abs($"value" - $"med") > lit(3.0) * lit(1.4826) * $"mad",
            1L).otherwise(0L)).as("n_outliers"),
          count(lit(1)).as("n"))
        .select($"event_type", $"med", $"mad", $"n_outliers",
          (floor(($"n_outliers".cast("double") / $"n") * 1e6 + 0.5) / 1e6).as("outlier_rate"))
        .orderBy($"event_type")
    },
    Some("""WITH med AS (
           |  SELECT event_type, (floor((quantile_cont(value, 0.5)) * 1e6 + 0.5) / 1e6) AS med
           |  FROM events GROUP BY event_type),
           |mad AS (
           |  SELECT e.event_type, max(m.med) AS med,
           |         (floor((quantile_cont(abs(e.value - m.med), 0.5)) * 1e6 + 0.5) / 1e6) AS mad
           |  FROM events e JOIN med m USING (event_type)
           |  GROUP BY e.event_type),
           |cut AS (
           |  SELECT e.event_type, max(s.med) AS med, max(s.mad) AS mad,
           |         sum(CASE WHEN abs(e.value - s.med) > 3.0*1.4826*s.mad
           |                  THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
           |         count(*) AS n
           |  FROM events e JOIN mad s USING (event_type)
           |  GROUP BY e.event_type)
           |SELECT event_type, med, mad, n_outliers,
           |       (floor((n_outliers::DOUBLE / n) * 1e6 + 0.5) / 1e6) AS outlier_rate
           |FROM cut ORDER BY event_type""".stripMargin))

  /** Winsorization, deployed form — the 100 TB memory posture: per-group
    * [p05, p95] clip bounds come from `approx_percentile` (a MERGEABLE
    * rank sketch, map-side partials combine in bounded memory), never from
    * exact `percentile` (a TypedImperativeAggregate that buffers every
    * group value — the per-group buffer is the OOM at scale, not the
    * shuffle). Approx bound VALUES are engine-specific, so the query emits
    * the INVARIANT as data: the exact rank of each approx bound, counted
    * with a constant-memory conditional sum on the clipping pass, must lie
    * within ±0.01 quantile of its target (accuracy=1000 bounds rank error
    * at n/1000 per group — 10× inside the window). `rank(approx) ∈
    * [0.04n, 0.06n]` is exactly "approx between the exact p04/p06 bounds",
    * proven WITHOUT any exact-percentile buffer in the plan. The DuckDB
    * twin emits literal `true`s plus the hash-checked exact columns
    * (n, mean_raw); a hash match proves the sketch's bound held. Exact
    * value-level winsorization stays oracle-checked at oracle scale in
    * [[winsorizeExact]]. Two scan+agg passes, bounds broadcast — same
    * shape as stats_mad_outliers. */
  private val winsorize = Q(
    "stats_winsorize",
    (s, dir) => {
      import s.implicits._
      val li = Tables(s, dir).lineitem.select($"l_returnflag", $"l_extendedprice")
      // both bounds from ONE sketch (array percentage) — two separate
      // aggregates would scan and sketch the group twice
      val bounds = li.groupBy($"l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, array(0.05, 0.95), 1000)")
          .as("b"))
        .select($"l_returnflag", element_at($"b", 1).as("lo"),
          element_at($"b", 2).as("hi"))
      li.join(broadcast(bounds), "l_returnflag")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          (floor(sum(floor($"l_extendedprice" * 100 + 0.5)).cast("double") / count($"l_extendedprice") * 1e4 + 0.5) / 1e6).as("mean_raw"),
          avg(greatest($"lo", least($"hi", $"l_extendedprice")))
            .as("mean_winsorized"),
          max($"lo").as("lo"), max($"hi").as("hi"),
          sum(when($"l_extendedprice" < $"lo", 1L).otherwise(0L)).as("r_lo_lt"),
          sum(when($"l_extendedprice" <= $"lo", 1L).otherwise(0L)).as("r_lo_le"),
          sum(when($"l_extendedprice" < $"hi", 1L).otherwise(0L)).as("r_hi_lt"),
          sum(when($"l_extendedprice" <= $"hi", 1L).otherwise(0L)).as("r_hi_le"))
        .select($"l_returnflag", $"n", $"mean_raw",
          // min-rank/max-rank STRADDLE, not a single inclusive count: a
          // duplicated value sitting exactly at the sketch bound inflates
          // count(<=) past the window even when the sketch met its rank
          // guarantee; count(<) ≤ hi-target ∧ count(≤) ≥ lo-target is the
          // duplicate-safe statement of "bound lies within ±0.01 quantile"
          ($"r_lo_lt" <= $"n" * 0.06 && $"r_lo_le" >= $"n" * 0.04).as("lo_rank_ok"),
          ($"r_hi_lt" <= $"n" * 0.96 && $"r_hi_le" >= $"n" * 0.94).as("hi_rank_ok"),
          ($"mean_winsorized" >= $"lo" && $"mean_winsorized" <= $"hi")
            .as("mean_w_in_band"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*)::BIGINT AS n,
           |       (floor(CAST(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS STRING) AS DOUBLE) / count(l_extendedprice) * 1e4 + 0.5) / 1e6) AS mean_raw,
           |       true AS lo_rank_ok, true AS hi_rank_ok,
           |       true AS mean_w_in_band
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Exact winsorization — the value-level twin of [[winsorize]], kept
    * oracle-checked at oracle scale: exact `percentile` bounds (full-group
    * buffer — fine at small SF, deliberately NOT the deployed path),
    * 6dp-prerounded on both engines before clipping so the boundary is
    * engine-stable. */
  private val winsorizeExact = Q(
    "stats_winsorize_exact",
    (s, dir) => {
      import s.implicits._
      val li = Tables(s, dir).lineitem.select($"l_returnflag", $"l_extendedprice")
      val bounds = li.groupBy($"l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.05, 0.95))").as("b"))
        // bounds snapped to micro-unit BIGINTs; the clip, its rank
        // predicate, and the winsorized mean all run in exact integer
        // micro-units (x_e6 = cents*1e4), so no engine-side float order
        // can move a value across a bound or shift the mean
        .select($"l_returnflag",
          floor(element_at($"b", 1) * 1e6 + 0.5).as("lo_e6"),
          floor(element_at($"b", 2) * 1e6 + 0.5).as("hi_e6"))
      li.join(broadcast(bounds), "l_returnflag")
        .withColumn("x_e6", floor($"l_extendedprice" * 100 + 0.5) * 10000L)
        .groupBy($"l_returnflag")
        .agg((max($"lo_e6") / 1e6).as("lo"), (max($"hi_e6") / 1e6).as("hi"),
          (floor(sum128($"x_e6").cast("double")
            / count($"x_e6") + 0.5) / 1e6).as("mean_raw"),
          (floor(sum128(greatest($"lo_e6", least($"hi_e6", $"x_e6")))
            .cast("double")
            / count($"x_e6") + 0.5) / 1e6).as("mean_winsorized"),
          sum(when($"x_e6" < $"lo_e6" || $"x_e6" > $"hi_e6",
            1L).otherwise(0L)).as("n_clipped"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH b AS (
           |  SELECT l_returnflag,
           |         CAST(floor(quantile_cont(l_extendedprice, 0.05) * 1e6 + 0.5)
           |           AS BIGINT) AS lo_e6,
           |         CAST(floor(quantile_cont(l_extendedprice, 0.95) * 1e6 + 0.5)
           |           AS BIGINT) AS hi_e6
           |  FROM lineitem GROUP BY l_returnflag),
           |x AS (
           |  SELECT l.l_returnflag, b.lo_e6, b.hi_e6,
           |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 10000
           |           AS x_e6
           |  FROM lineitem l JOIN b USING (l_returnflag))
           |SELECT l_returnflag, max(lo_e6) / 1e6 AS lo, max(hi_e6) / 1e6 AS hi,
           |       (floor(CAST(CAST(sum(x_e6) AS STRING) AS DOUBLE) / count(x_e6) + 0.5) / 1e6)
           |         AS mean_raw,
           |       (floor(CAST(CAST(sum(greatest(lo_e6, least(hi_e6, x_e6))) AS STRING) AS DOUBLE)
           |          / count(x_e6) + 0.5) / 1e6) AS mean_winsorized,
           |       sum(CASE WHEN x_e6 < lo_e6 OR x_e6 > hi_e6
           |                THEN 1 ELSE 0 END)::BIGINT AS n_clipped
           |FROM x GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Cumulative distinct users per day, two ways in one plan:
    * (a) EXACT via the first-seen trick — `min(date)` per user then a
    * running sum of new-user counts: one narrow aggregate, no history
    * re-scan per day (the O(days × history) naive form); (b) APPROX via
    * mergeable DataSketches HLL — daily sketches union over a running
    * window, the form that maintains incrementally at 100 TB (store
    * per-day sketches, union on read; datasketches are mergeable partials
    * exactly like the OHLC bars). The driver-checked result emits the
    * exact numbers plus an in-plan `hll_within_5pct` boolean (sketch
    * estimate vs exact), so the hash gate proves the sketch's error bound
    * held — same invariant-oracle pattern as stats_approx_percentiles.
    * The running-union window is over the ~30-row per-day table, not the
    * event table. */
  private val hllCumulative = Q(
    "stats_hll_cumulative",
    (s, dir) => {
      import s.implicits._
      val e = Tables(s, dir).events
        .select(to_date($"ts").as("date"), $"user_id")
      val daily = e.groupBy($"date").agg(
        hll_sketch_agg($"user_id", 14).as("sk"),
        count_distinct($"user_id").as("daily_distinct"))
      val firstSeen = e.groupBy($"user_id").agg(min($"date").as("date"))
        .groupBy($"date").agg(count(lit(1)).as("new_users"))
      val w = org.apache.spark.sql.expressions.Window.orderBy($"date")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      daily.join(firstSeen, Seq("date"), "left")
        .withColumn("cum_exact",
          sum(coalesce($"new_users", lit(0L))).over(w))
        .withColumn("cum_est",
          hll_sketch_estimate(hll_union_agg($"sk").over(w)))
        .select(date_format($"date", "yyyy-MM-dd").as("date"),
          $"daily_distinct", $"cum_exact",
          (abs($"cum_est".cast("double") - $"cum_exact".cast("double")) /
            $"cum_exact".cast("double") <= 0.05).as("hll_within_5pct"))
        .orderBy($"date")
    },
    Some("""WITH daily AS (
           |  SELECT ts::DATE AS date, count(DISTINCT user_id) AS daily_distinct
           |  FROM events GROUP BY 1),
           |fs AS (
           |  SELECT date, count(*) AS new_users
           |  FROM (SELECT user_id, min(ts::DATE) AS date FROM events GROUP BY 1)
           |  GROUP BY date)
           |SELECT strftime(d.date, '%Y-%m-%d') AS date, d.daily_distinct,
           |       sum(coalesce(fs.new_users, 0)) OVER
           |         (ORDER BY d.date ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_exact,
           |       TRUE AS hll_within_5pct
           |FROM daily d LEFT JOIN fs ON d.date = fs.date
           |ORDER BY date""".stripMargin))

  /** Welch's unequal-variance t-test between two event cohorts (the A/B
    * significance test): means/variances/counts per group from one
    * aggregate pass, then the t statistic and Welch–Satterthwaite degrees
    * of freedom as scalar arithmetic on the (rounded) moments. Moments are
    * 6dp-prerounded before the scalar formulas so both engines compute t
    * and df from identical inputs. */
  private val ttest = Q(
    "stats_welch_ttest",
    (s, dir) => {
      import s.implicits._
      val e = Tables(s, dir).events
        .filter($"event_type".isin("purchase", "click"))
      val m = e.groupBy($"event_type")
        .agg(count(lit(1)).cast("double").as("n"),
          (floor(sum(floor($"value" * 100 + 0.5)).cast("double") / count($"value") * 1e4 + 0.5) / 1e6).as("m"),
          (floor((count(lit(1)).cast("decimal(38,0)") *
              sumSq128(floor($"value" * 100 + 0.5)) -
              sum128(floor($"value" * 100 + 0.5)) *
              sum128(floor($"value" * 100 + 0.5)))
            .cast("double") / (count(lit(1)) * (count(lit(1)) - 1))
            * 1e2 + 0.5) / 1e6).as("v"))
      val a = m.filter($"event_type" === "purchase")
        .select($"n".as("n1"), $"m".as("m1"), $"v".as("v1"))
      val b = m.filter($"event_type" === "click")
        .select($"n".as("n2"), $"m".as("m2"), $"v".as("v2"))
      a.crossJoin(broadcast(b))
        .withColumn("se1", $"v1" / $"n1")
        .withColumn("se2", $"v2" / $"n2")
        .select(
          $"n1".cast("long").as("n_purchase"),
          $"n2".cast("long").as("n_click"),
          (floor((($"m1" - $"m2") / sqrt($"se1" + $"se2")) * 1e6 + 0.5) / 1e6).as("t_stat"),
          (floor(((($"se1" + $"se2") * ($"se1" + $"se2")) /
            ($"se1" * $"se1" / ($"n1" - 1) + $"se2" * $"se2" / ($"n2" - 1))) * 1e2 + 0.5) / 1e2)
            .as("welch_df"),
          (abs((floor((($"m1" - $"m2") / sqrt($"se1" + $"se2")) * 1e6 + 0.5) / 1e6)) > 1.96)
            .as("significant_5pct"))
    },
    Some("""WITH m AS (
           |  SELECT event_type, count(*)::DOUBLE AS n,
           |         (floor(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::VARCHAR::DOUBLE / count(value) * 1e4 + 0.5) / 1e6) AS m, (floor(CAST(CAST(count(*) * sum(CAST(floor(value * 100 + 0.5) AS BIGINT)::HUGEINT * CAST(floor(value * 100 + 0.5) AS BIGINT)) - sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) * sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS STRING) AS DOUBLE) / (count(*) * (count(*) - 1)) * 1e2 + 0.5) / 1e6) AS v
           |  FROM events WHERE event_type IN ('purchase', 'click')
           |  GROUP BY event_type),
           |ab AS (
           |  SELECT a.n AS n1, a.m AS m1, a.v / a.n AS se1,
           |         b.n AS n2, b.m AS m2, b.v / b.n AS se2
           |  FROM (SELECT * FROM m WHERE event_type = 'purchase') a
           |  CROSS JOIN (SELECT * FROM m WHERE event_type = 'click') b)
           |SELECT n1::BIGINT AS n_purchase, n2::BIGINT AS n_click,
           |       (floor(((m1 - m2) / sqrt(se1 + se2)) * 1e6 + 0.5) / 1e6) AS t_stat,
           |       (floor((((se1 + se2) * (se1 + se2)) /
           |             (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))) * 1e2 + 0.5) / 1e2) AS welch_df,
           |       abs((floor(((m1 - m2) / sqrt(se1 + se2)) * 1e6 + 0.5) / 1e6)) > 1.96
           |         AS significant_5pct
           |FROM ab""".stripMargin))

  /** Market-basket association: brand pairs co-purchased in the same
    * order, with support / confidence / lift (the Apriori first step).
    * Baskets are per-order distinct brand sets; pair generation is
    * order-local (Σ basket², baskets are small), margins and the basket
    * count are exact integers, so the three ratios are single float
    * divisions of identical operands on both engines.
    *
    * r15 challenger REFUTED: `collect_set` per order + double explode
    * (one groupBy(o) exchange, pairs emitted map-side — 2 fewer
    * Exchanges, 6 fewer Sorts in the plan) measured CONSISTENTLY slower
    * at sf0.1 (0.81× at 5 passes; 0.84/0.96× at 3) and indeterminate at
    * sf1 (1.60×/1.04×/0.73× across three contended runs) — the same
    * lesson as the r15 bounded-heap refutation: ObjectHashAggregate's
    * interpreted per-row collect path costs more than the codegen'd SMJ
    * machinery it removes. Evidence: Opt15AB basket_collect_pairs
    * (exceptAll-identical) + plans/r15/stats_basket_lift_*. */
  private val basket = Q(
    "stats_basket_lift",
    (s, dir) => {
      import s.implicits._
      val tt = Tables(s, dir)
      val items = tt.lineitem
        .join(tt.part, $"l_partkey" === $"p_partkey")
        .select($"l_orderkey".as("o"), $"p_brand".as("b")).distinct()
        .cut(eager = false)
      val nBaskets = items.select($"o").distinct()
        .agg(count(lit(1)).as("n"))
      val c1 = items.groupBy($"b").agg(count(lit(1)).as("c1"))
      val pairs = items.as("x").join(items.as("y"), Seq("o"))
        .filter($"x.b" < $"y.b")
        .groupBy($"x.b".as("ba"), $"y.b".as("bb"))
        .agg(count(lit(1)).as("c12"))
        .filter($"c12" >= 50)
      pairs
        .join(c1.select($"b".as("ba"), $"c1".as("c1a")), "ba")
        .join(c1.select($"b".as("bb"), $"c1".as("c1b")), "bb")
        .crossJoin(broadcast(nBaskets))
        .select($"ba", $"bb", $"c12",
          (floor(($"c12".cast("double") / $"n") * 1e6 + 0.5) / 1e6).as("support"),
          (floor(($"c12".cast("double") / $"c1a") * 1e6 + 0.5) / 1e6).as("confidence"),
          (floor(($"c12".cast("double") * $"n" / ($"c1a" * $"c1b")) * 1e6 + 0.5) / 1e6)
            .as("lift"))
        .orderBy($"lift".desc, $"ba", $"bb")
        .limit(15)
    },
    Some("""WITH items AS (
           |  SELECT DISTINCT l_orderkey AS o, p_brand AS b
           |  FROM lineitem JOIN part ON l_partkey = p_partkey),
           |n AS (SELECT count(DISTINCT o) AS n FROM items),
           |c1 AS (SELECT b, count(*) AS c1 FROM items GROUP BY b),
           |prs AS (
           |  SELECT x.b AS ba, y.b AS bb, count(*) AS c12
           |  FROM items x JOIN items y ON x.o = y.o AND x.b < y.b
           |  GROUP BY 1, 2 HAVING count(*) >= 50)
           |SELECT ba, bb, c12,
           |       (floor((c12::DOUBLE / n.n) * 1e6 + 0.5) / 1e6) AS support,
           |       (floor((c12::DOUBLE / ca.c1) * 1e6 + 0.5) / 1e6) AS confidence,
           |       (floor((c12::DOUBLE * n.n / (ca.c1 * cb.c1)) * 1e6 + 0.5) / 1e6) AS lift
           |FROM prs
           |JOIN c1 ca ON ca.b = prs.ba
           |JOIN c1 cb ON cb.b = prs.bb
           |CROSS JOIN n
           |ORDER BY lift DESC, ba, bb LIMIT 15""".stripMargin))

  /** Gini concentration of revenue across customers (the
    * whale-dependence metric): G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over
    * revenue sorted ascending. Revenue per customer is an exact
    * micro-unit integer sum (q7/q8 discipline), ranks come from one
    * window over the already-aggregated narrow table, and the two final
    * aggregates feed one scalar expression — so the only float ops are
    * the closing divisions, identical on both engines. */
  private val gini = Q(
    "stats_gini_revenue",
    (s, dir) => {
      import s.implicits._
      val tt = Tables(s, dir)
      val rev = tt.orders
        .groupBy($"o_custkey")
        .agg(sum(round($"o_totalprice" * 100).cast("long")).as("rev_c"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"rev_c", $"o_custkey")
      val ranked = rev.withColumn("i", row_number().over(w).cast("long"))
      // Σ i·rev_c and n·Σrev_c overflow BIGINT around sf10 (rank ~ n
      // customers × cents-scale revenue); accumulate via the 128-bit
      // kernels — exact like DuckDB's HUGEINT promotion, so both
      // engines convert the same exact integer to double for the
      // closing division (sumprod128 multiplies in 128-bit, so even the
      // per-row i·rev_c product — long-wrapping from ~sf1e4 — is exact
      // at any SF)
      ranked.agg(
          count(lit(1)).as("n_customers"),
          (floor((sum128($"rev_c").cast("double") / 100.0) * 1e2 + 0.5) / 1e2).as("total_revenue"),
          (floor((
            sumProd128($"i", $"rev_c").cast("double") * 2.0 /
              (count(lit(1)).cast("decimal(38,0)") *
                sum128($"rev_c")).cast("double") -
              (count(lit(1)) + 1.0) / count(lit(1))) * 1e6 + 0.5) / 1e6).as("gini"))
    },
    Some("""WITH rev AS (
           |  SELECT o_custkey,
           |         sum(round(o_totalprice*100)::BIGINT) AS rev_c
           |  FROM orders GROUP BY o_custkey),
           |ranked AS (
           |  SELECT rev_c,
           |         row_number() OVER (ORDER BY rev_c, o_custkey) AS i
           |  FROM rev)
           |SELECT count(*)::BIGINT AS n_customers,
           |       (floor((sum(rev_c)::VARCHAR::DOUBLE / 100.0) * 1e2 + 0.5) / 1e2) AS total_revenue,
           |       (floor((sum(i * rev_c)::VARCHAR::DOUBLE * 2.0
           |               / (count(*) * sum(rev_c))::VARCHAR::DOUBLE
           |             - (count(*) + 1.0) / count(*)) * 1e6 + 0.5) / 1e6) AS gini
           |FROM ranked""".stripMargin))

  /** Two-sample Kolmogorov–Smirnov statistic between the purchase and
    * click value distributions — the standard drift detector for data-
    * quality monitoring. Same scale trick as stats_auc_quality: collapse
    * to per-DISTINCT-VALUE group counts first, so the one ordered window
    * runs over value cardinality, not rows; cumulative counts stay exact
    * integers and the only floats are the per-step ECDF ratios. Emits D
    * plus the in-plan α=0.05 decision against the asymptotic critical
    * value 1.358·√((n1+n2)/(n1·n2)). */
  private val ksTest = Q(
    "stats_ks_drift",
    (s, dir) => {
      import s.implicits._
      val e = Tables(s, dir).events
        .filter($"event_type".isin("purchase", "click"))
        .select((floor(($"value") * 1e6 + 0.5) / 1e6).as("v"),
          ($"event_type" === "purchase").as("is1"))
      val byValue = e.groupBy($"v")
        .agg(sum(when($"is1", 1L).otherwise(0L)).as("c1"),
          sum(when(!$"is1", 1L).otherwise(0L)).as("c2"))
      val w = org.apache.spark.sql.expressions.Window.orderBy($"v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val totals = byValue.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
      byValue
        .withColumn("cum1", sum($"c1").over(w))
        .withColumn("cum2", sum($"c2").over(w))
        .crossJoin(broadcast(totals))
        .withColumn("d", abs($"cum1".cast("double") / $"n1"
          - $"cum2".cast("double") / $"n2"))
        .agg(max($"n1").as("n_purchase"), max($"n2").as("n_click"),
          (floor((max($"d")) * 1e6 + 0.5) / 1e6).as("ks_d"),
          ((floor((max($"d")) * 1e6 + 0.5) / 1e6) > lit(1.358) *
            sqrt((max($"n1") + max($"n2")).cast("double") /
              (max($"n1") * max($"n2")))).as("drift_5pct"))
    },
    Some("""WITH e AS (
           |  SELECT (floor((value) * 1e6 + 0.5) / 1e6) AS v, event_type = 'purchase' AS is1
           |  FROM events WHERE event_type IN ('purchase', 'click')),
           |bv AS (
           |  SELECT v, sum(CASE WHEN is1 THEN 1 ELSE 0 END)::BIGINT AS c1,
           |         sum(CASE WHEN is1 THEN 0 ELSE 1 END)::BIGINT AS c2
           |  FROM e GROUP BY v),
           |cum AS (
           |  SELECT v, c1, c2,
           |    (sum(c1) OVER w)::BIGINT AS cum1, (sum(c2) OVER w)::BIGINT AS cum2
           |  FROM bv WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
           |t AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM bv)
           |SELECT t.n1 AS n_purchase, t.n2 AS n_click,
           |       (floor((max(abs(cum1::DOUBLE / t.n1 - cum2::DOUBLE / t.n2))) * 1e6 + 0.5) / 1e6)
           |         AS ks_d,
           |       (floor((max(abs(cum1::DOUBLE / t.n1 - cum2::DOUBLE / t.n2))) * 1e6 + 0.5) / 1e6)
           |         > 1.358 * sqrt((t.n1 + t.n2)::DOUBLE / (t.n1 * t.n2))
           |         AS drift_5pct
           |FROM cum CROSS JOIN t GROUP BY t.n1, t.n2""".stripMargin))

  /** Zipf's-law fit of the corpus word-frequency curve: OLS regression of
    * ln(freq) on ln(rank) via the REGR_* aggregate family (slope ≈ −1 on
    * natural text) — the regression-aggregate surface (regr_slope /
    * regr_intercept / regr_r2) exercised on a real corpus statistic.
    * Ranks are exact integers (count desc, token tie-break). */
  private val zipf = Q(
    "stats_zipf_regression",
    (s, dir) => {
      import s.implicits._
      val freq = Tables(s, dir).documents
        .select(explode(graft.operators.TextOps.tokens($"text")).as("token"))
        .groupBy($"token").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"n".desc, $"token")
      freq.withColumn("rank", row_number().over(w).cast("long"))
        .agg(count(lit(1)).as("n_tokens"),
          (floor((regr_slope(log($"n"), log($"rank"))) * 1e6 + 0.5) / 1e6).as("zipf_slope"),
          (floor((regr_intercept(log($"n"), log($"rank"))) * 1e6 + 0.5) / 1e6).as("zipf_intercept"),
          (floor((regr_r2(log($"n"), log($"rank"))) * 1e6 + 0.5) / 1e6).as("r2"))
    },
    Some("""WITH f AS (
           |  SELECT token, count(*)::BIGINT AS n
           |  FROM (SELECT unnest(string_split(text, ' ')) AS token
           |        FROM documents)
           |  GROUP BY token),
           |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank
           |      FROM f)
           |SELECT count(*)::BIGINT AS n_tokens,
           |       (floor((regr_slope(ln(n), ln(rank))) * 1e6 + 0.5) / 1e6) AS zipf_slope,
           |       (floor((regr_intercept(ln(n), ln(rank))) * 1e6 + 0.5) / 1e6) AS zipf_intercept,
           |       (floor((regr_r2(ln(n), ln(rank))) * 1e6 + 0.5) / 1e6) AS r2
           |FROM r""".stripMargin))

  /** One-way ANOVA F-statistic across the event-type cohorts (the k-group
    * generalization of the Welch query): between-group and within-group
    * sums of squares from per-group moments, F = (SSB/(k−1)) /
    * (SSW/(n−k)). Group moments are 6dp-prerounded so both engines
    * compute the scalar formula from identical inputs; one aggregate pass
    * + a k-row reduction. */
  private val anova = Q(
    "stats_anova_f",
    (s, dir) => {
      import s.implicits._
      val g = Tables(s, dir).events
        .groupBy($"event_type")
        .agg(count(lit(1)).cast("double").as("n"),
          (floor(sum(floor($"value" * 100 + 0.5)).cast("double") / count($"value") * 1e4 + 0.5) / 1e6).as("m"),
          (floor((count(lit(1)).cast("decimal(38,0)") *
              sumSq128(floor($"value" * 100 + 0.5)) -
              sum128(floor($"value" * 100 + 0.5)) *
              sum128(floor($"value" * 100 + 0.5)))
            .cast("double") / (count(lit(1)) * (count(lit(1)) - 1))
            * 1e2 + 0.5) / 1e6).as("v"))
      val k = g.agg(
        count(lit(1)).cast("double").as("k"),
        sum($"n").as("n_total"),
        (sum($"n" * $"m") / sum($"n")).as("grand_mean"))
      g.crossJoin(broadcast(k))
        .agg(
          max($"k").cast("long").as("k_groups"),
          max($"n_total").cast("long").as("n_total"),
          (floor((
            (sum($"n" * ($"m" - $"grand_mean") * ($"m" - $"grand_mean"))
              / (max($"k") - 1)) /
              (sum(($"n" - 1) * $"v") / (max($"n_total") - max($"k")))) * 1e6 + 0.5) / 1e6).as("f_stat"))
    },
    Some("""WITH g AS (
           |  SELECT event_type, count(*)::DOUBLE AS n,
           |         (floor(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::VARCHAR::DOUBLE / count(value) * 1e4 + 0.5) / 1e6) AS m, (floor(CAST(CAST(count(*) * sum(CAST(floor(value * 100 + 0.5) AS BIGINT)::HUGEINT * CAST(floor(value * 100 + 0.5) AS BIGINT)) - sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) * sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS STRING) AS DOUBLE) / (count(*) * (count(*) - 1)) * 1e2 + 0.5) / 1e6) AS v
           |  FROM events GROUP BY event_type),
           |k AS (SELECT count(*)::DOUBLE AS k, sum(n) AS n_total,
           |             sum(n * m) / sum(n) AS grand_mean
           |      FROM g)
           |SELECT max(k.k)::BIGINT AS k_groups, max(k.n_total)::BIGINT AS n_total,
           |       (floor(((sum(n * (m - grand_mean) * (m - grand_mean))
           |              / (max(k.k) - 1)) /
           |             (sum((n - 1) * v) / (max(k.n_total) - max(k.k)))) * 1e6 + 0.5) / 1e6)
           |         AS f_stat
           |FROM g CROSS JOIN k""".stripMargin))

  /** Population Stability Index between the first and second half of the
    * event stream (the production ML drift monitor): reference deciles
    * from exact percentiles (6dp-prerounded bin edges shared by both
    * engines), per-bin shares as exact-integer counts over totals,
    * PSI = Σ (p−q)·ln(p/q). Two scan+agg passes with the 9 bin edges
    * broadcast — the same shape as winsorize/MAD. */
  private val psi = Q(
    "stats_psi_drift",
    (s, dir) => {
      import s.implicits._
      val e = Tables(s, dir).events
        .select($"value", ($"ts" < lit("2024-01-16").cast("timestamp"))
          .as("is_ref"))
      val edges = e.filter($"is_ref").agg(
        expr("""transform(
                  percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)),
                  x -> (floor((x) * 1e6 + 0.5) / 1e6))""").as("edges"))
      val binned = e.crossJoin(broadcast(edges))
        // bin = #edges strictly below the value → 0..9, engine-stable
        // because the edges are prerounded and the comparison is on the
        // raw value (no midpoint rounding on the data side)
        .withColumn("bin",
          aggregate($"edges", lit(0),
            (acc, edge) => acc + when($"value" > edge, 1).otherwise(0)))
      val counts = binned.groupBy($"bin")
        .agg(sum(when($"is_ref", 1L).otherwise(0L)).as("c_ref"),
          sum(when(!$"is_ref", 1L).otherwise(0L)).as("c_cur"))
      val totals = counts.agg(sum($"c_ref").as("n_ref"), sum($"c_cur").as("n_cur"))
      // standard epsilon floor: a zero bin on either half would send
      // (p−q)·ln(p/q) to ±Infinity exactly when drift is most extreme —
      // floor counts at 0.5 (identical on both engines) before the ratio
      counts.crossJoin(broadcast(totals))
        .withColumn("p", greatest($"c_ref".cast("double"), lit(0.5)) / $"n_ref")
        .withColumn("q", greatest($"c_cur".cast("double"), lit(0.5)) / $"n_cur")
        .agg(max($"n_ref").as("n_ref"), max($"n_cur").as("n_cur"),
          (floor((sum(($"p" - $"q") * log($"p" / $"q"))) * 1e6 + 0.5) / 1e6).as("psi"))
    },
    Some("""WITH e AS (
           |  SELECT value, ts < TIMESTAMP '2024-01-16' AS is_ref FROM events),
           |ed AS (
           |  SELECT list_transform(
           |           quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
           |           t -> (floor((t) * 1e6 + 0.5) / 1e6)) AS edges
           |  FROM e WHERE is_ref),
           |b AS (
           |  SELECT is_ref,
           |         len(list_filter(ed.edges, t -> e.value > t)) AS bin
           |  FROM e CROSS JOIN ed),
           |c AS (
           |  SELECT bin, sum(CASE WHEN is_ref THEN 1 ELSE 0 END)::BIGINT AS c_ref,
           |         sum(CASE WHEN is_ref THEN 0 ELSE 1 END)::BIGINT AS c_cur
           |  FROM b GROUP BY bin),
           |t AS (SELECT sum(c_ref)::BIGINT AS n_ref, sum(c_cur)::BIGINT AS n_cur
           |      FROM c)
           |SELECT max(t.n_ref) AS n_ref, max(t.n_cur) AS n_cur,
           |       (floor((sum((greatest(c_ref::DOUBLE, 0.5) / t.n_ref
           |                  - greatest(c_cur::DOUBLE, 0.5) / t.n_cur)
           |             * ln((greatest(c_ref::DOUBLE, 0.5) / t.n_ref)
           |                  / (greatest(c_cur::DOUBLE, 0.5) / t.n_cur)))) * 1e6 + 0.5) / 1e6) AS psi
           |FROM c CROSS JOIN t""".stripMargin))

  /** Decile lift / calibration table for a classifier score — the model-
    * eval companion to [[aucQ]] (same score, same label): rank documents
    * by quality score, cut into 10 ECDF deciles, and report each decile's
    * positive rate against the corpus base rate (lift). Same scale trick
    * as the AUC/KS queries: collapse to per-DISTINCT-score counts FIRST,
    * so the one ordered window runs over score cardinality (hundreds),
    * never rows; the decile boundary is pure integer arithmetic
    * (ceil(10·cum/n) as div-based floor division) so both engines cut
    * identically — no float ECDF anywhere near a boundary. Ties share a
    * score group and therefore a decile, so decile sizes are only
    * approximately n/10 — that is the standard, deterministic convention
    * for tied scores. */
  private val liftQ = Q(
    "stats_lift_deciles",
    (s, dir) => {
      import s.implicits._
      val byScore = Tables(s, dir).documents
        .select(($"lang" === "en").as("pos"),
          TextOps.qualityScore($"text").as("score"))
        .groupBy($"score")
        .agg(sum(when($"pos", 1L).otherwise(0L)).as("np"),
          count(lit(1)).as("nt"))
      val w = Window.orderBy($"score")
        .rowsBetween(Window.unboundedPreceding, 0)
      val totals = byScore.agg(sum($"nt").as("n"), sum($"np").as("n_pos"))
      byScore
        .withColumn("cum", sum($"nt").over(w))
        .crossJoin(broadcast(totals))
        // decile d = ceil(10·cum/n) via integer floor-div — exact in both
        // engines; high scores land in decile 10
        .withColumn("decile",
          expr("div(10 * cum + n - 1, n)").cast("int"))
        .groupBy($"decile")
        .agg(sum($"nt").as("n_docs"), sum($"np").as("n_pos_d"),
          max($"n_pos").as("n_pos"), max($"n").as("n"))
        .select($"decile", $"n_docs",
          (floor(($"n_pos_d".cast("double") / $"n_docs") * 1e6 + 0.5) / 1e6).as("pos_rate"),
          (floor((($"n_pos_d".cast("double") / $"n_docs") /
            ($"n_pos".cast("double") / $"n")) * 1e6 + 0.5) / 1e6).as("lift"))
        .orderBy($"decile")
    },
    Some("""WITH scored AS (
           |  SELECT lang = 'en' AS pos,
           |    (floor((least(length(text)::DOUBLE/500.0, 1.0)*0.5
           |      + (1.0 - least((floor((length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE
           |                    / length(text)) * 1e6 + 0.5) / 1e6)*5.0, 1.0))*0.3
           |      + least((floor((len(list_filter(string_split(text,' '),
           |                t -> t IN ('the','a','of','and','to','in')))::DOUBLE
           |              / len(string_split(text,' '))) * 1e6 + 0.5) / 1e6)*4.0, 1.0)*0.2) * 1e6 + 0.5) / 1e6) AS score
           |  FROM documents),
           |by_score AS (
           |  SELECT score, sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS np,
           |         count(*)::BIGINT AS nt
           |  FROM scored GROUP BY score),
           |cum AS (
           |  SELECT np, nt, (sum(nt) OVER (ORDER BY score
           |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
           |  FROM by_score),
           |t AS (SELECT sum(nt)::BIGINT AS n, sum(np)::BIGINT AS n_pos
           |      FROM by_score),
           |cut AS (
           |  SELECT np, nt, ((10 * cum + t.n - 1) // t.n)::INT AS decile,
           |         t.n, t.n_pos
           |  FROM cum CROSS JOIN t)
           |SELECT decile, sum(nt)::BIGINT AS n_docs,
           |       (floor((sum(np)::DOUBLE / sum(nt)) * 1e6 + 0.5) / 1e6) AS pos_rate,
           |       (floor(((sum(np)::DOUBLE / sum(nt))
           |             / (max(n_pos)::DOUBLE / max(n))) * 1e6 + 0.5) / 1e6) AS lift
           |FROM cut GROUP BY decile ORDER BY decile""".stripMargin))

  /** CUSUM change-point localization over the daily mean of events.value:
    * S_d = Σ_{d'≤d} (x_{d'} − μ), the day where |S| peaks being the
    * classic level-shift estimate. All accumulation is in integer
    * micro-units (the 6dp-rounded daily mean ×1e6 snapped to BIGINT, μ
    * likewise), so the running sum is exact and order-independent in
    * both engines — the only floats are the initial per-day avg (same
    * pattern as gold_rolling_corr's market series) and the final /1e6
    * display division. The running sum is a single ordered window over
    * one-row-per-day — series length is calendar-bounded, so the
    * single-partition window is O(days), not O(events). */
  private val cusum = Q(
    "stats_cusum_changepoint",
    (s, dir) => {
      import s.implicits._
      val daily = Tables(s, dir).events
        .groupBy(to_date($"ts").as("day"))
        .agg((floor(sum(floor($"value" * 100 + 0.5)).cast("double") / count($"value") * 1e4 + 0.5) / 1e6).as("x"))
        .withColumn("xi", round($"x" * 1e6).cast("long"))
      val mu = daily.agg(
        round(sum($"xi").cast("double") / count(lit(1))).cast("long")
          .as("mui"))
      val w = org.apache.spark.sql.expressions.Window.orderBy($"day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val withS = daily.crossJoin(broadcast(mu))
        .withColumn("si", sum($"xi" - $"mui").over(w))
      val peak = withS.agg(max(abs($"si")).as("peak"))
      withS.crossJoin(broadcast(peak))
        .select(date_format($"day", "yyyy-MM-dd").as("day"),
          (floor(($"x") * 1e6 + 0.5) / 1e6).as("daily_mean"),
          (floor(($"si".cast("double") / 1e6) * 1e6 + 0.5) / 1e6).as("cusum"),
          (abs($"si") === $"peak").as("is_peak"))
        .orderBy($"day")
    },
    Some("""WITH daily AS (
           |  SELECT ts::DATE AS day, (floor(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::VARCHAR::DOUBLE / count(value) * 1e4 + 0.5) / 1e6) AS x
           |  FROM events GROUP BY 1),
           |di AS (SELECT day, x, round(x * 1e6)::BIGINT AS xi FROM daily),
           |mu AS (SELECT round(sum(xi) / count(*))::BIGINT AS mui FROM di),
           |s AS (SELECT day, x,
           |        sum(xi - mui) OVER (ORDER BY day
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |          AS si
           |      FROM di CROSS JOIN mu),
           |pk AS (SELECT max(abs(si)) AS peak FROM s)
           |SELECT strftime(day, '%Y-%m-%d') AS day,
           |       (floor((x) * 1e6 + 0.5) / 1e6) AS daily_mean,
           |       (floor((si::DOUBLE / 1e6) * 1e6 + 0.5) / 1e6) AS cusum,
           |       (abs(si) = peak) AS is_peak
           |FROM s CROSS JOIN pk ORDER BY day""".stripMargin))

  /** Benford first-digit conformance over lineitem.l_extendedprice — the
    * data-quality / fraud-screen primitive: observed first-significant-
    * digit shares vs the Benford expectation log10(1+1/d). Counts are
    * exact integers (scan-local digit extraction + one 9-row hash agg);
    * the only floats are the two share divisions and the log10, computed
    * identically in both engines from identical integers. */
  private val benford = Q(
    "stats_benford_digits",
    (s, dir) => {
      import s.implicits._
      val digits = Tables(s, dir).lineitem
        .select(substring($"l_extendedprice".cast("bigint").cast("string"),
          1, 1).cast("int").as("digit"))
      val total = digits.agg(count(lit(1)).as("total"))
      digits.groupBy($"digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .select($"digit", $"n",
          (floor(($"n".cast("double") / $"total") * 1e6 + 0.5) / 1e6).as("share"),
          (floor((log10(lit(1.0) + lit(1.0) / $"digit")) * 1e6 + 0.5) / 1e6)
            .as("expected_share"),
          (floor(($"n".cast("double") / $"total" -
            log10(lit(1.0) + lit(1.0) / $"digit")) * 1e6 + 0.5) / 1e6).as("deviation"))
        .orderBy($"digit")
    },
    Some("""WITH d AS (
           |  -- trunc, not ::BIGINT: DuckDB's int cast rounds half-away
           |  -- where Spark's cast truncates
           |  SELECT substr(trunc(l_extendedprice)::BIGINT::VARCHAR, 1, 1)::INT
           |           AS digit
           |  FROM lineitem),
           |tot AS (SELECT count(*)::DOUBLE AS total FROM d)
           |SELECT digit, count(*)::BIGINT AS n,
           |       (floor((count(*) / total) * 1e6 + 0.5) / 1e6) AS share,
           |       (floor((log10(1.0 + 1.0 / digit)) * 1e6 + 0.5) / 1e6) AS expected_share,
           |       (floor((count(*) / total - log10(1.0 + 1.0 / digit)) * 1e6 + 0.5) / 1e6)
           |         AS deviation
           |FROM d CROSS JOIN tot
           |GROUP BY digit, total ORDER BY digit""".stripMargin))

  /** Shannon entropy of the event-type mix per day — the drift-monitor
    * primitive for categorical columns (a collapsing mix shows up as
    * falling entropy before any single share alarms). Counts are exact;
    * each −p·log2(p) term is rounded to 7dp and summed as DECIMAL so the
    * cross-engine result is order-independent (the PSI/PMI prerounding
    * pattern); one narrow (day, type) hash agg + a per-day sum. */
  private val entropyDaily = Q(
    "stats_entropy_daily",
    (s, dir) => {
      import s.implicits._
      val counts = Tables(s, dir).events
        .groupBy(to_date($"ts").as("day"), $"event_type")
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy($"day").agg(sum($"n").as("total"))
      counts.join(totals, "day")
        .withColumn("p", $"n".cast("double") / $"total")
        .withColumn("term",
          (floor((-$"p" * log2($"p")) * 1e7 + 0.5) / 1e7).cast("decimal(12,7)"))
        .groupBy($"day")
        .agg(count(lit(1)).as("n_types"),
          (floor((sum($"term").cast("double")) * 1e6 + 0.5) / 1e6).as("entropy_bits"))
        .select(date_format($"day", "yyyy-MM-dd").as("day"),
          $"n_types", $"entropy_bits")
        .orderBy($"day")
    },
    Some("""WITH c AS (
           |  SELECT ts::DATE AS day, event_type, count(*) AS n
           |  FROM events GROUP BY 1, 2),
           |t AS (SELECT day, sum(n) AS total FROM c GROUP BY day),
           |terms AS (
           |  SELECT c.day,
           |         (floor((-(n::DOUBLE/total) * log2(n::DOUBLE/total)) * 1e7 + 0.5) / 1e7)
           |           ::DECIMAL(12,7) AS term
           |  FROM c JOIN t USING (day))
           |SELECT strftime(day, '%Y-%m-%d') AS day,
           |       count(*)::BIGINT AS n_types,
           |       (floor((sum(term)::DOUBLE) * 1e6 + 0.5) / 1e6) AS entropy_bits
           |FROM terms GROUP BY day ORDER BY day""".stripMargin))

  /** Deterministic half-sample bootstrap CI for the mean of
    * events.value — the resampling-inference primitive without rand():
    * 32 deterministic half-samples (row b-membership = bit b of ONE
    * portable 32-bit row hash — 32 coin flips per md5), each mean
    * snapped to integer
    * micro-units, and the standard error computed from the exact
    * centered-integer identity Var = Σ(B·m − Σm)² / (B²(B−1)) — every
    * accumulation is an exact integer sum, so both engines produce
    * bit-identical CIs with no float-order dependence. The ×2 variance
    * correction maps half-sampling onto the bootstrap scale (a half
    * sample's mean has twice the variance of the full-n bootstrap
    * mean); 1.96 is the documented normal quantile. Cost: one 32×
    * scan-local generate + two tiny aggregates — embarrassingly
    * parallel at any scale. */
  private val halfsampleCi = Q(
    "stats_halfsample_ci",
    (s, dir) => {
      import s.implicits._
      val base = Tables(s, dir).events
        .select($"event_id", round($"value" * 100).cast("long").as("xi"))
      val grand = base.agg(count(lit(1)).as("n_rows"),
        (floor((sum($"xi").cast("double") / count(lit(1)) / 100) * 1e6 + 0.5) / 1e6)
          .as("grand_mean"))
      // ONE portable hash per row; resample b's membership is bit b of
      // it (32 independent coin flips from one md5 — 32× cheaper than
      // hashing per (row, b))
      val perB = base
        .withColumn("h", conv(substring(md5($"event_id".cast("string")),
          1, 8), 16, 10).cast("long"))
        .select($"xi", $"h", explode(sequence(lit(0), lit(31))).as("b"))
        .filter(expr("shiftright(h, b)").bitwiseAND(1) === 0)
        .groupBy($"b")
        .agg(round(lit(1e4) * sum($"xi") / count(lit(1))).cast("long")
          .as("mb"))
      // centered deviations d = B·mb − Σmb keep every square bounded
      // (Σmb² would overflow LongType on plausible value scales);
      // Var(m) = Σd² / (B²(B−1)), all-integer until the final sqrt
      val tot = perB.agg(count(lit(1)).as("bn"), sum($"mb").as("s1"))
      val se = perB.crossJoin(broadcast(tot))
        .select(($"bn" * $"mb" - $"s1").as("d"), $"bn")
        // d² accumulates through sumsq128 (exact 128-bit square +
        // int128 sum): d is a long whose square can pass 2⁶³ on
        // plausible value scales — previously a per-row DECIMAL(38,0)
        // multiply; the oracle side widens to HUGEINT to match
        .groupBy($"bn").agg(sumSq128($"d").as("sd2"))
        .select((floor((sqrt(
          $"sd2".cast("double") / ($"bn" * $"bn" * ($"bn" - 1)) / 2.0)
          / 1e6) * 1e6 + 0.5) / 1e6).as("se"))
      grand.crossJoin(broadcast(se))
        .select($"n_rows", $"grand_mean", $"se",
          (floor(($"grand_mean" - lit(1.96) * $"se") * 1e6 + 0.5) / 1e6).as("ci_lo"),
          (floor(($"grand_mean" + lit(1.96) * $"se") * 1e6 + 0.5) / 1e6).as("ci_hi"))
    },
    Some("""WITH base AS (
           |  SELECT event_id, round(value * 100)::BIGINT AS xi FROM events),
           |grand AS (
           |  SELECT count(*)::BIGINT AS n_rows,
           |         (floor((sum(xi)::VARCHAR::DOUBLE / count(*) / 100) * 1e6 + 0.5) / 1e6) AS grand_mean
           |  FROM base),
           |hashed AS (
           |  SELECT xi, ('0x' || substr(md5(event_id::VARCHAR), 1, 8))
           |           ::BIGINT AS h
           |  FROM base),
           |perb AS (
           |  SELECT b, round(1e4 * sum(xi) / count(*))::BIGINT AS mb
           |  FROM hashed CROSS JOIN generate_series(0, 31) t(b)
           |  WHERE (h >> b) & 1 = 0
           |  GROUP BY b),
           |tot AS (SELECT count(*) AS bn, sum(mb) AS s1 FROM perb),
           |dev AS (SELECT bn, (bn * mb - s1) AS d
           |        FROM perb CROSS JOIN tot),
           |se AS (
           |  SELECT (floor((sqrt(
           |           sum(d::HUGEINT * d::HUGEINT)::VARCHAR::DOUBLE
           |             / (bn * bn * (bn - 1)) / 2.0)
           |         / 1e6) * 1e6 + 0.5) / 1e6) AS se
           |  FROM dev GROUP BY bn)
           |SELECT n_rows, grand_mean, se,
           |       (floor((grand_mean - 1.96 * se) * 1e6 + 0.5) / 1e6) AS ci_lo,
           |       (floor((grand_mean + 1.96 * se) * 1e6 + 0.5) / 1e6) AS ci_hi
           |FROM grand CROSS JOIN se""".stripMargin))

  /** Two-proportion z-test on conversion rates — the A/B-test primitive
    * for RATES (stats_welch_ttest covers means): users split into two
    * deterministic cohorts by the parity of their portable hash,
    * conversion = "has a purchase event", z = (p̂₁−p̂₂)/√(p̂(1−p̂)(1/n₁+1/n₂))
    * with the pooled p̂. All counts exact integers; the z arithmetic is
    * a handful of scalar float ops on identical inputs in both engines.
    * One user-level aggregate + a 2-row reduction. On hash-split cohorts
    * of the same population the test should NOT reject — the in-plan
    * |z| < 1.96 boolean is the sanity oracle. */
  private val propZtest = Q(
    "stats_two_proportion_ztest",
    (s, dir) => {
      import s.implicits._
      // "converted" = above-average purchase spend: every user here has
      // every event type, so "has a purchase" is degenerate (p̂ = 1 and
      // the pooled-variance z divides by zero under ANSI). The
      // above-average cut is an exact integer comparison
      // (cents·n_users > total_cents — no division) with real variation
      // at every SF.
      val spend = Tables(s, dir).events
        .filter($"event_type" === "purchase")
        .groupBy($"user_id")
        .agg(sum(round($"value" * 100).cast("long")).as("cents"))
      val tot = spend.agg(count(lit(1)).as("n_users"),
        sum($"cents").as("total_cents"))
      val users = spend.crossJoin(broadcast(tot))
        .select($"user_id",
          ($"cents" * $"n_users" > $"total_cents").cast("int").as("converted"))
        .withColumn("cohort",
          conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
            .cast("long") % 2)
      val c = users.groupBy($"cohort")
        .agg(count(lit(1)).as("n"), sum($"converted").as("x"))
      val wide = c.agg(
        sum(when($"cohort" === 0, $"n")).as("n1"),
        sum(when($"cohort" === 0, $"x")).as("x1"),
        sum(when($"cohort" === 1, $"n")).as("n2"),
        sum(when($"cohort" === 1, $"x")).as("x2"))
      val zExpr = try_divide(
        $"x1".cast("double") / $"n1" - $"x2".cast("double") / $"n2",
        sqrt((($"x1" + $"x2").cast("double") / ($"n1" + $"n2")) *
          (lit(1.0) - ($"x1" + $"x2").cast("double") / ($"n1" + $"n2")) *
          (lit(1.0) / $"n1" + lit(1.0) / $"n2")))
      wide.select(
        $"n1", $"x1", $"n2", $"x2",
        (floor(($"x1".cast("double") / $"n1") * 1e6 + 0.5) / 1e6).as("p1"),
        (floor(($"x2".cast("double") / $"n2") * 1e6 + 0.5) / 1e6).as("p2"),
        (floor((zExpr) * 1e6 + 0.5) / 1e6).as("z"),
        (abs(zExpr) < 1.96).as("same_rate_at_95"))
    },
    Some("""WITH spend AS (
           |  SELECT user_id, sum(round(value * 100)::BIGINT) AS cents
           |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
           |tot AS (SELECT count(*) AS n_users, sum(cents) AS total_cents
           |        FROM spend),
           |users AS (
           |  SELECT user_id,
           |         (cents * n_users > total_cents)::INT AS converted,
           |         ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2
           |           AS cohort
           |  FROM spend CROSS JOIN tot),
           |c AS (SELECT cohort, count(*) AS n, sum(converted) AS x
           |      FROM users GROUP BY cohort),
           |wide AS (
           |  SELECT sum(CASE WHEN cohort = 0 THEN n END)::BIGINT AS n1,
           |         sum(CASE WHEN cohort = 0 THEN x END)::BIGINT AS x1,
           |         sum(CASE WHEN cohort = 1 THEN n END)::BIGINT AS n2,
           |         sum(CASE WHEN cohort = 1 THEN x END)::BIGINT AS x2
           |  FROM c)
           |SELECT n1, x1, n2, x2,
           |       (floor((x1::DOUBLE / n1) * 1e6 + 0.5) / 1e6) AS p1,
           |       (floor((x2::DOUBLE / n2) * 1e6 + 0.5) / 1e6) AS p2,
           |       (floor(((x1::DOUBLE / n1 - x2::DOUBLE / n2) /
           |         nullif(sqrt(((x1 + x2)::DOUBLE / (n1 + n2)) *
           |              (1.0 - (x1 + x2)::DOUBLE / (n1 + n2)) *
           |              (1.0 / n1 + 1.0 / n2)), 0)) * 1e6 + 0.5) / 1e6) AS z,
           |       (abs((x1::DOUBLE / n1 - x2::DOUBLE / n2) /
           |         nullif(sqrt(((x1 + x2)::DOUBLE / (n1 + n2)) *
           |              (1.0 - (x1 + x2)::DOUBLE / (n1 + n2)) *
           |              (1.0 / n1 + 1.0 / n2)), 0)) < 1.96) AS same_rate_at_95
           |FROM wide""".stripMargin))

  /** χ² test of independence on the (weekday × event type) contingency
    * table — "does the event mix depend on the weekday", completing the
    * engine's test family (Welch t, two-proportion z, KS, ANOVA F, and
    * the feature-selection χ² which is per-token 2×2). Observed counts
    * exact; expected = row·col/N on identical integers; each cell's
    * (o−e)²/e is 6dp-prerounded DECIMAL then summed exactly — the
    * PSI/PMI pattern. One scan-local agg + a 35-row reduction. */
  private val chisqIndep = Q(
    "stats_chisq_independence",
    (s, dir) => {
      import s.implicits._
      val cells = Tables(s, dir).events
        .groupBy(dayofweek(to_date($"ts")).as("dow"), $"event_type")
        .agg(count(lit(1)).as("o"))
      val rowT = cells.groupBy($"dow").agg(sum($"o").as("rt"))
      val colT = cells.groupBy($"event_type").agg(sum($"o").as("ct"))
      val n = cells.agg(sum($"o").as("n"),
        count_distinct($"dow").as("r"),
        count_distinct($"event_type").as("c"))
      cells.join(broadcast(rowT), "dow").join(broadcast(colT), "event_type")
        .crossJoin(broadcast(n))
        .withColumn("e", ($"rt" * $"ct").cast("double") / $"n")
        .withColumn("term",
          (floor((($"o" - $"e") * ($"o" - $"e") / $"e") * 1e6 + 0.5) / 1e6)
            .cast("decimal(18,6)"))
        .agg(max($"n").as("n_events"),
          ((max($"r") - 1) * (max($"c") - 1)).cast("int").as("df"),
          (floor((sum($"term").cast("double")) * 1e4 + 0.5) / 1e4).as("chi2"))
    },
    Some("""WITH cells AS (
           |  SELECT dayofweek(ts::DATE) + 1 AS dow, event_type,
           |         count(*) AS o
           |  FROM events GROUP BY 1, 2),
           |rt AS (SELECT dow, sum(o) AS rt FROM cells GROUP BY dow),
           |ct AS (SELECT event_type, sum(o) AS ct FROM cells
           |       GROUP BY event_type),
           |n AS (SELECT sum(o) AS n, count(DISTINCT dow) AS r,
           |             count(DISTINCT event_type) AS c
           |      FROM cells),
           |terms AS (
           |  SELECT n.n, n.r, n.c,
           |         (floor(((o - (rt * ct)::DOUBLE / n.n) *
           |               (o - (rt * ct)::DOUBLE / n.n) /
           |               ((rt * ct)::DOUBLE / n.n)) * 1e6 + 0.5) / 1e6)::DECIMAL(18,6)
           |           AS term
           |  FROM cells JOIN rt USING (dow) JOIN ct USING (event_type)
           |  CROSS JOIN n)
           |SELECT max(n)::BIGINT AS n_events,
           |       ((max(r) - 1) * (max(c) - 1))::INT AS df,
           |       (floor((sum(term)::DOUBLE) * 1e4 + 0.5) / 1e4) AS chi2
           |FROM terms""".stripMargin))

  def all: Seq[Q] =
    Seq(rollupQ, dispersion, percentiles, approxPct, profileQ, sketch, cubeQ,
      groupingSets, ntileQ, rangeFrame, histogram, correlation, heavyHitters,
      aucQ, liftQ, madQ, madExact, winsorize, winsorizeExact, hllCumulative,
      ttest, basket, gini, ksTest,
      zipf, anova, psi, cusum, benford, entropyDaily, halfsampleCi,
      propZtest, chisqIndep)
}
