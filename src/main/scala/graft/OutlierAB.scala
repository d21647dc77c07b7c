package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B micro-benchmark for the round-14 baseline-outlier claw-backs —
  * the five >2×-vs-first-baseline queries VERDICT r13's watch item left
  * unadjudicated after the stats_percentiles / f1 / text-scan rewrites.
  * Old and new forms run back-to-back in ONE JVM (cross-round artifact
  * ratios are host-polluted — the r14 box measures a median 1.25×
  * slower than the r13 box), min-of-N to the noop sink, every pair
  * identity-checked (exceptAll both ways) before the numbers print.
  *
  * Adjudication this tool produced (sf0.1, passes=3):
  *
  *   - `f7_interval_formats` — ADOPTED (1.34×): the f1 lesson verbatim;
  *     four per-row formatters sat BELOW the orderBy, so the range
  *     partitioner's sampling pass evaluated them twice and the sort
  *     rows carried four strings instead of one 4-byte date. `variant`
  *     here = the superseded format-below-sort form.
  *   - `q3_top_revenue_orders` — ADOPTED (1.11×): `date_format` below
  *     the TakeOrderedAndProject ran once per aggregated order (~150k
  *     rows at sf0.1) when only the surviving top-10 need it. `variant`
  *     = the superseded format-below-top-k form.
  *   - `dedup_ngram_jaccard` — ADOPTED (1.76×): the dense kernel's
  *     final stage (broadcast nested-loop join + codegen'd overlap
  *     kernel) has NO trailing exchange, so the orderBy sampling pass
  *     re-executed the whole O(n²) kernel; a round-robin repartition
  *     fence makes sampling re-read materialized shuffle blocks of the
  *     tiny pair set instead. `variant` = the unfenced form.
  *   - `dedup_inverted_index_pairs` — REJECTED (0.90×): the final
  *     distinct's exchange already fences the sampling pass; an extra
  *     repartition of the pair set is pure added shuffle. `variant` =
  *     the refuted repartition-fenced form; registry keeps the plain
  *     sort.
  *   - `window_range_frame` — REJECTED (0.85×): re-running the RANGE-
  *     frame window stage under sampling is cheaper than round-robin
  *     repartitioning every event row (plus its determinism sort).
  *     `variant` = the refuted fenced form; registry unchanged — its
  *     2.4× vs first baseline stands as the pinned exactness-doctrine
  *     cost (NOTES_r10 §1) times the host factor.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.OutlierAB [passes]"`.
  */
object OutlierAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-outlier-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def run(df: => DataFrame): Double = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min

    val par = spark.sparkContext.defaultParallelism
    def registry(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

    // superseded f7: formatters below the sort
    def f7Old: DataFrame = {
      import graft.operators.CalendarOps
      val d = to_date($"o_orderdate")
      graft.core.Tables(spark, sfDir).orders.select(
        $"o_orderkey",
        CalendarOps.formatForInterval(d, "DAILY").as("fmt_daily"),
        CalendarOps.formatForInterval(d, "MONTHLY").as("fmt_monthly"),
        CalendarOps.formatForInterval(d, "QUARTERLY").as("fmt_quarterly"),
        CalendarOps.formatForInterval(d, "YEARLY").as("fmt_yearly"))
        .orderBy($"o_orderkey")
    }

    // superseded q3: date_format below the TakeOrderedAndProject
    def q3Old: DataFrame = {
      import graft.functions.Sum128.sum128
      val tt = graft.core.Tables(spark, sfDir)
      tt.lineitem
        .join(tt.orders, $"l_orderkey" === $"o_orderkey")
        .join(tt.customer, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"c_mktsegment")
        .agg((floor(sum128(floor($"l_extendedprice" * 100 + 0.5) *
          (lit(100L) - floor($"l_discount" * 100 + 0.5))).cast("double") / 100 + 0.5) / 1e2)
          .as("revenue"))
        .select($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
          $"c_mktsegment", $"revenue")
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }

    // superseded dense-kernel sort: no repartition fence (sampling pass
    // re-executes the nested-loop join)
    def ngramOld: DataFrame = {
      import graft.operators.{DedupOps, TextOps}
      val withShingles = graft.core.Tables(spark, sfDir).documents
        .select($"doc_id", TextOps.shingles($"text", 2).as("shingles"))
      DedupOps.jaccardPairsDense(withShingles, "doc_id", "shingles", 0.5)
        .orderBy($"id_a", $"id_b")
    }

    // REFUTED variant: repartition fence over the inverted-index pairs
    def invFenced: DataFrame = {
      import graft.operators.{DedupOps, TextOps}
      val withShingles = graft.core.Tables(spark, sfDir).documents
        .select($"doc_id", TextOps.shingles($"text", 5).as("shingles"))
      DedupOps.invertedIndexPairs(withShingles, "doc_id", "shingles")
        .repartition(par)
        .orderBy($"id_a", $"id_b")
    }

    // REFUTED variant: repartition fence below the RANGE-frame window
    def wrfFenced: DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600L * 1000000L, 0L)
      graft.core.Tables(spark, sfDir).events
        .withColumn("trailing_1h_sum",
          (sum(floor($"value" * 100 + 0.5)).over(w) / 1e2))
        .select($"event_id", $"user_id", $"trailing_1h_sum")
        .repartition(par)
        .orderBy($"event_id")
    }

    // (name, old/refuted form, deployed registry form)
    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("f7_interval_formats", () => f7Old, () => registry("f7_interval_formats")),
      ("q3_top_revenue_orders", () => q3Old, () => registry("q3_top_revenue_orders")),
      ("dedup_ngram_jaccard", () => ngramOld, () => registry("dedup_ngram_jaccard")),
      ("dedup_inverted_index_pairs", () => invFenced,
        () => registry("dedup_inverted_index_pairs")),
      ("window_range_frame", () => wrfFenced, () => registry("window_range_frame")))

    // warm both code-path families untimed, then time the forms adjacent
    // so host drift hits them symmetrically
    run(cases.head._2()); run(cases.head._3())
    val out = cases.map { case (name, old, nw) =>
      val tOld = run(old())
      val tNew = run(nw())
      val mismatch = old().exceptAll(nw()).count() + nw().exceptAll(old()).count()
      require(mismatch == 0, s"$name A/B forms disagree on $mismatch rows")
      println(f"$name%-28s variant=$tOld%.3f registry=$tNew%.3f  (${tOld / tNew}%.2fx)")
      s""""$name":{"variant_sec":$tOld,"registry_sec":$tNew}"""
    }
    println(s"""{"metric":"outlier_ab","sf":"$sfDir","passes":$passes,${out.mkString(",")},"forms_identical":true}""")
    spark.stop()
  }
}
