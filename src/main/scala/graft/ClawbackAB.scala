package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B micro-benchmark for the round-14 exactness-cost claw-backs
  * (VERDICT r13 task 3): times the OLD form and the NEW registry form of
  * the two watch-list rewrites on the same JVM/host back-to-back, so the
  * before/after claim is host-factor-free. Cross-round artifact ratios
  * can't adjudicate these (the r14 box measured a median 1.25× slower
  * than the r13 box on 207 unchanged queries); this tool removes the
  * host from the comparison entirely.
  *
  *   - `stats_percentiles`: Spark's `percentile` aggregate (per-map-task
  *     value→count OpenHashMap, single-threaded merge+sort per group) vs
  *     [[graft.operators.ProfileOps.exactPercentiles]] (distributed-
  *     prefix global ranks — the high-cardinality path). The r14 verdict
  *     of this A/B: the aggregate wins at every SF of this corpus (its
  *     distinct-value count doesn't grow with SF), so the registry query
  *     deploys the aggregate and the exact op is the documented path
  *     past the aggregate's one-task-per-group merge ceiling.
  *   - `f1_conform_cast_rename`: `date_format` BELOW the orderBy (the
  *     range partitioner's sampling pass evaluates the child plan, so the
  *     formatter runs twice and the sort rows carry a 10-char string) vs
  *     the committed form that formats AFTER the sort.
  *
  * Results go to the noop sink (same materialization contract as
  * [[Bench]]); min-of-N per form, one JSON line.
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.ClawbackAB [passes]"`.
  */
object ClawbackAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-clawback-ab")
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

    val orders = graft.core.Tables(spark, sfDir).orders

    // OLD stats_percentiles: the catalyst `percentile` aggregate, with the
    // registry's exact rounding so both forms materialize identical bytes
    def pctOld: DataFrame = orders
      .groupBy($"o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50_raw"),
           expr("percentile(o_totalprice, 0.9)").as("p90_raw"))
      .select($"o_orderstatus",
        (floor($"p50_raw" * 1e4 + 0.5) / 1e4).as("p50"),
        (floor($"p90_raw" * 1e4 + 0.5) / 1e4).as("p90"))
      .orderBy($"o_orderstatus")
    def pctNew: DataFrame = graft.operators.ProfileOps
      .exactPercentiles(orders, "o_orderstatus", "o_totalprice",
        Seq(0.5 -> "p50_raw", 0.9 -> "p90_raw"))
      .select($"o_orderstatus",
        (floor($"p50_raw" * 1e4 + 0.5) / 1e4).as("p50"),
        (floor($"p90_raw" * 1e4 + 0.5) / 1e4).as("p90"))
      .orderBy($"o_orderstatus")

    // OLD f1: identical conform, but the formatter sits BELOW the sort
    def f1Old: DataFrame = graft.operators.RelationalOps.conform(
        graft.core.Tables(spark, sfDir).lineitem,
        keep = Seq("l_orderkey", "l_linenumber", "l_shipdate", "l_returnflag"),
        casts = Map("l_shipdate" -> "date"),
        renames = Map("l_orderkey" -> "order_key", "l_linenumber" -> "line_number",
          "l_shipdate" -> "ship_date", "l_returnflag" -> "return_flag"))
      .withColumn("ship_date", date_format(col("ship_date"), "yyyy-MM-dd"))
      .orderBy("order_key", "line_number")
    def f1New: DataFrame = SparkEntry.queries("f1_conform_cast_rename")(spark, sfDir)

    // warmup both code-path families untimed, then interleave A/B so any
    // slow drift in the host hits both forms symmetrically
    run(pctOld); run(f1New)
    val results = Seq(
      "percentile_agg_sec" -> run(pctOld),
      "percentile_rewrite_sec" -> run(pctNew),
      "f1_format_below_sort_sec" -> run(f1Old),
      "f1_rewrite_sec" -> run(f1New))

    // sanity: the two percentile forms must materialize identical rows
    val mismatch = pctOld.exceptAll(pctNew).count() + pctNew.exceptAll(pctOld).count()
    require(mismatch == 0, s"percentile A/B forms disagree on $mismatch rows")

    val kv = results.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"clawback_ab","sf":"$sfDir","passes":$passes,$kv,"forms_identical":true}""")
    spark.stop()
  }
}
