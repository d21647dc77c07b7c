package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Config A/B for the round-14 join-strategy knobs (guide §3.1 / §9):
  * `spark.sql.join.preferSortMergeJoin=false` (planner may pick shuffled
  * hash join where its size conditions hold) and the AQE SMJ→SHJ rewrite
  * threshold (`spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`).
  * Both are runtime SQL confs, so the A/B runs in ONE JVM: each variant
  * times the same join-heavy query set (min-of-N, noop sink), and every
  * query's output is exceptAll-identity-checked across variants (the
  * engine's exactness doctrine makes results partitioning-invariant; this
  * verifies it holds under the strategy flip too).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.OptConfAB [passes]"`.
  */
object OptConfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-opt-conf-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val queries = Seq(
      "q2_min_cost_supplier", "q3_top_revenue_orders", "q7_nation_volume",
      "q8_market_share", "q9_product_profit_by_nation_year",
      "q18_large_volume_customers", "q21_waiting_suppliers_double_exists",
      "gold_asof_nearest", "gold_asof_align", "events_point_in_time_join",
      "range_join_sessions", "stats_basket_lift", "dedup_substring_spans",
      "text_decontaminate_spans", "mix_perplexity_buckets",
      "sim_sparse_tfidf_topk", "gold_rolling_corr", "dedup_excise_spans")

    val variants: Seq[(String, Map[String, String])] = Seq(
      "baseline" -> Map(
        "spark.sql.join.preferSortMergeJoin" -> "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "0"),
      "preferSHJ" -> Map(
        "spark.sql.join.preferSortMergeJoin" -> "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "0"),
      "aqeSHJ64m" -> Map(
        "spark.sql.join.preferSortMergeJoin" -> "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "67108864"),
      "both" -> Map(
        "spark.sql.join.preferSortMergeJoin" -> "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "67108864"))

    def run(name: String): Double = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }.min

    // warmup under baseline confs
    variants.head._2.foreach { case (k, v) => spark.conf.set(k, v) }
    run(queries.head); run(queries(1))

    val results = variants.map { case (vname, confs) =>
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val times = queries.map(q => q -> run(q))
      println(f"[confab] $vname%-10s total=${times.map(_._2).sum}%7.3f  " +
        times.map { case (q, t) => f"$q=$t%.2f" }.mkString(" "))
      vname -> times
    }

    // identity check: every query's output under each non-baseline variant
    // equals the baseline's (exactness doctrine under strategy flips)
    variants.head._2.foreach { case (k, v) => spark.conf.set(k, v) }
    val base: Map[String, DataFrame] =
      queries.map(q => q -> SparkEntry.queries(q)(spark, sfDir)).toMap
    variants.tail.foreach { case (vname, confs) =>
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      queries.foreach { q =>
        val challenger = SparkEntry.queries(q)(spark, sfDir)
        variants.head._2.foreach { case (k, v) => spark.conf.set(k, v) }
        val b = base(q)
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        val mismatch = challenger.exceptAll(b).count() + b.exceptAll(challenger).count()
        require(mismatch == 0, s"$vname/$q differs from baseline on $mismatch rows")
      }
      println(s"[confab] $vname identity: OK")
    }

    val js = results.map { case (v, ts) =>
      s""""$v":{${ts.map { case (q, t) => s""""$q":$t""" }.mkString(",")}}"""
    }.mkString(",")
    println(s"""{"metric":"opt_conf_ab","sf":"$sfDir","passes":$passes,$js}""")
    spark.stop()
  }
}
