package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-2 A/B for the 1.5–2× movers vs the first-recorded baseline,
  * applying the two patterns OutlierAB proved (sort-first projection for
  * per-row compute below a range sort; round-robin repartition fence for
  * an exchange-less expensive stage below the sort) to the next five
  * candidates. Same protocol: one JVM, min-of-N, noop sink, exceptAll
  * identity check. Variants are the CHALLENGERS; `registry` is the
  * deployed form — a ratio > 1 means the challenger wins and should be
  * adopted (after which this file keeps the superseded form inline, as
  * OutlierAB does).
  *
  * Adjudication this tool produced (sf0.1, passes=3):
  *
  *   - `text_lang_id` — challenger ADOPTED (1.18×): sort first, run the
  *     n-gram marker scan once above the sort. `langSortFirst` is now
  *     the registry form; the inline variant here is the superseded
  *     classify-below-sort form.
  *   - `f8_string_slice_maturity` — challenger REFUTED (0.56×): the
  *     bond-key concat is cheap enough that evaluating it twice beats
  *     re-deriving it from (orderkey, orderdate) above the sort; the
  *     original ratio vs first baseline was host noise, not plan.
  *   - `dedup_simhash` — challenger REFUTED (0.83×): bucketedPairs'
  *     distinct already fences sampling; fencing the hamming filter too
  *     just adds a shuffle of the pair set.
  *   - `range_join_sessions` — challenger REFUTED (0.63×): the range
  *     join's post-exchange merge re-run under sampling is cheaper than
  *     round-robin repartitioning every match row.
  *   - `dedup_lines` — challenger REFUTED (0.63×): the per-doc
  *     string_agg's exchange fences its stage; the fence re-shuffles
  *     heavy clean_text rows for nothing.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.OutlierAB2 [passes]"`.
  */
object OutlierAB2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-outlier-ab2")
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

    // f8 challenger: sort on (orderkey, orderdate) first, build the bond
    // key strings above the sort
    def f8SortFirst: DataFrame = {
      import graft.operators.RelationalOps
      graft.core.Tables(spark, sfDir).orders
        .select($"o_orderkey", $"o_orderdate")
        .orderBy($"o_orderkey")
        .select($"o_orderkey",
          concat(lit("KR_"),
            (year($"o_orderdate") - ($"o_orderkey" % 5)).cast("string"),
            lit("-"),
            (year($"o_orderdate") + ($"o_orderkey" % 7)).cast("string")).as("bond_key"))
        .withColumn("matures_in", RelationalOps.maturesIn($"bond_key"))
    }

    // superseded lang_id: classify below the sort (marker scan runs twice)
    def langOld: DataFrame = {
      import graft.operators.TextOps
      graft.core.Tables(spark, sfDir).documents.select(
        $"doc_id", $"lang",
        TextOps.langId($"text").as("lang_pred"))
        .orderBy($"doc_id")
    }

    // simhash challenger: repartition fence between the hamming filter and
    // the sort (bucketedPairs' distinct fences ITS stage, but the hamming
    // evaluation over band arrays + filter still re-runs under sampling)
    def simhashFence: DataFrame = {
      import graft.operators.{DedupOps, TextOps}
      val d = graft.core.Tables(spark, sfDir).documents
      val sim = DedupOps.simhashes64(d, "doc_id", TextOps.tokens($"text"))
      val banded = sim.select($"id", $"bands", posexplode($"bands"))
        .select($"id", $"bands", $"pos".as("band"), $"col".as("bucket"))
      DedupOps.bucketedPairs(banded, carry = Seq("bands"))
        .select($"id_a", $"id_b",
          DedupOps.hammingBands($"bands_a", $"bands_b").cast("int").as("hamming"))
        .filter($"hamming" <= 3)
        .repartition(par)
        .orderBy($"id_a", $"id_b")
    }

    // range-join challenger: narrow rows through the sort (format after)
    // plus a fence so sampling re-reads shuffle blocks, not the range join
    def rangeJoinFence: DataFrame = {
      import graft.operators.RangeJoinOps
      val e = graft.core.Tables(spark, sfDir).events
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val sessions = e
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_ts".isNull ||
            unix_micros($"ts") - unix_micros($"prev_ts") > 600L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum($"new_session").over(
          byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
        .groupBy($"user_id", $"session_seq")
        .agg(min($"ts").as("session_start"), max($"ts").as("session_end"))
      val errors = e.filter($"event_type" === "error")
        .select($"user_id", $"event_id", $"ts")
      RangeJoinOps.pointInInterval(errors, sessions, "user_id",
          "ts", "session_start", "session_end", 600L * 1000000L)
        .select($"event_id", $"user_id", $"session_seq", $"session_start")
        .repartition(par)
        .orderBy($"event_id")
        .select($"event_id", $"user_id", $"session_seq",
          date_format($"session_start", "yyyy-MM-dd HH:mm:ss").as("session_start"))
    }

    // dedup_lines challenger: fence between the per-doc string_agg and
    // the sort
    def linesFence: DataFrame = {
      import graft.operators.DedupOps
      DedupOps.lineDedup(graft.core.Tables(spark, sfDir).documents, "doc_id", "text", 10)
        .withColumnRenamed("id", "doc_id")
        .repartition(par)
        .orderBy($"doc_id")
    }

    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("f8_string_slice_maturity", () => f8SortFirst, () => registry("f8_string_slice_maturity")),
      ("text_lang_id", () => langOld, () => registry("text_lang_id")),
      ("dedup_simhash", () => simhashFence, () => registry("dedup_simhash")),
      ("range_join_sessions", () => rangeJoinFence, () => registry("range_join_sessions")),
      ("dedup_lines", () => linesFence, () => registry("dedup_lines")))

    run(cases.head._2()); run(cases.head._3())
    val out = cases.map { case (name, challenger, reg) =>
      val tCh = run(challenger())
      val tReg = run(reg())
      val mismatch = challenger().exceptAll(reg()).count() + reg().exceptAll(challenger()).count()
      require(mismatch == 0, s"$name A/B forms disagree on $mismatch rows")
      println(f"$name%-28s challenger=$tCh%.3f registry=$tReg%.3f  (${tReg / tCh}%.2fx win if >1)")
      s""""$name":{"challenger_sec":$tCh,"registry_sec":$tReg}"""
    }
    println(s"""{"metric":"outlier_ab2","sf":"$sfDir","passes":$passes,${out.mkString(",")},"forms_identical":true}""")
    spark.stop()
  }
}
