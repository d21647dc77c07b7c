package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage probe for the r15 rarest-prefix swap: times the prefix-selection
  * stage ALONE (agg vs window, min-of-3, noop) and under candidate
  * configs, so the whole-query A/B's verdict can be attributed to the
  * right stage. Dev tool, not on any query path. */
object Opt15Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-opt15-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.core.Lineage.LineageOps
    import graft.operators.{DedupOps, TextOps}

    def run(df: => DataFrame): Double = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }.min

    val par = spark.sparkContext.defaultParallelism
    val docs = graft.core.Tables(spark, sfDir).documents
    def sets = docs
      .select($"doc_id", TextOps.shingles($"text", 2).as("sh"))
      .select($"doc_id".as("id"),
        sort_array(transform(array_distinct($"sh"), t => xxhash64(t))).as("s"))
      .withColumn("sz", size($"s"))
      .repartition(par)
      .cut(eager = false)
    def posting = sets.select($"id", $"sz", explode($"s").as("h"))

    for (t <- Seq(0.9, 0.5)) {
      val prefixLen = $"sz" - ceil(lit(t) * $"sz" - 1e-9) + 1
      val nAgg = DedupOps.rarestPrefixesAgg(posting, prefixLen).count()
      val nWin = DedupOps.rarestPrefixes(posting, prefixLen).count()
      val nPost = posting.count()
      println(f"[probe] t=$t rows: posting=$nPost prefix=$nAgg (win $nWin)")
      val tAgg = run(DedupOps.rarestPrefixesAgg(posting, prefixLen))
      val tWin = run(DedupOps.rarestPrefixes(posting, prefixLen))
      println(f"[probe] t=$t%.1f stage: agg=$tAgg%.3f window=$tWin%.3f (${tWin / tAgg}%.2fx win if >1)")
      // fallback threshold sensitivity: does the ObjectHashAggregate's
      // 128-group sort-based fallback dominate the agg stage?
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      val tAggBig = run(DedupOps.rarestPrefixesAgg(posting, prefixLen))
      spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      println(f"[probe] t=$t%.1f agg with 1e6 fallbackThreshold: $tAggBig%.3f")
    }

    // dispatch-probe cost in isolation: full count vs limit-bounded count
    // over the shingled projection (the form every *Auto dispatch counts)
    if (args.length <= 1 || args.contains("counts")) {
      val withShingles = docs
        .select($"doc_id", TextOps.shingles($"text", 2).as("shingles"))
      def timeIt(label: String)(f: => Long): Unit = {
        val t = (1 to passes).map { _ =>
          val t0 = System.nanoTime(); val n = f
          ((System.nanoTime() - t0) / 1e9, n)
        }.minBy(_._1)
        println(f"[probe] count-form $label%-22s ${t._1}%.3f s (n=${t._2})")
      }
      timeIt("full_count") { withShingles.select($"doc_id").count() }
      timeIt("limit_count") { withShingles.select($"doc_id").limit(10001).count() }
      timeIt("limit_count_100001") { withShingles.select($"doc_id").limit(100001).count() }
    }

    // pipeline_semdedup_embeddings stage split (coverage record): the
    // cluster-local pair scan vs the CC resolution over its pairs
    if (args.length <= 1 || args.contains("semdedup")) {
      import graft.operators.VectorOps
      val e = graft.core.Tables(spark, sfDir).embeddings
      def pairs = VectorOps.semdedupPairs(e, e.filter($"vec_id" < 8),
        "vec_id", "embedding", "vec_id", "embedding", 0.4)
      val nPairs = pairs.count()
      val tPairs = run(pairs)
      val tFull = run(SparkEntry.queries("pipeline_semdedup_embeddings")(spark, sfDir))
      println(f"[probe] semdedup: pairs=$nPairs rows, pairs_leg=$tPairs%.3f full=$tFull%.3f (cc+agg = ${tFull - tPairs}%.3f)")
    }
    spark.stop()
  }
}
