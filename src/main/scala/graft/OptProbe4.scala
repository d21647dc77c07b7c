package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 probe batch 4: the dense/prefix crossover as a function of
  * THRESHOLD. The 10k-doc `spark.graft.dedup.denseCutoff` was measured
  * at t = 0.5; at t = 0.9 the prefix filter is ~10× more selective
  * (prefix length (1−t)·|s|+1), so the crossover must sit far lower —
  * the sf1 clean-corpus regression (dense 13.4 s vs PPJoin 3.7 s at
  * ~8k gated docs) is the symptom. Times both branches at several
  * corpus sizes and thresholds. Read-only.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<sf1 dir> sbt "runMain graft.OptProbe4 [passes]"`. */
object OptProbe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val passes = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-opt-probe4")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.{DedupOps, TextOps}

    def time(df: => DataFrame): Double = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min

    val docs = graft.core.Tables(spark, sfDir).documents
    for (n <- Seq(2000, 4000, 8000, 16000); t <- Seq(0.9, 0.5)) {
      val sub = docs.filter($"doc_id" % lit((50000 / n).max(1)) === 0)
        .select($"doc_id", TextOps.shingles($"text", 2).as("sh"))
      val dense = time(DedupOps.jaccardPairsDense(sub, "doc_id", "sh", t))
      // nDocs picks only the verify strategy — pass the subset size so
      // the branch matches what a deployed run of this size would use
      val prefix = time(DedupOps.jaccardPairs(sub, "doc_id", "sh", t,
        nDocs = n.toLong))
      println(f"[probe4] n=$n%-6d t=$t%.1f  dense=$dense%7.2f  prefix=$prefix%7.2f")
    }
    spark.stop()
  }
}
