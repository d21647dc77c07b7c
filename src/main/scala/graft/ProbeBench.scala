package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark for the incremental near-dup probe: the in-memory
  * form re-bands the WHOLE history's signatures every probe (cost grows
  * with corpus size), the stored form reads the pre-banded index with
  * scan-level bucket pruning (cost tracks the batch). One JSON line:
  * build-once cost, then min-of-3 probe times for both forms at the
  * same batch size — the number that justifies the index at 100 TB.
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.ProbeBench"`. */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val signed = graft.core.Tables(spark, sfDir).documents
      .select($"doc_id", graft.operators.DedupOps.minhashSignature(
        graft.operators.TextOps.shingles($"text", 2), 16).as("sig"))
      .cut()
    // history = 99% of the corpus, batch = 1% — the production shape
    val hist = signed.filter($"doc_id" % 100 =!= 0)
    val batch = signed.filter($"doc_id" % 100 === 0)

    def time[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def probe(df: => DataFrame): Double =
      (1 to 3).map(_ => time(df.count())._1).min

    val idx = java.nio.file.Files
      .createTempDirectory("graft-probe-bench").toString
    val (buildSec, _) = time(graft.operators.DedupOps.writeBandedIndex(
      hist, "doc_id", "sig", 4, 4, idx))
    val memSec = probe(graft.operators.DedupOps.lshProbeCandidates(
      hist, batch, "doc_id", "sig", 4, 4))
    val storedSec = probe(graft.operators.DedupOps.lshProbeCandidatesStored(
      spark, idx, batch, "doc_id", "sig", 4, 4))
    val nPairs = graft.operators.DedupOps.lshProbeCandidatesStored(
      spark, idx, batch, "doc_id", "sig", 4, 4).count()
    println(s"""{"metric":"probe_bench","sf":"$sfDir",""" +
      s""""build_index_sec":$buildSec,"probe_inmemory_sec":$memSec,""" +
      s""""probe_stored_sec":$storedSec,"pairs":$nPairs}""")
    spark.stop()
  }

  private implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cut(): DataFrame = graft.core.Lineage.cut(df)
  }
}
