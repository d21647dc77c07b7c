package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark for the incremental near-dup probe — the crossover
  * measurement that justifies (or refutes) the STORED banded index.
  *
  * Production shape under test: a long-lived history (written as MANY
  * appended increments, the way the incremental loop actually builds it)
  * probed by a small batch. The in-memory form re-bands the WHOLE
  * history's signatures every probe — cost grows with corpus size; the
  * stored form reads the pre-banded index with scan-level bucket pruning —
  * cost tracks the batch and the index's file layout. Three probe
  * variants are timed (isolated min-of-3 each):
  *
  *   - `probe_inmemory_sec`: re-band history + band batch + join.
  *   - `probe_stored_multifile_sec`: against the as-appended index
  *     (`increments` overlapping file sets per band — the worst case a
  *     maintenance-starved deployment probes).
  *   - `probe_stored_compacted_sec`: after [[DedupOps.compactBandedIndex]]
  *     restores the one-file-set-per-band layout.
  *
  * One JSON line per run; sweep SFs externally and compare columns.
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.ProbeBench [increments]"`.
  */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val increments = args.headOption.map(_.toInt).getOrElse(8)
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
    // history = 99% of the corpus, batch = 1% — history >> batch, the
    // regime the stored index exists for
    val hist = signed.filter($"doc_id" % 100 =!= 0)
    val batch = signed.filter($"doc_id" % 100 === 0)
    val (nHist, nBatch) = (hist.count(), batch.count())

    def time[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def probe(df: => DataFrame): Double =
      (1 to 3).map(_ => time(df.count())._1).min

    val idx = java.nio.file.Files
      .createTempDirectory("graft-probe-bench").toString
    // build the index the way production does: one append per increment
    val buildSecs = (0 until increments).map { i =>
      time(graft.operators.DedupOps.writeBandedIndex(
        hist.filter($"doc_id" % increments === i),
        "doc_id", "sig", 4, 4, idx, append = i != 0))._1
    }
    // SELF-MAINTAINED twin: same increments through the scheduling
    // policy (growthFactor=2 at filesPerBand=8 → compact past 64 files)
    // — the deployed shape; its probe must track the compacted curve,
    // not the multifile one
    val idxM = java.nio.file.Files
      .createTempDirectory("graft-probe-bench-maint").toString
    var nCompactions = 0
    val maintSecs = (0 until increments).map { i =>
      time {
        if (graft.operators.DedupOps.appendBandedIndexMaintained(
          hist.filter($"doc_id" % increments === i),
          "doc_id", "sig", 4, 4, idxM, growthFactor = 2)) nCompactions += 1
      }._1
    }
    val maintSec = probe(graft.operators.DedupOps.lshProbeCandidatesStored(
      spark, idxM, batch, "doc_id", "sig", 4, 4))
    val nPairsMaint = graft.operators.DedupOps.lshProbeCandidatesStored(
      spark, idxM, batch, "doc_id", "sig", 4, 4).count()

    val memSec = probe(graft.operators.DedupOps.lshProbeCandidates(
      hist, batch, "doc_id", "sig", 4, 4))
    val multiSec = probe(graft.operators.DedupOps.lshProbeCandidatesStored(
      spark, idx, batch, "doc_id", "sig", 4, 4))
    val (compactSec, _) = time(
      graft.operators.DedupOps.compactBandedIndex(spark, idx))
    val storedSec = probe(graft.operators.DedupOps.lshProbeCandidatesStored(
      spark, idx, batch, "doc_id", "sig", 4, 4))
    val nPairs = graft.operators.DedupOps.lshProbeCandidatesStored(
      spark, idx, batch, "doc_id", "sig", 4, 4).count()
    val nPairsMem = graft.operators.DedupOps.lshProbeCandidates(
      hist, batch, "doc_id", "sig", 4, 4).count()
    require(nPairs == nPairsMem,
      s"stored/in-memory probes disagree: $nPairs vs $nPairsMem")
    require(nPairsMaint == nPairsMem,
      s"maintained/in-memory probes disagree: $nPairsMaint vs $nPairsMem")
    println(s"""{"metric":"probe_bench","sf":"$sfDir",""" +
      s""""hist_docs":$nHist,"batch_docs":$nBatch,""" +
      s""""increments":$increments,""" +
      s""""build_index_sec":${buildSecs.sum},""" +
      s""""build_last_increment_sec":${buildSecs.last},""" +
      s""""maintained_build_sec":${maintSecs.sum},""" +
      s""""maintained_compactions":$nCompactions,""" +
      s""""probe_inmemory_sec":$memSec,""" +
      s""""probe_stored_multifile_sec":$multiSec,""" +
      s""""compact_sec":$compactSec,""" +
      s""""probe_stored_compacted_sec":$storedSec,""" +
      s""""probe_stored_maintained_sec":$maintSec,"pairs":$nPairs}""")
    spark.stop()
  }

  private implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cut(): DataFrame = graft.core.Lineage.cut(df)
  }
}
