package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.PartitionLedger

/** The STORED banded-postings index behind incremental near-dup
  * ([[DedupOps.writeBandedIndex]] / [[DedupOps.lshProbeCandidatesStored]]):
  * equivalence with the in-memory probe, the append path, ledger-driven
  * idempotence, and both pruning regimes (scan-level IN pushdown vs
  * broadcast semi-join). */
class BandedIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val signed = {
    val docs = graft.core.Tables(spark, graft.TestSpark.sfDir).documents
      .select($"doc_id", array_distinct(TextOps.shingles($"text", 2)).as("sh"))
    docs.withColumn("sig", DedupOps.minhashSignature($"sh", 16))
      .select($"doc_id", $"sig")
  }

  test("stored probe == in-memory probe; appended increments both count; " +
       "ledger makes re-appends no-ops") {
    val idx = java.nio.file.Files.createTempDirectory("graft-bidx").toString
    val ledger = new PartitionLedger(
      java.nio.file.Files.createTempDirectory("graft-bidx-ledger")
        .resolve("ledger.tsv").toString)
    // two history increments, appended only when the ledger says so —
    // the production incremental loop
    val increments = Seq("inc1" -> 1, "inc2" -> 2)
    for ((name, m) <- increments
         if !ledger.isProcessed("banded_index", name)) {
      DedupOps.writeBandedIndex(signed.filter($"doc_id" % 3 === m),
        "doc_id", "sig", 4, 4, idx, append = m != 1)
      ledger.markProcessed("banded_index", name)
    }
    def files() = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val nFiles = files()
    // re-running the loop appends nothing: both increments are marked
    assert(ledger.unprocessed("banded_index", increments.map(_._1)).isEmpty)
    val batch = signed.filter($"doc_id" % 3 === 0)
    val stored = DedupOps.lshProbeCandidatesStored(spark, idx, batch,
      "doc_id", "sig", 4, 4).as[(Long, Long)].collect().toSet
    val mem = DedupOps.lshProbeCandidates(signed.filter($"doc_id" % 3 =!= 0),
      batch, "doc_id", "sig", 4, 4).as[(Long, Long)].collect().toSet
    assert(stored === mem)
    assert(stored.nonEmpty)
    assert(files() === nFiles)
    // layout: one hive partition dir per band
    val bandDirs = java.nio.file.Files.list(java.nio.file.Paths.get(idx))
      .filter(p => p.getFileName.toString.startsWith("band="))
      .count()
    assert(bandDirs === 4)
  }

  test("compaction collapses per-increment file sets into one bucket-" +
       "range layout; probe results unchanged") {
    val idx = java.nio.file.Files.createTempDirectory("graft-bidx3").toString
    // 4 increments -> 4 overlapping bucket-range file sets per band
    for (m <- 0 to 3)
      DedupOps.writeBandedIndex(signed.filter($"doc_id" % 4 === m),
        "doc_id", "sig", 4, 4, idx, filesPerBand = 2, append = m != 0)
    def files() = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val batch = signed.limit(50)
    val before = DedupOps.lshProbeCandidatesStored(spark, idx, batch,
      "doc_id", "sig", 4, 4).as[(Long, Long)].collect().toSet
    val nBefore = files()
    DedupOps.compactBandedIndex(spark, idx, filesPerBand = 2)
    val after = DedupOps.lshProbeCandidatesStored(spark, idx, batch,
      "doc_id", "sig", 4, 4).as[(Long, Long)].collect().toSet
    assert(after === before)
    assert(after.nonEmpty)
    assert(files() < nBefore,
      s"compaction did not reduce the file count (${files()} vs $nBefore)")
    // the temp sibling is gone after the swap
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(idx + ".__compact__")))
  }

  test("a crash at ANY compaction phase loses nothing: recover() restores " +
       "a complete index with identical probe results") {
    val batch = signed.limit(50)
    case class SimulatedCrash(phase: String) extends RuntimeException(phase)
    for (crashAt <- Seq("written", "aside", "swapped")) {
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-bidx-crash-$crashAt").toString
      for (m <- 0 to 2)
        DedupOps.writeBandedIndex(signed.filter($"doc_id" % 3 === m),
          "doc_id", "sig", 4, 4, idx, filesPerBand = 2, append = m != 0)
      val before = DedupOps.lshProbeCandidatesStored(spark, idx, batch,
        "doc_id", "sig", 4, 4).as[(Long, Long)].collect().toSet
      // kill the maintenance job mid-swap at this phase…
      val thrown = intercept[SimulatedCrash] {
        DedupOps.compactBandedIndex(spark, idx, filesPerBand = 2,
          onPhase = p => if (p == crashAt) throw SimulatedCrash(p))
      }
      assert(thrown.phase === crashAt)
      // …then run crash recovery, as the next maintenance run would
      DedupOps.recoverBandedIndex(spark, idx)
      val after = DedupOps.lshProbeCandidatesStored(spark, idx, batch,
        "doc_id", "sig", 4, 4).as[(Long, Long)].collect().toSet
      assert(after === before, s"probe set changed after crash at $crashAt")
      assert(after.nonEmpty)
      for (sib <- Seq(".__compact__", ".__old__"))
        assert(!java.nio.file.Files.exists(
          java.nio.file.Paths.get(idx + sib)),
          s"sibling $sib survived recovery after crash at $crashAt")
      // a re-run of compaction completes normally on the recovered index
      DedupOps.compactBandedIndex(spark, idx, filesPerBand = 2)
      val compacted = DedupOps.lshProbeCandidatesStored(spark, idx, batch,
        "doc_id", "sig", 4, 4).as[(Long, Long)].collect().toSet
      assert(compacted === before)
    }
    // a typo'd / never-written path must fail loudly, not silently "heal"
    intercept[IllegalStateException] {
      DedupOps.recoverBandedIndex(spark, "/tmp/graft-no-such-index")
    }
  }

  test("self-maintaining append: the growth-factor policy compacts when " +
       "the layout degrades and never changes probe results") {
    import java.nio.file.{Files, Paths}
    val batch = signed.limit(50)
    val idx = Files.createTempDirectory("graft-bidx-maintained").toString
    def nFiles() = java.nio.file.Files.walk(Paths.get(idx))
      .filter(p => p.toString.endsWith(".parquet")).count()
    // bands=4, filesPerBand=2, growthFactor=2 → compact past 16 files;
    // each append lays down ≤ 8, so the trigger must fire within the
    // first 8 increments and keep the layout bounded thereafter
    val compactions = (0 until 8).map { m =>
      DedupOps.appendBandedIndexMaintained(
        signed.filter($"doc_id" % 8 === m), "doc_id", "sig", 4, 4, idx,
        filesPerBand = 2, growthFactor = 2)
    }
    assert(compactions.exists(identity),
      "the growth trigger never fired across 8 appends")
    assert(nFiles() <= 4L * 2 * 2 + 8,
      s"maintained layout unbounded: ${nFiles()} files")
    // parity: the maintained index probes identically to in-memory
    // re-banding over the full corpus
    val stored = DedupOps.lshProbeCandidatesStored(spark, idx, batch,
      "doc_id", "sig", 4, 4).as[(Long, Long)].collect().toSet
    val mem = DedupOps.lshProbeCandidates(signed, batch,
      "doc_id", "sig", 4, 4).as[(Long, Long)].collect().toSet
    assert(stored === mem)
    assert(stored.nonEmpty)
    // a generous growth factor is a no-op policy: no compaction fires
    val idx2 = Files.createTempDirectory("graft-bidx-noop").toString
    val fired = (0 until 3).map { m =>
      DedupOps.appendBandedIndexMaintained(
        signed.filter($"doc_id" % 3 === m), "doc_id", "sig", 4, 4, idx2,
        filesPerBand = 2, growthFactor = 1000)
    }
    assert(!fired.exists(identity))
  }

  test("a PARTIAL live directory (no _SUCCESS — the non-atomic-rename " +
       "casualty) is never blessed as whole: recovery rolls forward over " +
       "it when a complete compact set exists, and fails loudly when no " +
       "complete copy exists anywhere") {
    import java.nio.file.{Files, Paths}
    val batch = signed.limit(50)
    // partial dst + COMPLETE __compact__ → roll forward, drop the debris
    val idx = Files.createTempDirectory("graft-bidx-partial").toString
    DedupOps.writeBandedIndex(signed, "doc_id", "sig", 4, 4, idx,
      filesPerBand = 2)
    val before = DedupOps.lshProbeCandidatesStored(spark, idx, batch,
      "doc_id", "sig", 4, 4).as[(Long, Long)].collect().toSet
    // stage a completed compact sibling, then mutilate the live dir the
    // way a crashed copy+delete rename would: drop its _SUCCESS marker
    case class Crash() extends RuntimeException
    intercept[Crash] {
      DedupOps.compactBandedIndex(spark, idx, filesPerBand = 2,
        onPhase = p => if (p == "written") throw Crash())
    }
    Files.delete(Paths.get(idx, "_SUCCESS"))
    DedupOps.recoverBandedIndex(spark, idx)
    val after = DedupOps.lshProbeCandidatesStored(spark, idx, batch,
      "doc_id", "sig", 4, 4).as[(Long, Long)].collect().toSet
    assert(after === before, "roll-forward over a partial live dir changed the probe set")
    for (sib <- Seq(".__compact__", ".__old__"))
      assert(!Files.exists(Paths.get(idx + sib)))
    // partial dst, NO complete sibling → refuse to bless it as whole
    val lone = Files.createTempDirectory("graft-bidx-lone").toString
    DedupOps.writeBandedIndex(signed, "doc_id", "sig", 4, 4, lone,
      filesPerBand = 2)
    Files.delete(Paths.get(lone, "_SUCCESS"))
    val ex = intercept[IllegalStateException] {
      DedupOps.recoverBandedIndex(spark, lone)
    }
    assert(ex.getMessage.contains("PARTIAL"))
  }

  test("small batch pushes a bucket IN-list to the parquet scan; the " +
       "semi-join regime (maxPushdownBuckets=0) returns the same pairs") {
    val idx = java.nio.file.Files.createTempDirectory("graft-bidx2").toString
    DedupOps.writeBandedIndex(signed.filter($"doc_id" % 3 =!= 0),
      "doc_id", "sig", 4, 4, idx)
    val batch = signed.filter($"doc_id" % 3 === 0).limit(20)
    val pushed = DedupOps.lshProbeCandidatesStored(spark, idx, batch,
      "doc_id", "sig", 4, 4)
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("In(bucket"),
      s"expected a bucket IN-list in PushedFilters, plan:\n$plan")
    val semi = DedupOps.lshProbeCandidatesStored(spark, idx, batch,
      "doc_id", "sig", 4, 4, maxPushdownBuckets = 0)
    assert(pushed.as[(Long, Long)].collect().toSet ===
      semi.as[(Long, Long)].collect().toSet)
  }
}
