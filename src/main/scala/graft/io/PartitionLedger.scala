package graft.io

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Processed-partition ledger — the engine's stand-in for Glue job
  * bookmarks (industry_code_glue_job.py:26-32) and Airflow's
  * already-ran-this-ds bookkeeping: a driver-side append-only record of
  * `(source, ymd)` marks, so incremental runs skip work that is already
  * done and backfills can be resumed.
  *
  * Driver-side by design: the ledger is metadata (thousands of rows, not
  * data-scale), exactly like Glue bookmarks live in the Glue service, so
  * a plain file beats a Spark job here.
  */
final class PartitionLedger(path: String) {
  private val file: Path = Paths.get(path)

  private def readAll(): Set[(String, String)] =
    if (!Files.exists(file)) Set.empty
    else Files.readAllLines(file).asScala.filter(_.nonEmpty).map { line =>
      val Array(s, d) = line.split("\t", 2)
      (s, d)
    }.toSet

  def isProcessed(source: String, ymd: String): Boolean =
    readAll().contains((source, ymd))

  def markProcessed(source: String, ymd: String): Unit = {
    if (!isProcessed(source, ymd)) {
      Files.createDirectories(file.getParent)
      Files.write(file, s"$source\t$ymd\n".getBytes,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** The dates in `candidates` not yet processed for `source` — the
    * incremental frontier for a backfill loop. */
  def unprocessed(source: String, candidates: Seq[String]): Seq[String] = {
    val done = readAll().collect { case (s, d) if s == source => d }
    candidates.filterNot(done)
  }
}
