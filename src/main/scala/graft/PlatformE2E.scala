package graft

import graft.io.{Layout, PartitionLedger, SchemaRegistry}
import graft.pipeline.{Failed, PlatformDay, Ran, Skipped}

/** One-day full-platform E2E, timed — runs [[graft.pipeline.PlatformDay]]
  * TWICE on a fresh lake (same ledger) and emits ONE JSON line with stage
  * timings, per-source results, and the run-twice ≡ run-once verdict (the
  * C3 invariant at platform scope). The committed artifact is
  * E2E_PLATFORM.json; BASELINE.md's operational envelope ("one day's
  * multi-source ingest+conform ≈ a 10-worker Glue job") is asserted
  * nowhere else end-to-end.
  *
  *   sbt "runMain graft.PlatformE2E [fixturesRoot]"
  */
object PlatformE2E {
  def main(args: Array[String]): Unit = {
    val fixtures = args.headOption.getOrElse(
      "/root/repo/src/test/resources/bronze")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-platform-e2e")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val layout = Layout(root)
    val ledger = new PartitionLedger(root + "/ledger.tsv")
    val registry = new SchemaRegistry(root + "/registry")

    def stamp(r: graft.pipeline.StageResult): String = r match {
      case Ran        => "ran"
      case Skipped(w) => s"skipped: $w"
      case Failed(e)  => s"failed: ${e.getClass.getSimpleName}"
    }
    val t0 = System.nanoTime()
    val first = PlatformDay.run(spark, layout, ledger, registry, fixtures)
    val firstSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val second = PlatformDay.run(spark, layout, ledger, registry, fixtures)
    val secondSec = (System.nanoTime() - t1) / 1e9

    val idempotent = first.snapshot == second.snapshot
    val rerunSkipped = second.daily.values.forall {
      case Skipped(_) => true; case _ => false
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    def jmap(m: Map[String, String]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val results = jmap(
      first.yearly.map { case (k, v) => s"yearly/$k" -> stamp(v) } ++
      first.monthly.map { case (k, v) => s"monthly/$k" -> stamp(v) } ++
      first.daily.map { case (k, v) => s"daily/$k" -> stamp(v) } ++
      first.backfill.map { case (k, v) => s"backfill/$k" -> stamp(v) } +
      ("silver/dim_industry_code" -> stamp(first.silver)))
    val stages = first.stageSec.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val snaps = first.snapshot.toSeq.sortBy(_._1)
      .map { case (k, (n, h)) => jstr(k) + s""":{"rows":$n,"hash":$h}""" }
      .mkString("{", ",", "}")
    val gitHead = try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD")
        .directory(new java.io.File("/root/repo")).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream)
        .mkString.trim
      if (p.waitFor() == 0) s""","git_head":${jstr(out)}""" else ""
    } catch { case _: Throwable => "" }
    val line =
      s"""{"metric":"platform_e2e_day","first_run_sec":$firstSec,""" +
      s""""rerun_sec":$secondSec,"idempotent":$idempotent,""" +
      s""""rerun_all_daily_skipped":$rerunSkipped,""" +
      s""""gold_rows":${first.goldRows},"stages":$stages,""" +
      s""""results":$results,"snapshot":$snaps$gitHead}"""
    println(line)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/E2E_PLATFORM.json"),
      (line + "\n").getBytes("UTF-8"))
    require(idempotent,
      "PLATFORM NOT IDEMPOTENT: second-run snapshot differs from the first")
    spark.stop()
  }
}
