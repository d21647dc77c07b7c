package graft.pipeline

import java.nio.file.Files
import graft.SparkSpec
import graft.io.{Layout, PartitionLedger, SchemaRegistry}

/** The one-day FULL-PLATFORM leg ([[PlatformDay]]): every reference DAG's
  * stage for one logical date on fixtures — yearly holiday/calendar leg,
  * monthly news leg, 13-source daily fan-out behind the C1 decision
  * query, the bounded
  * deprecated backfill (red path included), silver conform, gold — and
  * the C3 invariant AT PLATFORM SCOPE: run-twice ≡ run-once on content. */
class PlatformE2ESpec extends SparkSpec {

  private def fixtures =
    getClass.getResource("/bronze").getPath

  test("one platform day: every stage lands; rerun is ledger-skipped and " +
       "content-identical (C3 at platform scope)") {
    val root = Files.createTempDirectory("graft-e2e-spec").toString
    val layout = Layout(root)
    val ledger = new PartitionLedger(root + "/ledger.tsv")
    val registry = new SchemaRegistry(root + "/registry")

    val first = PlatformDay.run(spark, layout, ledger, registry, fixtures)

    // yearly leg: both holiday feeds + the calendar build ran
    assert(first.yearly.values.toSeq === Seq.fill(3)(Ran),
      s"yearly leg: ${first.yearly}")
    // monthly news leg ingested on its own (non-gated) logical date
    assert(first.monthly === Map("news" -> Ran))
    // daily fan-out: all 13 sources ingested (C1 let the Monday through)
    assert(first.daily.size === 13)
    assert(first.daily.values.forall(_ === Ran),
      s"daily statuses: ${first.daily.filterNot(_._2 == Ran)}")
    // backfill: bound clips 2020-01-02; the empty-output day FAILS by
    // contract (kr_etf_old raises, tasks_deprecated.py:84-87); two land
    assert(!first.backfill.contains("2020-01-02"),
      "the deprecated DAG bound did not clip the backfill request")
    assert(first.backfill("2019-12-26").isInstanceOf[Failed])
    assert(first.backfill("2019-12-27") === Ran)
    assert(first.backfill("2019-12-30") === Ran)
    // silver conform ran; gold produced the 3-row returns series (one
    // asset on 12-27, two on 12-30)
    assert(first.silver === Ran)
    assert(first.goldRows === 3L)
    // the calendar knows its holidays: Jan 1 flagged, Jan 6 open
    import org.apache.spark.sql.functions._
    val cal = spark.read.parquet(
      layout.source("silver", "calendar") + "/dim_calendar")
    assert(cal.filter(col("date") === lit("2025-01-01"))
      .select("is_market_holiday").head().getBoolean(0))
    assert(!cal.filter(col("date") === lit("2025-01-06"))
      .select("is_market_holiday").head().getBoolean(0))
    // every output table fingerprinted and non-empty
    assert(first.snapshot.size === 17 + 3)
    for ((t, (rows, _)) <- first.snapshot)
      assert(rows > 0, s"output table $t is empty")

    // ---- C3 at platform scope: the second day-run changes NOTHING -----
    val second = PlatformDay.run(spark, layout, ledger, registry, fixtures)
    assert(second.daily.values.forall {
      case Skipped(r) => r.contains("already processed"); case _ => false
    }, s"rerun daily statuses not ledger-skips: ${second.daily}")
    // the ledger re-attempts ONLY the failed backfill date
    assert(second.backfill.keySet === Set("2019-12-26"))
    assert(second.backfill("2019-12-26").isInstanceOf[Failed])
    assert(second.snapshot === first.snapshot,
      "platform rerun changed output content")
  }

  test("a holiday logical date short-circuits the WHOLE daily fan-out " +
       "before any source is touched (C1 at platform scope)") {
    val root = Files.createTempDirectory("graft-e2e-holiday").toString
    val layout = Layout(root)
    val ledger = new PartitionLedger(root + "/ledger.tsv")
    // yearly leg only, to get the holiday-aware calendar
    val runner = new Runner(spark, layout, ledger)
    runner.ingestAll(Seq(
      new graft.sources.MarketHolidayConnector(
        s"$fixtures/kr_market_holiday")), PlatformDay.HolidayYear)
    val calJob = new CalendarJob(spark, layout)
    calJob.runFor(2023)
    val cal = PlatformDay.calendarHolidaysApplied(spark, layout, calJob)
    val results = runner.ingestAll(
      PlatformDay.dailyConnectors(fixtures), "2025-01-01", Some(cal))
    assert(results.size === 13)
    assert(results.values.forall {
      case Skipped(r) => r.contains("holiday"); case _ => false
    }, s"holiday fan-out statuses: $results")
    // nothing landed in bronze
    for (c <- PlatformDay.dailyConnectors(fixtures))
      assert(!new java.io.File(
        layout.source("bronze", c.name) + "/ymd=2025-01-01").exists,
        s"${c.name} wrote bronze on a holiday")
  }
}
