package graft.gold

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GoldOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val prices = Seq(
    ("BTC", "2025-01-01", 100.0),
    ("BTC", "2025-01-02", 110.0),
    ("BTC", "2025-01-03", 99.0),
    ("BTC", "2025-01-04", 121.0),
    ("ETH", "2025-01-01", 10.0),
    ("ETH", "2025-01-02", 12.0)).toDF("ticker", "d", "close")

  test("returns: simple and log, null on first row") {
    val r = GoldOps.withReturns(prices, "ticker", "d", "close")
      .filter($"ticker" === "BTC").orderBy($"d")
      .select(round($"ret", 4), round($"log_ret", 4)).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(1).getDouble(0) === 0.1)
    assert(r(2).getDouble(0) === -0.1)
    assert(math.abs(r(1).getDouble(1) - math.log(1.1)) < 1e-3)
  }

  test("rolling MA over 2 rows") {
    val r = GoldOps.withRolling(
      GoldOps.withReturns(prices, "ticker", "d", "close"),
      "ticker", "d", "close", 2)
      .filter($"ticker" === "BTC").orderBy($"d")
      .select(round($"ma2", 2)).as[Double].collect()
    assert(r === Array(100.0, 105.0, 104.5, 110.0))
  }

  test("drawdown from running max") {
    val r = GoldOps.withDrawdown(prices, "ticker", "d", "close")
      .filter($"ticker" === "BTC").orderBy($"d")
      .select(round($"drawdown", 4)).as[Double].collect()
    assert(r(0) === 0.0)
    assert(r(2) === 0.1) // 1 - 99/110
    assert(r(3) === 0.0) // new high
  }

  test("as-of align carries last known sparse value onto the spine") {
    val spine = Seq(("KRW", "2025-01-01"), ("KRW", "2025-01-02"),
      ("KRW", "2025-01-03")).toDF("ccy", "d")
    val fx = Seq(("KRW", "2025-01-01", 1450.0), ("KRW", "2025-01-03", 1460.0))
      .toDF("ccy", "d", "rate")
    val out = GoldOps.asOfAlign(spine, fx, "ccy", "d", "rate")
      .orderBy($"d").select($"rate").as[Double].collect()
    assert(out === Array(1450.0, 1450.0, 1460.0))
  }

  test("calendar join labels holidays via broadcast") {
    val cal = graft.operators.CalendarOps.calendarDim(spark, 2025, 2025)
      .withColumn("date", date_format($"date", "yyyy-MM-dd"))
    val out = GoldOps.withCalendar(prices, cal, "d")
    // 2025-01-04 is a Saturday
    assert(out.filter($"d" === "2025-01-04")
      .select($"is_market_holiday").as[Boolean].head())
    assert(out.filter($"d" === "2025-01-02")
      .select($"quarter_id").as[String].head() === "2025Q1")
  }

  test("OHLC partials merge == batch resample, in any merge order") {
    val e = graft.core.Tables(spark, graft.TestSpark.sfDir).events
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"bucket", round($"open", 6).as("open"),
          round($"high", 6).as("high"), round($"low", 6).as("low"),
          round($"close", 6).as("close"), $"n".cast("long").as("n"))
        .as[(Long, String, Double, Double, Double, Double, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    val whole = canon(GoldOps.ohlcResample(e, "user_id", "ts", "event_id",
      "value", date_format($"ts", "yyyyMM")))
    // three disjoint chunks that cut straight through the MONTHLY bucket
    // (all events are January), so every merge must stitch partial bars:
    // earliest open wins, extremes combine, latest close wins, counts add
    val chunks = Seq($"ts" < "2024-01-11",
      $"ts" >= "2024-01-11" && $"ts" < "2024-01-21", $"ts" >= "2024-01-21")
      .map(p => GoldOps.ohlcPartials(e.filter(p), "user_id", "ts",
        "event_id", "value", date_format($"ts", "yyyyMM")))
    val fwd = canon(GoldOps.ohlcFinish(
      GoldOps.ohlcMergePartials(
        GoldOps.ohlcMergePartials(chunks(0), chunks(1), "user_id"),
        chunks(2), "user_id"), "user_id"))
    val rev = canon(GoldOps.ohlcFinish(
      GoldOps.ohlcMergePartials(chunks(0),
        GoldOps.ohlcMergePartials(chunks(2), chunks(1), "user_id"),
        "user_id"), "user_id"))
    assert(fwd === whole)
    assert(rev === whole)
  }

  test("asOfNearest: picks closer side, ties to earlier, honors tolerance") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val spine = Seq(("A", ts(100)), ("A", ts(200)), ("A", ts(300)),
      ("A", ts(1000)), ("B", ts(50)))
      .toDF("k", "ts")
    val sparse = Seq(
      ("A", ts(95), 1.0),   // 5s before t=100 (next is 12s after → prev wins)
      ("A", ts(112), 2.0),  // 12s after t=100; 88s before t=200
      ("A", ts(288), 3.0),  // 88s after t=200 → TIE with prev at 88s → prev
      ("A", ts(300), 4.0),  // exact hit for t=300 (simultaneous counts as before)
      ("B", ts(49), 9.0))
      .toDF("k", "ts", "v")
    def run(tolUs: Long) =
      GoldOps.asOfNearest(spine, sparse, "k", "ts", "v", tolUs)
        .orderBy($"k", $"ts")
        .select($"k", $"v", $"matched_delta_us")
        .as[(String, Option[Double], Option[Long])].collect().toSeq
    // tolerance 60 s: the t=200 row (88 s to both sides) matches nothing
    assert(run(60L * 1000000L) === Seq(
      ("A", Some(1.0), Some(5000000L)),  // prev 5 s beats next 12 s
      ("A", None, None),                 // both candidates beyond tolerance
      ("A", Some(4.0), Some(0L)),        // simultaneous sparse row counts
      ("A", None, None),                 // t=1000: nearest is 700 s away
      ("B", Some(9.0), Some(1000000L))))
    // tolerance 100 s: t=200 sees an exact 88 s tie → earlier (prev) wins
    assert(run(100L * 1000000L)(1) === ("A", Some(2.0), Some(88000000L)))
  }

  test("denseForwardFill: every day in each key's range, LOCF, fill flag") {
    val sparse = Seq(("A", "2025-01-01", 10.0), ("A", "2025-01-04", 13.0),
      ("B", "2025-01-02", 5.0))
      .toDF("k", "d", "v").withColumn("d", to_date($"d"))
    val out = GoldOps.denseForwardFill(sparse, "k", "d", "v")
      .orderBy($"k", $"d")
      .select($"k", date_format($"d", "yyyy-MM-dd"), $"v", $"filled")
      .as[(String, String, Double, Boolean)].collect().toSeq
    // A densified to 4 days (gap days carry 10.0 and are flagged), B to 1
    assert(out === Seq(
      ("A", "2025-01-01", 10.0, false), ("A", "2025-01-02", 10.0, true),
      ("A", "2025-01-03", 10.0, true), ("A", "2025-01-04", 13.0, false),
      ("B", "2025-01-02", 5.0, false)))
  }

  test("rolling median: exact interpolated percentile over the frame") {
    val out = GoldOps.withRollingMedian(prices, "ticker", "d", "close", 2)
      .filter($"ticker" === "BTC").orderBy($"d")
      .select(round($"med2", 2)).as[Double].collect()
    // frames: [100], [100,110], [110,99], [99,121]
    assert(out === Array(100.0, 105.0, 104.5, 110.0))
  }
}
