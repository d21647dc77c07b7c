package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileHolidaySpec extends SparkSpec {
  import spark.implicits._

  test("holiday upsert flags exchange holidays on top of weekends (risk 2)") {
    val cal = CalendarOps.calendarDim(spark, 2025, 2025)
    // 2025-01-28/29 are weekdays (Tue/Wed) — Seollal holidays from S12
    val holidays = Seq("2025-01-28", "2025-01-29").toDF("locdate")
    val merged = CalendarOps.applyHolidays(cal, holidays, "locdate")
    assert(merged.count() === 365) // row-preserving upsert
    assert(merged.filter($"date" === "2025-01-28")
      .select($"is_market_holiday").as[Boolean].head())
    // weekends still flagged, plain weekdays still open
    assert(merged.filter($"date" === "2025-01-04")
      .select($"is_market_holiday").as[Boolean].head())
    assert(!merged.filter($"date" === "2025-01-30")
      .select($"is_market_holiday").as[Boolean].head())
    // idempotent: applying twice changes nothing
    val twice = CalendarOps.applyHolidays(merged, holidays, "locdate")
    assert(twice.filter($"is_market_holiday").count() ===
      merged.filter($"is_market_holiday").count())
  }

  test("profile: nulls/distinct/min/max in one pass; wide row is O(cols)") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")), (3L, Some("a")))
      .toDF("id", "s")
    val p = ProfileOps.profileLong(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))).toMap
    assert(p("id") === ((0L, 3L, "1", "3")))
    assert(p("s") === ((1L, 2L, "a", "b")))
  }

  test("HLL sketch distinct within 15% of exact on real tokens") {
    val toks = graft.core.Tables(spark, graft.TestSpark.sfDir).documents
      .select(explode(TextOps.tokens($"text")).as("t"))
    val exact = toks.select(countDistinct($"t")).as[Long].head()
    val approx = toks.select(approx_count_distinct($"t", 0.05)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact percentile at the sketch's rank error") {
    // accuracy 1000 -> rank error <= 1/1000: the approximate p50 must lie
    // between the exact p49 and p51 (per group, on the real orders table)
    val o = graft.core.Tables(spark, graft.TestSpark.sfDir).orders
    val rows = o.groupBy($"o_orderstatus")
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("ap50"),
        expr("percentile(o_totalprice, 0.49)").as("lo"),
        expr("percentile(o_totalprice, 0.51)").as("hi"))
      .as[(String, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (st, ap, lo, hi) =>
      assert(ap >= lo && ap <= hi, s"group $st: ap50=$ap not in [$lo,$hi]")
    }
  }
}
