package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

class CalendarOpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val cal2025 = CalendarOps.calendarDim(spark, 2025, 2025).cache()

  test("calendar has one row per day, contiguous") {
    assert(cal2025.count() === 365)
    assert(cal2025.select(countDistinct($"date")).as[Long].head === 365L)
  }

  test("leap year 2024 has 366 days incl Feb 29") {
    val cal = CalendarOps.calendarDim(spark, 2024, 2024)
    assert(cal.count() === 366)
    assert(cal.filter($"date" === "2024-02-29").count() === 1)
  }

  test("derived columns match reference semantics (sql.py:26-82)") {
    // 2025-01-06 is a Monday: Redshift-style DOW = 1, Korean name 월요일
    val row = cal2025.filter($"date" === "2025-01-06").head()
    assert(row.getAs[Int]("year") === 2025)
    assert(row.getAs[Int]("quarter") === 1)
    assert(row.getAs[String]("quarter_id") === "2025Q1")
    assert(row.getAs[String]("month_id") === "202501")
    assert(row.getAs[String]("month_name") === "Jan")
    assert(row.getAs[Int]("day_of_week") === 1) // Redshift DOW: Sun=0
    assert(row.getAs[String]("day_name") === "월요일")
    assert(!row.getAs[Boolean]("is_market_holiday"))
    // Saturday is a weekend-holiday with DOW 6
    val sat = cal2025.filter($"date" === "2025-01-04").head()
    assert(sat.getAs[Int]("day_of_week") === 6)
    assert(sat.getAs[String]("day_name") === "토요일")
    assert(sat.getAs[Boolean]("is_market_holiday"))
  }

  test("previous working day: golden (Mon 2025-01-06 -> Fri 2025-01-03)") {
    val pwd = CalendarOps.previousWorkingDay(cal2025)
      .filter($"date" === "2025-01-06")
      .select($"previous_working_day").as[Date].head()
    assert(pwd.toString === "2025-01-03")
  }

  test("previous working day: window form == reference SQL subquery form") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      df.select($"date".cast("string"), $"previous_working_day".cast("string"))
        .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(rows(CalendarOps.previousWorkingDay(cal2025)) ===
      rows(CalendarOps.previousWorkingDaySql(spark, cal2025)))
  }

  test("year-end last weekday: closed form matches walk-back loop") {
    // reference walk-back (tasks_deprecated.py:35-42) reimplemented in Scala
    def walkBack(year: Int): java.time.LocalDate = {
      var d = java.time.LocalDate.of(year, 12, 31)
      while (d.getDayOfWeek.getValue > 5) d = d.minusDays(1)
      d
    }
    val got = spark.range(2015, 2031)
      .select($"id".cast("int").as("year"),
        CalendarOps.yearEndLastWeekday($"id".cast("int")).as("lwd"))
      .as[(Int, Date)].collect().toMap
    (2015 to 2030).foreach { y =>
      assert(got(y).toString === walkBack(y).toString, s"year $y")
    }
  }

  test("interval formats (bank_of_korea_operator.py:147-168)") {
    val d = to_date(lit("2024-07-15"))
    val row = spark.range(1).select(
      CalendarOps.formatForInterval(d, "DAILY").as("d"),
      CalendarOps.formatForInterval(d, "MONTHLY").as("m"),
      CalendarOps.formatForInterval(d, "QUARTERLY").as("q"),
      CalendarOps.formatForInterval(d, "YEARLY").as("y")).head()
    assert(row.getString(0) === "20240715")
    assert(row.getString(1) === "202407")
    assert(row.getString(2) === "2024Q3")
    assert(row.getString(3) === "2024")
  }

  test("holiday filter drops listed dates (F19)") {
    val days = Seq("2025-01-01", "2025-01-02", "2025-01-03").toDF("d")
    val holidays = Seq("2025-01-01").toDF("h")
    val out = CalendarOps.filterWorkingDays(days, "d", holidays, "h")
      .as[String].collect().sorted
    assert(out === Array("2025-01-02", "2025-01-03"))
  }
}
