package graft.operators

import graft.SparkSpec
import graft.functions.Sum128
import graft.functions.Sum128.sum128
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.Decimal
import org.scalatest.prop.TableDrivenPropertyChecks

/** [[graft.functions.Sum128]] — exact 128-bit integer sum.
  *
  * Contract: bit-identical to `sum(x.cast("decimal(38,0)"))` (the
  * determinism class's reference form) on every input where both are
  * defined, while keeping a primitive two-long buffer that stays inside
  * whole-stage-codegen'd HashAggregateExec. The adversarial cases are
  * the carry paths: totals crossing 2⁶³ in both directions, alternating
  * signs (hi-half borrow), lo-half wraparound, and partial-merge order
  * across many partitions.
  */
class Sum128Spec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def reference(colName: String) =
    sum(col(colName).cast("decimal(38,0)"))

  test("static composition helper: hi/lo halves round-trip BigInteger") {
    val cases = Seq(
      BigInt(0), BigInt(1), BigInt(-1), BigInt(Long.MaxValue),
      BigInt(Long.MinValue), BigInt(Long.MaxValue) + 1,
      BigInt(Long.MinValue) - 1, BigInt("123456789012345678901234567890"),
      BigInt("-99999999999999999999999999999999999999"), // -(10^38-1)
      BigInt("99999999999999999999999999999999999999"))
    for (v <- cases) {
      val hi = (v >> 64).toLong
      val lo = v.toLong // low 64 bits, two's complement
      assert(Sum128.toDecimal(hi, lo) === Decimal(BigDecimal(v), 38, 0),
        s"composing $v from hi=$hi lo=$lo")
    }
  }

  test("bit-equal to sum(cast(decimal(38,0))): totals crossing 2^63 both ways") {
    // 200 values near +/-2^62: partial sums repeatedly cross the long
    // boundary and flip sign, exercising carry and borrow on every merge
    val big = (0 until 200).map { i =>
      if (i % 2 == 0) Long.MaxValue / 2 + i else Long.MinValue / 2 - 3 * i
    }
    val df = big.toDF("x").repartition(7)
    val got = df.agg(sum128($"x").as("s"), reference("x").as("r"))
      .select($"s", $"r", ($"s" === $"r").as("eq")).head()
    assert(got.getBoolean(2), s"sum128=${got.get(0)} ref=${got.get(1)}")
    assert(got.getDecimal(0).toBigInteger ===
      big.map(BigInt(_)).sum.bigInteger)
  }

  test("grouped: random 64-bit values, 11 partitions, per-group equality") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 5000).map(i => (i % 13, rnd.nextLong()))
    val df = rows.toDF("k", "x").repartition(11)
    val bad = df.groupBy($"k")
      .agg(sum128($"x").as("s"), reference("x").as("r"))
      .where($"s" =!= $"r" || $"s".isNull =!= $"r".isNull)
    assert(bad.count() === 0)
    // and against a driver-side BigInt oracle
    val got = df.groupBy($"k").agg(sum128($"x").as("s"))
      .collect().map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger))
      .toMap
    val want = rows.groupBy(_._1).map { case (k, v) =>
      k -> v.map(t => BigInt(t._2)).sum }
    assert(got === want)
  }

  test("null semantics match sum: nulls skipped, all-null group is NULL") {
    val df = Seq[(Int, java.lang.Long)](
      (1, 10L), (1, null), (1, -3L), (2, null), (2, null))
      .toDF("k", "x")
    val rows = df.groupBy($"k")
      .agg(sum128($"x").as("s"), reference("x").as("r"))
      .orderBy($"k").collect()
    assert(rows(0).getDecimal(1) === rows(0).getDecimal(2))
    assert(rows(0).getDecimal(1).longValueExact === 7L)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("empty relation aggregates to NULL (global aggregate)") {
    val df = spark.range(0).select($"id".as("x"))
    val row = df.agg(sum128($"x").as("s")).head()
    assert(row.isNullAt(0))
  }

  test("input contract: a fractional column is REJECTED at analysis, " +
       "never silently truncated") {
    // the helper used to cast("long") for the caller — a non-integer
    // double like 2.5 truncated to 2 with no diagnostic (VERDICT r11
    // watch-item). The aggregate now rejects non-integral inputs at
    // type-check time with an actionable message.
    val df = Seq(2.5, 3.0, -2.5e13).toDF("x")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(sum128($"x").as("s")).collect()
    }
    assert(ex.getMessage.contains("sum128 expects an integral column"),
      s"unexpected analysis error: ${ex.getMessage}")
    // a caller with exact integer-valued doubles writes the cast
    // explicitly — loud in the code, exact below 2^53
    val ok = Seq(1.0e14, 3.0, -2.5e13).toDF("x")
      .agg(sum128($"x".cast("long")).as("s")).head()
    assert(ok.getDecimal(0).longValueExact === 75000000000003L)
  }

  test("toDecimal past +/-10^38 THROWS (documented fail-loud divergence " +
       "from the NULLing non-ANSI decimal sum)") {
    // 2^127-ish magnitude: hi = Long.MinValue is -2^127 + lo
    intercept[ArithmeticException] {
      Sum128.toDecimal(Long.MinValue, 0L)
    }
    // and just past the decimal cap from the positive side: 10^38
    val tenPow38 = BigInt(10).pow(38)
    intercept[ArithmeticException] {
      Sum128.toDecimal((tenPow38 >> 64).toLong, tenPow38.toLong)
    }
    // the cap itself minus one is representable
    val cap = tenPow38 - 1
    assert(Sum128.toDecimal((cap >> 64).toLong, cap.toLong)
      .toBigDecimal === BigDecimal(cap))
  }

  test("works as a window function, equal to the decimal-sum frame") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"i")
      .rowsBetween(Long.MinValue, 0)
    val df = (0 until 300)
      .map(i => (i % 3, i, Long.MaxValue / 3 * (if (i % 2 == 0) 1 else -1)))
      .toDF("k", "i", "x")
    val bad = df
      .withColumn("s", sum128($"x").over(w))
      .withColumn("r", sum($"x".cast("decimal(38,0)")).over(w))
      .where($"s" =!= $"r" || $"s".isNull =!= $"r".isNull)
    assert(bad.count() === 0)
  }

  test("wide aggregate with non-trivial children COMPILES under codegen") {
    // regression pin: a redundant Cast around the child desynced the
    // CSE key used by split-function codegen — janino failed and Spark
    // silently fell back to the interpreted path (same results, no
    // codegen). Compile the generated source directly; fallback hides
    // nothing from this.
    import org.apache.spark.sql.graft.bridge
    val wide = spark.range(0, 100)
      .select(($"id" % 3).as("k"), $"id".as("x"))
    val aggs = (0 until 11).map(i =>
      sum128(floor($"x" * 1.5 + lit(i))).as(s"s$i"))
    val df = wide.groupBy($"k").agg(aggs.head, aggs.tail: _*)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // AQE hides spans inside (recursively nested) query stages — expand
    // every stage's plan and compile each fragment
    def expand(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val stages = p.collect {
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          s.plan
      }
      p +: stages.flatMap(expand)
    }
    val nSpans = expand(finalPlan).map(bridge.compileWholeStageSpans).sum
    assert(nSpans >= 2, s"expected codegen spans for partial+final agg, " +
      s"got $nSpans in:\n$finalPlan")
  }

  test("plan stays in whole-stage-codegen'd HashAggregateExec") {
    val df = spark.range(0, 1000)
      .select(($"id" % 5).as("k"), ($"id" * 1000000L).as("x"))
      .groupBy($"k").agg(sum128($"x").as("s"))
    df.collect() // materialize so AQE finalizes the physical plan
    // AQE query stages hide children from collect(), so assert on the
    // rendered plan: `*(n)` before an operator == inside codegen span n
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) HashAggregate\(keys=\[k[#\d]+L?\], functions=\[partial_sum128"""
      .r.findFirstIn(plan).isDefined,
      s"partial sum128 not in a codegen'd HashAggregate:\n$plan")
    assert("""\*\(\d+\) HashAggregate\(keys=\[k[#\d]+L?\], functions=\[sum128"""
      .r.findFirstIn(plan).isDefined,
      s"final sum128 not in a codegen'd HashAggregate:\n$plan")
  }
}
