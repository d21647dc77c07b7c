package graft.operators

import graft.SparkSpec
import graft.functions.{SumProd128, SumSq128}
import graft.functions.SumSq128.sumSq128
import graft.functions.SumProd128.sumProd128
import org.apache.spark.sql.functions._

/** [[graft.functions.SumSq128]] / [[graft.functions.SumProd128]] — exact
  * 128-bit second and cross moments.
  *
  * Contract: bit-identical to the decimal reference forms
  * `sum(x.cast(dec) * x.cast(dec))` / `sum(x.cast(dec) * y.cast(dec))`
  * wherever both are defined, with the square/product computed INSIDE
  * the kernel (Math.multiplyHigh + wrapping low half) so no per-row
  * value ever rides a wrapping long multiply or a BigDecimal. The
  * adversarial cases are per-row squares past 2⁶³ (the NOTES_r11 §10b
  * domain gap that kept sharpe on decimal), Long.MinValue whose square
  * is exactly 2¹²⁶, sign-mixed products, partial-merge order, and the
  * null-on-either-side product semantics.
  */
class SumSq128Spec extends SparkSpec {
  import spark.implicits._

  private val dec = "decimal(38,0)"

  test("static kernel: 128-bit square/product match BigInteger on edges") {
    val edge = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue,
      3037000499L /* isqrt(2^63) */, -3037000500L, 123456789012345L)
    for (x <- edge; y <- edge) {
      val pLo = x * y
      val pHi = Math.multiplyHigh(x, y)
      val got = (BigInt(pHi) << 64) +
        BigInt(java.lang.Long.toUnsignedString(pLo))
      assert(got === BigInt(x) * BigInt(y), s"product $x * $y")
      // the hiAfterAdd helpers accumulate from a zero buffer correctly
      assert(BigInt(SumProd128.hiAfterAddProd(0L, 0L, x, y)) ===
        (BigInt(x) * BigInt(y)) >> 64, s"hiAfterAddProd($x, $y)")
      assert(BigInt(SumSq128.hiAfterAddSq(0L, 0L, x)) ===
        (BigInt(x) * BigInt(x)) >> 64, s"hiAfterAddSq($x)")
    }
  }

  test("bit-equal to the decimal reference: per-row squares cross 2^63") {
    // |x| ~ 2^55: x² ~ 2^110 per row — far outside a long, the exact
    // domain gap sumsq128 exists for
    val rnd = new scala.util.Random(7)
    val rows = (0 until 4000).map { i =>
      (i % 13, (rnd.nextLong() >> 8) | 1L)
    }
    val df = rows.toDF("k", "x").repartition(11)
    val bad = df.groupBy($"k")
      .agg(sumSq128($"x").as("s"),
        sum($"x".cast(dec) * $"x".cast(dec)).as("r"))
      .where($"s" =!= $"r" || $"s".isNull =!= $"r".isNull)
    assert(bad.count() === 0)
    // and against a driver-side BigInt oracle
    val got = df.groupBy($"k").agg(sumSq128($"x").as("s"))
      .collect().map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger))
      .toMap
    val want = rows.groupBy(_._1).map { case (k, v) =>
      k -> v.map(t => BigInt(t._2) * BigInt(t._2)).sum }
    assert(got === want)
  }

  test("Long.MinValue squares to exactly 2^126") {
    val row = Seq(Long.MinValue).toDF("x")
      .agg(sumSq128($"x").as("s")).head()
    assert(BigInt(row.getDecimal(0).toBigInteger) === BigInt(2).pow(126))
  }

  test("sumprod128 bit-equal to the decimal cross-moment, mixed signs") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 4000).map { i =>
      (i % 7, (rnd.nextLong() >> 12), (rnd.nextLong() >> 12)) }
    val df = rows.toDF("k", "x", "y").repartition(9)
    val bad = df.groupBy($"k")
      .agg(sumProd128($"x", $"y").as("s"),
        sum($"x".cast(dec) * $"y".cast(dec)).as("r"))
      .where($"s" =!= $"r" || $"s".isNull =!= $"r".isNull)
    assert(bad.count() === 0)
  }

  test("product null semantics: a null on EITHER side skips the row; " +
       "group with no fully-non-null row is NULL (matches sum(x*y))") {
    val df = Seq[(Int, java.lang.Long, java.lang.Long)](
      (1, 3L, 4L), (1, null, 100L), (1, 5L, null), (1, -2L, 6L),
      (2, null, 1L), (2, 2L, null))
      .toDF("k", "x", "y")
    val rows = df.groupBy($"k")
      .agg(sumProd128($"x", $"y").as("s"),
        sum($"x".cast(dec) * $"y".cast(dec)).as("r"))
      .orderBy($"k").collect()
    assert(rows(0).getDecimal(1) === rows(0).getDecimal(2))
    assert(rows(0).getDecimal(1).longValueExact === 0L) // 12 - 12
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("input contract: fractional columns rejected at analysis") {
    val df = Seq((2.5, 3L)).toDF("x", "y")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(sumSq128($"x")).collect()
    }
    assert(e1.getMessage.contains("sumsq128 expects an integral column"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(sumProd128($"y", $"x")).collect()
    }
    assert(e2.getMessage.contains("sumprod128 expects integral columns"))
  }

  test("mixed Sum128/SumSq128/SumProd128 over the SAME child COMPILES " +
       "under codegen (split-function CSE discipline)") {
    // the correlation shape: first, second and cross moments of shared
    // children in ONE aggregate — the split-function CSE desync class
    // would fail janino here and silently fall back to interpreted
    import org.apache.spark.sql.graft.bridge
    import graft.functions.Sum128.sum128
    val wide = spark.range(0, 100)
      .select(($"id" % 3).as("k"), $"id".as("x"), ($"id" * 7L).as("y"))
    val df = wide.groupBy($"k").agg(
      sum128($"x").as("s1"), sum128($"y").as("s1y"),
      sumSq128($"x").as("sxx"), sumSq128($"y").as("syy"),
      sumProd128($"x", $"y").as("sxy"),
      sumSq128(floor($"x" * 1.5).cast("long")).as("sff"),
      count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
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
    // and the moments are right (driver-side oracle)
    val r = df.where($"k" === 0).head()
    val xs = (0L until 100L by 3L)
    assert(BigInt(r.getDecimal(5).toBigInteger) ===
      xs.map(x => BigInt(x) * BigInt(x * 7)).sum)
  }

  test("plan stays in whole-stage-codegen'd HashAggregateExec") {
    val df = spark.range(0, 1000)
      .select(($"id" % 5).as("k"), ($"id" * 1000000L).as("x"))
      .groupBy($"k").agg(sumSq128($"x").as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) HashAggregate\(keys=\[k[#\d]+L?\], functions=\[partial_sumsq128"""
      .r.findFirstIn(plan).isDefined,
      s"partial sumsq128 not in a codegen'd HashAggregate:\n$plan")
    assert("""\*\(\d+\) HashAggregate\(keys=\[k[#\d]+L?\], functions=\[sumsq128"""
      .r.findFirstIn(plan).isDefined,
      s"final sumsq128 not in a codegen'd HashAggregate:\n$plan")
  }
}
