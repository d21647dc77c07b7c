package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact 128-bit sum of SQUARES as a native declarative aggregate — the
  * second-moment companion to [[Sum128]].
  *
  * Why: [[Sum128]] removed the BigDecimal per-row tax from first
  * moments, but squared moments (sharpe's Σr², welch/anova variance
  * terms over 1e6-scaled units) stayed on
  * `sum((x*x).cast("decimal(38,0)"))` because the SQUARE itself
  * overflows a long — r_e6² > 2⁶³ per row — so the summand could never
  * enter sum128's long-input domain (NOTES_r11 §10b). This aggregate
  * squares INSIDE the kernel in full 128-bit precision
  * (`Math.multiplyHigh(x,x)` for the high half, wrapping `x*x` for the
  * low half — exact for every long, including Long.MinValue whose
  * square 2¹²⁶ still fits int128) and accumulates with the same
  * two-primitive-long carry chain, so the whole second moment stays
  * inside whole-stage-codegen'd HashAggregateExec with primitive buffer
  * slots.
  *
  * Semantics: input must be an integral column (the [[Sum128]] input
  * contract — exact integer-valued doubles must be cast by the CALLER,
  * so a fractional double can never silently truncate); nulls are
  * ignored; an all-null/empty group yields NULL. Result is
  * DECIMAL(38,0), bit-identical to `sum((x.cast("decimal(38,0)")) *
  * x.cast("decimal(38,0)"))` for totals < 10³⁸; past that cap
  * [[Sum128.toDecimal]] THROWS (documented divergence from a NULLing
  * non-ANSI decimal sum — fail-loud beats silent null at 1e38).
  *
  * Merge/evaluate legs are shared with [[Sum128]]
  * ([[Int128HiMerge]]/[[Int128LoUpdate]]/[[Int128ToDecimal]]): a merge
  * adds two (hi, lo) pairs regardless of what produced them.
  */
case class SumSq128(child: Expression) extends DeclarativeAggregate
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sumsq128 expects an integral column, got ${other.simpleString} — " +
        "cast exact integer-valued doubles to long first")
  }

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "sumsq128"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  // Same codegen discipline as Sum128: the child appears as the SAME
  // tree in every slot with no redundant wrapper (the split-function
  // CSE desync trap), and each slot is ONE opaque codegen'd expression
  // calling a static helper.
  override lazy val updateExpressions: Seq[Expression] = {
    val xLong =
      if (child.dataType == LongType) child
      else Cast(child, LongType, evalMode = EvalMode.LEGACY)
    Seq(Int128HiUpdateSq(hi, lo, xLong),
        Int128LoUpdateSq(lo, xLong),
        Or(seen, IsNotNull(xLong)))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Int128HiMerge(hi.left, lo.left, hi.right, lo.right),
        Int128LoUpdate(lo.left, lo.right),
        Or(seen.left, seen.right))

  override lazy val evaluateExpression: Expression =
    If(seen, Int128ToDecimal(hi, lo), Literal(null, DecimalType(38, 0)))

  override protected def withNewChildInternal(newChild: Expression): SumSq128 =
    copy(child = newChild)
}

/** hi-half after adding x² (128-bit exact) to (hi, lo); null x
  * contributes 0. */
case class Int128HiUpdateSq(hi: Expression, lo: Expression, x: Expression)
    extends TernaryExpression {
  override def first: Expression = hi
  override def second: Expression = lo
  override def third: Expression = x
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "int128_hi_update_sq"

  override def eval(input: InternalRow): Any = {
    val h = hi.eval(input).asInstanceOf[Long]
    val xv = x.eval(input)
    if (xv == null) h
    else SumSq128.hiAfterAddSq(h, lo.eval(input).asInstanceOf[Long],
      xv.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val hGen = hi.genCode(ctx)
    val lGen = lo.genCode(ctx)
    val xGen = x.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code =
      code"""
            |${hGen.code}
            |${lGen.code}
            |${xGen.code}
            |long ${ev.value} = ${hGen.value};
            |if (!(${xGen.isNull})) {
            |  ${ev.value} = graft.functions.SumSq128.hiAfterAddSq(
            |    ${hGen.value}, ${lGen.value}, ${xGen.value});
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Int128HiUpdateSq =
    copy(hi = f, lo = s, x = t)
}

/** lo-half after adding x²: wrapping `lo + x*x`; null x contributes 0. */
case class Int128LoUpdateSq(lo: Expression, x: Expression)
    extends BinaryExpression {
  override def left: Expression = lo
  override def right: Expression = x
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "int128_lo_update_sq"

  override def eval(input: InternalRow): Any = {
    val l = lo.eval(input).asInstanceOf[Long]
    val xv = x.eval(input)
    if (xv == null) l
    else l + { val v = xv.asInstanceOf[Long]; v * v }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val lGen = lo.genCode(ctx)
    val xGen = x.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code =
      code"""
            |${lGen.code}
            |${xGen.code}
            |long ${ev.value} = ${lGen.value};
            |if (!(${xGen.isNull})) {
            |  ${ev.value} += ${xGen.value} * ${xGen.value};
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128LoUpdateSq =
    copy(lo = newLeft, x = newRight)
}

/** Exact 128-bit sum of PRODUCTS `Σ x·y` — the cross-moment companion
  * ([[SumSq128]] is the `x = y` special case). The per-row product is
  * computed exactly in 128 bits (`Math.multiplyHigh` is the signed high
  * half), so a covariance/co-moment stays exact even when `x·y` crosses
  * 2⁶³ per row — removing the "product fits a long" adjudication the
  * `sum128(x * y)` form required. Null semantics match `sum(x * y)`:
  * a row where EITHER side is null contributes nothing, and a group
  * with no fully-non-null row yields NULL. */
case class SumProd128(x: Expression, y: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(x, y)

  override def checkInputDataTypes(): TypeCheckResult =
    children.collectFirst {
      case c if !Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(c.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"sumprod128 expects integral columns, got ${c.dataType.simpleString} — " +
            "cast exact integer-valued doubles to long first")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "sumprod128"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e
    else Cast(e, LongType, evalMode = EvalMode.LEGACY)

  override lazy val updateExpressions: Seq[Expression] = {
    val (xl, yl) = (asLong(x), asLong(y))
    Seq(Int128HiUpdateProd(hi, lo, xl, yl),
        Int128LoUpdateProd(lo, xl, yl),
        Or(seen, And(IsNotNull(xl), IsNotNull(yl))))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Int128HiMerge(hi.left, lo.left, hi.right, lo.right),
        Int128LoUpdate(lo.left, lo.right),
        Or(seen.left, seen.right))

  override lazy val evaluateExpression: Expression =
    If(seen, Int128ToDecimal(hi, lo), Literal(null, DecimalType(38, 0)))

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SumProd128 = copy(x = c(0), y = c(1))
}

/** hi-half after adding x·y (128-bit exact) to (hi, lo); a null on
  * either side contributes 0. */
case class Int128HiUpdateProd(hi: Expression, lo: Expression,
                              x: Expression, y: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(hi, lo, x, y)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "int128_hi_update_prod"

  override def eval(input: InternalRow): Any = {
    val h = hi.eval(input).asInstanceOf[Long]
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv == null || yv == null) h
    else SumProd128.hiAfterAddProd(h, lo.eval(input).asInstanceOf[Long],
      xv.asInstanceOf[Long], yv.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    ev.copy(isNull = FalseLiteral, code =
      code"""
            |${gens(0).code}
            |${gens(1).code}
            |${gens(2).code}
            |${gens(3).code}
            |long ${ev.value} = ${gens(0).value};
            |if (!(${gens(2).isNull}) && !(${gens(3).isNull})) {
            |  ${ev.value} = graft.functions.SumProd128.hiAfterAddProd(
            |    ${gens(0).value}, ${gens(1).value},
            |    ${gens(2).value}, ${gens(3).value});
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Int128HiUpdateProd =
    copy(hi = c(0), lo = c(1), x = c(2), y = c(3))
}

/** lo-half after adding x·y: wrapping `lo + x*y`; a null on either side
  * contributes 0. */
case class Int128LoUpdateProd(lo: Expression, x: Expression, y: Expression)
    extends TernaryExpression {
  override def first: Expression = lo
  override def second: Expression = x
  override def third: Expression = y
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "int128_lo_update_prod"

  override def eval(input: InternalRow): Any = {
    val l = lo.eval(input).asInstanceOf[Long]
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv == null || yv == null) l
    else l + xv.asInstanceOf[Long] * yv.asInstanceOf[Long]
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val lGen = lo.genCode(ctx)
    val xGen = x.genCode(ctx)
    val yGen = y.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code =
      code"""
            |${lGen.code}
            |${xGen.code}
            |${yGen.code}
            |long ${ev.value} = ${lGen.value};
            |if (!(${xGen.isNull}) && !(${yGen.isNull})) {
            |  ${ev.value} += ${xGen.value} * ${yGen.value};
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Int128LoUpdateProd =
    copy(lo = f, x = s, y = t)
}

object SumProd128 {
  import org.apache.spark.sql.graft.bridge

  /** Column API: exact Σx·y for integral columns (covariance / Gini /
    * weighted-rank co-moments). Inputs must already be integral — the
    * aggregate rejects fractional types at analysis time rather than
    * truncating. */
  def sumProd128(x: Column, y: Column): Column =
    bridge.column(SumProd128(bridge.expression(x), bridge.expression(y))
      .toAggregateExpression())

  /** hi-half after (hi, lo) += x·y. `Math.multiplyHigh(x, y)` is the
    * SIGNED high half of the exact 128-bit product (no correction term
    * needed) and `x*y` its wrapping low half; the add carries out of
    * the unsigned lo-add. */
  def hiAfterAddProd(hi: Long, lo: Long, x: Long, y: Long): Long = {
    val pLo = x * y
    hi + Math.multiplyHigh(x, y) +
      (if (java.lang.Long.compareUnsigned(lo + pLo, lo) < 0) 1L else 0L)
  }
}

object SumSq128 {
  import org.apache.spark.sql.graft.bridge

  /** Column API: exact Σx² for integral columns whose squares (or their
    * sum) may cross 2⁶³. Input must already be integral — the aggregate
    * REJECTS fractional types at analysis time rather than truncating
    * (the [[Sum128.sum128]] contract). */
  def sumSq128(c: Column): Column =
    bridge.column(SumSq128(bridge.expression(c))
      .toAggregateExpression())

  /** hi-half after (hi, lo) += x². The 128-bit square is
    * (multiplyHigh(x,x), x*x) — exact for every long since x² < 2¹²⁷ —
    * and the add carries out of the unsigned lo-add. x² is non-negative,
    * so no sign extension term. */
  def hiAfterAddSq(hi: Long, lo: Long, x: Long): Long = {
    val sqLo = x * x
    hi + Math.multiplyHigh(x, x) +
      (if (java.lang.Long.compareUnsigned(lo + sqLo, lo) < 0) 1L else 0L)
  }
}
