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

/** Exact 128-bit integer sum as a native declarative aggregate.
  *
  * Why: the engine's determinism class (NOTES_r10 §1) accumulates money
  * and grid-valued moments as exact integers; where a sum can cross 2⁶³
  * the queries used `sum(x.cast("decimal(38,0)"))`, which pays BigDecimal
  * arithmetic per row inside the hash aggregate (the measured
  * `stats_correlation` 0.25→0.73 s cost — VERDICT r10). This aggregate
  * keeps the buffer as TWO primitive longs (hi:lo two's-complement
  * halves) with carry-propagating adds, so it stays inside
  * whole-stage-codegen'd HashAggregateExec with primitive buffer slots —
  * Decimal exactness at long-sum speed.
  *
  * Semantics: input must be INTEGRAL — byte/short/int/long (cents,
  * 1e6-scaled grids, integer products < 2⁶³); a fractional type is a
  * TYPE-CHECK FAILURE at analysis, never a silent truncation. Nulls are
  * ignored; an all-null/empty group yields NULL (matches `sum`). The
  * result is DECIMAL(38,0), bit-identical to
  * `sum(x.cast("decimal(38,0)"))` for every |total| < 10³⁸ (the
  * representable cap; int128 overflows only past ~1.7e38, far beyond any
  * 100 TB total — ~1e10/row × 1e12 rows = 1e22). Past ±10³⁸ the
  * evaluate leg THROWS where the decimal sum would NULL under non-ANSI
  * Spark — see [[Sum128.toDecimal]] for why that divergence is
  * deliberate.
  *
  * The lo-half add wraps intentionally (that is how the carry is
  * detected), so the adds are built with `EvalMode.LEGACY` — immune to
  * the session's ANSI setting. Carry-out of `lo + x` is the standard
  * unsigned compare `(newLo ^ MIN) < (lo ^ MIN)`; the hi half absorbs
  * the carry plus the sign extension of x (`x >> 63`). The merge leg is
  * the same add over two (hi, lo) pairs.
  */
case class Sum128(child: Expression) extends DeclarativeAggregate
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sum128 expects an integral column, got ${other.simpleString} — " +
        "cast exact integer-valued doubles to long first")
  }

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "sum128"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  // Each buffer slot's update/merge is ONE dedicated codegen'd
  // expression with the carry/sign/null logic inside its doGenCode —
  // a single static call per slot instead of composed Add/If/BitwiseXor
  // trees (less generated code, fewer branches).
  //
  // CODEGEN TRAP (hard-won): the child must be referenced by the SAME
  // tree in every slot, with NO redundant wrapper. An extra
  // Cast(child, Long) around an already-long child desyncs the
  // common-subexpression key that HashAggregateExec's split-function
  // codegen uses to pre-evaluate the child once and pass it as a
  // parameter — the split method body then re-generates the child
  // against a variable that was never passed, and the whole stage
  // fails janino compilation ("unknown variable hashAgg_expr_N_0"),
  // silently falling back to the interpreted path. Sum128Spec compiles
  // a many-function aggregate's generated source to pin this.

  override lazy val updateExpressions: Seq[Expression] = {
    // the Column helper / SQL typecheck guarantee an integral child; a
    // sub-long child still works (Int128*Update read it via genCode)
    val xLong =
      if (child.dataType == LongType) child
      else Cast(child, LongType, evalMode = EvalMode.LEGACY)
    Seq(Int128HiUpdate(hi, lo, xLong),
        Int128LoUpdate(lo, xLong),
        Or(seen, IsNotNull(xLong)))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Int128HiMerge(hi.left, lo.left, hi.right, lo.right),
        Int128LoUpdate(lo.left, lo.right),
        Or(seen.left, seen.right))

  override lazy val evaluateExpression: Expression =
    If(seen, Int128ToDecimal(hi, lo), Literal(null, DecimalType(38, 0)))

  override protected def withNewChildInternal(newChild: Expression): Sum128 =
    copy(child = newChild)
}

/** hi-half after adding a (nullable) 64-bit value x to (hi, lo):
  * `hi + (x >> 63) + carryOut(lo + x)`; null x contributes 0. */
case class Int128HiUpdate(hi: Expression, lo: Expression, x: Expression)
    extends TernaryExpression {
  override def first: Expression = hi
  override def second: Expression = lo
  override def third: Expression = x
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "int128_hi_update"

  override def eval(input: InternalRow): Any = {
    val h = hi.eval(input).asInstanceOf[Long]
    val xv = x.eval(input)
    if (xv == null) h
    else Sum128.hiAfterAdd(h, lo.eval(input).asInstanceOf[Long],
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
            |  ${ev.value} = graft.functions.Sum128.hiAfterAdd(
            |    ${hGen.value}, ${lGen.value}, ${xGen.value});
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Int128HiUpdate =
    copy(hi = f, lo = s, x = t)
}

/** hi-half after merging two (hi, lo) pairs: `hiL + hiR + carryOut(loL +
  * loR)` (no sign extension — hiR already carries the value's sign). */
case class Int128HiMerge(hiL: Expression, loL: Expression,
                         hiR: Expression, loR: Expression)
    extends Expression {
  override def children: Seq[Expression] = Seq(hiL, loL, hiR, loR)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "int128_hi_merge"

  override def eval(input: InternalRow): Any =
    Sum128.hiAfterMerge(
      hiL.eval(input).asInstanceOf[Long], loL.eval(input).asInstanceOf[Long],
      hiR.eval(input).asInstanceOf[Long], loR.eval(input).asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    ev.copy(isNull = FalseLiteral, code =
      code"""
            |${gens(0).code}
            |${gens(1).code}
            |${gens(2).code}
            |${gens(3).code}
            |long ${ev.value} = graft.functions.Sum128.hiAfterMerge(
            |  ${gens(0).value}, ${gens(1).value},
            |  ${gens(2).value}, ${gens(3).value});
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Int128HiMerge =
    copy(hiL = c(0), loL = c(1), hiR = c(2), loR = c(3))
}

/** lo-half after adding a (nullable) 64-bit value: wrapping `lo + x`;
  * null x contributes 0. Also the merge form (loR is never null). */
case class Int128LoUpdate(lo: Expression, x: Expression)
    extends BinaryExpression {
  override def left: Expression = lo
  override def right: Expression = x
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "int128_lo_update"

  override def eval(input: InternalRow): Any = {
    val l = lo.eval(input).asInstanceOf[Long]
    val xv = x.eval(input)
    if (xv == null) l else l + xv.asInstanceOf[Long]
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
            |if (!(${xGen.isNull})) { ${ev.value} += ${xGen.value}; }
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128LoUpdate =
    copy(lo = newLeft, x = newRight)
}

/** Compose two's-complement (hi, lo) halves into DECIMAL(38,0). Runs once
  * per group at aggregate output, not in the per-row hot loop. */
case class Int128ToDecimal(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "int128_to_decimal"

  override def nullSafeEval(h: Any, l: Any): Any =
    Sum128.toDecimal(h.asInstanceOf[Long], l.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (h, l) => s"graft.functions.Sum128.toDecimal($h, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128ToDecimal =
    copy(left = newLeft, right = newRight)
}

object Sum128 {
  import org.apache.spark.sql.graft.bridge

  /** Column API: exact integer sum for columns whose per-group total may
    * cross 2⁶³. Input must already be INTEGRAL: the aggregate's type
    * check rejects fractional types at ANALYSIS time with a clear
    * message. The helper used to `cast("long")` for the caller, which
    * silently TRUNCATED a non-integer-valued double — a caller with an
    * exact integer-valued double (`floor` already returns LONG, so this
    * is rare) must now write the cast explicitly, which is the loud
    * contract the truncation hazard demands. */
  def sum128(c: Column): Column =
    bridge.column(Sum128(bridge.expression(c))
      .toAggregateExpression())

  /** hi-half after (hi, lo) += x with sign extension of x. Carry-out of
    * the unsigned lo-add is `unsigned(lo + x) < unsigned(lo)`. */
  def hiAfterAdd(hi: Long, lo: Long, x: Long): Long =
    hi + (x >> 63) + (if (java.lang.Long.compareUnsigned(lo + x, lo) < 0) 1L
                      else 0L)

  /** hi-half after (hiL, loL) += (hiR, loR) — hiR already carries the
    * right value's sign, so no extension. */
  def hiAfterMerge(hiL: Long, loL: Long, hiR: Long, loR: Long): Long =
    hiL + hiR + (if (java.lang.Long.compareUnsigned(loL + loR, loL) < 0) 1L
                 else 0L)

  /** Static codegen helper: (hi, lo) → Decimal(38,0).
    *
    * Overflow contract (documented divergence): past ±10³⁸ this THROWS
    * (`Decimal` rejects precision > 38) where non-ANSI
    * `sum(x.cast("decimal(38,0)"))` yields NULL. Deliberate: a total
    * that large means ~1e16 max-long rows — certainly corruption — and
    * a query-killing exception beats a silent NULL propagating through
    * downstream arithmetic. Pinned by Sum128Spec. */
  def toDecimal(hi: Long, lo: Long): Decimal = {
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    Decimal(new java.math.BigDecimal(bi), 38, 0)
  }
}
