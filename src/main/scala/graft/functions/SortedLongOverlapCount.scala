package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Intersection cardinality of two SORTED distinct `array<bigint>` columns
  * — the primitive-typed sibling of [[SortedOverlapCount]]: the merge loop
  * reads raw longs from ArrayData with zero per-element allocation, which
  * is what the all-pairs set-similarity kernel needs (UTF8String access
  * allocates a wrapper per element; at 10⁷ pairs × 10² elements that is a
  * GC storm). Callers dictionary-encode tokens first, e.g.
  * `sort_array(transform(array_distinct(s), t => xxhash64(t)))`.
  */
case class SortedLongOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_long_overlap_count expects two array<bigint>, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xa = x.getLong(i); val yb = y.getLong(j)
      if (xa == yb) { c += 1; i += 1; j += 1 }
      else if (xa < yb) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xa = $x.getLong($i);
         |  long $yb = $y.getLong($j);
         |  if ($xa == $yb) { $c++; $i++; $j++; }
         |  else if ($xa < $yb) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongOverlapCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongOverlapCount {
  import org.apache.spark.sql.graft.bridge
  def apply(a: Column, b: Column): Column =
    bridge.column(SortedLongOverlapCount(bridge.expression(a), bridge.expression(b)))
}
