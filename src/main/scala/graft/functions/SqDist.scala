package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: squared L2 distance Σ(a_i − b_i)² of two
  * `array<double>` columns — the companion kernel to [[DotProduct]], for
  * the same reason (HOFs are CodegenFallback; this is the per-row hot
  * loop of every IVF/PQ assignment and reconstruction check). Left-to-
  * right accumulation in element order — bit-identical to
  * `aggregate(zip_with(a, b, (x,y) => (x−y)·(x−y)), 0.0, +)` on the
  * equal-length, null-free arrays this engine feeds it (PropertySpec
  * pins kernel ≡ HOF). Null input array → null; null elements contribute
  * 0; extra elements beyond the common prefix are ignored (DotProduct's
  * documented semantics). */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_dist expects two array<double>, got ${left.dataType.simpleString}" +
        s" and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    double $d = $x.getDouble($i) - $y.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  import org.apache.spark.sql.graft.bridge
  /** Column API entry: `SqDist($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    bridge.column(SqDist(bridge.expression(a), bridge.expression(b)))
}
