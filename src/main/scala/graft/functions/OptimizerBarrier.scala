package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.DataType

/** Identity expression that reports itself non-deterministic — a
  * zero-cost optimizer fence. Wrap a predicate in it to stop Catalyst
  * from pushing that predicate somewhere expensive (e.g. into a
  * nested-loop join condition, where it would be evaluated interpreted
  * for every ordered pair instead of codegen'd once per surviving row).
  * Unlike a typed-filter barrier it costs nothing at runtime: eval and
  * codegen delegate directly to the child.
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the fence: PushDownPredicates only moves deterministic predicates
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childCode = child.genCode(ctx)
    ev.copy(code = childCode.code, isNull = childCode.isNull,
      value = childCode.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OptimizerBarrier =
    copy(child = newChild)
}

object OptimizerBarrier {
  import org.apache.spark.sql.graft.bridge
  def apply(c: Column): Column = bridge.column(OptimizerBarrier(bridge.expression(c)))
}
