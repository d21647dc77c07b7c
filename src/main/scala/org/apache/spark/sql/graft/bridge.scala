package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression converters — the standard
  * extension-point shim for registering native Catalyst expressions from
  * an external library (no Spark internals are modified or copied). */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the listener bus (private[spark]) — lets metrics harnesses
    * attribute task metrics to the query that produced them. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Compile every WholeStageCodegen span of a physical plan and return
    * the number of spans compiled — THROWS on janino failure instead of
    * Spark's silent interpreted fallback. Specs use this to pin that
    * custom expressions/aggregates actually stay codegen'd (a compile
    * error is invisible in results: same values, slower path). */
  def compileWholeStageSpans(
      plan: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val spans = plan.collect { case w: WholeStageCodegenExec => w }
    spans.foreach { w =>
      val (_, source) = w.doCodeGen()
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .compile(source)
    }
    spans.length
  }
}
