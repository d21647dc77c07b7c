package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * as SQL functions, so `spark.sql("SELECT dot_product(a, b) ...")` works
  * next to the Column API. Install with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("sum128"),
      new ExpressionInfo(classOf[Sum128].getName, "sum128"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new IllegalArgumentException(
            s"sum128 expects 1 argument, got ${children.length}")
        Sum128(children.head).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("sumsq128"),
      new ExpressionInfo(classOf[SumSq128].getName, "sumsq128"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new IllegalArgumentException(
            s"sumsq128 expects 1 argument, got ${children.length}")
        SumSq128(children.head).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("sumprod128"),
      new ExpressionInfo(classOf[SumProd128].getName, "sumprod128"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"sumprod128 expects 2 arguments, got ${children.length}")
        SumProd128(children(0), children(1)).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_overlap_count"),
      new ExpressionInfo(classOf[SortedOverlapCount].getName, "sorted_overlap_count"),
      (children: Seq[Expression]) => SortedOverlapCount(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_long_overlap_count"),
      new ExpressionInfo(classOf[SortedLongOverlapCount].getName, "sorted_long_overlap_count"),
      (children: Seq[Expression]) => SortedLongOverlapCount(children(0), children(1))))
    // second args must be literals folded at registration — validate here
    // so misuse gets a clear AnalysisException-style message, not a
    // ClassCastException from an unbound attribute at eval time
    def foldableArg(fn: String, children: Seq[Expression], n: Int,
                    what: String): Expression = {
      if (children.length != n + 1)
        throw new IllegalArgumentException(
          s"$fn expects ${n + 1} arguments, got ${children.length}")
      val e = children(n)
      if (!e.foldable)
        throw new IllegalArgumentException(s"$fn argument ${n + 1} must be $what")
      e
    }
    ext.injectFunction((
      new FunctionIdentifier("rp_signature"),
      new ExpressionInfo(classOf[RpSignature].getName, "rp_signature"),
      (children: Seq[Expression]) => RpSignature(children(0),
        foldableArg("rp_signature", children, 1, "a literal plane count")
          .eval() match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"rp_signature plane count must be integral, got $other")
          })))
    ext.injectFunction((
      new FunctionIdentifier("string_set_count"),
      new ExpressionInfo(classOf[StringSetCount].getName, "string_set_count"),
      (children: Seq[Expression]) => StringSetCount(children(0),
        foldableArg("string_set_count", children, 1,
          "a literal array<string> of set members").eval() match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              a.toObjectArray(org.apache.spark.sql.types.StringType)
                .map(_.toString).toSeq
            case other => throw new IllegalArgumentException(
              s"string_set_count members must be array<string>, got $other")
          })))
  }
}
