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
      new FunctionIdentifier("sorted_overlap_count"),
      new ExpressionInfo(classOf[SortedOverlapCount].getName, "sorted_overlap_count"),
      (children: Seq[Expression]) => SortedOverlapCount(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_long_overlap_count"),
      new ExpressionInfo(classOf[SortedLongOverlapCount].getName, "sorted_long_overlap_count"),
      (children: Seq[Expression]) => SortedLongOverlapCount(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("rp_signature"),
      new ExpressionInfo(classOf[RpSignature].getName, "rp_signature"),
      (children: Seq[Expression]) => RpSignature(children(0),
        children(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      new FunctionIdentifier("string_set_count"),
      new ExpressionInfo(classOf[StringSetCount].getName, "string_set_count"),
      // second arg: an array<string> literal of set members
      (children: Seq[Expression]) => StringSetCount(children(0),
        children(1).eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq)))
  }
}
