package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: how many elements of an `array<string>`
  * column are members of a fixed string set.
  *
  * Replaces `size(filter(arr, _.isin(set:_*)))`: the HOF form is
  * CodegenFallback (interpreted per row), and when `arr` is a
  * `split(text)` subtree the lambda re-evaluates the split once per
  * ELEMENT. Here the membership set is a shared `HashSet[UTF8String]`
  * reference object and the loop is generated primitive Java — one array
  * evaluation, one probe per element, inside whole-stage codegen. Used by
  * TextOps.stopwordRatio / langId (the quality-scoring hot path).
  *
  * Null semantics: null array → null; null elements count 0.
  */
case class StringSetCount(child: Expression, set: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"string_set_count expects array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = IntegerType

  @transient private lazy val members: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    set.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && members.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("members", members,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $arr.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i) && $setRef.contains($arr.getUTF8String($i))) {
         |    $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): StringSetCount =
    copy(child = newChild)
}

object StringSetCount {
  import org.apache.spark.sql.graft.bridge
  /** Column API entry: `StringSetCount($"tokens", Seq("the","a"))`. */
  def apply(arr: Column, set: Seq[String]): Column =
    bridge.column(StringSetCount(bridge.expression(arr), set))
}
