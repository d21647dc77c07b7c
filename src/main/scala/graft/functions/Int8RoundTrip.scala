package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: the int8 quantize→dequantize ROUND TRIP of
  * `VectorOps.quantizeInt8`/`dequantize`, fused into one codegen'd pass —
  * `x ↦ round(x/s)·s` with `s = max|x|/127` (1.0 for the all-zero vector).
  *
  * Why an Expression: the HOF form is three `transform`s + an `array_max`,
  * all `CodegenFallback` — measured 2.4 s vs 0.5 s for the unquantized
  * sibling on the same top-k plan at sf0.1, with the interpreted per-element
  * eval as the entire gap. This kernel stays inside whole-stage codegen.
  *
  * Bit-compatibility contract (what the `sim_quantized_topk` oracle pins):
  * rounding is EXACTLY Spark's `round(e, 0)` on doubles — decimal-string
  * `BigDecimal` HALF_UP (`BigDecimal.valueOf`, i.e. shortest-decimal
  * representation, ties away from zero) — NOT `Math.round`/`Math.rint`,
  * which disagree on negative ties and on near-tie doubles like
  * 0.49999999999999994. The spec asserts elementwise bit-equality against
  * the HOF chain.
  *
  * Null semantics mirror [[DotProduct]]: null array → null; null elements
  * (absent by the embeddings contract) contribute as 0.0.
  */
case class Int8RoundTrip(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_round_trip expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = math.abs(x.getDouble(i))
        if (v > mx) mx = v
      }
      i += 1
    }
    val scale = if (mx > 0) mx / 127.0 else 1.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val v = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      out(i) = Int8RoundTrip.roundHalfUp(v / scale).toInt.toDouble * scale
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mx = ctx.freshName("mx")
      val v = ctx.freshName("v")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    double $v = java.lang.Math.abs($x.getDouble($i));
         |    if ($v > $mx) $mx = $v;
         |  }
         |}
         |double $scale = $mx > 0 ? $mx / 127.0 : 1.0;
         |double[] $out = new double[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  double $v = $x.isNullAt($j) ? 0.0 : $x.getDouble($j);
         |  $out[$j] = (double)(int) graft.functions.Int8RoundTrip.roundHalfUp($v / $scale) * $scale;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8RoundTrip =
    copy(child = newChild)
}

object Int8RoundTrip {
  import org.apache.spark.sql.graft.bridge

  /** Exactly Spark's `Round(e, 0)` double path: shortest-decimal BigDecimal,
    * HALF_UP. Called from generated code — keep it a static-shaped method. */
  def roundHalfUp(q: Double): Double =
    if (java.lang.Double.isNaN(q) || java.lang.Double.isInfinite(q)) q
    else java.math.BigDecimal.valueOf(q)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Column API entry: `Int8RoundTrip($"vec")`. */
  def apply(v: Column): Column =
    bridge.column(Int8RoundTrip(bridge.expression(v)))
}
