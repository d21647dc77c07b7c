package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: sign-random-projection LSH signature of an
  * `array<double>` embedding, packed into a long.
  *
  * Bit i (i < planes) is set iff Σ_j v_j · w_ij > 0 with the deterministic
  * pseudo-hyperplane weight w_ij = ((i·31 + j·17) % 13) − 6 — the same
  * integer-hash hyperplanes as `VectorOps.planeWeight`, chosen so the
  * DuckDB oracle can recompute them exactly.
  *
  * Why an Expression: the HOF formulation (16 × `aggregate(zip_with(...))`)
  * is CodegenFallback — 16 interpreted passes with per-element boxing made
  * it the slowest code path in the engine (BENCH_r01 `sim_lsh_rp` 10 s).
  * This kernel makes ONE pass over the array, accumulating all plane sums
  * in a primitive double array inside whole-stage codegen. Per-plane
  * accumulation order over j is identical left-to-right, so projections
  * are bit-equal to the fold and to the oracle.
  *
  * Null semantics: null array → null; null elements contribute 0 (matches
  * DotProduct's convention; embeddings contain no nulls).
  */
case class RpSignature(child: Expression, planes: Int)
    extends UnaryExpression {

  require(planes > 0 && planes <= 64, s"planes must be in [1,64], got $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rp_signature expects array<double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val acc = new Array[Double](planes)
    var j = 0
    while (j < n) {
      if (!x.isNullAt(j)) {
        val v = x.getDouble(j)
        var i = 0
        while (i < planes) {
          acc(i) += v * (((i * 31 + j * 17) % 13) - 6).toDouble
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < planes) {
      if (acc(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $x.numElements();
         |double[] $acc = new double[$planes];
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$x.isNullAt($j)) {
         |    double $v = $x.getDouble($j);
         |    for (int $i = 0; $i < $planes; $i++) {
         |      $acc[$i] += $v * (double)((($i * 31 + $j * 17) % 13) - 6);
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < $planes; $i++) {
         |  if ($acc[$i] > 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RpSignature =
    copy(child = newChild)
}

object RpSignature {
  import org.apache.spark.sql.graft.bridge
  /** Column API entry: `RpSignature($"v", 16)`. */
  def apply(vec: Column, planes: Int): Column =
    bridge.column(RpSignature(bridge.expression(vec), planes))
}
