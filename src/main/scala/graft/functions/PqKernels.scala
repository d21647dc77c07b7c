package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst kernels for the PQ (product-quantization) hot loops.
  *
  * Why Expressions and not the HOF forms they replace: `transform` /
  * `zip_with` / `aggregate` are CodegenFallback — every subspace distance
  * in `VectorOps.pqEncode` was m·k interpreted `Expression.eval` calls
  * with boxing, measured as the dominant cost of every PQ query (encode
  * of the sf0.1 corpus ≈ 2.3 s of sim_pq_topk's 2.9 s). These kernels run
  * the same arithmetic as tight primitive loops inside whole-stage
  * codegen.
  *
  * Bit-exactness contract (PropertySpec pins kernel ≡ HOF form): float
  * element reads widen exactly to double; each subspace distance
  * accumulates left-to-right in dimension order (`acc += (c-v)²`), the
  * codeword scan tracks the FIRST strict minimum (`d < best`), exactly
  * `array_position(d2s, array_min(d2s)) − 1` for the non-null, non-NaN
  * distances this data produces; the ADC sum accumulates in subspace
  * order. Same IEEE ops in the same order ⇒ identical doubles, identical
  * codes, identical oracle hashes.
  */
object PqKernels {
  /** Flattened codebooks: cb(s)(c)(j) → flat[(s*k + c)*sub + j]. */
  private[functions] def flatten(cbs: Seq[Seq[Seq[Double]]]): Array[Double] = {
    val m = cbs.size; val k = cbs.head.size; val sub = cbs.head.head.size
    val out = new Array[Double](m * k * sub)
    var i = 0
    for (s <- 0 until m; c <- 0 until k; j <- 0 until sub) {
      out(i) = cbs(s)(c)(j); i += 1
    }
    out
  }
}

/** PQ encode: for each of `m` contiguous subspaces of `sub` dims, the
  * index of the L2-nearest codeword among `k` (tie → lowest index).
  * Input `array<float>` or `array<double>`; output `array<int>` of m. */
case class PqEncodeKernel(child: Expression, cb: Array[Double], m: Int,
                          k: Int, sub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // lazy: child.dataType is only legal after analysis (withNewChildInternal
  // copies this expression while the tree is still unresolved)
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var d = 0.0
        var j = 0
        val base = (s * k + c) * sub
        val voff = s * sub
        while (j < sub) {
          val x = if (isFloat) v.getFloat(voff + j).toDouble
                  else v.getDouble(voff + j)
          val diff = cb(base + j) - x
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "double[]")
    val get = if (isFloat) "(double)" else ""
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      val base = ctx.freshName("base"); val voff = ctx.freshName("voff")
      s"""
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  int $voff = $s * $sub;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    int $base = ($s * $k + $c) * $sub;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      double $diff = $cbRef[$base + $j] - $get$v.$getter($voff + $j);
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeKernel =
    copy(child = newChild)
}

object PqEncodeKernel {
  import org.apache.spark.sql.graft.bridge
  def apply(vec: Column, cbs: Seq[Seq[Seq[Double]]]): Column =
    bridge.column(PqEncodeKernel(bridge.expression(vec),
      PqKernels.flatten(cbs), cbs.size, cbs.head.size, cbs.head.head.size))
}

/** ADC lookup sum: Σ_s lut[s][codes[s]] in subspace order — the
  * asymmetric-distance finish over PQ codes. `codes` is `array<int>`,
  * `lut` is `array<array<double>>` (one row per subspace). Identical
  * accumulation order to the `aggregate(zip_with(codes, lut, ...))` HOF
  * it replaces. */
case class AdcSumKernel(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_sum expects (array<int>, array<array<double>>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), lut.numElements())
    var acc = 0.0
    var s = 0
    while (s < n) {
      acc += lut.getArray(s).getDouble(codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($codes.numElements(), $lut.numElements());
         |double $acc = 0.0;
         |for (int $s = 0; $s < $n; $s++) {
         |  $acc += $lut.getArray($s).getDouble($codes.getInt($s));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSumKernel =
    copy(left = newLeft, right = newRight)
}

object AdcSumKernel {
  import org.apache.spark.sql.graft.bridge
  def apply(codes: Column, lut: Column): Column =
    bridge.column(AdcSumKernel(bridge.expression(codes), bridge.expression(lut)))
}
