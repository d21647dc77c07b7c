package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row kernel for the hashed-feature linear classifier margin
  * (`TextOps.classifierMargin`): grams = unigrams ++ word-2-grams of the
  * single-space-split text, z = Σ weights[hash32(gram) mod dim] — one
  * md5 per gram and a weight lookup, in a single byte-scan loop.
  *
  * The HOF form built the token and bigram arrays, concatenated them,
  * and folded with an interpreted lambda per gram (element_at over a
  * 1024-entry literal); this kernel slices grams directly from the text
  * bytes (same zero-copy identity as [[ShinglesKernel]]: a bigram IS the
  * byte range spanning two adjacent tokens) and keeps the md5 as the
  * dominant cost. Returns struct(n_feats int, z_milli long) — exact
  * integer arithmetic, bit-identical to the HOF twin (PropertySpec).
  * Null text → struct(null, null), matching the column form's null
  * propagation through size()/aggregate(). */
case class ClassifierMarginKernel(child: Expression, weights: Array[Long],
                                  dim: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"classifier_margin expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", IntegerType, nullable = true),
    StructField("z_milli", LongType, nullable = true)))

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return InternalRow(null, null)
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    var nToks = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) nToks += 1; i += 1 }
    val starts = new Array[Int](nToks + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nToks) = len + 1 // sentinel: token i spans [starts(i), starts(i+1)-2]
    var z = 0L
    def add(from: Int, until: Int): Unit = {
      val (h, _) = SigKernels.md5Words(
        java.util.Arrays.copyOfRange(bytes, from, until))
      z += weights((h % dim).toInt)
    }
    i = 0
    while (i < nToks) { add(starts(i), starts(i + 1) - 1); i += 1 }
    // bigrams exist only when nToks >= 2 (shingles' short-doc empty array)
    if (nToks >= 2) {
      i = 0
      while (i < nToks - 1) { add(starts(i), starts(i + 2) - 1); i += 1 }
    }
    val nFeats = nToks + (if (nToks >= 2) nToks - 1 else 0)
    InternalRow(nFeats, z)
  }

  override protected def withNewChildInternal(newChild: Expression): ClassifierMarginKernel =
    copy(child = newChild)
}

object ClassifierMarginKernel {
  import org.apache.spark.sql.graft.bridge
  def apply(text: Column, weights: Seq[Long], dim: Int): Column =
    bridge.column(ClassifierMarginKernel(bridge.expression(text),
      weights.toArray, dim))
}
