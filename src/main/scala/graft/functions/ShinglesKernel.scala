package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as byte-range SLICES of the source text — the
  * r14 replacement for the (n−1)-fold zip_with/concat_ws chain in
  * `TextOps.shingles`.
  *
  * Identity: tokens are `split(text, " ")` (single-space delimiter,
  * trailing empties kept), and joining consecutive split-tokens with the
  * SAME single-space delimiter reconstructs exactly the original span —
  * so shingle i IS `text[start(token_i) .. end(token_{i+n-1})]`, no
  * string building at all. The fold form built n−1 intermediate arrays
  * of progressively longer concatenated strings per row (interpreted
  * HOFs — measured +1.3 s per corpus scan at n = 8); this kernel makes
  * one pass over the bytes to find the space boundaries and emits
  * zero-copy `UTF8String` slices. A 0x20 byte never occurs inside a
  * multi-byte UTF-8 sequence, so byte scanning is unicode-safe.
  *
  * Semantics pinned against the fold twin (PropertySpec): null text →
  * null; fewer than n tokens → empty array; n = 1 → the tokens
  * themselves; multi-space/trailing-space inputs produce the identical
  * empty-token joins. CodegenFallback deliberately — one eval per row,
  * interior is a byte scan. */
case class ShinglesKernel(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val len = bytes.length
    // token start offsets: 0 and every byte after a 0x20
    var nToks = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) nToks += 1; i += 1 }
    if (nToks < n) return new GenericArrayData(new Array[AnyRef](0))
    val starts = new Array[Int](nToks)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[AnyRef](nToks - n + 1)
    var k = 0
    while (k < out.length) {
      val from = starts(k)
      val until = if (k + n < nToks) starts(k + n) - 1 else len
      out(k) = UTF8String.fromBytes(bytes, from, until - from)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesKernel =
    copy(child = newChild)
}

object ShinglesKernel {
  import org.apache.spark.sql.graft.bridge
  def apply(text: Column, n: Int): Column =
    bridge.column(ShinglesKernel(bridge.expression(text), n))
}
