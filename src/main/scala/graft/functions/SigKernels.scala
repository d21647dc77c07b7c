package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-document signature kernels — the r14 replacement for the
  * explode + k-aggregate signature builders.
  *
  * Why: `simhashes64` / `minhashSignatures` exploded every token into a
  * posting row and ran 64 (resp. 16) conditional aggregate expressions
  * per row plus a hash-shuffle on the id — measured as ~90% of
  * dedup_simhash (2.1 s of 2.35 s at sf0.1) and ~0.9 s of each minhash
  * query. Each kernel computes the identical integers in ONE tight Scala
  * loop per document over the token array: no explode, no 64-expression
  * aggregate buffers, no shuffle — scan-local at any scale (strictly
  * better 100 TB posture: the signature pass becomes a map-only stage).
  *
  * Deliberately `CodegenFallback`: the expression is evaluated once per
  * ROW (not per element, which is what makes HOF fallback expensive),
  * its interior is already a primitive loop, and the md5 calls dominate
  * — generated-code savings would be noise. The md5 is
  * `java.security.MessageDigest` over the UTF-8 bytes, the same digest
  * the `md5()` expression computes (classifierMargin precedent,
  * spec-pinned); bit-exactness vs the aggregate forms is property-tested
  * (PropertySpec "signature kernels").
  */
private[graft] object SigKernels {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** (first 4 md5 bytes, next 4) as unsigned 32-bit values in longs —
    * exactly `conv(substring(md5(s),1,8),16,10)` / digits 9–16. */
  def md5Words(bytes: Array[Byte]): (Long, Long) = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    (h1, h2)
  }
}

/** 64-bit SimHash as 4 × 16-bit band values (the [[DedupOps.simhashes64]]
  * layout: band b = bits [16b, 16b+16), bit j of word w set iff the
  * ±1-summed bit-j votes over all tokens are positive). Input: the raw
  * token array (duplicates WEIGHT the vote, exactly like the posting
  * explode). Null input → null (callers filter, matching the explode
  * form's row drop); empty array → the all-zero-sum bands (callers
  * filter those rows out too). */
case class SimHash64Bands(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64_bands expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val bitSums = new Array[Long](64)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        // aggregate-form parity: a null token's null bit test falls
        // through `when(...).otherwise(-1)` — a −1 vote on every bit
        var j = 0
        while (j < 64) { bitSums(j) -= 1L; j += 1 }
      } else {
        val (h1, h2) = SigKernels.md5Words(toks.getUTF8String(i).getBytes)
        var j = 0
        while (j < 32) {
          bitSums(j) += (if (((h1 >>> j) & 1L) == 1L) 1L else -1L)
          bitSums(32 + j) += (if (((h2 >>> j) & 1L) == 1L) 1L else -1L)
          j += 1
        }
      }
      i += 1
    }
    val bands = new Array[Long](4)
    var b = 0
    while (b < 4) {
      var acc = 0L
      var jj = 0
      while (jj < 16) {
        if (bitSums(16 * b + jj) > 0) acc |= (1L << jj)
        jj += 1
      }
      bands(b) = acc
      b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Bands =
    copy(child = newChild)
}

object SimHash64Bands {
  import org.apache.spark.sql.graft.bridge
  def apply(tokens: Column): Column =
    bridge.column(SimHash64Bands(bridge.expression(tokens)))
}

/** MinHash signature: k permutation-min values over the shingle array —
  * permutation i is `((2i+1)·hash32(s) + 17i+3) mod 4294967311`, the
  * [[DedupOps.minhashCoeffs]] family. Matches the column form
  * [[DedupOps.minhashSignature]] bit for bit, including its sentinel:
  * an EMPTY (or all-null-element) set yields the impossible-max prime
  * in every slot. Null input array also yields the sentinel array (the
  * column form's `coalesce(array_min(transform(NULL, …)), p)` does the
  * same), so this expression is non-nullable. One md5 per shingle where
  * the HOF form paid one PER COEFFICIENT (k× the digests). */
case class MinHashSigKernel(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  private val p = 4294967311L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  private def sentinel: GenericArrayData =
    new GenericArrayData(Array.fill(k)(p))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return sentinel
    val sh = v.asInstanceOf[ArrayData]
    val n = sh.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        any = true
        val (h, _) = SigKernels.md5Words(sh.getUTF8String(i).getBytes)
        var c = 0
        while (c < k) {
          val x = ((2L * c + 1) * h + (17L * c + 3)) % p
          if (x < mins(c)) mins(c) = x
          c += 1
        }
      }
      i += 1
    }
    if (!any) sentinel else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigKernel =
    copy(child = newChild)
}

object MinHashSigKernel {
  import org.apache.spark.sql.graft.bridge
  def apply(shingles: Column, k: Int): Column =
    bridge.column(MinHashSigKernel(bridge.expression(shingles), k))
}
