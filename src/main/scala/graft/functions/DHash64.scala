package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the dHash perceptual hash of a raw 8-bit
  * luma payload (width×height bytes, row-major) as a 16-char hex string —
  * the single-pass kernel behind [[graft.operators.MultimodalOps.dhash]].
  *
  * Semantics (bit-identical to the HOF column-expression form, which the
  * spec cross-checks): downscale to a 9×8 grid of block sums with
  * integer boundaries (cell (r,c) covers rows [r·h/8,(r+1)·h/8), cols
  * [c·w/9,(c+1)·w/9)), then bit i (r=i/8, c=i%8) = 1 iff cell(r,c)'s
  * mean exceeds cell(r,c+1)'s — compared by integer cross-multiplication
  * (sumA·cntB > sumB·cntA), so no float ties exist and the DuckDB twin
  * replays the hash exactly. Nibbles are MSB-first.
  *
  * Why an Expression: the HOF form interprets a ~2500-node tree per row
  * (one hex() + per-pixel substr/conv, 72 nested aggregates, 128 grid
  * lookups — all CodegenFallback with boxed intermediates); measured
  * 36.8 s at sf0.1 where this kernel does one primitive pass per row.
  * Codegen emits a static call, keeping the surrounding projection
  * inside whole-stage codegen.
  *
  * Contract (ENFORCED): payload length ≥ width×height (the luma frame),
  * width ≥ 9, height ≥ 8 (keeps every cell non-empty). Out-of-contract
  * inputs return NULL — the HOF twin guards identically, so the two
  * forms can never produce divergent non-null hashes. Null on any null
  * input.
  */
case class DHash64(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"dhash64 expects (binary, int, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = StringType

  // out-of-contract (short payload / tiny frame) inputs yield null even
  // when every child is non-null
  override def nullable: Boolean = true

  override def nullSafeEval(p: Any, w: Any, h: Any): Any =
    DHash64.compute(p.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, w, h) =>
      s"""${ev.value} = graft.functions.DHash64.compute($p, $w, $h);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DHash64 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DHash64 {
  private val digits = "0123456789abcdef"

  /** The kernel (also called from generated code via the companion's
    * static forwarder). One pass over the grid rectangles; all-integer.
    * Returns null outside the contract domain. */
  def compute(b: Array[Byte], w: Int, h: Int): UTF8String = {
    if (w < 9 || h < 8 || b.length < w.toLong * h) return null
    val sums = new Array[Long](72) // 8 rows × 9 cols, index r*9+c
    val cnts = new Array[Long](72)
    var r = 0
    while (r < 8) {
      val r0 = r * h / 8
      val r1 = (r + 1) * h / 8
      var c = 0
      while (c < 9) {
        val c0 = c * w / 9
        val c1 = (c + 1) * w / 9
        var s = 0L
        var rr = r0
        while (rr < r1) {
          val base = rr * w
          var cc = c0
          while (cc < c1) {
            s += (b(base + cc) & 0xff) // in bounds: contract guarantees len >= w*h
            cc += 1
          }
          rr += 1
        }
        sums(r * 9 + c) = s
        cnts(r * 9 + c) = (r1 - r0).toLong * (c1 - c0).toLong
        c += 1
      }
      r += 1
    }
    val chars = new Array[Char](16)
    var p = 0
    while (p < 16) {
      var v = 0
      var k = 0
      while (k < 4) {
        val i = 4 * p + k
        val a = (i / 8) * 9 + (i % 8)
        val bit = if (sums(a) * cnts(a + 1) > sums(a + 1) * cnts(a)) 1 else 0
        v = v * 2 + bit
        k += 1
      }
      chars(p) = digits.charAt(v)
      p += 1
    }
    UTF8String.fromString(new String(chars))
  }

  import org.apache.spark.sql.graft.bridge
  /** Column API entry: `DHash64($"payload", $"w", $"h")`. */
  def apply(payload: Column, width: Column, height: Column): Column =
    bridge.column(DHash64(bridge.expression(payload),
      bridge.expression(width), bridge.expression(height)))
}
