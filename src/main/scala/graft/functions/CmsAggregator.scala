package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch as a typed aggregate: a `depth × width` counter grid
  * (flattened row-major) where each input string increments one counter
  * per row, at column `floorMod(murmur3(s + ":" + row), width)`.
  *
  * Why a sketch: exact per-token counts need a full shuffle on the token;
  * the CMS buffer is a FIXED-SIZE mergeable array — partials combine
  * map-side and the exchange carries depth·width longs per partition
  * regardless of N or cardinality, the right shape for 100 TB frequency
  * estimation. Point estimates `min over rows` never undercount and
  * overshoot by ≤ ε·N with ε ≈ e/width (Cormode & Muthukrishnan 2005).
  *
  * The row hash is Spark's own Murmur3 (`Murmur3HashFunction`, seed 42 —
  * exactly the builtin `hash()` expression), so a probe can be written as
  * a PURE COLUMN EXPRESSION over the broadcast sketch array:
  * `element_at(cms, row·width + pmod(hash(concat(token, ':row')), width) + 1)`
  * — no UDF on the probe path, and the equality is spec-asserted.
  */
final class CmsAggregator(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  def zero: Array[Long] = new Array[Long](depth * width)

  def reduce(buf: Array[Long], token: String): Array[Long] = {
    var r = 0
    while (r < depth) {
      buf(r * width + CmsAggregator.bucket(token, r, width)) += 1L
      r += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CmsAggregator {
  /** The bucket for (token, row): Spark-builtin Murmur3 (seed 42) of
    * `token + ":" + row`, floor-mod width — bit-identical to the column
    * form `pmod(hash(concat(token, lit(":" + row))), width)`. */
  def bucket(token: String, row: Int, width: Int): Int = {
    val h = Murmur3HashFunction
      .hash(UTF8String.fromString(token + ":" + row), StringType, 42L)
      .toInt
    java.lang.Math.floorMod(h, width)
  }
}
