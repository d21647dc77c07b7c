package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter as a typed aggregate: a fixed `numBits` bit array (packed
  * into `numBits/64` longs) where each input string sets `numHashes` bits,
  * bit r at `floorMod(murmur3(s + ":" + r), numBits)`.
  *
  * Why: the membership prefilter for anti-join/delta-dedup at scale. The
  * buffer is a FIXED-SIZE mergeable array — partials OR together map-side,
  * so building it is one aggregate pass whose exchange carries
  * `numBits/64` longs per partition regardless of row count. A Bloom
  * filter has NO false negatives: a probe miss proves the key was never
  * inserted, so miss-rows can skip the exact join entirely; only hits
  * (true matches + ~`(1-e^{-kn/m})^k` false positives) continue.
  *
  * The bit hash is Spark's own Murmur3 (`Murmur3HashFunction`, seed 42 —
  * exactly the builtin `hash()` expression), so the probe is a PURE COLUMN
  * EXPRESSION over the broadcast bit array ([[BloomAggregator.mightContain]])
  * — scan-local, no UDF on the 100 TB probe side; agg/probe hash equality
  * is spec-asserted.
  */
final class BloomAggregator(numBits: Int, numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(numBits % 64 == 0, "numBits must pack into whole longs")

  def zero: Array[Long] = new Array[Long](numBits / 64)

  def reduce(buf: Array[Long], key: String): Array[Long] = {
    var r = 0
    while (r < numHashes) {
      val bit = BloomAggregator.bit(key, r, numBits)
      buf(bit >>> 6) |= (1L << (bit & 63))
      r += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object BloomAggregator {
  /** Bit index for (key, round): Spark-builtin Murmur3 (seed 42) of
    * `key + ":" + round`, floor-mod numBits — bit-identical to the column
    * form `pmod(hash(concat(key, lit(":" + r))), numBits)`. */
  def bit(key: String, round: Int, numBits: Int): Int = {
    val h = Murmur3HashFunction
      .hash(UTF8String.fromString(key + ":" + round), StringType, 42L)
      .toInt
    java.lang.Math.floorMod(h, numBits)
  }

  /** Probe as a pure column expression over a (broadcast) bit-array
    * column: true iff all `numHashes` bits for `key` are set. `getbit`
    * indexes the long at `bit >> 6` from the LSB, matching the
    * aggregator's `1L << (bit & 63)` packing. */
  def mightContain(bloom: Column, key: Column, numBits: Int,
                   numHashes: Int): Column =
    (0 until numHashes).map { r =>
      val bit = pmod(hash(concat(key, lit(":" + r))), lit(numBits))
      call_function("getbit",
        element_at(bloom, shiftright(bit, 6) + 1),
        pmod(bit, lit(64))) === 1
    }.reduce(_ && _)
}
