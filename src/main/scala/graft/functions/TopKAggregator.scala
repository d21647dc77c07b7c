package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregate (SURVEY §4 "the one genuinely custom
  * aggregate"): keeps the k largest (score, id) pairs per group.
  *
  * Why not `row_number().over(Window.partitionBy(q))`? The window form
  * shuffles and fully sorts every candidate row per group; this
  * `Aggregator` gets map-side partial aggregation — each partition
  * reduces to ≤k pairs before the shuffle, so the exchange carries
  * O(partitions × k) rows instead of O(N). At 100 TB candidate scale
  * that is the difference between a broadcast-sized shuffle and a
  * full-data sort.
  *
  * Buffer is a sorted-descending Vector capped at k (insertion into a
  * ≤k-element vector is O(k) — fine for the k ≤ 100 regime this is for).
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && ordLt(x, buf.last)) buf
    else ((buf :+ x).sortBy(t => (-t._1, t._2))).take(k)

  /** (score desc, id asc) ordering — lower means "worse". */
  private def ordLt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)

  def zero: Seq[(Double, Long)] = Vector.empty

  def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, x)

  def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortBy(t => (-t._1, t._2)).take(k)

  def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
