package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join (point-in-interval) — the scalable form.
  *
  * A naive `points JOIN intervals ON pt BETWEEN start AND end` is a
  * nested-loop join (O(P×I)). This implementation buckets time into
  * fixed-width chunks: each interval is exploded into the chunks it
  * overlaps, each point maps to exactly one chunk, and the join becomes
  * an EQUI-join on (key, chunk) followed by the exact BETWEEN filter.
  * Cost is O(P + I·avg_chunks + matches) with an ordinary hash shuffle —
  * the standard interval-bucketing technique.
  *
  * `chunkMicros` tunes the bucket width: ≈ the median interval length is
  * a good default (too small → interval explosion; too large → many
  * false candidates per chunk).
  */
object RangeJoinOps {

  def pointInInterval(points: DataFrame, intervals: DataFrame, keyCol: String,
                      ptCol: String, startCol: String, endCol: String,
                      chunkMicros: Long): DataFrame = {
    val p = points.withColumn("__chunk",
      (unix_micros(col(ptCol)) / chunkMicros).cast("long"))
    val i = intervals.withColumn("__chunk",
      explode(sequence(
        (unix_micros(col(startCol)) / chunkMicros).cast("long"),
        (unix_micros(col(endCol)) / chunkMicros).cast("long"))))
    p.join(i, Seq(keyCol, "__chunk"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__chunk")
  }
}
