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

  /** Merge overlapping/touching intervals per key (gaps-and-islands over
    * INTERVALS): an interval starts a new island only when its start lies
    * strictly past the RUNNING MAX of all previous ends — the running max
    * (not `lag(end)`) is what makes nested intervals ([1,10], [2,3],
    * [4,12]) merge correctly where plain sessionization logic would split.
    * Start/end are plain longs (e.g. epoch micros). Returns one row per
    * merged island: key, island ordinal, merged bounds, source-row count.
    * One shuffle on the key; the two window passes and the final
    * aggregate all reuse the same (key, start, end, tie) sort. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol), col(tieCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__new_island",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("__new_island"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("merged_start"),
        max(col(endCol)).as("merged_end"),
        count(lit(1)).as("n_merged"))
  }
}
