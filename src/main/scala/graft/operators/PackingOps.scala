package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Corpus-assembly operators (SURVEY §2E): context-window chunking
  * and fixed-budget sequence packing — the two ops that turn a cleaned
  * document corpus into model-ready training sequences.
  */
object PackingOps {

  /** Context-window chunking: split each document into token windows of
    * `chunkTokens`, starting a new window every `stride` tokens
    * (stride < chunkTokens ⇒ overlapping windows; tail windows may be
    * shorter). Returns (doc_id, chunk_id, chunk_text, chunk_tokens).
    *
    * One `posexplode` of a `transform` over the start sequence —
    * scan-local, zero shuffles. The token array is materialized ONCE per
    * row outside the lambda: a lambda that embedded the split subtree
    * would re-run the split once per window (interpreted HOF pitfall,
    * see [[TextOps.shingles]]).
    */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0,
      s"chunkTokens/stride must be positive, got $chunkTokens/$stride")
    docs
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(stride)),
          start => slice(col("toks"), start + 1, lit(chunkTokens)))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).as("chunk_tokens"))
  }

  /** Sequence packing: assign documents, in deterministic `idCol` order,
    * to fixed token-budget bins by cumulative token count — the document
    * whose preceding cumulative total is c lands in bin c div budget (a
    * document may overhang its bin boundary; the next bin starts after
    * it — the standard streaming/cumulative packing approximation, exact
    * greedy bin packing being inherently sequential).
    *
    * The global cumulative sum is built the way it must be at 100 TB:
    * range-partition by id, partition-LOCAL running-sum windows (each
    * window group is one partition, never the whole table on one node),
    * then add per-partition prefix offsets. The prefix scan is over
    * partition TOTALS — O(shuffle partitions) driver work, not O(rows).
    * Result is invariant to where the range boundaries fall, so sampled
    * range splits don't affect determinism.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budgetTokens: Long, partitions: Int = 32): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    val spark = docs.sparkSession
    import spark.implicits._
    // Lineage.cut pins ONE materialization of the range partitioning:
    // `local` is consumed by TWO actions (the offsets collect and the
    // final join), and repartitionByRange picks its boundaries by
    // SAMPLING — re-execution can sample different boundaries, making
    // spark_partition_id/local_cum disagree with the collected offsets
    // (observed at sf1 as token-gap bins: 1279 vs the oracle's 1322;
    // invisible at small SF where the sample sees every row).
    val local = graft.core.Lineage.cut(docs
      .select(col(idCol).as("doc_id"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .repartitionByRange(partitions, col("doc_id"))
      .withColumn("part", spark_partition_id())
      .withColumn("local_cum", sum(col("n_tokens")).over(
        Window.partitionBy(col("part")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    // partition totals -> exclusive prefix offsets (tiny: one row per part)
    val totals = local.groupBy(col("part"))
      .agg(max(col("local_cum")).as("part_total"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).init)
      .toSeq.toDF("part", "offset")
    local.join(broadcast(offsets), "part")
      .withColumn("cum_tokens", col("local_cum") + col("offset"))
      .withColumn("bin",
        expr(s"(cum_tokens - n_tokens) div ${budgetTokens}L"))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"), col("bin"))
  }
}
