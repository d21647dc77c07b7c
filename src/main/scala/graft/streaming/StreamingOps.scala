package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import java.sql.Timestamp

/** Structured Streaming surface (SURVEY §2 streaming row + §2E):
  * watermarked tumbling/sliding windows, session windows, custom
  * per-key state via flatMapGroupsWithState, and the incremental file
  * source that replaces the reference's S3KeySensor + Glue-bookmark
  * pattern (S15/S17) with `readStream` + `Trigger.AvailableNow`.
  *
  * Scale posture: state is bounded per key by watermarks; the shuffle is
  * on the grouping key exactly as in the batch twin queries
  * (EventQueries), so a batch-validated plan carries over unchanged.
  */
object StreamingOps {

  /** Typed event row matching the `events` table (FIXTURES.md §B). */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Watermarked tumbling-window counts — streaming twin of
    * events_tumbling_hourly. Late data beyond `watermark` is dropped and
    * its window state reclaimed. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows with a gap timeout — streaming twin of
    * events_session_windows, via the built-in `session_window`. */
  def sessionAggregate(events: DataFrame, gap: String = "10 minutes",
                       watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Per-user running aggregate emitted on every update — the custom-state
    * escape hatch (`flatMapGroupsWithState`) for semantics windows can't
    * express. State per key is O(1) (count + sum). */
  case class UserRunning(user_id: Long, n: Long, total: Double)
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserRunning(userId, prev.n + batch.size,
            prev.total + batch.map(_.value).sum)
          state.update(next)
          Iterator(next)
      }
  }

  /** Funnel state: earliest micros of each reached step (None = not yet).
    * O(1) per key — the watermark-free analog of a conversion tracker. */
  case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long])
  case class FunnelProgress(user_id: Long, step: Int)

  /** Streaming ordered funnel via `flatMapGroupsWithState`: per user, a
    * 3-step state machine (steps(0) → steps(1) → steps(2)) where each
    * step's timestamp must be STRICTLY after the previous step's — the
    * incremental twin of the batch `events_funnel_steps` chain (first
    * qualifying event per step). Rows inside one micro-batch arrive
    * unordered, so each invocation folds its rows in (ts, event_id)
    * order; across batches the state carries the earliest step times, so
    * in-order batch arrival (the CDC contract, same as SCD2 upsert)
    * yields exactly the batch result. Emits the user's current step count
    * on every update. */
  def funnelProgress(events: Dataset[Event], steps: Seq[String])
      : Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(steps.size == 3, "3-step funnel")
    def micros(t: Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(None, None, None))
          rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val us = micros(e.ts)
            if (st.t1.isEmpty) {
              if (e.event_type == steps(0)) st = st.copy(t1 = Some(us))
            } else if (st.t2.isEmpty) {
              if (e.event_type == steps(1) && us > st.t1.get)
                st = st.copy(t2 = Some(us))
            } else if (st.t3.isEmpty) {
              if (e.event_type == steps(2) && us > st.t2.get)
                st = st.copy(t3 = Some(us))
            }
          }
          state.update(st)
          Iterator(FunnelProgress(uid,
            Seq(st.t1, st.t2, st.t3).count(_.nonEmpty)))
      }
  }

  /** Streaming exact dedup with bounded state: drop duplicate keys whose
    * event time is within the watermark; state for keys older than the
    * watermark is reclaimed — the streaming twin of exact dedup for an
    * incremental document feed. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           tsCol: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** A candidate near-dup pair surfaced by [[lshCandidatesStream]]:
    * (band, bucket) names the colliding LSH bucket, ids are ordered. */
  case class StreamCandPair(band: Int, bucket: String, id_a: Long, id_b: Long)

  /** Per-bucket LSH state: member ids + the max event time seen, which
    * anchors the TTL (the watermark at update time lags the data — on the
    * first batch it is epoch 0, so a watermark-anchored timeout would
    * expire the moment the real watermark appears). */
  case class BucketState(ids: Array[Long], lastMs: Long)

  /** Streaming NEAR-dup candidate generation — the batch MinHash+LSH
    * banding (`DedupOps.lshCandidatePairs`) as an incremental stream for
    * a document feed. Per arriving doc: shingle → minhash signature →
    * one (band, bucket) key per band (same comma-joined band-slice
    * bucket encoding as the batch form, so a stream restart can warm its
    * state from a batch backfill); per (band, bucket) group a
    * `flatMapGroupsWithState` keeps the ids seen so far and emits one
    * candidate row per (new doc × already-seen member). State per bucket
    * is an id array BOUNDED by the event-time watermark: buckets idle
    * past `stateTtlMs` time out and are reclaimed, which is the streaming
    * analog of the batch job's corpus scope (a candidate pairs only with
    * docs inside the TTL horizon — the dedup-against-recent-history
    * contract).
    *
    * Semantics vs batch: the batch form ends in `.distinct()` across
    * bands; a stream cannot retract, so pairs here surface AT LEAST once
    * (once per colliding band) and downstream must treat candidates as a
    * set — exactly what the verify step (exact Jaccard ≥ t on the full
    * sets) or an idempotent foreachBatch merge already does. Within one
    * invocation rows fold in id order, so output is deterministic for a
    * given micro-batch partitioning. The skew-blocking of the batch form
    * is unnecessary here: a hot bucket's work arrives spread over time
    * instead of as one |bucket|² task. */
  def lshCandidatesStream(docs: DataFrame, idCol: String, textCol: String,
                          tsCol: String, shingleN: Int = 2, k: Int = 16,
                          bands: Int = 4, rowsPerBand: Int = 4,
                          watermark: String = "10 minutes",
                          stateTtlMs: Long = 3600000L,
                          warmStart: Option[(DataFrame, Long)] = None)
      : Dataset[StreamCandPair] = {
    import docs.sparkSession.implicits._
    require(bands * rowsPerBand <= k, s"bands*rowsPerBand must be <= k=$k")
    // warm start: seed the per-bucket state from a batch-built banded
    // postings table — e.g. the STORED index `DedupOps.writeBandedIndex`
    // maintains (`spark.read.parquet(indexPath)`), which uses the same
    // comma-joined band-slice bucket encoding. The stream then dedups new
    // arrivals AGAINST the backfilled history, not just against itself —
    // the restart-from-backfill contract the bucket encoding was designed
    // for. `asOfMs` anchors the seeded buckets' TTL: history idle past
    // `stateTtlMs` after it expires as usual.
    val initialState = warmStart.map { case (postings, asOfMs) =>
      postings
        .groupBy(col("band"), col("bucket"))
        .agg(sort_array(collect_set(col("id").cast("long"))).as("ids"))
        .select(col("band").cast("int"), col("bucket"), col("ids"))
        .as[(Int, String, Array[Long])]
        .groupByKey(r => (r._1, r._2))
        .mapValues(r => BucketState(r._3, asOfMs))
    }
    val sig = graft.operators.DedupOps.minhashSignature(
      graft.operators.TextOps.shingles(col(textCol), shingleN), k)
    val banded = docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"), sig.as("sig"))
      .select(col("id"), col("ts"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
      .select(col("id"), col("ts"), col("pos").cast("int").as("band"),
        concat_ws(",", col("col").cast("array<string>")).as("bucket"))
      .as[(Long, Timestamp, Int, String)]
    val fold =
        (key: (Int, String), rows: Iterator[(Long, Timestamp, Int, String)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty[StreamCandPair] }
          else {
            val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
            var lastMs = 0L
            state.getOption.foreach { st => seen ++= st.ids; lastMs = st.lastMs }
            val batch = rows.toSeq
            lastMs = (lastMs +: batch.map(_._2.getTime)).max
            val out = Seq.newBuilder[StreamCandPair]
            // fold in id order so emission is deterministic per batch
            for (id <- batch.map(_._1).distinct.sorted
                 if !seen.contains(id)) {
              for (other <- seen)
                out += StreamCandPair(key._1, key._2,
                  math.min(id, other), math.max(id, other))
              seen += id
            }
            state.update(BucketState(seen.toArray, lastMs))
            // reclaim the bucket TTL past its newest member's event time
            // (anchoring to the watermark instead would use epoch 0 on the
            // first batch and evict everything at the next watermark
            // advance); the max() keeps the mandatory timeout > watermark
            // invariant when the bucket's data is already older than TTL
            state.setTimeoutTimestamp(math.max(lastMs + stateTtlMs,
              state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
    val grouped = banded.groupByKey(r => (r._3, r._4))
    initialState match {
      case Some(init) => grouped.flatMapGroupsWithState[BucketState, StreamCandPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout, init)(fold)
      case None => grouped.flatMapGroupsWithState[BucketState, StreamCandPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
    }
  }

  /** Stream-stream interval join: each left event joins right events of
    * the same key within `[left.ts − lookback, left.ts]`. Watermarks on
    * BOTH sides bound the join state (right rows older than the watermark
    * + lookback are evicted). Columns are prefixed l_/r_ to keep the
    * output unambiguous.
    *
    * `joinType = "left_outer"` additionally emits a null-padded row for
    * each left event that finds no partner — but only once the watermark
    * has passed the event's whole join window, i.e. the engine can PROVE
    * no matching right row can still arrive. Outer results are therefore
    * watermark-delayed by construction; both sides' time columns must
    * appear in the join condition (they do) for state eviction. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, lookback: String, watermark: String,
                   joinType: String = "inner"): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
      .withWatermark(s"l_$tsCol", watermark)
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_$tsCol", watermark)
    l.join(r, expr(
      s"""l_$keyCol = r_$keyCol AND
         |r_$tsCol >= l_$tsCol - interval $lookback AND
         |r_$tsCol <= l_$tsCol""".stripMargin), joinType)
  }

  /** Stream-static enrichment: join a stream against a batch dimension
    * table (the lookup-table pattern — prices × static calendar, events ×
    * user dim). The static side is explicitly broadcast: each micro-batch
    * probes the dim map-side with NO stream-side shuffle and NO state
    * store — unlike stream-stream joins this is stateless, so no
    * watermark is required. The dim is re-resolved per micro-batch, so a
    * view/table that changes between batches is picked up (the Spark
    * stream-static contract). */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    keyCols: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim),
      keyCols, "left")

  /** foreachBatch sink wiring: lift any batch writer (e.g. the idempotent
    * partitioned Writers.writeForDate) into a streaming sink — each
    * micro-batch is written under its batch id exactly once on retry
    * because the partition overwrite is idempotent. */
  def sinkViaForeachBatch(df: DataFrame, checkpoint: String)
                         (write: (DataFrame, Long) => Unit) =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(write)
      .trigger(Trigger.AvailableNow())

  /** Incremental file ingestion: process exactly the files not yet seen
    * (checkpoint-tracked), then stop — the engine's replacement for
    * S3KeySensor + job bookmarks. Returns the query after completion. */
  def processAvailableFiles(spark: SparkSession, srcDir: String,
                            schema: org.apache.spark.sql.types.StructType,
                            checkpoint: String, outDir: String): Unit = {
    val q = spark.readStream
      .schema(schema)
      .json(srcDir)
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .option("path", outDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
