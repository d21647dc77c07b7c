package graft.streaming

import graft.SparkSpec
import graft.operators.RelationalOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** State-SIZE evidence for the stateful-streaming plane (VERDICT r5
  * task 6). The parity specs prove the semantics; these prove the state
  * store is BOUNDED under sustained input — the property that decides
  * whether a query survives week-long uptime at production volume. Each
  * test drives an order of magnitude more batches than the TTL horizon
  * holds and asserts `stateOperators.numRowsTotal` (resp. the state
  * table's row count) plateaus at the horizon-implied bound instead of
  * growing with total input.
  */
class StateBoundSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(doc_id: Long, text: String, ts: Timestamp)

  test("lshCandidatesStream state plateaus at the TTL horizon, not total input") {
    implicit val sqlCtx = spark.sqlContext
    val bands = 4
    val docsPerBatch = 20
    val nBatches = 10
    val batchGapMs = 10 * 60 * 1000L // event time advances 10 min per batch
    val ttlMs = 15 * 60 * 1000L      // ⇒ a bucket survives ~1.5 batch gaps
    val input = MemoryStream[Doc]
    val q = StreamingOps.lshCandidatesStream(input.toDF(), "doc_id", "text",
        "ts", watermark = "1 minute", stateTtlMs = ttlMs)
      .writeStream.format("memory").queryName("lsh_bound_out")
      .outputMode(OutputMode.Append).start()

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val observed = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (b <- 0 until nBatches) {
      // unique texts ⇒ every doc seeds `bands` fresh (band,bucket) groups:
      // without eviction state would grow by bands×docsPerBatch per batch
      val docs = (0 until docsPerBatch).map { i =>
        val id = b.toLong * docsPerBatch + i
        Doc(id, s"u${id}a u${id}b u${id}c u${id}d u${id}e u${id}f",
          new Timestamp(t0 + b * batchGapMs + i))
      }
      input.addData(docs)
      q.processAllAvailable()
      observed += q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    }
    q.stop()

    val unbounded = bands.toLong * docsPerBatch * nBatches
    // horizon bound: buckets from at most the last 2 batch gaps are inside
    // TTL, plus one gap of timed-out-but-not-yet-reaped groups (eviction
    // happens in the first batch whose watermark passes the timeout)
    val horizon = 3L * bands * docsPerBatch
    assert(observed.last > 0, "state operator reported no rows — probe is vacuous")
    assert(observed.max <= horizon,
      s"state grew past the TTL-implied bound: max=${observed.max} " +
        s"bound=$horizon series=$observed")
    assert(observed.max < unbounded / 2,
      s"state tracks total input (${observed.max} of $unbounded) — TTL not in effect")
    // plateau shape: the second half of the run adds no net state
    assert(observed.takeRight(nBatches / 2).max
             <= observed.take(nBatches / 2).max + bands * docsPerBatch,
      s"state still climbing in steady state: $observed")
  }

  test("cdcUpsertBatch state rows stay <= live keys regardless of log volume") {
    val nKeys = 20
    val nBatches = 12
    val rowsPerBatch = 100
    var state = Seq.empty[(Long, Long, Long, String, Double)]
      .toDF("k", "ord", "tie", "op", "v")
    var seq = 0L
    var processed = 0L
    for (b <- 0 until nBatches) {
      val rows = (0 until rowsPerBatch).map { i =>
        val k = (b * 7 + i * 3) % nKeys
        // every 11th op is a delete; later batches may resurrect the key
        val op = if ((b + i) % 11 == 0) "D" else "U"
        seq += 1
        (k.toLong, seq, seq, op, (b * 100 + i) / 100.0)
      }
      processed += rows.size
      state = RelationalOps.cdcUpsertBatch(state, rows.toDF("k", "ord", "tie", "op", "v"),
        "k", "ord", "tie", "op").localCheckpoint()
      val n = state.count()
      assert(n <= nKeys,
        s"state holds $n rows after batch $b — exceeds the $nKeys live keys " +
          s"(log processed so far: $processed rows)")
      // the state IS the latest surviving op per key — never duplicated
      assert(state.groupBy("k").count().filter($"count" > 1).isEmpty)
    }
    // the bound is structural: 1200 log rows folded, ≤ 20 state rows kept
    assert(processed === nBatches.toLong * rowsPerBatch)
    // and the fold is not vacuously empty
    assert(state.count() > 0)
  }
}
