package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.sql.Timestamp

/** Provider-parameterized state-store evidence: a 100 TB deployment runs
  * the stateful plane on RocksDB
  * (`spark.sql.streaming.stateStore.providerClass`), not the default
  * HDFS-backed in-memory map — state semantics (custom case-class state
  * encoders, TTL timeouts, watermark dedup buffers) and the state-bound
  * plateaus must hold identically there, where the store round-trips
  * through native memory instead of JVM maps. Each scenario runs under
  * BOTH providers and asserts result parity (and, for the LSH stream,
  * the same TTL plateau bound proven in [[StateBoundSpec]]). The
  * provider conf is read at query START, so setting it per-scenario on
  * the shared session is sound. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._
  import StreamingOps.Event

  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def withProvider[A](provider: Option[String])(body: => A): A = {
    val prior = spark.conf.getOption(providerKey)
    provider.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    try body
    finally prior.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Doc(doc_id: Long, text: String, ts: Timestamp)

  /** funnel FSM over the real events fixture (AvailableNow file source),
    * returning the (user_id, step) map. */
  private def runFunnel(tag: String): Map[Long, Int] = {
    val stageDir = java.nio.file.Files.createTempDirectory(s"graft-rocks-$tag")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(graft.TestSpark.sfDir + "/events.parquet"),
      stageDir.resolve("events.parquet"))
    val schema = spark.read.parquet(stageDir.toString).schema
    val streamed = graft.core.Tables.normalizeTs(spark.readStream
        .schema(schema).parquet(stageDir.toString))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event]
    val qn = s"rocks_funnel_$tag"
    val q = StreamingOps.funnelProgress(streamed, Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(qn).as[(Long, Int)].collect().toMap
  }

  test("funnel FSM (custom FunnelState encoders + EventTimeTimeout): " +
       "RocksDB result == default-provider result") {
    val hdfs = withProvider(None) { runFunnel("hdfs") }
    val rocksRes = withProvider(Some(rocks)) { runFunnel("rocks") }
    assert(rocksRes === hdfs)
    assert(hdfs.nonEmpty)
  }

  test("LSH stream under RocksDB: same candidates and the same TTL " +
       "plateau as the default provider") {
    implicit val sqlCtx = spark.sqlContext
    val bands = 4
    val docsPerBatch = 20
    val nBatches = 10
    val batchGapMs = 10 * 60 * 1000L
    val ttlMs = 15 * 60 * 1000L
    def run(tag: String): (Set[(Int, String, Long, Long)], Seq[Long]) = {
      var sawRocksMetrics = false
      val input = MemoryStream[Doc]
      val q = StreamingOps.lshCandidatesStream(input.toDF(), "doc_id", "text",
          "ts", watermark = "1 minute", stateTtlMs = ttlMs)
        .writeStream.format("memory").queryName(s"rocks_lsh_$tag")
        .outputMode(OutputMode.Append).start()
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val observed = scala.collection.mutable.ArrayBuffer.empty[Long]
      for (b <- 0 until nBatches) {
        val docs = (0 until docsPerBatch).map { i =>
          val id = b.toLong * docsPerBatch + i
          // every 5th doc repeats the previous doc's text: guaranteed
          // in-horizon collisions so the parity check is non-vacuous
          val stem = if (i % 5 == 4) id - 1 else id
          Doc(id, s"u${stem}a u${stem}b u${stem}c u${stem}d u${stem}e u${stem}f",
            new Timestamp(t0 + b * batchGapMs + i))
        }
        input.addData(docs)
        q.processAllAvailable()
        observed += q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        sawRocksMetrics ||= q.lastProgress.stateOperators.exists(
          _.customMetrics.keySet.stream.anyMatch(_.startsWith("rocksdb")))
      }
      q.stop()
      // guard against a silently-ignored provider conf: the RocksDB run
      // must surface rocksdb* state metrics, the default run must not
      assert(sawRocksMetrics === (tag == "rocks"),
        s"provider engagement mismatch for $tag leg")
      val pairs = spark.table(s"rocks_lsh_$tag")
        .as[(Int, String, Long, Long)].collect().toSet
      (pairs, observed.toSeq)
    }
    val (hdfsPairs, hdfsState) = withProvider(None) { run("hdfs") }
    val (rocksPairs, rocksState) = withProvider(Some(rocks)) { run("rocks") }
    assert(rocksPairs === hdfsPairs)
    assert(rocksPairs.nonEmpty, "no candidate pairs — parity is vacuous")
    // the TTL plateau proven for the default store holds under RocksDB
    val horizon = 3L * bands * docsPerBatch
    assert(rocksState.max <= horizon,
      s"RocksDB state grew past the TTL bound: $rocksState")
    assert(rocksState.last > 0)
    assert(hdfsState.max <= horizon)
  }

  test("warm-started LSH stream (initialState seeded from the stored " +
       "banded index): RocksDB == default provider, and the seeded state " +
       "expires on the same TTL plateau") {
    implicit val sqlCtx = spark.sqlContext
    // history postings persisted once by the stored-index writer — the
    // same seed both provider legs warm-start from
    val all = graft.core.Tables(spark, graft.TestSpark.sfDir).documents
      .filter(size(split($"text", "\\s+")) >= 5)
      .select($"doc_id", graft.operators.DedupOps.minhashSignature(
        graft.operators.TextOps.shingles($"text", 2), 16).as("sig"))
    val idx = java.nio.file.Files
      .createTempDirectory("graft-rocks-warm-idx").toString
    graft.operators.DedupOps.writeBandedIndex(
      all.filter($"doc_id" % 3 =!= 0), "doc_id", "sig", 4, 4, idx)
    val postings = spark.read.parquet(idx)
    val t0 = ts("2024-01-01 10:00:00").getTime
    val ttlMs = 15 * 60 * 1000L
    val newDocs = graft.core.Tables(spark, graft.TestSpark.sfDir).documents
      .filter(size(split($"text", "\\s+")) >= 5 && $"doc_id" % 3 === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect().take(40)
      .zipWithIndex.map { case ((id, text), i) =>
        Doc(id, text, new Timestamp(t0 + i * 1000L)) }
    def run(tag: String): (Set[(Long, Long)], Seq[Long]) = {
      var sawRocksMetrics = false
      val input = MemoryStream[Doc]
      val qn = s"rocks_warm_$tag"
      val q = StreamingOps.lshCandidatesStream(input.toDF(), "doc_id",
          "text", "ts", watermark = "1 minute", stateTtlMs = ttlMs,
          warmStart = Some((postings, t0)))
        .writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append).start()
      val observed = scala.collection.mutable.ArrayBuffer.empty[Long]
      def step(docs: Seq[Doc]): Unit = {
        input.addData(docs); q.processAllAvailable()
        observed += q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        sawRocksMetrics ||= q.lastProgress.stateOperators.exists(
          _.customMetrics.keySet.stream.anyMatch(_.startsWith("rocksdb")))
      }
      newDocs.grouped(20).foreach(chunk => step(chunk.toIndexedSeq))
      // advance the watermark hours past the TTL horizon: every seeded
      // bucket is idle since ~t0 and must be reclaimed
      step(Seq(Doc(999999L, "zz1 zz2 zz3 zz4 zz5 zz6",
        new Timestamp(t0 + 6 * 3600 * 1000L))))
      step(Seq(Doc(999998L, "yy1 yy2 yy3 yy4 yy5 yy6",
        new Timestamp(t0 + 6 * 3600 * 1000L + 60000L))))
      q.stop()
      assert(sawRocksMetrics === (tag == "rocks"),
        s"provider engagement mismatch for $tag leg")
      val pairs = spark.table(qn).select($"id_a", $"id_b")
        .as[(Long, Long)].collect().toSet
      (pairs, observed.toSeq)
    }
    val (hdfsPairs, hdfsState) = withProvider(None) { run("hdfs") }
    val (rocksPairs, rocksState) = withProvider(Some(rocks)) { run("rocks") }
    assert(rocksPairs === hdfsPairs)
    // non-vacuous: the stream must have paired new arrivals against the
    // warm-started history (cross-boundary pairs exist)
    assert(rocksPairs.exists { case (a, b) => (a % 3 == 0) != (b % 3 == 0) },
      "no cross-boundary pairs — the warm start was vacuous")
    // TTL plateau under BOTH providers: after the watermark jump the
    // seeded buckets are reclaimed, so state falls well below its peak
    for ((tag, st) <- Seq("hdfs" -> hdfsState, "rocks" -> rocksState)) {
      assert(st.last < st.max,
        s"$tag state never shrank after the TTL horizon: $st")
      // only the two sentinel docs' own buckets (4 bands each, both
      // inside their own TTL window) may remain — every seeded/streamed
      // bucket from the t0 era must be gone
      assert(st.last <= 8,
        s"$tag seeded buckets survived the TTL horizon: $st")
    }
    assert(rocksState === hdfsState,
      "state-row trajectories diverge between providers")
  }

  test("watermark dedup buffer: RocksDB keeps first, drops in-watermark " +
       "repeats — identical to default") {
    implicit val sqlCtx = spark.sqlContext
    def run(tag: String): Seq[Long] = {
      val input = MemoryStream[Event]
      val q = StreamingOps.dedupWithinWatermark(input.toDF(), Seq("user_id"),
          "ts", "10 minutes")
        .writeStream.format("memory").queryName(s"rocks_dedup_$tag")
        .outputMode(OutputMode.Append).start()
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:01:00"), 7, "click", 2.0),
        Event(3, ts("2024-01-01 10:02:00"), 8, "view", 3.0))
      q.processAllAvailable()
      q.stop()
      spark.table(s"rocks_dedup_$tag").select($"event_id")
        .as[Long].collect().sorted.toSeq
    }
    val hdfs = withProvider(None) { run("hdfs") }
    val rocksRes = withProvider(Some(rocks)) { run("rocks") }
    assert(rocksRes === hdfs)
    assert(rocksRes === Seq(1L, 3L))
  }
}
