package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingOps._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window with watermark drops late data past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = tumblingCounts(input.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Append).start()
    // batch 1: two events in hour 10, watermark advances to 11:30-0:10
    input.addData(
      Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:20:00"), 1, "click", 2.0),
      Event(3, ts("2024-01-01 11:30:00"), 2, "view", 3.0))
    q.processAllAvailable()
    // batch 2: an event 2 hours late for hour 10 — must be dropped;
    // plus one closing hour 11
    input.addData(
      Event(4, ts("2024-01-01 10:30:00"), 3, "click", 9.0), // late, dropped
      Event(5, ts("2024-01-01 12:30:00"), 2, "view", 4.0))
    q.processAllAvailable()
    input.addData(Event(6, ts("2024-01-01 14:00:00"), 9, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("tumbling_out")
      .select(date_format($"window_start", "HH:mm").as("w"), $"event_type", $"n", $"sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    // hour-10 click window must contain exactly the 2 on-time events
    assert(out.contains(("10:00", "click", 2L, 3.0)))
    assert(!out.exists { case (w, t, n, s) => w == "10:00" && n == 3 })
  }

  test("session windows split on gap > timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionAggregate(input.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("session_out")
      .outputMode(OutputMode.Append).start()
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:05:00"), 1, "click", 1.0), // same session
      Event(3, ts("2024-01-01 10:30:00"), 1, "click", 1.0)) // gap 25m: new session
    q.processAllAvailable()
    input.addData(Event(9, ts("2024-01-01 13:00:00"), 2, "view", 0.0)) // close user-1 state
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("session_out")
      .filter($"user_id" === 1).select($"n_events").as[Long].collect().sorted
    assert(sessions === Array(1L, 2L))
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("running_out")
      .outputMode(OutputMode.Append).start()
    input.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "click", 2.0))
    q.processAllAvailable()
    input.addData(Event(2, ts("2024-01-01 10:01:00"), 7, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val states = spark.table("running_out").as[UserRunning].collect()
      .sortBy(_.n)
    assert(states.map(s => (s.n, s.total)).toSeq === Seq((1L, 2.0), (2L, 5.0)))
  }

  test("streaming dedup within watermark drops repeats, keeps first") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = dedupWithinWatermark(input.toDF(), Seq("user_id"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 10:01:00"), 7, "click", 2.0), // dup key within wm
      Event(3, ts("2024-01-01 10:02:00"), 8, "view", 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").select($"event_id").as[Long].collect().sorted
    assert(out === Array(1L, 3L))
  }

  case class Doc(doc_id: Long, text: String, ts: Timestamp)

  test("streaming LSH candidates == batch banding on the same corpus") {
    implicit val sqlCtx = spark.sqlContext
    // fixture docs (non-trivial shingle sets), synthetic arrival times
    val docs = graft.core.Tables(spark, graft.TestSpark.sfDir).documents
      .filter(size(split($"text", "\\s+")) >= 5)
      .select($"doc_id", $"text").as[(Long, String)].collect().take(30)
    val t0 = ts("2024-01-01 10:00:00").getTime
    val rows = docs.zipWithIndex.map { case ((id, text), i) =>
      Doc(id, text, new Timestamp(t0 + i * 1000L)) }
    val input = MemoryStream[Doc]
    val q = lshCandidatesStream(input.toDF(), "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("lsh_cand_out")
      .outputMode(OutputMode.Append).start()
    // three micro-batches — candidate pairs must not depend on batching
    rows.grouped(10).foreach { chunk =>
      input.addData(chunk.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("lsh_cand_out")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val signed = graft.core.Tables(spark, graft.TestSpark.sfDir).documents
      .join(rows.map(_.doc_id).toSeq.toDF("doc_id"), "doc_id")
      .select($"doc_id".as("id"), graft.operators.DedupOps.minhashSignature(
        graft.operators.TextOps.shingles($"text", 2), 16).as("sig"))
    val batch = graft.operators.DedupOps
      .lshCandidatePairs(signed, "id", "sig", 4, 4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(streamed === batch,
      s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
  }

  test("streaming LSH warm-started from the STORED batch index: new " +
       "arrivals pair against the backfilled history == batch probe") {
    implicit val sqlCtx = spark.sqlContext
    val all = graft.core.Tables(spark, graft.TestSpark.sfDir).documents
      .filter(size(split($"text", "\\s+")) >= 5)
      .select($"doc_id", graft.operators.DedupOps.minhashSignature(
        graft.operators.TextOps.shingles($"text", 2), 16).as("sig"))
    val hist = all.filter($"doc_id" % 3 =!= 0)
    // the batch side of the restart: history postings persisted by the
    // stored-index writer, read back as the warm-start seed
    val idx = java.nio.file.Files.createTempDirectory("graft-warm-idx").toString
    graft.operators.DedupOps.writeBandedIndex(hist, "doc_id", "sig", 4, 4, idx)
    val postings = spark.read.parquet(idx)
    val t0 = ts("2024-01-01 10:00:00").getTime
    val newDocs = graft.core.Tables(spark, graft.TestSpark.sfDir).documents
      .filter(size(split($"text", "\\s+")) >= 5 && $"doc_id" % 3 === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect().take(40)
      .zipWithIndex.map { case ((id, text), i) =>
        Doc(id, text, new Timestamp(t0 + i * 1000L)) }
    val input = MemoryStream[Doc]
    val q = lshCandidatesStream(input.toDF(), "doc_id", "text", "ts",
        warmStart = Some((postings, t0)))
      .writeStream.format("memory").queryName("lsh_warm_out")
      .outputMode(OutputMode.Append).start()
    newDocs.grouped(20).foreach { chunk =>
      input.addData(chunk.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("lsh_warm_out")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // cross-boundary slice of the stream == the batch incremental probe
    val streamedCross = streamed.filter { case (a, b) =>
      (a % 3 == 0) != (b % 3 == 0) }
    val batchIds = newDocs.map(_.doc_id).toSet
    val probe = graft.operators.DedupOps.lshProbeCandidatesStored(spark, idx,
        all.filter($"doc_id" % 3 === 0)
          .join(batchIds.toSeq.toDF("doc_id"), "doc_id"),
        "doc_id", "sig", 4, 4)
      .select(least($"batch_id", $"hist_id"), greatest($"batch_id", $"hist_id"))
      .as[(Long, Long)].collect().toSet
    assert(streamedCross === probe,
      s"missing=${(probe -- streamedCross).take(5)} " +
        s"extra=${(streamedCross -- probe).take(5)}")
    assert(streamedCross.nonEmpty, "no cross-boundary pairs — vacuous")
  }

  test("streaming LSH bucket state is reclaimed after the TTL horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = lshCandidatesStream(input.toDF(), "doc_id", "text", "ts",
        watermark = "1 minute", stateTtlMs = 60 * 60 * 1000L)
      .writeStream.format("memory").queryName("lsh_ttl_out")
      .outputMode(OutputMode.Append).start()
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    // doc 1 seeds its buckets at 10:00
    input.addData(Doc(1, text, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // identical doc 2 inside the TTL horizon pairs with doc 1
    input.addData(Doc(2, text, ts("2024-01-01 10:05:00")))
    q.processAllAvailable()
    // advance the watermark far past TTL (unrelated bucket), let the
    // timeout fire in its own batch, then probe with identical doc 4
    input.addData(Doc(3, "zzz yyy xxx www vvv uuu", ts("2024-01-01 14:00:00")))
    q.processAllAvailable()
    input.addData(Doc(9, "qqq ppp ooo nnn mmm lll", ts("2024-01-01 14:01:00")))
    q.processAllAvailable()
    input.addData(Doc(4, text, ts("2024-01-01 14:02:00")))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("lsh_ttl_out")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "in-horizon duplicate must pair")
    assert(!pairs.exists(_._2 == 4L),
      s"doc 4 must NOT pair with evicted state, got $pairs")
  }

  test("stream-stream interval join: purchase picks up views within lookback") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = intervalJoin(
      purchases.toDF(), views.toDF(), "user_id", "ts", "1 hour", "10 minutes")
      .select($"l_event_id", $"r_event_id")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append).start()
    views.addData(
      Event(10, ts("2024-01-01 09:30:00"), 1, "view", 1.0), // in window
      Event(11, ts("2024-01-01 08:00:00"), 1, "view", 1.0), // too old
      Event(12, ts("2024-01-01 09:45:00"), 2, "view", 1.0)) // other user
    purchases.addData(Event(20, ts("2024-01-01 10:00:00"), 1, "purchase", 5.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ssj_out").as[(Long, Long)].collect().toSet
    assert(out === Set((20L, 10L)))
  }

  test("stream-stream LEFT OUTER interval join: unmatched left emits nulls after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = intervalJoin(
      purchases.toDF(), views.toDF(), "user_id", "ts", "1 hour",
      "10 minutes", "left_outer")
      .select($"l_event_id", $"r_event_id")
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode(OutputMode.Append).start()
    views.addData(Event(10, ts("2024-01-01 09:30:00"), 1, "view", 1.0))
    purchases.addData(
      Event(20, ts("2024-01-01 10:00:00"), 1, "purchase", 5.0), // matched
      Event(21, ts("2024-01-01 10:00:00"), 3, "purchase", 7.0)) // no view
    q.processAllAvailable()
    // the unmatched row must NOT have emitted yet: a 09:00–10:00 view for
    // user 3 could still arrive until the watermark passes its window
    assert(spark.table("ssj_outer").as[(Long, Option[Long])].collect().toSet
      === Set((20L, Some(10L))))
    // advance BOTH watermarks well past 10:00 + lookback
    views.addData(Event(90, ts("2024-01-01 23:00:00"), 9, "view", 1.0))
    purchases.addData(Event(91, ts("2024-01-01 23:00:00"), 9, "purchase", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ssj_outer").as[(Long, Option[Long])].collect().toSet
    assert(out.contains((21L, None)),
      s"unmatched left must null-pad once provably partnerless: $out")
    assert(out.filter(_._1 == 20L) === Set((20L, Some(10L))))
  }

  test("foreachBatch sink: idempotent partitioned write from a stream") {
    val root = Files.createTempDirectory("graft-feb").toString
    val src = s"$root/in"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.writeString(java.nio.file.Paths.get(s"$src/a.json"),
      """{"id":1,"d":"2025-01-01"}""" + "\n" + """{"id":2,"d":"2025-01-02"}""")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, d STRING")
    val stream = spark.readStream.schema(schema).json(src)
    val q = sinkViaForeachBatch(stream, s"$root/ckpt") { (batch, _) =>
      batch.withColumnRenamed("d", "ymd")
        .write.mode("append").partitionBy("ymd").parquet(s"$root/out")
    }.start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$root/out")
    assert(out.count() === 2)
    assert(new java.io.File(s"$root/out/ymd=2025-01-01").exists)
  }

  test("text hygiene scoring is batch==stream identical (stateless ops)") {
    // the quality/repetition/lang-ID operators are pure row expressions, so
    // they must produce byte-identical results under Structured Streaming —
    // the property that lets one scoring codepath serve both the backfill
    // and the live ingest of a training-data pipeline
    val docsPath = graft.TestSpark.sfDir + "/documents.parquet"
    val schema = spark.read.parquet(docsPath).schema
    def score(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id",
        graft.operators.TextOps.qualityScore($"text").as("quality"),
        graft.operators.HygieneOps.repetitionRatio($"text", 2).as("rep2"),
        graft.operators.TextOps.langId($"text").as("lang"))
    val tmp = Files.createTempDirectory("graft-docs-stream")
    Files.copy(java.nio.file.Paths.get(docsPath), tmp.resolve("documents.parquet"))
    val q = score(spark.readStream.schema(schema).parquet(tmp.toString))
      .writeStream.format("memory").queryName("hygiene_stream")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("hygiene_stream")
      .as[(Long, Double, Double, String)].collect().toSet
    val batch = score(spark.read.parquet(docsPath))
      .as[(Long, Double, Double, String)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("context-window chunking is batch==stream identical (corpus assembly)") {
    // chunking is generate-only (posexplode over a stride sequence, no
    // aggregation or state), so the SAME operator serves the backfill
    // chunker and the live-ingest chunker of a RAG/pretraining pipeline
    val docsPath = graft.TestSpark.sfDir + "/documents.parquet"
    val schema = spark.read.parquet(docsPath).schema
    def chunk(df: org.apache.spark.sql.DataFrame) =
      graft.operators.PackingOps.chunkByTokens(df, "doc_id", "text", 32, 16)
    val tmp = Files.createTempDirectory("graft-chunk-stream")
    Files.copy(java.nio.file.Paths.get(docsPath), tmp.resolve("documents.parquet"))
    val q = chunk(spark.readStream.schema(schema).parquet(tmp.toString))
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("chunk_stream")
      .as[(Long, Int, String, Int)].collect().toSet
    val batch = chunk(spark.read.parquet(docsPath))
      .as[(Long, Int, String, Int)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("stream-static dim enrichment: broadcast join, stateless, == batch") {
    val docsPath = graft.TestSpark.sfDir + "/documents.parquet"
    val schema = spark.read.parquet(docsPath).schema
    val dim = Seq(("en", "English", true), ("de", "German", true),
      ("zh", "Chinese", false)).toDF("lang", "lang_name", "latin")
    def enrich(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamingOps.enrichWithDim(df, dim, Seq("lang"))
        .select($"doc_id", $"lang", $"lang_name", $"latin")
    val tmp = Files.createTempDirectory("graft-dim-stream")
    Files.copy(java.nio.file.Paths.get(docsPath), tmp.resolve("documents.parquet"))
    val q = enrich(spark.readStream.schema(schema).parquet(tmp.toString))
      .writeStream.format("memory").queryName("dim_stream")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("dim_stream")
      .as[(Long, String, Option[String], Option[Boolean])].collect().toSet
    val batch = enrich(spark.read.parquet(docsPath))
      .as[(Long, String, Option[String], Option[Boolean])].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
    // left join: unmatched langs pass through null-padded, none dropped
    assert(streamed.exists(_._3.isEmpty))
    assert(streamed.size === spark.read.parquet(docsPath).count())
  }

  test("AvailableNow file source processes new files only (S15/S17 story)") {
    val root = Files.createTempDirectory("graft-stream").toString
    val src = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING")
    Files.writeString(java.nio.file.Paths.get(s"$src/a.json"),
      """{"id":1,"v":"x"}""" + "\n" + """{"id":2,"v":"y"}""")
    StreamingOps.processAvailableFiles(spark, src, schema, ckpt, out)
    assert(spark.read.parquet(out).count() === 2)
    // second run with one extra file: only the new file is processed
    Files.writeString(java.nio.file.Paths.get(s"$src/b.json"), """{"id":3,"v":"z"}""")
    StreamingOps.processAvailableFiles(spark, src, schema, ckpt, out)
    val rows = spark.read.parquet(out)
    assert(rows.count() === 3) // not 5: a.json was not reprocessed
  }
}
