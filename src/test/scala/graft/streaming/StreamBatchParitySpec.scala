package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Batch↔streaming parity: the same windowed aggregation over the real
  * `events` table must produce identical results whether run as a batch
  * plan or replayed through the Structured Streaming file source with
  * `Trigger.AvailableNow` — the property that makes batch-validated
  * plans safe to lift into the incremental path (SURVEY §2 streaming).
  */
class StreamBatchParitySpec extends SparkSpec {
  import spark.implicits._

  test("tumbling hourly counts: streaming replay == batch") {
    // the streaming file source requires a DIRECTORY: stage the single
    // driver-generated parquet file into one
    val stageDir = java.nio.file.Files.createTempDirectory("graft-parity")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(graft.TestSpark.sfDir + "/events.parquet"),
      stageDir.resolve("events.parquet"))
    // schema from the batch reader (nanos flag handled by Tables)
    val batchEvents = graft.core.Tables(spark, graft.TestSpark.sfDir).events
    val schema = spark.read.parquet(stageDir.toString).schema

    val streamed = graft.core.Tables.normalizeTs(spark.readStream
        .schema(schema)
        .parquet(stageDir.toString))
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .select($"window.start".as("ws"), $"event_type", $"n", $"sum_value")

    val qname = "parity_out"
    val q = streamed.writeStream.format("memory").queryName(qname)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val batch = batchEvents
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .select($"window.start".as("ws"), $"event_type", $"n", $"sum_value")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(date_format($"ws", "yyyy-MM-dd HH:mm").as("ws"),
          $"event_type", $"n", $"sum_value")
        .as[(String, String, Long, Double)].collect().sortBy(t => (t._1, t._2)).toSeq

    val streamedRows = canon(spark.table(qname))
    val batchRows = canon(batch)
    // Append mode only emits windows the watermark has CLOSED — the final
    // (max-ts) windows may be withheld; everything emitted must match the
    // batch result exactly, and coverage must be nearly total.
    val batchByKey = batchRows.map(t => (t._1, t._2) -> t).toMap
    streamedRows.foreach { t =>
      assert(batchByKey((t._1, t._2)) === t, s"mismatch at ${(t._1, t._2)}")
    }
    assert(streamedRows.size >= batchRows.size - 10,
      s"streaming emitted ${streamedRows.size} of ${batchRows.size} windows")
  }

  test("incremental corpus intake: per-batch bloom-delta dedup == batch keepFirst") {
    import graft.operators.DedupOps
    // continuous intake of a duplicate-bearing corpus: each micro-batch
    // dedups within itself (keep min id), bloom-delta filters against the
    // accumulated history, and appends — the streaming form of global
    // exact dedup. Replaying in id order must reproduce the batch
    // keep-first set exactly.
    val docs = graft.core.Tables(spark, graft.TestSpark.sfDir).documents
      .select($"doc_id", md5($"text").as("fp"))
    val expected = DedupOps.keepFirst(docs, Seq("fp"), "doc_id")
      .select($"doc_id").as[Long].collect().toSet

    val stageDir = java.nio.file.Files.createTempDirectory("graft-intake").toFile
    val t0 = System.currentTimeMillis() - 600000
    Seq($"doc_id" < 40L, $"doc_id" >= 40L && $"doc_id" < 80L,
        $"doc_id" >= 80L).zipWithIndex.foreach { case (pred, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-intake-c$i")
      docs.filter(pred).coalesce(1).write.parquet(tmp.resolve("p").toString)
      val part = tmp.resolve("p").toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(stageDir, s"chunk-$i.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(t0 + i * 10000L)
    }

    var history = docs.limit(0).localCheckpoint()
    val q = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageDir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val within = DedupOps.keepFirst(batch, Seq("fp"), "doc_id")
        val fresh = DedupOps.bloomDeltaNew(within, history, "fp",
          numBits = 1 << 12)
        history = history.unionByName(fresh).localCheckpoint()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    assert(history.select($"doc_id").as[Long].collect().toSet === expected)
  }

  test("scd2 history: incremental foreachBatch upserts == batch build") {
    import graft.operators.RelationalOps
    val log = graft.core.Tables(spark, graft.TestSpark.sfDir).events
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val expected = RelationalOps
      .scd2(log, "user_id", "ts", "event_id", Seq("event_type"))

    // stage the change log as 3 time-ordered chunk files: the CDC-log
    // contract (per-key nondecreasing order across batches) holds because
    // the chunks partition the timeline; mod-times 10 s apart make the
    // file source's oldest-first ordering deterministic, and
    // maxFilesPerTrigger=1 forces one micro-batch per chunk
    val stageDir = java.nio.file.Files.createTempDirectory("graft-scd2").toFile
    val t0 = System.currentTimeMillis() - 600000
    Seq($"ts" < "2024-01-11", $"ts" >= "2024-01-11" && $"ts" < "2024-01-21",
        $"ts" >= "2024-01-21").zipWithIndex.foreach { case (pred, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-scd2-c$i")
      log.filter(pred).coalesce(1).write.parquet(tmp.resolve("p").toString)
      val part = tmp.resolve("p").toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(stageDir, s"chunk-$i.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(t0 + i * 10000L)
    }

    var history = RelationalOps
      .scd2(log.limit(0), "user_id", "ts", "event_id", Seq("event_type"))
      .localCheckpoint()
    val q = spark.readStream
      .schema(log.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageDir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // eager checkpoint: the micro-batch frame is only valid inside the
        // callback, and each round's history must not re-derive the last
        history = RelationalOps.scd2UpsertBatch(history, batch,
          "user_id", "ts", "event_id", Seq("event_type")).localCheckpoint()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", unix_micros($"ts").as("f"),
          coalesce(unix_micros($"effective_to"), lit(-1L)).as("t"),
          $"event_type", $"is_current")
        .as[(Long, Long, Long, String, Boolean)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(canon(history) === canon(expected))
  }

  test("cdc current state maintained incrementally via foreachBatch == batch collapse") {
    import graft.operators.RelationalOps
    // the events_cdc_apply feed: signup=insert, error=delete, else update
    val feed = graft.core.Tables(spark, graft.TestSpark.sfDir).events
      .select($"user_id", $"ts", $"event_id", $"value",
        when($"event_type" === "signup", "I")
          .when($"event_type" === "error", "D")
          .otherwise("U").as("op"))
    val expected = RelationalOps.applyCdc(
      feed, "user_id", "ts", "event_id", "op")

    // same 3-chunk timeline staging as the scd2 test: chunks partition
    // the timeline so the per-key in-order contract holds across batches
    val stageDir = java.nio.file.Files.createTempDirectory("graft-cdc").toFile
    val t0 = System.currentTimeMillis() - 600000
    Seq($"ts" < "2024-01-11", $"ts" >= "2024-01-11" && $"ts" < "2024-01-21",
        $"ts" >= "2024-01-21").zipWithIndex.foreach { case (pred, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-cdc-c$i")
      feed.filter(pred).coalesce(1).write.parquet(tmp.resolve("p").toString)
      val part = tmp.resolve("p").toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(stageDir, s"chunk-$i.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(t0 + i * 10000L)
    }

    var state = RelationalOps.applyCdc(
        feed.limit(0), "user_id", "ts", "event_id", "op")
      .localCheckpoint()
    val q = spark.readStream
      .schema(feed.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageDir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = RelationalOps.cdcUpsertBatch(state, batch,
          "user_id", "ts", "event_id", "op").localCheckpoint()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", unix_micros($"ts").as("us"), $"event_id",
          $"op", round($"value", 2))
        .as[(Long, Long, Long, String, Double)]
        .collect().sortBy(_._1).toSeq
    assert(canon(state) === canon(expected))
    // a delete arriving in a later batch than the insert it tombstones
    // must actually remove the key: find one such user and prove absence
    val tombstoned = expected.select($"user_id").as[Long].collect().toSet
    val allKeys = feed.select($"user_id").distinct().as[Long].collect().toSet
    assert((allKeys -- tombstoned).nonEmpty,
      "fixture has no tombstoned user; parity check is vacuous")
    val stateKeys = state.select($"user_id").as[Long].collect().toSet
    assert((allKeys -- tombstoned).forall(!stateKeys.contains(_)))
  }

  test("OHLC bars maintained incrementally via foreachBatch == batch bars") {
    import graft.gold.GoldOps
    val log = graft.core.Tables(spark, graft.TestSpark.sfDir).events
      .select($"user_id", $"ts", $"event_id", $"value")
    // stage 3 time-ordered chunk files (mod-times make the file source's
    // oldest-first order deterministic; one micro-batch per file)
    val stageDir = java.nio.file.Files.createTempDirectory("graft-ohlc").toFile
    val t0 = System.currentTimeMillis() - 600000
    Seq($"ts" < "2024-01-11", $"ts" >= "2024-01-11" && $"ts" < "2024-01-21",
        $"ts" >= "2024-01-21").zipWithIndex.foreach { case (pred, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-ohlc-c$i")
      log.filter(pred).coalesce(1).write.parquet(tmp.resolve("p").toString)
      val part = tmp.resolve("p").toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(stageDir, s"chunk-$i.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(t0 + i * 10000L)
    }

    val monthly = date_format($"ts", "yyyyMM")
    var bars = GoldOps.ohlcPartials(log.limit(0), "user_id", "ts",
      "event_id", "value", monthly).localCheckpoint()
    val q = spark.readStream
      .schema(log.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageDir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        bars = GoldOps.ohlcMergePartials(bars,
          GoldOps.ohlcPartials(batch, "user_id", "ts", "event_id", "value",
            date_format(batch("ts"), "yyyyMM")), "user_id").localCheckpoint()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"bucket", round($"open", 6), round($"high", 6),
          round($"low", 6), round($"close", 6), $"n".cast("long"))
        .as[(Long, String, Double, Double, Double, Double, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    val expected = canon(GoldOps.ohlcResample(log, "user_id", "ts",
      "event_id", "value", monthly))
    assert(canon(GoldOps.ohlcFinish(bars, "user_id")) === expected)
  }

  test("funnel state machine: streaming flatMapGroupsWithState == batch chain") {
    val stageDir = java.nio.file.Files.createTempDirectory("graft-funnel")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(graft.TestSpark.sfDir + "/events.parquet"),
      stageDir.resolve("events.parquet"))
    val schema = spark.read.parquet(stageDir.toString).schema

    val streamed = graft.core.Tables.normalizeTs(spark.readStream
        .schema(schema)
        .parquet(stageDir.toString))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[StreamingOps.Event]
    val q = StreamingOps
      .funnelProgress(streamed, Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamedSteps = spark.table("funnel_out")
      .as[(Long, Int)].collect().toMap

    // batch truth: the events_funnel_steps chain, kept per-user
    val e = graft.core.Tables(spark, graft.TestSpark.sfDir).events
    val t1 = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val t2 = e.join(t1, "user_id")
      .filter($"event_type" === "click" && $"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val t3 = e.join(t2, "user_id")
      .filter($"event_type" === "purchase" && $"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    val batchSteps = t1.join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select($"user_id",
        ($"t1".isNotNull.cast("int") + $"t2".isNotNull.cast("int") +
          $"t3".isNotNull.cast("int")).as("step"))
      .as[(Long, Int)].collect().toMap

    // every user with a step-1 event must agree exactly; users with no
    // 'view' at all emit step 0 in streaming and are absent from batch t1
    batchSteps.foreach { case (u, s) =>
      assert(streamedSteps(u) === s, s"user $u: batch $s vs ${streamedSteps(u)}")
    }
    streamedSteps.filterNot(kv => batchSteps.contains(kv._1))
      .foreach { case (u, s) => assert(s === 0, s"user $u should be step 0") }
  }
}
