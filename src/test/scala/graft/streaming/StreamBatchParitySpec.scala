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

    val streamed = spark.readStream
      .schema(schema)
      .parquet(stageDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
}
