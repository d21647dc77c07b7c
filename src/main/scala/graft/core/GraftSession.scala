package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Scale posture (SURVEY.md §4): AQE on (runtime coalesce + skew-join
  * handling), dynamic partition overwrite (idempotent per-partition
  * backfill — the reference's `replace=True` semantics,
  * dags/common/s3_utils.py:7-14), UTC session timezone (oracle parity).
  * `shuffle.partitions` defaults to the local core count; on a real
  * cluster this is overridden to ~2-3× total executor cores and AQE
  * coalesces down.
  */
object GraftSession {
  def builder(master: String = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"),
              shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // zstd beats snappy ~30% at-rest at comparable scan speed — at
      // 100 TB that is tens of TB of storage and proportional scan IO;
      // decode cost is amortized inside the columnar reader
      .config("spark.sql.parquet.compression.codec", "zstd")
      // selective-join runtime bloom prefilter (the engine-level twin of
      // DedupOps.bloomDeltaNew) — plan-asserted in PlanQualitySpec
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
