package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Deterministic sampling / splitting / mixture operators for
  * training-data pipelines.
  *
  * Everything here is hash-based, NOT `rand()`-based: the keep/split
  * decision for a row is a pure function of its key (md5-prefix hash32,
  * the engine's portable hash), so samples are reproducible across runs,
  * engines, partitionings, and retries — the property a 100 TB pipeline
  * needs for resumable sampling and for an oracle to verify the exact
  * row set. All ops are scan-local column expressions (no shuffle).
  */
object SamplingOps {

  /** Stable bucket in [0, buckets) from a row key. `salt` decorrelates
    * independent decisions taken on the same key (e.g. sampling vs
    * splitting — without it, a 50%-sampled stratum could never reach the
    * test split because both decisions would read the same bucket). */
  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column =
    pmod(TextOps.hash32(concat(key.cast("string"), lit(salt))), lit(buckets))

  /** Keep a deterministic ~`permille`/1000 fraction of rows by key. */
  def deterministicSample(df: DataFrame, keyCol: String, permille: Int): DataFrame =
    df.filter(hashBucket(col(keyCol), 1000) < permille)

  /** Per-stratum deterministic sampling — the "data mixing" op: each
    * stratum keeps its own fraction (permille), e.g. keep all English,
    * half German, 10% of everything else. One scan, no shuffle. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       permilleByStratum: Map[String, Int],
                       defaultPermille: Int): DataFrame = {
    val threshold = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, pm)) =>
        when(col(strataCol) === stratum, lit(pm)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 1000) < threshold)
  }

  /** Deterministic train/val/test assignment by key hash: buckets
    * [0,train) → train, [train,train+val) → val, rest → test (of 1000). */
  def trainValTestSplit(df: DataFrame, keyCol: String,
                        trainPermille: Int = 800, valPermille: Int = 100)
      : DataFrame =
    df.withColumn("split", {
      val b = hashBucket(col(keyCol), 1000, ":split")
      when(b < trainPermille, "train")
        .when(b < trainPermille + valPermille, "val")
        .otherwise("test")
    })

  /** Integer upsampling per stratum (mixture epochs): each row of stratum
    * s appears `repeatsByStratum(s)` times (default 1), tagged with its
    * copy index. `explode(sequence(...))` — scan-local row replication,
    * the deterministic form of oversampling a high-quality source. */
  def upsample(df: DataFrame, strataCol: String,
               repeatsByStratum: Map[String, Int]): DataFrame = {
    val repeats = repeatsByStratum.foldLeft(lit(1)) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    // guard: sequence(1, 0) is the DESCENDING array [1, 0] in Spark, so an
    // unguarded repeat count of 0 would DOUBLE a stratum instead of
    // dropping it; null-out non-positive repeats — explode skips nulls, so
    // repeats ≤ 0 means "excluded from the mix"
    df.withColumn("copy",
      explode(when(repeats >= 1, sequence(lit(1), repeats))))
  }
}
