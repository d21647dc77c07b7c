package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators (SURVEY §2E scale notes; BASELINE "design for
  * 100 TB"). AQE's skew-join split handles most cases at runtime; these
  * are the explicit forms for when the skew is known and extreme (a
  * handful of hot keys holding a large share of a 100 TB fact table).
  */
object SkewOps {

  /** Salted two-phase aggregation: groupBy(keys + salt) partial, then
    * groupBy(keys) final — caps any single reducer's share of a hot key
    * at 1/`saltBuckets`. Only sum/count-decomposable aggregates survive
    * two phases; pass them pre-split (e.g. sum+count for avg). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__n")).as("n"))
  }

  /** Salted broadcast-side replication for a skewed equi-join: the big
    * (skewed) side gets a random salt in [0, buckets); the small side is
    * exploded `buckets`× so every salted key still finds its match. Use
    * when one side is small enough to replicate but too big or too
    * volatile to broadcast outright. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-N hot keys by frequency — the planning query used to decide
    * whether salting is worth it. */
  def hotKeys(df: DataFrame, key: Column, topN: Int): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
