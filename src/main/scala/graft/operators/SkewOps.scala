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

  /** Measured key-skew summary — the compact driver-side fact
    * [[chooseJoinPlan]] decides from. `skewRatio` = max group size over
    * the median group size: the factor by which the hottest key's
    * reducer outworks the typical one. */
  final case class SkewProfile(nKeys: Long, nRows: Long, p50Sz: Long,
                               maxSz: Long) {
    def skewRatio: Double =
      if (p50Sz <= 0L) 0.0 else maxSz.toDouble / p50Sz
  }

  /** One-pass skew measurement for a join/agg key: per-key sizes, then
    * (count, sum, approx-median, max) in a single 1-row aggregate the
    * driver reads. The approx median is a PLANNING statistic (same
    * posture as the reference's pre-flight row counts), not an oracle
    * value — the oracle-grade exact profile lives in the
    * `profile_key_skew` registry query. */
  def profileKey(df: DataFrame, key: String): SkewProfile = {
    val r = df.groupBy(col(key)).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_keys"), sum(col("sz")).as("n_rows"),
        expr("approx_percentile(sz, 0.5)").as("p50_sz"),
        max(col("sz")).as("max_sz"))
      .head()
    // empty input: the 1-row aggregate yields NULL sum/percentile/max —
    // return the zero profile instead of NPEing on getLong
    if (r.isNullAt(1)) SkewProfile(0L, 0L, 0L, 0L)
    else SkewProfile(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Profile-driven equi-join plan choice — closes the loop between the
    * skew profiler and the salted plans: measured `skewRatio` at or above
    * `skewRatioThreshold` selects [[saltedJoin]] (hot-key rows spread
    * over `buckets` reducers at buckets× small-side replication),
    * anything below keeps the plain shuffle join (salting costs
    * replication and buys nothing on uniform keys). Returns the chosen
    * plan label with the plan so pipelines can log the decision.
    *
    * Default threshold 32: below it, AQE's runtime skew-join split
    * (factor-5-over-median trigger, no replication cost) is the right
    * tool; an explicit pre-planned salt only pays once one key outweighs
    * the median by well over an order of magnitude — the regime where
    * one reducer would otherwise run ~skewRatio× longer than the stage
    * median regardless of partition count. */
  def chooseJoinPlan(big: DataFrame, small: DataFrame, key: String,
                     profile: SkewProfile,
                     skewRatioThreshold: Double = 32.0,
                     buckets: Int = 8): (String, DataFrame) =
    if (profile.skewRatio >= skewRatioThreshold)
      ("salted", saltedJoin(big, small, key, buckets))
    else
      ("plain", big.join(small, Seq(key)))
}
