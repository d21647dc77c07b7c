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

  /** Cap each stratum (web-corpus "domain") at `k` rows, chosen
    * deterministically: the k rows with the SMALLEST salted portable hash
    * of their key win, so the survivor set is a pure function of the data
    * — reproducible across runs, engines, and partitionings, and
    * verifiable by an oracle (unlike `ORDER BY rand() LIMIT k`).
    *
    * Scale posture: a `row_number` window would sort-shuffle every row of
    * every domain; the bounded-heap TopKAggregator partial-aggregates
    * map-side, so each partition contributes ≤k (hash, key) pairs per
    * domain it touches and the exchange carries O(partitions × k) rows per
    * domain instead of the domain's full row count — a hot domain with
    * 100M rows shuffles ≤ 32k pairs, not 100M rows. Winners then rejoin
    * the input on the key (AQE picks broadcast when domains × k is small).
    * Contract: keys are non-null (a null key cannot win the rejoin) and
    * INTEGRAL — the bounded heap carries the key in a long slot, and a
    * non-numeric key would cast to NULL and silently drop its whole
    * stratum, so the type is asserted here. String keys must be mapped to
    * a unique id first (hashing is not enough: a collision in the long
    * slot would rejoin foreign rows). */
  def capPerStratum(df: DataFrame, strataCol: String, keyCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val kt = df.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(kt),
      s"capPerStratum key '$keyCol' must be integral (got $kt): " +
        "non-numeric keys cast to NULL in the long heap slot and the " +
        "stratum would be silently dropped")
    val topk = udaf(new graft.functions.TopKAggregator(k))
    // k smallest hashes == k largest negated hashes; hash tie → smaller key
    val winners = df
      .select(col(strataCol), col(keyCol).cast("long").as(keyCol),
        (-TextOps.hash32(concat(col(keyCol).cast("string"), lit(":cap"))))
          .cast("double").as("__score"))
      .groupBy(col(strataCol))
      .agg(topk(col("__score"), col(keyCol)).as("__top"))
      .select(col(strataCol), explode(col("__top._2")).as(keyCol))
    df.join(winners, Seq(strataCol, keyCol))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006),
    * deterministic: each row draws its "uniform" u ∈ (0,1] from the salted
    * portable hash of its key and the k rows with the largest
    * `u^(1/weight)` win — equivalently `ln(u)/weight`, which avoids the
    * pow. Inclusion probability is proportional to weight, the selection
    * is a pure function of the keys (reproducible, oracle-checkable), and
    * the plan is scan-local scoring + one bounded TakeOrdered(k) — no
    * shuffle of the full table, no rand().
    *
    * The sort key is pre-rounded to 12dp via the deterministic floor form
    * `floor(x·1e12 + 0.5)/1e12` so the ordering is stable across engines'
    * `ln` implementations (sub-ulp differences). NOTE the sort key is
    * NEGATIVE (ln(u) ≤ 0): the floor form rounds half-cases toward +∞,
    * so a −…5 tie lands one 1e-12 step HIGHER than `round()`'s HALF_UP
    * would — deliberate, identical on both engines. Contract: keys
    * non-null, weights strictly positive (ln(u) ≤ 0 flips order under a
    * negative weight). */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val u = (TextOps.hash32(concat(col(keyCol).cast("string"), lit(":ws")))
      + 1.0) / 4294967296.0
    df.withColumn("__wkey", (floor((log(u) / col(weightCol)) * 1e12 + 0.5) / 1e12))
      .orderBy(col("__wkey").desc, col(keyCol))
      .limit(k)
      .drop("__wkey")
  }

  /** Temperature-scaled domain mixing weights (the multilingual/domain
    * rebalancing rule of mBERT/XLM-R and the Pile: sample domain i with
    * probability ∝ p_i^α for α ∈ (0,1], α = 1/T). α < 1 flattens the
    * mixture — rare domains are upsampled relative to their raw share —
    * while preserving the head's ordering. Returns per domain
    * (domain, n_docs, p_raw, w_temp): `p_raw` the raw corpus share,
    * `w_temp = n_i^α / Σ_j n_j^α` the temperature-scaled target share
    * (algebraically identical to p_i^α/Σp_j^α — the N^α cancels — but
    * computed on integer counts so both engines see the same inputs).
    *
    * Plan: one map-side-combined hash aggregate over the corpus, then a
    * broadcast cross-join of the one-row totals onto the (tiny) domain
    * table — no driver collect, no second scan. The Σ n^α total is
    * pre-rounded to 6dp before dividing (the repo's prerounded-moments
    * convention) so partition-order ulp drift in the double sum can't
    * flip the 6dp-rounded output. */
  def temperatureWeights(df: DataFrame, domainCol: String,
                         alpha: Double): DataFrame = {
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"))
    val totals = counts.agg(
      sum(col("n_docs")).cast("double").as("tot"),
      (floor((sum(pow(col("n_docs").cast("double"), alpha))) * 1e6 + 0.5) / 1e6).as("pa"))
    counts.crossJoin(broadcast(totals))
      .select(col(domainCol), col("n_docs"),
        (floor((col("n_docs") / col("tot")) * 1e6 + 0.5) / 1e6).as("p_raw"),
        (floor((pow(col("n_docs").cast("double"), alpha) / col("pa")) * 1e6 + 0.5) / 1e6)
          .as("w_temp"))
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): reduce each document to hashed unigram
    * buckets, fit add-one-smoothed bucket distributions over the TARGET
    * slice (rows matching `targetPred`) and over the RAW corpus, and
    * weight each document by its summed log-likelihood ratio
    * Σ_tokens (ln p_target(bucket) − ln p_raw(bucket)). Documents that
    * look like the target get high weight; resampling by this weight
    * shifts the corpus mixture toward the target domain without a
    * trained classifier. Returns (id, n_tokens, log_w).
    *
    * Scale posture: one token scan feeds both the distribution fit and
    * the scoring join (lineage-cut, materialized once); the fitted
    * distributions are `buckets` rows — broadcast — and the totals are a
    * one-row aggregate broadcast-cross-joined (no driver count). The only
    * shuffles are the bucket-count hash aggregate and the final per-doc
    * sum. Hashing uses the portable md5-prefix hash32, so the weights are
    * reproducible across engines and an oracle can verify the exact
    * resampled row set. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column, buckets: Int = 64): DataFrame = {
    import graft.core.Lineage.LineageOps
    val toks = docs
      .select(col(idCol).as("id"), targetPred.as("is_target"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .withColumn("b", pmod(TextOps.hash32(col("token")), lit(buckets)))
      .select(col("id"), col("is_target"), col("b"))
      .cut(eager = false)
    val stats = toks.groupBy(col("b"))
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("c_tgt"))
    val totals = stats.agg(sum(col("c_raw")).as("t_raw"),
      sum(col("c_tgt")).as("t_tgt"))
    val probs = stats.crossJoin(broadcast(totals))
      .select(col("b"),
        ((col("c_tgt") + 1.0) / (col("t_tgt") + buckets)).as("p_tgt"),
        ((col("c_raw") + 1.0) / (col("t_raw") + buckets)).as("p_raw"))
    toks.join(broadcast(probs), "b")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(log(col("p_tgt")) - log(col("p_raw"))).as("log_w"))
  }
}
