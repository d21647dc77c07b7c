package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** [EXT] Deduplication operator library (SURVEY §2E): exact, n-gram
  * Jaccard, MinHash+LSH, SimHash — over `documents`.
  *
  * Scale posture: nothing here compares all pairs. Candidate generation is
  * always an inverted-index / LSH-bucket equi-join (shuffle on the bucket
  * key), so cost is Σ bucket² not N² — the standard way these survive
  * 100 TB. Verification (true Jaccard / hamming) runs only on candidate
  * pairs. All hashing is the portable md5-prefix hash32 (TextOps.hash32),
  * so DuckDB oracles reproduce values exactly.
  */
object DedupOps {

  /** Exact dedup by fingerprint: one survivor (min tiebreakCol) per key,
    * plus the group size. A single hash-shuffle groupBy with map-side
    * partial aggregation. */
  def exactDedupSummary(df: DataFrame, fingerprint: Column, idCol: String)
      : DataFrame =
    df.groupBy(fingerprint.as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup keeping the first row per key set — `row_number` over a
    * key-partitioned window; shuffles once on the keys. */
  def keepFirst(df: DataFrame, keys: Seq[String], tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tiebreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Candidate pairs via inverted index: explode each doc's distinct
    * shingles, self-equi-join on the shingle, keep each (a<b) pair once.
    * This is the exact (non-approximate) candidate generator: any pair
    * with Jaccard > 0 shares ≥1 shingle, so no true near-dup is missed. */
  def invertedIndexPairs(docs: DataFrame, idCol: String, setCol: String)
      : DataFrame = {
    val posting = docs.select(col(idCol).as("id"),
      explode(array_distinct(col(setCol))).as("token"))
    posting.as("l").join(posting.as("r"),
        col("l.token") === col("r.token") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Verified Jaccard over candidate pairs: join back both shingle sets,
    * compute |A∩B| / |A∪B|, keep pairs ≥ threshold. */
  def jaccardPairs(docs: DataFrame, idCol: String, setCol: String,
                   threshold: Double): DataFrame = {
    val sets = docs.select(col(idCol).as("id"),
      array_distinct(col(setCol)).as("s"))
    invertedIndexPairs(docs, idCol, setCol)
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("s", "s_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("s", "s_b"), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("s_a"), col("s_b"))).cast("double") /
          size(array_union(col("s_a"), col("s_b"))), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: k permutation-min values over the shingle set.
    * Permutation i is `(a_i·hash32(s) + b_i) mod p` with p prime > 2^32;
    * coefficients derive deterministically from i so the oracle can
    * recompute them. Empty shingle sets get p (an impossible-max sentinel). */
  val minhashPrime: Long = 4294967311L
  def minhashCoeffs(k: Int): Seq[(Long, Long)] =
    (0 until k).map(i => (2L * i + 1, 17L * i + 3))

  def minhashSignature(shingleSet: Column, k: Int): Column =
    array(minhashCoeffs(k).map { case (a, b) =>
      coalesce(
        array_min(transform(shingleSet,
          s => (lit(a) * TextOps.hash32(s) + lit(b)) % minhashPrime)),
        lit(minhashPrime))
    }: _*)

  /** LSH banding: signature split into `bands` bands of `rowsPerBand`;
    * docs sharing any band bucket become candidates. Returns (id_a, id_b)
    * distinct pairs. Shuffles on (band, bucket-hash) — bucket sizes are
    * the skew knob; at scale add a salt on oversized buckets. */
  def lshCandidatePairs(docs: DataFrame, idCol: String, sigCol: String,
                        bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = docs.select(col(idCol).as("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand)))))
      .select(col("id"), col("pos").as("band"),
        concat_ws(",", col("col").cast("array<string>")).as("bucket"))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** 32-bit SimHash from a precomputed token-hash array (materialize
    * `transform(tokens, TextOps.hash32)` as a column first so each token
    * is md5'd once, not once per bit): bit j of the result is set iff the
    * frequency-weighted sum of (2·bit_j(hash) − 1) is positive. Pure
    * per-row HOF fold — no shuffle at all. Bit test is integer-only
    * (`h mod 2^(j+1) >= 2^j`) for exact oracle parity. */
  def simhash32FromHashes(hashes: Column): Column =
    aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, j) => {
      val pow = org.apache.spark.sql.functions.pow(lit(2.0), j).cast("long")
      val bitSum = aggregate(hashes, lit(0L),
        (s, h) => s + when(h % (pow * 2) >= pow, 1L).otherwise(-1L))
      acc + when(bitSum > 0, pow).otherwise(0L)
    })

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
