package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the HISTORICAL fully-fixed RP-LSH parameterization (16 bits =
  * 4 bands × 4-bit buckets) on a bounded fixture, now that the deployed
  * `sim_lsh_rp` query sizes its band width with the corpus
  * ([[VectorOps.lshBandWidth]]). Two contracts:
  *
  *   1. the fixed 16/4×4 banding SEMANTICS — candidates are exactly the
  *      pairs sharing ≥ 1 band bucket of the packed signature, verified
  *      pairs exactly the candidates at cosine ≥ 0.4 — checked against
  *      an independent driver-side recomputation on the bounded corpus
  *      (sf0.001 embeddings, well under the quadratic regime);
  *
  *   2. the re-parameterization's bench-SF IDENTITY: lshBandWidth floors
  *      at 4 bits for every N ≤ 320·2⁴, so the SF-aware query and the
  *      historical fixed one are the same plan at bench scale — the
  *      sizing law only engages where the fixed form went quadratic
  *      (measured ~61× at 10× bench SF before the change). */
class RpLshFixedWidthSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs: Array[(Long, Array[Double])] = {
    val e = spark.read
      .parquet(s"${graft.TestSpark.sfDir}/embeddings.parquet")
      .select($"vec_id".cast("long"),
        VectorOps.toDouble($"embedding").as("v"))
    e.as[(Long, Array[Double])].collect().sortBy(_._1)
  }

  /** Driver-side recomputation of the deterministic pseudo-hyperplane
    * signature — same integer hash as [[VectorOps.planeWeight]]. */
  private def signature(v: Array[Double], bits: Int): Long =
    (0 until bits).map { i =>
      val dot = v.indices.foldLeft(0.0)((acc, j) =>
        acc + v(j) * (((i * 31 + j * 17) % 13) - 6))
      if (dot > 0) 1L << i else 0L
    }.sum

  test("fixed 16-bit / 4-band banding semantics: engine candidates == " +
       "independent recomputation; verified pairs == candidates at " +
       "cosine >= 0.4") {
    val e = spark.createDataset(vecs.toSeq).toDF("vec_id", "v")
    val signed = e.withColumn("sig", VectorOps.rpSignature($"v", 16))
    // engine leg: explode 4x4-bit bands, self-join on (band, bucket)
    val banded = signed.select($"vec_id",
      posexplode(array((0 until 4).map(b =>
        pmod(shiftright($"sig", 4 * b), lit(16L))): _*)))
      .select($"vec_id", $"pos".as("band"), $"col".as("bucket"))
    val engineCands = banded.as("l").join(banded.as("r"),
        $"l.band" === $"r.band" && $"l.bucket" === $"r.bucket" &&
          $"l.vec_id" < $"r.vec_id")
      .select($"l.vec_id", $"r.vec_id").distinct()
      .as[(Long, Long)].collect().toSet
    // independent recomputation, driver-side over the bounded corpus
    val sigs = vecs.map { case (id, v) => id -> signature(v, 16) }
    val expCands = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if (0 until 4).exists(b => ((sa >> (4 * b)) & 15L) == ((sb >> (4 * b)) & 15L))
    } yield (ia, ib)).toSet
    assert(engineCands === expCands)
    assert(engineCands.nonEmpty, "bounded fixture produced no candidates")
    // packed signatures agree bit-for-bit with the recomputation
    val engineSigs = signed.select($"vec_id", $"sig")
      .as[(Long, Long)].collect().toMap
    for ((id, s) <- sigs) assert(engineSigs(id) === s, s"sig mismatch at $id")
    // verification: exactly the candidates at rounded cosine >= 0.4
    val byId = vecs.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x * x))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x * x))
      math.floor(dot / (na * nb) * 1e6 + 0.5) / 1e6
    }
    val expVerified = expCands.filter { case (a, b) => cos(byId(a), byId(b)) >= 0.4 }
    val eNrm = e.withColumn("nrm", VectorOps.norm($"v"))
    val engineVerified = spark.createDataset(engineCands.toSeq)
      .toDF("id_a", "id_b")
      .join(eNrm.select($"vec_id".as("id_a"), $"v".as("v_a"), $"nrm".as("n_a")), "id_a")
      .join(eNrm.select($"vec_id".as("id_b"), $"v".as("v_b"), $"nrm".as("n_b")), "id_b")
      .select($"id_a", $"id_b", (floor((
        VectorOps.cosinePrenormed($"v_a", $"v_b", $"n_a", $"n_b")) * 1e6 + 0.5) / 1e6).as("cos"))
      .filter($"cos" >= 0.4).select($"id_a", $"id_b")
      .as[(Long, Long)].collect().toSet
    assert(engineVerified === expVerified)
  }

  test("lshBandWidth: floors at 4 bits through every bench SF (bit-" +
       "identical to the historical fixed form), grows one bit per " +
       "doubling past N = 5120, caps at 15") {
    // bench SFs: 500 (sf0.001/sf0.01), 2000 (sf0.1) -> historical width
    for (n <- Seq(1L, 320L, 500L, 2000L, 5120L))
      assert(VectorOps.lshBandWidth(n) === 4, s"width moved at N=$n")
    // the linear-cost law engages past the floor
    assert(VectorOps.lshBandWidth(5121) === 5)
    assert(VectorOps.lshBandWidth(20000) === 6)   // sf1
    assert(VectorOps.lshBandWidth(60000) === 8)   // sf3
    assert(VectorOps.lshBandWidth(Long.MaxValue) === 15) // 4*15 <= 63
    intercept[IllegalArgumentException](VectorOps.lshBandWidth(0))
  }
}
