package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TopKAggregator
import graft.operators.{MultimodalOps, VectorOps}

/** [EXT] queries exercising the custom typed aggregate and the multimodal
  * column plumbing. */
object ExtQueries {

  /** Top-k via the bounded-heap Aggregator — identical results to
    * sim_topk_bruteforce (same oracle), but planned as a hash aggregate
    * with map-side partial top-k instead of a window sort: the shuffle
    * carries ≤ k rows per (partition × query) instead of every candidate. */
  private val topkAgg = Q(
    "sim_topk_aggregator",
    (s, dir) => {
      import s.implicits._
      val e = Tables(s, dir).embeddings
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), VectorOps.toDouble($"embedding").as("qv"))
        .withColumn("qn", VectorOps.norm($"qv"))
      val c = e.select($"vec_id".as("neighbor_id"), VectorOps.toDouble($"embedding").as("cv"))
        .withColumn("cn", VectorOps.norm($"cv"))
      val topk = udaf(new TopKAggregator(10))
      c.crossJoin(broadcast(q))
        .filter($"query_id" =!= $"neighbor_id")
        .select($"query_id",
          round(VectorOps.cosinePrenormed($"qv", $"cv", $"qn", $"cn"), 6).as("cos"),
          $"neighbor_id")
        .groupBy($"query_id")
        .agg(topk($"cos", $"neighbor_id").as("top"))
        .select($"query_id", posexplode($"top"))
        .select($"query_id", ($"pos" + 1).as("rank"),
          $"col._2".as("neighbor_id"), $"col._1".as("cos"))
        .orderBy($"query_id", $"rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
            |scored AS (
            |  SELECT q.vec_id query_id, c.vec_id neighbor_id,
            |         round(list_dot_product(q.v,c.v)/(sqrt(list_dot_product(q.v,q.v))*sqrt(list_dot_product(c.v,c.v))), 6) cos
            |  FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id)
            |SELECT query_id, rank, neighbor_id, cos FROM (
            |  SELECT *, (row_number() OVER
            |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id))::INT rank
            |  FROM scored)
            |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin))

  /** Multimodal plumbing: build the binary media struct from documents,
    * extract features through the per-partition decode kernel, aggregate.
    * Oracle recomputes payload stats straight off the text bytes. */
  private val multimodal = Q(
    "multimodal_features",
    (s, dir) => {
      import s.implicits._
      val media = MultimodalOps.fakeMediaFromDocuments(Tables(s, dir).documents)
      MultimodalOps.extractFeatures(media)
        .toDF()
        .select($"doc_id", $"mime", $"n_bytes",
          round($"byte_mean", 4).as("byte_mean"))
        .orderBy($"doc_id")
    },
    // documents.text is pure ASCII (verified: octet_length == length for
    // every row), so byte values == character codes and the oracle can use
    // ascii() per char instead of blob byte access.
    Some("""SELECT doc_id,
           |  'application/x-fake-' || regexp_extract(source, '([0-9]+)$', 1) AS mime,
           |  octet_length(text::BLOB)::INT AS n_bytes,
           |  round(list_sum([ascii(text[i]) FOR i IN generate_series(1, length(text))])::DOUBLE
           |        / length(text), 4) AS byte_mean
           |FROM documents
           |ORDER BY doc_id""".stripMargin))

  /** Frame-sampling plumbing oracle: every 2nd 256-byte block of the
    * payload becomes a "frame" (MultimodalOps.sampleFrames); per doc the
    * frame count and total sampled bytes are recomputed by the oracle
    * from the text length (payload = utf-8 text bytes, pure ASCII). */
  private val frames = Q(
    "multimodal_frame_sample",
    (s, dir) => {
      import s.implicits._
      val media = MultimodalOps.fakeMediaFromDocuments(Tables(s, dir).documents)
      val fr = MultimodalOps.sampleFrames($"media.payload", 2)
      media.select($"doc_id",
          size(fr).as("n_frames"),
          aggregate(fr, lit(0), (acc, f) => acc + octet_length(f))
            .as("frame_bytes"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
           |  ceil(ceil(length(text)/256.0)/2)::INT AS n_frames,
           |  coalesce(list_sum([least(256, length(text) - i*256)
           |            FOR i IN generate_series(0, ceil(length(text)/256.0)::INT - 1)
           |            IF i % 2 = 0]), 0)::INT AS frame_bytes
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Banded pHash near-dup over the fake media table
    * (MultimodalOps.phashCandidatePairs) — the image-dedup entry of the
    * multimodal plane. With the md5-stub hash, survivors at hamming ≤ 3
    * are exactly the identical-payload pairs; the PLUMBING (banding,
    * bucket join, hamming verify) is what a real pHash would ride
    * unchanged. The oracle rebuilds hash/bands/hamming from the text
    * bytes (payload == utf-8 text, pure ASCII). */
  private val phashDedup = Q(
    "multimodal_phash_neardup",
    (s, dir) => {
      import s.implicits._
      val media = MultimodalOps.fakeMediaFromDocuments(Tables(s, dir).documents)
      MultimodalOps.phashCandidatePairs(media, "doc_id", 3)
        .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), $"hamming")
        .orderBy($"doc_a", $"doc_b")
    },
    Some("""WITH h AS (
           |  SELECT doc_id, substr(md5(text), 1, 16) AS h FROM documents),
           |bands AS (
           |  SELECT doc_id, h, i AS band_idx, substr(h, 1 + 4*i, 4) AS band
           |  FROM h CROSS JOIN generate_series(0, 3) t(i)),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |         a.h AS ha, b.h AS hb
           |  FROM bands a JOIN bands b
           |    ON a.band_idx = b.band_idx AND a.band = b.band
           |   AND a.doc_id < b.doc_id),
           |ham AS (
           |  SELECT doc_a, doc_b,
           |         (bit_count(xor(('0x' || substr(ha, 1, 8))::BIGINT,
           |                        ('0x' || substr(hb, 1, 8))::BIGINT)) +
           |          bit_count(xor(('0x' || substr(ha, 9, 8))::BIGINT,
           |                        ('0x' || substr(hb, 9, 8))::BIGINT)))::INT
           |           AS hamming
           |  FROM cand)
           |SELECT doc_a, doc_b, hamming FROM ham
           |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin))

  def all: Seq[Q] = Seq(topkAgg, multimodal, frames, phashDedup)
}
