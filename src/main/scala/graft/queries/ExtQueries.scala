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
          (floor((VectorOps.cosinePrenormed($"qv", $"cv", $"qn", $"cn")) * 1e6 + 0.5) / 1e6).as("cos"),
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
            |         (floor((list_dot_product(q.v,c.v)/(sqrt(list_dot_product(q.v,q.v))*sqrt(list_dot_product(c.v,c.v)))) * 1e6 + 0.5) / 1e6) cos
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
          (floor(($"byte_mean") * 1e4 + 0.5) / 1e4).as("byte_mean"))
        .orderBy($"doc_id")
    },
    // documents.text is pure ASCII (verified: octet_length == length for
    // every row), so byte values == character codes and the oracle can use
    // ascii() per char instead of blob byte access.
    Some("""SELECT doc_id,
           |  'application/x-fake-' || regexp_extract(source, '([0-9]+)$', 1) AS mime,
           |  octet_length(text::BLOB)::INT AS n_bytes,
           |  (floor((list_sum([ascii(text[i]) FOR i IN generate_series(1, length(text))])::DOUBLE
           |        / length(text)) * 1e4 + 0.5) / 1e4) AS byte_mean
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

  /** Banded PERCEPTUAL near-dup over the raw-luma media table: the real
    * dHash (MultimodalOps.dhash — 9×8 block-mean downscale + horizontal
    * gradient bits, integer arithmetic throughout) rides the same
    * banding/bucket-join/hamming-verify plumbing the md5 exact key uses.
    * Survivors at hamming ≤ 3 include genuinely near-identical (NOT
    * byte-identical) frames — near-dup texts yield near-dup luma images —
    * and 4 bands × 16 bits makes the banded result EXACTLY the
    * brute-force hamming ≤ 3 set (pigeonhole: ≤3 flipped bits leave ≥1
    * band intact). The oracle replays the full pixel→grid→bits→hex→
    * band→hamming chain from the text bytes (payload == cycled utf-8
    * text, pure ASCII, 24×16). */
  private val phashDedup = Q(
    "multimodal_phash_neardup",
    (s, dir) => {
      import s.implicits._
      val media = MultimodalOps.lumaMediaFromDocuments(Tables(s, dir).documents)
      MultimodalOps.dhashCandidatePairs(media, "doc_id", 3)
        .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), $"hamming")
        .orderBy($"doc_a", $"doc_b")
    },
    Some("""WITH px AS (SELECT doc_id,
           |    [CASE WHEN length(text)=0 THEN 32
           |          ELSE ascii(text[(i % length(text)) + 1]) END
           |     FOR i IN generate_series(0, 383)] px
           |  FROM documents),
           |cg AS (SELECT doc_id, px, r, c, (c*24)//9 c0,
           |              ((c+1)*24)//9 - (c*24)//9 cw
           |       FROM px, generate_series(0,7) tr(r), generate_series(0,8) tc(c)),
           |cells AS (SELECT doc_id, r, c,
           |    list_sum([px[(2*r + i // cw)*24 + c0 + (i % cw) + 1]
           |              FOR i IN generate_series(0, 2*cw - 1)]) s,
           |    2*cw n
           |  FROM cg),
           |gb AS (SELECT a.doc_id, a.r*8 + a.c idx,
           |    CASE WHEN a.s * b.n > b.s * a.n THEN 1 ELSE 0 END bv
           |  FROM cells a JOIN cells b
           |    ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
           |  WHERE a.c < 8),
           |nib AS (SELECT doc_id, idx // 4 p,
           |    sum(bv * (CASE idx % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
           |              WHEN 2 THEN 2 ELSE 1 END)) v
           |  FROM gb GROUP BY 1, 2),
           |h AS (SELECT doc_id,
           |        string_agg(substr('0123456789abcdef', v::INT + 1, 1),
           |                   '' ORDER BY p) h
           |      FROM nib GROUP BY doc_id),
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

  /** The md5 EXACT-duplicate media key (the pre-decode gate real
    * pipelines run before any perceptual work): byte-identical payload
    * groups with the kept representative. */
  private val exactKey = Q(
    "multimodal_exact_key",
    (s, dir) => {
      import s.implicits._
      val media = MultimodalOps.fakeMediaFromDocuments(Tables(s, dir).documents)
      MultimodalOps.exactKeyGroups(media, "doc_id").orderBy($"k")
    },
    Some("""SELECT k, n, keep_id FROM (
           |  SELECT substr(md5(text), 1, 16) k, count(*) n, min(doc_id) keep_id
           |  FROM documents GROUP BY 1)
           |WHERE n > 1 ORDER BY k""".stripMargin))

  def all: Seq[Q] = Seq(topkAgg, multimodal, frames, phashDedup, exactKey)
}
