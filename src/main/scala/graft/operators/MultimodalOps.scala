package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Multimodal column conventions (SURVEY §2E): image/audio/video as
  * opaque `binary` payloads with a typed metadata struct, plus the
  * decode / feature-extract plumbing as per-partition batch processing.
  *
  * Column convention — a `media` struct:
  * {{{
  *   media: STRUCT<
  *     payload: BINARY,            -- opaque encoded bytes
  *     meta: STRUCT<mime: STRING, width: INT, height: INT,
  *                  duration_ms: BIGINT, codec: STRING>>
  * }}}
  *
  * Scale posture: payloads never pass through a shuffle unless the query
  * keys on them (group/join on doc_id, not on payload); decode runs
  * per-partition with bounded batch memory (`mapPartitions` over an
  * iterator — the Scala analog of `mapInPandas` batches), so executor
  * memory is O(batch), not O(partition).
  *
  * The actual image/audio codecs are NOT in this environment; the decode
  * kernel is an explicitly-marked deterministic stub (see `decodeStub`)
  * behind the same signature a real decoder would have — schema,
  * partitioning and batch shape are real and tested.
  */
object MultimodalOps {

  val metaType: StructType = StructType.fromDDL(
    "mime STRING, width INT, height INT, duration_ms BIGINT, codec STRING")

  val mediaType: StructType = new StructType()
    .add("payload", BinaryType)
    .add("meta", metaType)

  /** Wrap a binary column + metadata columns into the media struct. */
  def asMedia(payload: org.apache.spark.sql.Column,
              mime: org.apache.spark.sql.Column,
              width: org.apache.spark.sql.Column,
              height: org.apache.spark.sql.Column,
              durationMs: org.apache.spark.sql.Column,
              codec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      payload.as("payload"),
      struct(mime.as("mime"), width.as("width"), height.as("height"),
        durationMs.as("duration_ms"), codec.as("codec")).as("meta"))

  /** Extracted feature row produced by the decode kernel. */
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
                           byte_mean: Double, histogram16: Array[Long])

  /** Decode kernel STUB — deterministic byte statistics standing in for a
    * real image/audio decode (which would link an actual codec here).
    * Kernel signature and batching are production-shaped: an iterator of
    * (doc_id, payload, mime) batches in, an iterator of feature rows out.
    */
  def decodeStub(rows: Iterator[(Long, Array[Byte], String)]): Iterator[MediaFeatures] =
    rows.map { case (id, bytes, mime) =>
      // real decoder goes here (e.g. JPEG -> pixels); stubbed: byte stats
      val hist = new Array[Long](16)
      var sum = 0L
      bytes.foreach { b => val u = b & 0xff; hist(u / 16) += 1; sum += u }
      MediaFeatures(id, mime, bytes.length,
        if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, hist)
    }

  /** Distributed feature extraction over a media table: per-partition
    * iterator processing (bounded memory), no shuffle. `df` must have
    * (doc_id BIGINT, media STRUCT<payload, meta>). */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media.payload"), col("media.meta.mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(decodeStub)
  }

  /** Frame sampling STUB for video-ish payloads: every `stride`-th
    * 256-byte block becomes a "frame" (a real implementation would seek
    * keyframes). Pure column expression — no UDF. */
  def sampleFrames(payload: org.apache.spark.sql.Column, stride: Int)
      : org.apache.spark.sql.Column = {
    val nBlocks = ceil(octet_length(payload) / lit(256.0)).cast("int")
    // empty payload → zero frames (not one empty frame: sequence(0,0)
    // would still yield block index 0)
    when(octet_length(payload) === 0,
      array().cast("array<binary>")).otherwise(
      filter(
        transform(sequence(lit(0), greatest(nBlocks - 1, lit(0))),
          i => when(i % stride === 0, substring(payload, i * 256 + 1, lit(256)))),
        f => f.isNotNull))
  }

  /** Perceptual-hash STUB: 64 bits from the payload's md5 prefix. A real
    * pipeline computes pHash/dHash from decoded pixels (DCT of the
    * downscaled luma); the codec isn't in this environment, so the
    * deterministic stand-in hashes the encoded bytes — which preserves
    * the property the downstream plumbing exercises (identical payloads
    * collide, others are ~random), and is itself the exact-duplicate
    * image key real pipelines use before any decode. Returned as the hex
    * string (the cross-engine-portable form; band extraction and
    * hamming both slice it). */
  def phash(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(md5(payload), 1, 16)

  /** Banded near-dup candidate pairs over 64-bit perceptual hashes, the
    * image-dedup sibling of DedupOps.simhash: 4 bands of 16 bits — any
    * shared band makes a candidate (a pair within hamming distance 3
    * shares at least one intact band by pigeonhole), then the exact
    * 64-bit hamming distance verifies ≤ `maxHamming`.
    *
    * Scale posture: candidates come from a groupBy-shaped equi-join on
    * (band index, band value) — Σ bucket², never corpus²; hamming is a
    * scan-local expression over the two hex halves (conv → xor →
    * bit_count). Payloads themselves never shuffle — only (id, 16-char
    * hash) pairs do.
    *
    * `payloadCol` is the (possibly nested) binary payload column path;
    * the default matches the asMedia-shaped table this module produces —
    * callers with a different layout pass their own path. */
  def phashCandidatePairs(media: DataFrame, idCol: String,
                          maxHamming: Int,
                          payloadCol: String = "media.payload"): DataFrame = {
    val h = media.select(col(idCol).as("id"),
      phash(col(payloadCol)).as("h"))
    val bands = h.select(col("id"), col("h"),
        posexplode(array((0 to 3).map(i =>
          substring(col("h"), 1 + 4 * i, 4)): _*)))
      .select(col("id"), col("h"), col("pos").as("band_idx"),
        col("col").as("band"))
    def half(c: org.apache.spark.sql.Column, off: Int) =
      conv(substring(c, off, 8), 16, 10).cast("long")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.h").as("ha"), col("b.h").as("hb"))
      .distinct()
    cand
      .withColumn("hamming",
        (bit_count(half(col("ha"), 1).bitwiseXOR(half(col("hb"), 1))) +
          bit_count(half(col("ha"), 9).bitwiseXOR(half(col("hb"), 9))))
          .cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** A deterministic fake media table derived from `documents` — text
    * bytes play the payload role so fixtures need no binary files. */
  def fakeMediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      asMedia(
        to_binary(col("text"), lit("utf-8")),
        concat(lit("application/x-fake-"),
          regexp_extract(col("source"), "([0-9]+)$", 1)),
        length(col("text")).cast("int"),
        lit(1).cast("int"),
        (col("n_chars") * 10).cast("long"),
        lit("fake")).as("media"))
}
