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

  /** Exact-duplicate media key: 64 bits from the payload's md5 prefix —
    * the pre-decode key real pipelines use to drop byte-identical copies
    * before any decode work. NOT perceptual (see [[dhash]] for that):
    * identical payloads collide, everything else is ~random. Returned as
    * a 16-char hex string (the cross-engine-portable form; band
    * extraction and hamming both slice it). */
  def phash(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(md5(payload), 1, 16)

  /** Let-binding for column expressions: evaluates `value` ONCE per row
    * and exposes it as a lambda variable to `f`. Without this, an
    * expression referenced n times is INLINED n times (Catalyst does not
    * CSE across HOF lambda bodies) — for dhash's 72-cell grid referenced
    * by 128 gradient comparisons that's a ~100× tree blowup. */
  private def bind(value: org.apache.spark.sql.Column)
                  (f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    element_at(transform(array(value), f), 1)

  /** REAL perceptual hash (dHash) over a raw 8-bit luma payload — no
    * codec needed: `payload` is width×height grayscale bytes, row-major
    * (the shape a decoder emits; a real pipeline runs this right after
    * decode, or on the raw-luma sidecar column). Classic dHash:
    * downscale to a 9×8 grid of block means, then bit (r,c) = 1 iff
    * cell(r,c) is brighter than cell(r,c+1) — 8 gradient bits per row ×
    * 8 rows = 64 bits, emitted as a 16-char hex string so the SAME
    * banding/hamming plumbing as [[phash]] rides it unchanged.
    *
    * All arithmetic is INTEGER (block means compared by cross-
    * multiplying sums with cell pixel counts), so the DuckDB twin
    * replays it exactly — no float tie hazards. Contract: width ≥ 9,
    * height ≥ 8 (keeps every cell non-empty) and payload length ≥
    * width×height; out-of-contract inputs hash to NULL in both the
    * kernel and the HOF twin (a real decoder's downscale handles
    * smaller frames upstream).
    *
    * Near-dup behavior (spec-asserted): a few-pixel perturbation leaves
    * most block means — and so most gradient bits — intact, landing
    * within hamming ≤ 3 of the original; unrelated images differ in
    * ~half the bits. Pure scan-local expression: no UDF, no shuffle. */
  def dhash(payload: org.apache.spark.sql.Column,
            width: org.apache.spark.sql.Column,
            height: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.DHash64(payload, width.cast("int"), height.cast("int"))

  /** The pure-HOF formulation of [[dhash]] — kept as the semantics
    * cross-check (spec-asserted bit-identical to the codegen'd
    * [[graft.functions.DHash64]] kernel, the Int8RoundTrip pattern):
    * every step is an auditable column expression, but the ~2500-node
    * interpreted tree per row made it 36.8 s at sf0.1 where the kernel
    * does one primitive pass. */
  private[graft] def dhashHof(payload: org.apache.spark.sql.Column,
            width: org.apache.spark.sql.Column,
            height: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val w = width.cast("int")
    val h = height.cast("int")
    // same contract guard as the kernel: out-of-domain inputs are NULL in
    // BOTH forms (otherwise a short payload zero-fills here but not there
    // and the twins diverge)
    when(w >= 9 && h >= 8 && length(payload) >= w * h, dhashHofBody(payload, w, h))
  }

  private def dhashHofBody(payload: org.apache.spark.sql.Column,
            w: org.apache.spark.sql.Column,
            h: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // one hex() of the payload, let-bound; byte i is then a 2-char slice
    bind(hex(payload)) { hx =>
      def byteAt(pos: org.apache.spark.sql.Column) = // pos 0-based
        conv(hx.substr(pos * 2 + 1, lit(2)), 16, 10).cast("long")
      def bound(i: org.apache.spark.sql.Column,
                n: org.apache.spark.sql.Column, parts: Int) =
        floor(i * n / parts).cast("int")
      val gridExpr = transform(sequence(lit(0), lit(7)), r =>
        transform(sequence(lit(0), lit(8)), c => {
          val r0 = bound(r, h, 8); val r1 = bound(r + 1, h, 8)
          val c0 = bound(c, w, 9); val c1 = bound(c + 1, w, 9)
          val cell = flatten(transform(sequence(r0, r1 - 1), rr =>
            transform(sequence(c0, c1 - 1), cc => byteAt(rr * w + cc))))
          struct(
            aggregate(cell, lit(0L), (acc, x) => acc + x).as("s"),
            size(cell).cast("long").as("n"))
        }))
      bind(gridExpr) { grid =>
        val bitsExpr = transform(sequence(lit(0), lit(63)), i => {
          val a = element_at(element_at(grid, (i / 8).cast("int") + 1),
            (i % 8).cast("int") + 1)
          val b = element_at(element_at(grid, (i / 8).cast("int") + 1),
            (i % 8).cast("int") + 2)
          // mean(a) > mean(b) by integer cross-multiplication
          when(a.getField("s") * b.getField("n") >
            b.getField("s") * a.getField("n"), 1).otherwise(0)
        })
        bind(bitsExpr) { bits =>
          // nibble p (MSB-first) = bits[4p..4p+3] → one hex char
          val digits = lit("0123456789abcdef")
          concat((0 until 16).map { p =>
            val v = element_at(bits, 4 * p + 1) * 8 +
              element_at(bits, 4 * p + 2) * 4 +
              element_at(bits, 4 * p + 3) * 2 +
              element_at(bits, 4 * p + 4)
            digits.substr(v + 1, lit(1))
          }: _*)
        }
      }
    }
  }

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
                          payloadCol: String = "media.payload"): DataFrame =
    hashBandPairs(media.select(col(idCol).as("id"),
      phash(col(payloadCol)).as("h")), maxHamming)

  /** [[phashCandidatePairs]] with the REAL perceptual hash ([[dhash]])
    * over raw-luma payloads. Identical banding/verify plumbing; only the
    * hash differs. `widthCol`/`heightCol` default to the asMedia-shaped
    * meta paths and travel with `payloadCol` — a caller with a different
    * layout overrides all three together. */
  def dhashCandidatePairs(media: DataFrame, idCol: String,
                          maxHamming: Int,
                          payloadCol: String = "media.payload",
                          widthCol: String = "media.meta.width",
                          heightCol: String = "media.meta.height"): DataFrame =
    hashBandPairs(media.select(col(idCol).as("id"),
      dhash(col(payloadCol), col(widthCol), col(heightCol)).as("h")),
      maxHamming)

  /** The md5 EXACT-duplicate media key groups (the pre-decode gate real
    * pipelines run before any perceptual work): byte-identical payloads
    * group on [[phash]] (an md5 prefix — exact-equality key, nothing
    * perceptual); groups of n > 1 survive with their min-id
    * representative as `keep_id`. One hash-aggregate shuffle on the
    * 16-char key — payloads never shuffle. */
  def exactKeyGroups(media: DataFrame, idCol: String,
                     payloadCol: String = "media.payload"): DataFrame =
    media.select(col(idCol).as("gid"), phash(col(payloadCol)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), min(col("gid")).as("keep_id"))
      .filter(col("n") > 1)

  /** Banding + hamming-verify core over any 64-bit hash rendered as a
    * 16-char hex string. `hashed` must have columns (id, h).
    *
    * Pairing routes through [[DedupOps.bucketedPairs]], so hot buckets
    * triangle-shard: image corpora make degenerate bands pathologically
    * (solid/black frames, shared intro frames — thousands of members in
    * ONE (band_idx, band) bucket), and without sharding that bucket's
    * |bucket|² candidate scan serializes into a single task at 100 TB.
    * The 16-char hash rides the band postings (`carry`), so the hamming
    * verify runs inside the pair plan — no (id → hash) join-backs, and
    * payloads never shuffle: only (id, hash) band rows do. */
  def hashBandPairs(hashed: DataFrame, maxHamming: Int,
                    skewThreshold: Int = 1024, blocks: Int = 8): DataFrame = {
    val bands = hashed.select(col("id"), col("h"),
        posexplode(array((0 to 3).map(i =>
          substring(col("h"), 1 + 4 * i, 4)): _*)))
      .select(col("id"), col("h"), col("pos").as("band"), col("col").as("bucket"))
    def half(c: org.apache.spark.sql.Column, off: Int) =
      conv(substring(c, off, 8), 16, 10).cast("long")
    DedupOps.bucketedPairs(bands, skewThreshold, blocks, carry = Seq("h"))
      .withColumn("hamming",
        (bit_count(half(col("h_a"), 1).bitwiseXOR(half(col("h_b"), 1))) +
          bit_count(half(col("h_a"), 9).bitwiseXOR(half(col("h_b"), 9))))
          .cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** A deterministic raw-luma media table derived from `documents`: the
    * payload is a width×height 8-bit grayscale image whose pixels are the
    * doc's text bytes cycled to fill the frame (rpad with the text itself
    * cycles; empty docs get a flat 0x20 frame). Pure ASCII text means
    * pixel i == ascii(text[i mod len]) — exactly what the DuckDB twin
    * recomputes — while near-identical TEXTS yield near-identical IMAGES,
    * so the corpus' real near-dup structure carries into the perceptual
    * plane. Meta carries the (width, height) [[dhash]] reads. */
  def lumaMediaFromDocuments(docs: DataFrame, width: Int = 24,
                             height: Int = 16): DataFrame = {
    val n = width * height
    val cycled = when(length(col("text")) === 0, lit(" " * n))
      .otherwise(expr(s"rpad(text, $n, text)"))
    docs.select(col("doc_id"),
      asMedia(
        to_binary(cycled, lit("utf-8")),
        lit("image/x-raw-luma"),
        lit(width), lit(height),
        lit(0L), lit("raw")).as("media"))
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
