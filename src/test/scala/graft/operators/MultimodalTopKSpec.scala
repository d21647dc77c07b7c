package graft.operators

import graft.SparkSpec
import graft.functions.TopKAggregator
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = MultimodalOps.fakeMediaFromDocuments(
    graft.core.Tables(spark, graft.TestSpark.sfDir).documents).cache()

  test("media struct has the convention schema and survives parquet") {
    // simpleString comparison: nullability flags differ between literal
    // construction and the convention type, which is fine for the contract
    assert(media.schema("media").dataType.simpleString ===
      MultimodalOps.mediaType.simpleString)
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("media").dataType.simpleString ===
      MultimodalOps.mediaType.simpleString)
    assert(back.count() === media.count())
  }

  test("decode kernel: n_bytes == payload size, histogram sums to n_bytes") {
    val f = MultimodalOps.extractFeatures(media)
    val row = f.filter($"doc_id" === 0).head()
    val expected = media.filter($"doc_id" === 0)
      .select(octet_length($"media.payload")).as[Int].head()
    assert(row.n_bytes === expected)
    assert(row.histogram16.sum === expected.toLong)
    assert(row.byte_mean > 0)
    assert(row.mime.startsWith("application/x-fake-"))
  }

  test("phash near-dup: identical payloads pair at hamming 0, others drop") {
    val docs = Seq(
      (1L, "the same exact payload bytes", "s_1", 28L),
      (2L, "the same exact payload bytes", "s_1", 28L),
      (3L, "a completely different document body", "s_2", 36L),
      (4L, "the same exact payload bytes", "s_3", 28L))
      .toDF("doc_id", "text", "source", "n_chars")
    val m = MultimodalOps.fakeMediaFromDocuments(docs)
    val pairs = MultimodalOps.phashCandidatePairs(m, "doc_id", 3)
      .as[(Long, Long, Int)].collect().toSet
    // all three identical-payload pairs, each at distance 0; doc 3's
    // random-looking md5 shares no 16-bit band, so it never pairs
    assert(pairs === Set((1L, 2L, 0), (1L, 4L, 0), (2L, 4L, 0)))
    // widening the threshold cannot add pairs that share no band
    val wide = MultimodalOps.phashCandidatePairs(m, "doc_id", 64)
      .as[(Long, Long, Int)].collect()
    assert(wide.forall(p => p._3 <= 64))
    // the hamming column is the true 64-bit distance: recompute one pair
    // driver-side from the md5 prefixes
    val h = docs.select($"doc_id",
        MultimodalOps.phash(to_binary($"text", lit("utf-8"))).as("h"))
      .as[(Long, String)].collect().toMap
    def bits(s: String) = java.lang.Long.parseUnsignedLong(s, 16)
    wide.foreach { case (a, b, d) =>
      assert(java.lang.Long.bitCount(bits(h(a)) ^ bits(h(b))) === d)
    }
  }

  /** Reference dHash in plain Scala — the same integer math the column
    * expression and the DuckDB twin implement. */
  private def refDhash(b: Array[Int], w: Int, h: Int): String = {
    def cell(r: Int, c: Int): (Long, Long) = {
      val vals = for {
        rr <- r * h / 8 until (r + 1) * h / 8
        cc <- c * w / 9 until (c + 1) * w / 9
      } yield b(rr * w + cc).toLong
      (vals.sum, vals.size.toLong)
    }
    val grid = Array.tabulate(8, 9)(cell)
    val bits = (0 until 64).map { i =>
      val (sa, na) = grid(i / 8)(i % 8); val (sb, nb) = grid(i / 8)(i % 8 + 1)
      if (sa * nb > sb * na) 1 else 0
    }
    (0 until 16).map(p => "0123456789abcdef".charAt(
      8 * bits(4 * p) + 4 * bits(4 * p + 1) + 2 * bits(4 * p + 2) + bits(4 * p + 3)))
      .mkString
  }

  test("dhash: near-dup (not byte-identical) luma frames collide within hamming ≤ 3") {
    val w = 24; val h = 16
    val base = Array.tabulate(h * w)(i => (i / w * 7 + i % w * 11) % 200 + 20)
    val variant = base.clone()
    // a strong local change confined to one grid cell: flips exactly the
    // gradient bits that cell participates in (reference says hamming 1)
    for (rr <- 0 until 2; cc <- 0 until 2)
      variant(rr * w + cc) = math.min(255, variant(rr * w + cc) + 60)
    val unrelated = Array.tabulate(h * w)(i => (i / w * 53 + i % w * 97) % 251)
    assert(!java.util.Arrays.equals(base, variant), "fixture must not be byte-identical")
    val rows = Seq((1L, base), (2L, variant), (3L, unrelated)).map {
      case (id, px) => (id, px.map(_.toByte))
    }
    val media = rows.toDF("doc_id", "payload").select($"doc_id",
      MultimodalOps.asMedia($"payload", lit("image/x-raw-luma"),
        lit(w), lit(h), lit(0L), lit("raw")).as("media"))
    // engine dhash == the plain-Scala reference on all three frames
    val hs = media.select($"doc_id",
        MultimodalOps.dhash($"media.payload", $"media.meta.width",
          $"media.meta.height").as("dh"))
      .as[(Long, String)].collect().toMap
    assert(hs(1L) === refDhash(base, w, h))
    assert(hs(2L) === refDhash(variant, w, h))
    assert(hs(3L) === refDhash(unrelated, w, h))
    // the near-dup pair collides within hamming ≤ 3; unrelated drops
    val pairs = MultimodalOps.dhashCandidatePairs(media, "doc_id", 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 2L, 1)))
    // ...while the md5 exact key does NOT pair them (not byte-identical):
    // the perceptual behavior is real, not an artifact of equal payloads
    val exact = MultimodalOps.phashCandidatePairs(media, "doc_id", 3)
      .as[(Long, Long, Int)].collect()
    assert(exact.isEmpty)
  }

  test("dhash over luma-from-documents media matches the reference per doc") {
    val luma = MultimodalOps.lumaMediaFromDocuments(
      graft.core.Tables(spark, graft.TestSpark.sfDir).documents)
    val got = luma.select($"doc_id",
        MultimodalOps.dhash($"media.payload", $"media.meta.width",
          $"media.meta.height").as("dh"))
      .orderBy($"doc_id").limit(20).as[(Long, String)].collect()
    val texts = graft.core.Tables(spark, graft.TestSpark.sfDir).documents
      .select($"doc_id", $"text").orderBy($"doc_id").limit(20)
      .as[(Long, String)].collect().toMap
    got.foreach { case (id, dh) =>
      val t = texts(id)
      val px = Array.tabulate(384)(i =>
        if (t.isEmpty) 32 else t.charAt(i % t.length).toInt)
      assert(dh === refDhash(px, 24, 16), s"doc $id")
    }
    // the codegen'd kernel (DHash64) is bit-identical to the pure-HOF
    // column-expression form on the same rows (the Int8RoundTrip pattern)
    val mismatches = luma.select(
        MultimodalOps.dhash($"media.payload", $"media.meta.width",
          $"media.meta.height").as("k"),
        MultimodalOps.dhashHof($"media.payload", $"media.meta.width",
          $"media.meta.height").as("hof"))
      .filter($"k" =!= $"hof").count()
    assert(mismatches === 0L)
  }

  test("dhash contract: short payload / tiny frame hash to NULL in both forms") {
    val w = 24; val h = 16
    val full = Array.tabulate(h * w)(i => (i * 37) % 251).map(_.toByte)
    val rows = Seq(
      (1L, full, w, h),                  // in contract
      (2L, full.take(100), w, h),        // payload < w*h
      (3L, full, 8, h),                  // width < 9
      (4L, full, w, 7))                  // height < 8
    val df = rows.toDF("id", "payload", "w", "h").select($"id",
      MultimodalOps.dhash($"payload", $"w", $"h").as("k"),
      MultimodalOps.dhashHof($"payload", $"w", $"h").as("hof"))
    val got = df.collect().map(r =>
      r.getLong(0) -> ((Option(r.getString(1)), Option(r.getString(2))))).toMap
    assert(got(1L)._1.isDefined && got(1L)._1 === got(1L)._2)
    Seq(2L, 3L, 4L).foreach { id =>
      assert(got(id)._1.isEmpty, s"kernel must NULL id=$id")
      assert(got(id)._2.isEmpty, s"HOF twin must NULL id=$id")
    }
  }

  test("hashBandPairs: degenerate hot bucket shards without changing pairs") {
    // an image-corpus pathology: many identical solid-color frames — every
    // one lands in the SAME (band, bucket) for all 4 bands. Forcing the
    // triangle grid over that hot bucket must yield exactly the all-pairs
    // set the unsharded join finds (block-invariance on the worst case).
    val w = 24; val h = 16
    val black = Array.fill(h * w)(0.toByte)
    val n = 20
    val media = (1L to n.toLong).map(id => (id, black)).toDF("doc_id", "payload")
      .select($"doc_id", MultimodalOps.asMedia($"payload",
        lit("image/x-raw-luma"), lit(w), lit(h), lit(0L), lit("raw")).as("media"))
    val hashed = media.select($"doc_id".as("id"),
      MultimodalOps.dhash($"media.payload", $"media.meta.width",
        $"media.meta.height").as("h"))
    val unsharded = MultimodalOps.hashBandPairs(hashed, 3,
      skewThreshold = Int.MaxValue).as[(Long, Long, Int)].collect().toSet
    val sharded = MultimodalOps.hashBandPairs(hashed, 3,
      skewThreshold = 2, blocks = 4).as[(Long, Long, Int)].collect().toSet
    assert(unsharded === sharded)
    // all 20 frames are identical → every pair, hamming 0
    assert(sharded.size === n * (n - 1) / 2)
    assert(sharded.forall { case (a, b, d) => a < b && d === 0 })
  }

  test("exactKeyGroups: byte-identical payloads group, min id kept, " +
       "uniques drop") {
    // the sf fixtures have no byte-identical texts, so the registry query
    // passes vacuously (0 rows both engines) — this constructed corpus is
    // where the n>1 grouping and min-doc_id keeper are actually asserted
    val dup = "same bytes".getBytes("UTF-8")
    val dup2 = "other dup".getBytes("UTF-8")
    val media = Seq(
      (7L, dup), (3L, dup), (9L, dup),          // triple → keep 3
      (5L, dup2), (4L, dup2),                   // pair → keep 4
      (6L, "unique".getBytes("UTF-8"))          // singleton → dropped
    ).toDF("doc_id", "payload").select($"doc_id",
      MultimodalOps.asMedia($"payload", lit("application/octet-stream"),
        lit(0), lit(0), lit(0L), lit("raw")).as("media"))
    val got = MultimodalOps.exactKeyGroups(media, "doc_id")
      .select($"n", $"keep_id").as[(Long, Long)].collect().toSet
    assert(got === Set((3L, 3L), (2L, 4L)))
  }

  test("frame sampling: stride-2 keeps every other 256-byte block") {
    val df = Seq(("x" * 1000)).toDF("t")
      .select(MultimodalOps.sampleFrames(to_binary($"t", lit("utf-8")), 2).as("frames"))
    val frames = df.as[Seq[Array[Byte]]].head()
    // 1000 bytes -> 4 blocks -> blocks 0 and 2 kept
    assert(frames.length === 2)
    assert(frames(0).length === 256)
    assert(frames(1).length === 256)
  }
}

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("bounded heap keeps k best, ordered, with map-side partial merge") {
    val topk = udaf(new TopKAggregator(3))
    val df = Seq(
      ("g1", 0.5, 1L), ("g1", 0.9, 2L), ("g1", 0.7, 3L), ("g1", 0.9, 0L),
      ("g1", 0.1, 4L), ("g2", 0.2, 5L))
      .toDF("g", "score", "id").repartition(4)
    val out = df.groupBy($"g").agg(topk($"score", $"id").as("top"))
      .select($"g", $"top").as[(String, Seq[(Double, Long)])]
      .collect().toMap
    // ties broken by id asc: (0.9,0) before (0.9,2)
    assert(out("g1") === Seq((0.9, 0L), (0.9, 2L), (0.7, 3L)))
    assert(out("g2") === Seq((0.2, 5L)))
  }

  test("aggregator result == window row_number result on real embeddings") {
    val e = graft.core.Tables(spark, graft.TestSpark.sfDir).embeddings
    val viaAgg = graft.queries.ExtQueries.all.find(_.name == "sim_topk_aggregator").get
      .run(spark, graft.TestSpark.sfDir)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val viaWindow = graft.operators.VectorOps.topKNeighbors(
      e.filter($"vec_id" < 5), e, "vec_id", "embedding", 10)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(viaAgg.sortBy(t => (t._1, t._2)) === viaWindow.sortBy(t => (t._1, t._2)))
  }

  test("top-k partials merge in any grouping == whole-data top-k (incremental)") {
    // the same mergeable-partials algebra as the OHLC bars: maintain a
    // stored ≤k buffer per group and fold each micro-batch in — never
    // re-rank history. Associativity + order-independence is what makes
    // the stored buffer a valid incremental state.
    val agg = new graft.functions.TopKAggregator(5)
    val scored = (1 to 200).map(i => (((i * 37) % 101).toDouble, i.toLong))
    val whole = scored.foldLeft(agg.zero)(agg.reduce)
    val chunks = scored.grouped(70).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val fwd = chunks.reduce(agg.merge)
    val rev = chunks.reverse.reduce(agg.merge)
    assert(fwd === whole)
    assert(rev === whole)
    assert(whole.size === 5)
  }
}
