package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HygieneOpsSpec extends SparkSpec {
  import spark.implicits._

  test("contaminationHits counts shared n-grams, excludes self-pairs") {
    val train = Seq(
      (1L, "a b c d e"),   // shares 3-grams "a b c","b c d","c d e" with bench 10
      (2L, "x y z w q"),   // no overlap
      (10L, "a b c d e")   // the benchmark doc itself — self-pair must drop
    ).toDF("doc_id", "text")
    val bench = train.filter($"doc_id" === 10L)
    val hits = HygieneOps.contaminationHits(train, bench, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq === Seq((1L, 10L, 3L)))
  }

  test("exciseContaminatedSpans: overlapping hits merge, clean docs " +
       "untouched, full match empties but keeps the row") {
    val bench = Seq((100L, "b c d e")).toDF("doc_id", "text")
    val train = Seq(
      // windows "b c d" and "c d e" both hit → covered positions 1..5
      // merge (overlap counted once): keep "a" and "f"
      (1L, "a b c d e f"),
      (2L, "x y z w"),        // clean — returned verbatim
      (3L, "b c d e"),        // fully excised — empty text, row kept
      (4L, "b c")             // shorter than n=3: no windows, untouched
    ).toDF("doc_id", "text")
    val out = HygieneOps.exciseContaminatedSpans(train, bench,
        "doc_id", "text", 3)
      .orderBy($"doc_id")
      .as[(Long, String, Int, Int)].collect().toSeq
    assert(out === Seq(
      (1L, "a f", 6, 4),
      (2L, "x y z w", 4, 0),
      (3L, "", 4, 4),
      (4L, "b c", 2, 0)))
  }

  test("exciseDuplicateSpans: first occurrence kept, later cut, " +
       "within-doc repeats collapse") {
    val span = "q w e r t y u i" // 8 tokens
    val docs = Seq(
      (2L, s"c1 c2 $span c3"), // later occurrence → span excised
      (1L, s"a1 $span a2"),    // first occurrence (min doc_id) → untouched
      (3L, "z1 z2 z3"),        // clean, shorter than k
      (4L, "s s s s s s s s s s") // within-doc: 3 identical windows →
                                  // keeper at start 0, positions 1-9 cut
    ).toDF("doc_id", "text")
    val out = HygieneOps.exciseDuplicateSpans(docs, "doc_id", "text", 8)
      .orderBy($"doc_id").as[(Long, String, Int, Int)].collect().toSeq
    assert(out === Seq(
      (1L, s"a1 $span a2", 10, 0),
      (2L, "c1 c2 c3", 11, 8),
      (3L, "z1 z2 z3", 3, 0),
      (4L, "s", 10, 9)))
  }

  test("repetitionRatio: 0 for all-distinct, rises with repeats, 0 when too short") {
    val r = Seq("a b c d", "a b a b a b", "x").toDF("t")
      .select(HygieneOps.repetitionRatio($"t", 2).as("r")).as[Double].collect()
    assert(r(0) === 0.0)
    // "a b a b a b": 5 2-grams, 2 distinct ("a b","b a") → 1 - 2/5
    assert(r(1) === 0.6)
    assert(r(2) === 0.0) // single token, no 2-grams
  }

  test("gopherRules verdict matches hand-computed metrics") {
    val good = ("this is a clean document with twenty two distinct tokens " +
      "covering enough length to pass every gate fine also more words here now")
    val repeaty = Seq.fill(30)("spam").mkString(" ")
    val out = Seq((1L, good), (2L, repeaty)).toDF("doc_id", "text")
    val rows = HygieneOps.gopherRules(out, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(rows(0).getAs[Boolean]("passes"))
    val bad = rows(1)
    assert(!bad.getAs[Boolean]("passes"))
    assert(bad.getAs[Double]("top_token_ratio") === 1.0)
    assert(bad.getAs[Double]("rep_2gram") > 0.9)
  }

  test("deterministic sampling: stable across runs, rates honored, salt decorrelates") {
    val d = graft.core.Tables(spark, graft.TestSpark.sfDir).documents
    val s1 = SamplingOps.deterministicSample(d, "doc_id", 300)
      .select($"doc_id").as[Long].collect().toSet
    val s2 = SamplingOps.deterministicSample(d, "doc_id", 300)
      .select($"doc_id").as[Long].collect().toSet
    assert(s1 === s2 && s1.nonEmpty) // pure function of the key
    val n = d.count().toDouble
    assert(math.abs(s1.size / n - 0.3) < 0.1) // ~30% kept
    // a 50%-sampled stratum must still reach the test split (salted hash)
    val sampled = SamplingOps.stratifiedSample(d, "lang", "doc_id",
      Map("en" -> 500), 1000)
    val splits = SamplingOps.trainValTestSplit(sampled, "doc_id")
      .filter($"lang" === "en").select($"split").distinct()
      .as[String].collect().toSet
    assert(splits === Set("train", "val", "test"))
  }

  test("capPerStratum: exactly k survivors per big stratum, partition-invariant") {
    val df = spark.range(1000)
      .select(($"id" % 3).cast("string").as("dom"), $"id".as(("k")))
    val capped = SamplingOps.capPerStratum(df, "dom", "k", 7)
    val byDom = capped.groupBy($"dom").count()
      .as[(String, Long)].collect().toMap
    assert(byDom === Map("0" -> 7L, "1" -> 7L, "2" -> 7L))
    // survivor set is a pure function of the keys — not of partitioning
    // (the map-side heap merge must pick the same global winners)
    val again = SamplingOps.capPerStratum(df.repartition(17), "dom", "k", 7)
    assert(capped.select($"dom", $"k").as[(String, Long)].collect().toSet ===
      again.select($"dom", $"k").as[(String, Long)].collect().toSet)
    // a stratum smaller than k keeps everything
    val tiny = SamplingOps.capPerStratum(
      Seq(("x", 1L), ("x", 2L)).toDF("dom", "k"), "dom", "k", 7)
    assert(tiny.count() === 2)
  }

  test("weightedSample: weight-proportional inclusion, deterministic, k-bounded") {
    val df = spark.range(200).select($"id",
      when($"id" === 7L, 1e9).otherwise(1.0).as("w"))
    val got = SamplingOps.weightedSample(df, "id", "w", 10)
      .select($"id").as[Long].collect().toSet
    assert(got.size === 10)
    // a weight 10⁹ row has wkey ≈ 0, strictly above any weight-1 row
    assert(got.contains(7L))
    val again = SamplingOps.weightedSample(df.repartition(13), "id", "w", 10)
      .select($"id").as[Long].collect().toSet
    assert(got === again)
    // aggregate behavior: doubling the weight of half the keys must raise
    // their selection share well above the unweighted baseline
    val big = spark.range(2000).select($"id",
      when($"id" % 2 === 0, 8.0).otherwise(1.0).as("w"))
    val sel = SamplingOps.weightedSample(big, "id", "w", 400)
      .filter($"id" % 2 === 0).count()
    assert(sel > 260, s"heavy half got $sel of 400 — expected a clear majority")
  }

  test("upsample repeats strata exactly and tags copies") {
    val df = Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
    val up = SamplingOps.upsample(df, "lang", Map("en" -> 3))
    assert(up.filter($"lang" === "en").count() === 3)
    assert(up.filter($"lang" === "de").count() === 1)
    assert(up.filter($"lang" === "en").select($"copy")
      .as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
  }

  test("upsample with repeats <= 0 drops the stratum (sequence(1,0) guard)") {
    val df = Seq((1L, "en"), (2L, "junk"), (3L, "bad")).toDF("doc_id", "lang")
    val up = SamplingOps.upsample(df, "lang", Map("junk" -> 0, "bad" -> -2))
    assert(up.filter($"lang" === "junk").count() === 0)
    assert(up.filter($"lang" === "bad").count() === 0)
    assert(up.filter($"lang" === "en").count() === 1)
  }

  test("gopherRules fails (not drops) NULL-text documents") {
    val df = Seq((1L, Option("the a of and to in many fine plain words " +
        "stretch this clean document toward twenty tokens total here now")),
      (2L, None: Option[String])).toDF("doc_id", "text")
    val rows = HygieneOps.gopherRules(df, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(rows.length === 2) // the corrupt doc is present, not invisible
    assert(!rows(1).getAs[Boolean]("passes"))
  }

  test("semdedupPairs is the cluster-local subset of global cosine pairs") {
    val e = graft.core.Tables(spark, graft.TestSpark.sfDir).embeddings
    val global = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b"),
        round(VectorOps.cosine(VectorOps.toDouble($"a.embedding"),
          VectorOps.toDouble($"b.embedding")), 6).as("cos"))
      .filter($"cos" >= 0.4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val local = VectorOps.semdedupPairs(e, e.filter($"vec_id" < 8),
        "vec_id", "embedding", "vec_id", "embedding", 0.4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(local.nonEmpty)
    assert(local.subsetOf(global)) // within-cluster pairs, exact cosines
    // triangle blocking is pure parallelization: any block count yields
    // the identical pair set
    val unblocked = VectorOps.semdedupPairs(e, e.filter($"vec_id" < 8),
        "vec_id", "embedding", "vec_id", "embedding", 0.4, blocks = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(local === unblocked)
  }

  test("temperatureWeights: alpha<1 flattens, alpha=1 is the raw mixture") {
    import graft.operators.SamplingOps
    // domains with counts 1 / 4 / 16
    val df = (Seq.fill(1)("a") ++ Seq.fill(4)("b") ++ Seq.fill(16)("c"))
      .toDF("source")
    val half = SamplingOps.temperatureWeights(df, "source", 0.5)
      .orderBy($"source").collect()
    // sqrt weights 1,2,4 over 7
    assert(half.map(_.getAs[Double]("w_temp")).toSeq ===
      Seq(0.142857, 0.285714, 0.571429))
    assert(half.map(_.getAs[Double]("p_raw")).toSeq ===
      Seq(0.047619, 0.190476, 0.761905))
    // flattening: every rare domain's target share >= its raw share,
    // the head's share strictly shrinks
    assert(half.forall(r => r.getAs[Double]("w_temp") >=
      r.getAs[Double]("p_raw") || r.getAs[String]("source") == "c"))
    assert(half.last.getAs[Double]("w_temp") < half.last.getAs[Double]("p_raw"))
    // alpha = 1 recovers the raw mixture exactly
    val one = SamplingOps.temperatureWeights(df, "source", 1.0)
      .orderBy($"source").collect()
    assert(one.forall(r =>
      r.getAs[Double]("w_temp") === r.getAs[Double]("p_raw")))
  }
}
