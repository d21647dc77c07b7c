package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 optimization A/B harness — same protocol as OutlierAB/
  * ClawbackAB (one JVM, min-of-N, noop sink, exceptAll identity check;
  * the registry form is the incumbent, a ratio > 1 means the challenger
  * wins and is adopted). Cases are the round's hypotheses, drawn from the
  * two measured patterns of NOTES_r13/14 §8 plus the cost-based-generator
  * doctrine:
  *
  *   - sort-first projection (guide §2.3/§7.2: per-row compute below an
  *     orderBy runs twice — the range partitioner's sampling pass
  *     re-executes the child plan): text_quality_classifier,
  *     text_normalize still computed their heavy md5/regex columns below
  *     the presentation sort.
  *   - repartition fence (NOTES_r14 §8 pattern B: when the stage below
  *     the orderBy ends with no exchange, sampling re-executes it
  *     entirely): dedup_containment's dense N² kernel and
  *     dedup_containment_verified's array-intersect verify both end
  *     exchange-less.
  *   - cost-based pair generator (jaccardPairsAuto) in the capstones that
  *     still pin the PPJoin branch: both branches are property-tested
  *     identical, so this is purely the measured dense/prefix crossover
  *     (DedupOps.resolveDenseCutoff) applied where it was skipped.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.OptAB [passes [case ...]]"`.
  */
object OptAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-opt-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def run(df: => DataFrame): Double = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }.min

    val par = spark.sparkContext.defaultParallelism
    def registry(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)
    def docs = graft.core.Tables(spark, sfDir).documents

    import graft.operators.{DedupOps, TextOps}

    // sort-first: classifier margin (one md5 per gram) above the sort
    def classifierSortFirst: DataFrame =
      docs.select($"doc_id", $"text")
        .orderBy($"doc_id")
        .select($"doc_id", TextOps.classifierMargin($"text").as("m"))
        .select($"doc_id",
          $"m.n_feats".as("n_feats"),
          (floor(($"m.z_milli".cast("double") / ($"m.n_feats" * 1000.0)) * 1e6 + 0.5) / 1e6)
            .as("score"),
          ($"m.z_milli" > 0).as("keep"))

    // sort-first: the three normalizeText pipelines above the sort
    def normalizeSortFirst: DataFrame = {
      val dirty = concat(lit("  "), upper(substring($"text", 1, 12)),
        lit("\t"), $"text", lit("   "))
      docs.select($"doc_id", $"text")
        .orderBy($"doc_id")
        .select(
          $"doc_id",
          md5(TextOps.normalizeText(dirty)).as("norm_md5"),
          length(TextOps.normalizeText(dirty)).as("n_chars_norm"),
          (TextOps.normalizeText($"text") === $"text").as("already_clean"))
    }

    // repartition fence: the dense containment kernel's final stage
    // (broadcast NL join + overlap kernel) has no trailing exchange, so
    // the orderBy's sampling pass re-runs the whole N² kernel
    def containmentFence: DataFrame = {
      val withShingles = docs
        .select($"doc_id", TextOps.shingles($"text", 2).as("shingles"))
      DedupOps.containmentPairsAuto(withShingles, "doc_id", "shingles", 0.8)
        .repartition(par)
        .orderBy($"id_a", $"id_b")
    }

    // repartition fence: the exact verify (two attach joins + intersect)
    // below the presentation sort
    def containmentVerifiedFence: DataFrame = {
      import graft.core.Lineage.LineageOps
      val withShingles = docs
        .select($"doc_id", TextOps.shingles($"text", 3).as("shingles"))
      val sets = withShingles
        .select($"doc_id", array_distinct($"shingles").as("ss"))
        .cut(eager = false)
      val cands = DedupOps.containmentSketchPairs(withShingles, "doc_id",
          "shingles", 0.5, 16)
        .select($"id_a", $"id_b")
      cands
        .join(sets.select($"doc_id".as("id_a"), $"ss".as("s_a")), "id_a")
        .join(sets.select($"doc_id".as("id_b"), $"ss".as("s_b")), "id_b")
        .withColumn("inter", size(array_intersect($"s_a", $"s_b")).cast("double"))
        .withColumn("cab", $"inter" / size($"s_a"))
        .withColumn("cba", $"inter" / size($"s_b"))
        .filter(greatest($"cab", $"cba") >= 0.8)
        .select($"id_a", $"id_b",
          (floor(($"cab") * 1e6 + 0.5) / 1e6).as("containment_ab"),
          (floor(($"cba") * 1e6 + 0.5) / 1e6).as("containment_ba"))
        .repartition(par)
        .orderBy($"id_a", $"id_b")
    }

    // cost-based pair generator in pipeline_training_corpus
    def trainingCorpusAuto: DataFrame = {
      import graft.operators.{HygieneOps, SamplingOps}
      import graft.core.Lineage.LineageOps
      val d = docs
      val gophered = HygieneOps.gopherRules(d, "doc_id", "text")
        .filter($"passes").select($"doc_id")
      val train = d.join(gophered, "doc_id").filter($"doc_id" % 50 =!= 0)
      val benchmark = d.filter($"doc_id" % 50 === 0)
      val contaminated = HygieneOps
        .contaminationHits(train, benchmark, "doc_id", "text", 3, minHits = 5L)
        .select($"doc_id").distinct()
      val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
      val exactKept = clean
        .withColumn("keep", min($"doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy(md5($"text"))))
        .filter($"doc_id" === $"keep").drop("keep")
        .cut(eager = false)
      val sh = exactKept.select($"doc_id", TextOps.shingles($"text", 2).as("sh"))
      val pairs = DedupOps.jaccardPairsAuto(sh, "doc_id", "sh", 0.9)
      val nonReps = DedupOps.connectedComponents(pairs, "id_a", "id_b")
        .filter($"id" =!= $"label").select($"id".as("doc_id"))
      val survivors = exactKept.join(nonReps, Seq("doc_id"), "left_anti")
      SamplingOps.trainValTestSplit(survivors, "doc_id")
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
        .orderBy($"lang", $"split")
    }

    // cost-based pair generator in pipeline_clean_corpus
    def cleanCorpusAuto: DataFrame = {
      import graft.core.Lineage.LineageOps
      val d = docs
      val quality = d.filter(TextOps.qualityScore($"text") >= 0.5)
      val exactKept = quality
        .withColumn("fp", md5($"text"))
        .withColumn("keep", min($"doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"fp")))
        .filter($"doc_id" === $"keep")
        .cut(eager = false)
      val withShingles = exactKept
        .select($"doc_id", TextOps.shingles($"text", 2).as("sh"))
      val nearDupLosers = DedupOps
        .jaccardPairsAuto(withShingles, "doc_id", "sh", 0.9)
        .select($"id_b".as("doc_id")).distinct()
      exactKept.join(nearDupLosers, Seq("doc_id"), "left_anti")
        .groupBy($"lang", $"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
        .orderBy($"lang", $"source")
    }

    // repartition fence between the chunk explode and the sort
    def chunkFence: DataFrame =
      graft.operators.PackingOps
        .chunkByTokens(docs, "doc_id", "text", 32, 16)
        .repartition(par)
        .orderBy($"doc_id", $"chunk_id")

    // bottom-k containment with the probe⋈posting join strategy forced
    // (Catalyst broadcasts the full-posting side off unknown RDD stats —
    // a shape that can't exist at 100 TB where neither side broadcasts)
    def bottomkHinted(hint: String): DataFrame = {
      import graft.core.Lineage.LineageOps
      val sets = docs
        .select($"doc_id", TextOps.shingles($"text", 3).as("shingles"))
        .select($"doc_id",
          sort_array(array_distinct(
            transform(array_distinct($"shingles"), t => TextOps.hash32(t))))
            .as("hs"))
        .withColumn("sz", size($"hs"))
        .filter($"sz" > 0)
        .repartition(par)
        .cut(eager = false)
      val posting = sets.select($"doc_id".as("id"), explode($"hs").as("h"))
      val probe = sets.select($"doc_id".as("id"), $"sz",
        explode(slice($"hs", 1, 16)).as("h"))
      val directed = probe.as("p")
        .join(posting.hint(hint).as("q"),
          $"p.h" === $"q.h" && $"p.id" =!= $"q.id")
        .groupBy($"p.id".as("a"), $"q.id".as("b"), $"p.sz".as("sza"))
        .agg(count(lit(1)).as("m"))
        .withColumn("est", $"m".cast("double") / least(lit(16), $"sza"))
      directed
        .select(least($"a", $"b").as("id_a"), greatest($"a", $"b").as("id_b"),
          when($"a" < $"b", $"est").as("eab"),
          when($"a" > $"b", $"est").as("eba"))
        .groupBy($"id_a", $"id_b")
        .agg(coalesce(max($"eab"), lit(0.0)).as("rab"),
          coalesce(max($"eba"), lit(0.0)).as("rba"))
        .filter(greatest($"rab", $"rba") >= 0.8)
        .select($"id_a", $"id_b",
          (floor(($"rab") * 1e6 + 0.5) / 1e6).as("containment_ab_est"),
          (floor(($"rba") * 1e6 + 0.5) / 1e6).as("containment_ba_est"))
        .orderBy($"id_a", $"id_b")
    }

    // excise with (a) the hit-id set lineage-cut (the registry form
    // recomputes the distinct over covered three times: untouched anti,
    // touched semi, and the reassembly's anti feed), and (b) optionally a
    // round-robin fence before the presentation sort
    def exciseCut(fence: Boolean): DataFrame = {
      import graft.core.Lineage.LineageOps
      val k = 8
      val wins = docs
        .select($"doc_id".as("id"), posexplode(TextOps.shingles($"text", k)))
        .select($"id", $"pos".as("start"), $"col".as("win"))
        .cut(eager = false)
      val keepers = wins.groupBy($"win")
        .agg(min(struct($"id", $"start")).as("keeper"))
      val covered = wins.join(keepers, "win")
        .filter(struct($"id", $"start") =!= $"keeper")
        .select($"id", explode(sequence($"start", $"start" + lit(k - 1))).as("pos"))
        .distinct()
        .cut(eager = false)
      val hitIds = covered.select($"id".as("__hit_id")).distinct()
        .cut(eager = false)
      val untouched = docs.join(hitIds, $"doc_id" === $"__hit_id", "left_anti")
        .select($"doc_id", $"text".as("clean_text"),
          TextOps.tokenCount($"text").cast("int").as("n_tokens"),
          lit(0).as("n_removed"))
      val touchedDocs = docs.join(hitIds, $"doc_id" === $"__hit_id", "left_semi")
      val toks = touchedDocs
        .select($"doc_id".as("id"), posexplode(TextOps.tokens($"text")))
        .select($"id", $"pos", $"col".as("tok"))
      val reassembled = toks.join(covered, Seq("id", "pos"), "left_anti")
        .groupBy($"id")
        .agg(concat_ws(" ",
            transform(array_sort(collect_list(struct($"pos", $"tok"))),
              _.getField("tok"))).as("clean_text"),
          count(lit(1)).as("n_kept"))
        .withColumnRenamed("id", "doc_id")
      val touched = touchedDocs.select($"doc_id",
          TextOps.tokenCount($"text").as("n_tokens"))
        .join(reassembled, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"clean_text", lit("")).as("clean_text"),
          $"n_tokens".cast("int").as("n_tokens"),
          ($"n_tokens" - coalesce($"n_kept", lit(0L))).cast("int").as("n_removed"))
      val out = untouched.unionByName(touched)
      (if (fence) out.repartition(par) else out).orderBy($"doc_id")
    }

    // training corpus with the gated `train` side lineage-cut: it feeds
    // BOTH the contamination posting and the clean anti-join, so the
    // gate pipeline (two scans + topTokenRatio aggregate + join) executes
    // twice in the registry form
    def trainingCorpusTrainCut: DataFrame = {
      import graft.operators.{HygieneOps, SamplingOps}
      import graft.core.Lineage.LineageOps
      val d = docs
      val gophered = HygieneOps.gopherRules(d, "doc_id", "text")
        .filter($"passes").select($"doc_id")
      val train = d.join(gophered, "doc_id").filter($"doc_id" % 50 =!= 0)
        .cut(eager = false)
      val benchmark = d.filter($"doc_id" % 50 === 0)
      val contaminated = HygieneOps
        .contaminationHits(train, benchmark, "doc_id", "text", 3, minHits = 5L)
        .select($"doc_id").distinct()
      val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
      val exactKept = clean
        .withColumn("keep", min($"doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy(md5($"text"))))
        .filter($"doc_id" === $"keep").drop("keep")
        .cut(eager = false)
      val sh = exactKept.select($"doc_id", TextOps.shingles($"text", 2).as("sh"))
      val pairs = DedupOps.jaccardPairs(sh, "doc_id", "sh", 0.9)
      val nonReps = DedupOps.connectedComponents(pairs, "id_a", "id_b")
        .filter($"id" =!= $"label").select($"id".as("doc_id"))
      val survivors = exactKept.join(nonReps, Seq("doc_id"), "left_anti")
      SamplingOps.trainValTestSplit(survivors, "doc_id")
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
        .orderBy($"lang", $"split")
    }

    // dedup_components with min-label propagation WITHOUT pointer
    // jumping: near-dup clusters are near-cliques (diameter ~2), so the
    // label-of-label hop may buy no rounds while costing 2 joins/round
    def componentsNoPj: DataFrame = {
      import graft.core.Lineage.LineageOps
      val d = docs
      val withShingles = d
        .select($"doc_id", TextOps.shingles($"text", 2).as("shingles"))
      val pairs = DedupOps.jaccardPairsAuto(withShingles, "doc_id", "shingles", 0.5)
      val edges = pairs.select($"id_a".as("src"), $"id_b".as("dst"))
        .union(pairs.select($"id_b".as("src"), $"id_a".as("dst")))
        .distinct()
        .cut(eager = false)
      var labels = edges.groupBy($"src".as("id"))
        .agg(least($"src", min($"dst")).as("label"))
        .cut(eager = false)
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 20) {
        val neighborMin = edges.join(labels, $"dst" === $"id")
          .groupBy($"src").agg(min($"label").as("nbr_min"))
        val updated = labels.join(neighborMin, $"id" === $"src", "left")
          .select($"id", $"label",
            least($"label", coalesce($"nbr_min", $"label")).as("new_label"))
          .cut(eager = false)
        changed = updated.filter($"new_label" < $"label").count()
        labels = updated.select($"id", $"new_label".as("label"))
        iter += 1
      }
      require(changed == 0, s"no-PJ CC did not converge")
      d.select($"doc_id")
        .join(labels, $"doc_id" === $"id", "left")
        .select($"doc_id", coalesce($"label", $"doc_id").as("rep"))
        .orderBy($"doc_id")
    }

    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("cc_nopj", () => componentsNoPj, () => registry("dedup_components")),
      ("ptc_train_cut", () => trainingCorpusTrainCut, () => registry("pipeline_training_corpus")),
      ("excise_hitids_cut", () => exciseCut(false), () => registry("dedup_excise_spans")),
      ("excise_hitids_cut_fence", () => exciseCut(true), () => registry("dedup_excise_spans")),
      ("text_quality_classifier", () => classifierSortFirst, () => registry("text_quality_classifier")),
      ("text_normalize", () => normalizeSortFirst, () => registry("text_normalize")),
      ("dedup_containment", () => containmentFence, () => registry("dedup_containment")),
      ("dedup_containment_verified", () => containmentVerifiedFence, () => registry("dedup_containment_verified")),
      ("pipeline_training_corpus", () => trainingCorpusAuto, () => registry("pipeline_training_corpus")),
      ("pipeline_clean_corpus", () => cleanCorpusAuto, () => registry("pipeline_clean_corpus")),
      ("text_chunk_windows", () => chunkFence, () => registry("text_chunk_windows")),
      ("bottomk_merge", () => bottomkHinted("merge"), () => registry("dedup_containment_bottomk")),
      ("bottomk_shuffle_hash", () => bottomkHinted("shuffle_hash"), () => registry("dedup_containment_bottomk")))
      .filter { case (n, _, _) => only.isEmpty || only(n) }

    // warmup: JVM + codegen on the first case's both forms
    run(cases.head._2()); run(cases.head._3())
    val out = cases.map { case (name, challenger, reg) =>
      val tCh = run(challenger())
      val tReg = run(reg())
      val mismatch = challenger().exceptAll(reg()).count() +
        reg().exceptAll(challenger()).count()
      require(mismatch == 0, s"$name A/B forms disagree on $mismatch rows")
      println(f"$name%-30s challenger=$tCh%.3f registry=$tReg%.3f  (${tReg / tCh}%.2fx win if >1)")
      s""""$name":{"challenger_sec":$tCh,"registry_sec":$tReg}"""
    }
    println(s"""{"metric":"opt_ab","sf":"$sfDir","passes":$passes,${out.mkString(",")},"forms_identical":true}""")
    spark.stop()
  }
}
