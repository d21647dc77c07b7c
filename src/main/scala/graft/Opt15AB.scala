package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 optimization A/B harness — same protocol as OptAB (one JVM,
  * min-of-N, noop sink, exceptAll identity; ratio > 1 means the
  * challenger/registry form under test wins). The round's hypotheses are
  * the VERDICT r14 "next round" list; for each case the REGISTRY now
  * carries the candidate optimization and the incumbent is the r14 form
  * rebuilt inline (the window-twin / HOF-twin / sequential-write forms
  * kept in the codebase for exactly this purpose), so the A/B runs both
  * forms in one JVM regardless of which one is deployed.
  *
  * Also reports DRIVER JOB COUNTS per form (a SparkListener tick): the
  * stored-index and CC cases are job-launch-bound at bench SFs, so the
  * job count is the honest local metric while the wall-clock win shows
  * at scale.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.Opt15AB [passes [case ...]]"`.
  */
object Opt15AB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-opt15-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val jobCount = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet()
      })

    // min-of-N seconds plus the job count of ONE pass (jobs are
    // deterministic per form; counted on the last pass after a bus drain)
    def run(df: => DataFrame): (Double, Long) = {
      var jobs = 0L
      val t = (1 to passes).map { _ =>
        org.apache.spark.sql.graft.bridge
          .drainListenerBus(spark.sparkContext)
        val j0 = jobCount.get()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graft.bridge
          .drainListenerBus(spark.sparkContext)
        jobs = jobCount.get() - j0
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }.min
      (t, jobs)
    }

    val par = spark.sparkContext.defaultParallelism
    def registry(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)
    def docs = graft.core.Tables(spark, sfDir).documents

    import graft.operators.{DedupOps, HygieneOps, SamplingOps, TextOps}
    import graft.core.Lineage.LineageOps

    // ---- challenger rebuild: bounded-heap-aggregate PPJoin (encodedSets
    // + rarestPrefixesAgg + the same candidate/verify tail) — REFUTED,
    // kept as the committed evidence (see DedupOps.rarestPrefixes) ----
    def encodedSets(d: DataFrame, idCol: String, setCol: String): DataFrame =
      d.select(col(idCol).as("id"),
          sort_array(transform(array_distinct(col(setCol)), t => xxhash64(t))).as("s"))
        .withColumn("sz", size(col("s")))
        .repartition(par)
        .cut(eager = false)

    def jaccardPairsAggForm(d: DataFrame, idCol: String, setCol: String,
                            threshold: Double): DataFrame = {
      val eps = 1e-9
      val sets = encodedSets(d, idCol, setCol)
      val posting = sets.select(col("id"), col("sz"), explode(col("s")).as("h"))
      val prefixLen = col("sz") - ceil(lit(threshold) * col("sz") - eps) + 1
      val prefixes = DedupOps.rarestPrefixesAgg(posting, prefixLen)
      val alpha = ceil(lit(threshold / (1 + threshold)) *
        (col("l.sz") + col("r.sz")) - eps)
      val positionOk =
        (lit(1) + least(col("l.sz") - col("l.rn"), col("r.sz") - col("r.rn"))) >= alpha
      val lengthOk = least(col("l.sz"), col("r.sz")).cast("double") >=
        greatest(col("l.sz"), col("r.sz")) * threshold
      val candidates = prefixes.as("l").join(prefixes.as("r"),
          col("l.h") === col("r.h") && col("l.id") < col("r.id") &&
            lengthOk && positionOk)
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
        .distinct()
      candidates
        .join(sets.select(col("id").as("id_a"), col("s").as("s_a"),
          col("sz").as("sz_a")), "id_a")
        .join(sets.select(col("id").as("id_b"), col("s").as("s_b"),
          col("sz").as("sz_b")), "id_b")
        .withColumn("common",
          graft.functions.SortedLongOverlapCount(col("s_a"), col("s_b")).cast("double"))
        .withColumn("raw", col("common") / (col("sz_a") + col("sz_b") - col("common")))
        .filter(col("raw") >= threshold)
        .select(col("id_a"), col("id_b"),
          (floor((col("raw")) * 1e6 + 0.5) / 1e6).as("jaccard"))
    }

    def ppjoinAgg: DataFrame = {
      val withShingles = docs
        .select($"doc_id", TextOps.shingles($"text", 2).as("shingles"))
      jaccardPairsAggForm(withShingles, "doc_id", "shingles", 0.9)
        .orderBy($"id_a", $"id_b")
    }

    // training corpus, identical except the agg-form PPJoin stage
    def trainingCorpusAgg: DataFrame = {
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
      val pairs = jaccardPairsAggForm(sh, "doc_id", "sh", 0.9)
      val nonReps = DedupOps.connectedComponents(pairs, "id_a", "id_b")
        .filter($"id" =!= $"label").select($"id".as("doc_id"))
      val survivors = exactKept.join(nonReps, Seq("doc_id"), "left_anti")
      SamplingOps.trainValTestSplit(survivors, "doc_id")
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
        .orderBy($"lang", $"split")
    }

    // ---- PQ reconstruction legs: kernel vs HOF decode, over the real
    // codebooks and corpus of the gates ----
    import graft.operators.VectorOps
    def emb = graft.core.Tables(spark, sfDir).embeddings
    lazy val pqCbs = VectorOps.pqTrainCodebooks(emb, "embedding", 16, 16)
    def pqReconLeg(useKernel: Boolean): DataFrame = {
      val cbs = pqCbs
      val enc = emb.select($"vec_id",
        VectorOps.pqEncode($"embedding", cbs).as("codes"))
      val qv = emb.filter($"vec_id" < 4).select($"vec_id".as("query_id"),
        VectorOps.toDouble($"embedding").as("qv"))
      val dec = if (useKernel) VectorOps.pqDecode($"codes", cbs)
                else VectorOps.pqDecodeHof($"codes", cbs)
      enc.crossJoin(broadcast(qv))
        .filter($"query_id" =!= $"vec_id")
        .withColumn("dr", graft.functions.SqDist($"qv", dec))
        .groupBy($"query_id")
        .agg(min($"dr").as("mn"), sum($"dr").as("sm"), count(lit(1)).as("n"))
        .orderBy($"query_id")
    }
    lazy val ivfCents = emb.filter($"vec_id" < 8)
    lazy val ivfCbs = VectorOps.pqTrainResidualCodebooks(emb, ivfCents,
      "vec_id", "embedding", "vec_id", "embedding", 16, 16)
    def ivfpqReconLeg(useKernel: Boolean): DataFrame = {
      val cbs = ivfCbs
      val lists = VectorOps.assignWithResidual(emb, ivfCents, "vec_id",
          "embedding", "vec_id", "embedding")
        .select($"vec_id".as("neighbor_id"), $"centroid_id",
          VectorOps.pqEncode($"residual", cbs).as("codes"))
      val cv = ivfCents.select($"vec_id".as("centroid_id"),
        VectorOps.toDouble($"embedding").as("cv"))
      val rv = if (useKernel) VectorOps.pqReconstruct($"cv", $"codes", cbs)
               else zip_with($"cv", VectorOps.pqDecodeHof($"codes", cbs),
                 (a, b) => a + b)
      lists.join(broadcast(cv), "centroid_id")
        .select($"neighbor_id", $"centroid_id", rv.as("rv"))
        .groupBy($"centroid_id")
        .agg(sum(element_at($"rv", 1)).as("s1"), count(lit(1)).as("n"))
        .orderBy($"centroid_id")
    }

    // ---- CC loop with the edges table pre-partitioned AND pre-sorted on
    // the join key BEFORE its checkpoint: Dataset.checkpoint preserves
    // outputPartitioning/outputOrdering into the LogicalRDD, so every
    // round's edges⋈labels join plans NO exchange and NO sort on the
    // edges side (one repartition+sort paid once vs one exchange+sort per
    // round). Labels/aggregate shuffles unchanged; results identical. ----
    def componentsEdgesPartitioned: DataFrame = {
      val d = docs
      val withShingles = d
        .select($"doc_id", TextOps.shingles($"text", 2).as("shingles"))
      val pairs = DedupOps.jaccardPairsAuto(withShingles, "doc_id", "shingles", 0.5)
      val edges = pairs.select($"id_a".as("src"), $"id_b".as("dst"))
        .union(pairs.select($"id_b".as("src"), $"id_a".as("dst")))
        .distinct()
        .repartition(col("dst"))
        .sortWithinPartitions($"dst")
        .cut(eager = false)
      var labels = edges.groupBy($"src".as("id"))
        .agg(least($"src", min($"dst")).as("label"))
        .cut(eager = false)
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 20) {
        val neighborMin = edges.join(labels, $"dst" === $"id")
          .groupBy($"src").agg(min($"label").as("nbr_min"))
        val propagated = labels.join(neighborMin, $"id" === $"src", "left")
          .select($"id", $"label",
            least($"label", coalesce($"nbr_min", $"label")).as("mid_label"))
        val parents = propagated
          .select($"id".as("pid"), $"mid_label".as("parent"))
        val updated = propagated
          .join(parents, $"mid_label" === $"pid", "left")
          .select($"id", $"label",
            least($"mid_label", coalesce($"parent", $"mid_label")).as("new_label"))
          .cut(eager = false)
        changed = updated.filter($"new_label" < $"label").count()
        labels = updated.select($"id", $"new_label".as("label"))
        iter += 1
      }
      require(changed == 0, "partitioned-edges CC did not converge")
      d.select($"doc_id")
        .join(labels, $"doc_id" === $"id", "left")
        .select($"doc_id", coalesce($"label", $"doc_id").as("rep"))
        .orderBy($"doc_id")
    }

    // ---- CC round with the neighbor-min and own-label fused into ONE
    // union + tagged aggregate: the r14 round plans edges⋈labels →
    // groupBy(src) → labels⋈neighborMin (3 shuffle boundaries before the
    // pointer jump); here neighbors' labels and own labels union into a
    // single groupBy(id) carrying min(all) and min(own) — one join and
    // ~2 exchanges fewer per round, same label sequence (min is the same
    // min), same pointer jump, same convergence count. ----
    def ccUnionAgg(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
      val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
        .distinct()
        .cut(eager = false)
      var labels = edges.groupBy(col("src").as("id"))
        .agg(least(col("src"), min(col("dst"))).as("label"))
        .cut(eager = false)
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 20) {
        val fromNbrs = edges.join(labels, col("dst") === col("id"))
          .select(col("src").as("id"), col("label"), lit(false).as("own"))
        val self = labels.select(col("id"), col("label"), lit(true).as("own"))
        val propagated = fromNbrs.unionByName(self)
          .groupBy(col("id"))
          .agg(min(col("label")).as("mid_label"),
            min(when(col("own"), col("label"))).as("label"))
        val parents = propagated
          .select(col("id").as("pid"), col("mid_label").as("parent"))
        val updated = propagated
          .join(parents, col("mid_label") === col("pid"), "left")
          .select(col("id"), col("label"),
            least(col("mid_label"), coalesce(col("parent"), col("mid_label")))
              .as("new_label"))
          .cut(eager = false)
        changed = updated.filter(col("new_label") < col("label")).count()
        labels = updated.select(col("id"), col("new_label").as("label"))
        iter += 1
      }
      require(changed == 0, "union-agg CC did not converge")
      labels
    }

    def componentsUnionAgg: DataFrame = {
      val d = docs
      val withShingles = d
        .select($"doc_id", TextOps.shingles($"text", 2).as("shingles"))
      val pairs = DedupOps.jaccardPairsAuto(withShingles, "doc_id", "shingles", 0.5)
      val comps = ccUnionAgg(pairs, "id_a", "id_b")
      d.select($"doc_id")
        .join(comps, $"doc_id" === $"id", "left")
        .select($"doc_id", coalesce($"label", $"doc_id").as("rep"))
        .orderBy($"doc_id")
    }

    def semdedupUnionAgg: DataFrame = {
      import graft.operators.VectorOps
      val e = graft.core.Tables(spark, sfDir).embeddings
      val pairs = VectorOps.semdedupPairs(e, e.filter($"vec_id" < 8),
        "vec_id", "embedding", "vec_id", "embedding", 0.4)
      val comps = ccUnionAgg(pairs, "id_a", "id_b")
        .withColumnRenamed("label", "rep")
      e.join(comps, $"vec_id" === $"id", "left")
        .withColumn("survivor", coalesce($"rep", $"vec_id") === $"vec_id")
        .groupBy($"label")
        .agg(count(lit(1)).as("n_vectors"),
          sum(when($"survivor", 1L).otherwise(0L)).as("n_survivors"))
        .orderBy($"label")
    }

    // ---- stored index: batched (registry) vs sequential two-write ----
    def minhashDeltaStoredSequential: DataFrame = {
      val withShingles = docs
        .select($"doc_id", TextOps.shingles($"text", 2).as("shingles"))
        .select($"doc_id", array_distinct($"shingles").as("shingles"))
        .cut(eager = false)
      val signed = DedupOps.minhashSignatures(withShingles, "doc_id",
          "shingles", 16)
        .withColumnRenamed("id", "doc_id")
        .cut(eager = false)
      val idx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_banded_index_seq_ab",
        Integer.toHexString(sfDir.hashCode)).toString
      DedupOps.writeBandedIndex(signed.filter($"doc_id" % 3 === 1),
        "doc_id", "sig", 4, 4, idx)
      DedupOps.writeBandedIndex(signed.filter($"doc_id" % 3 === 2),
        "doc_id", "sig", 4, 4, idx, append = true)
      val cands = DedupOps.lshProbeCandidatesStored(spark, idx,
        signed.filter($"doc_id" % 3 === 0), "doc_id", "sig", 4, 4)
      val sets = withShingles.select($"doc_id".as("id"), $"shingles".as("ss"))
      cands
        .join(sets.withColumnRenamed("id", "batch_id")
          .withColumnRenamed("ss", "s_a"), "batch_id")
        .join(sets.withColumnRenamed("id", "hist_id")
          .withColumnRenamed("ss", "s_b"), "hist_id")
        .withColumn("raw", size(array_intersect($"s_a", $"s_b")).cast("double") /
          size(array_union($"s_a", $"s_b")))
        .filter($"raw" >= 0.8)
        .select($"batch_id", $"hist_id", (floor(($"raw") * 1e6 + 0.5) / 1e6).as("jaccard"))
        .orderBy($"batch_id", $"hist_id")
    }

    // ---- dispatch probe: full count() vs the r15 bounded
    // limit(cutoff+1).count() — both pick the SAME branch; this measures
    // the probe's own local cost (at 100 TB the bounded form is O(cutoff)
    // instead of a full corpus scan, the point of the change) ----
    def componentsFullCountDispatch: DataFrame = {
      val d = docs
      val withShingles = d
        .select($"doc_id", TextOps.shingles($"text", 2).as("shingles"))
      val n = withShingles.select($"doc_id").count()
      val pairs =
        if (n < spark.conf.get("spark.graft.dedup.denseCutoff", "10000").toLong)
          DedupOps.jaccardPairsDense(withShingles, "doc_id", "shingles", 0.5)
        else DedupOps.jaccardPairs(withShingles, "doc_id", "shingles", 0.5, nDocs = n)
      val comps = DedupOps.connectedComponents(pairs, "id_a", "id_b")
      d.select($"doc_id")
        .join(comps, $"doc_id" === $"id", "left")
        .select($"doc_id", coalesce($"label", $"doc_id").as("rep"))
        .orderBy($"doc_id")
    }

    // ---- basket lift challenger, REFUTED: collect_set + double-explode
    // pair generation (one groupBy(o) exchange, pairs map-side; 2 fewer
    // Exchanges / 6 fewer Sorts in the plan) loses to the registry's
    // order-local self-join — 0.81× at sf0.1 (5 passes), indeterminate
    // at sf1 across three contended runs. ObjectHashAggregate's
    // interpreted collect path costs more than the codegen'd SMJ it
    // removes (the bounded-heap refutation's lesson, again). ----
    def basketCollectPairs: DataFrame = {
      val tt = graft.core.Tables(spark, sfDir)
      val items = tt.lineitem
        .join(tt.part, $"l_partkey" === $"p_partkey")
        .select($"l_orderkey".as("o"), $"p_brand".as("b")).distinct()
        .cut(eager = false)
      val nBaskets = items.select($"o").distinct()
        .agg(count(lit(1)).as("n"))
      val c1 = items.groupBy($"b").agg(count(lit(1)).as("c1"))
      val pairs = items.groupBy($"o").agg(collect_set($"b").as("bs"))
        .select(explode($"bs").as("ba"), $"bs")
        .select($"ba", explode($"bs").as("bb"))
        .filter($"ba" < $"bb")
        .groupBy($"ba", $"bb")
        .agg(count(lit(1)).as("c12"))
        .filter($"c12" >= 50)
      pairs
        .join(c1.select($"b".as("ba"), $"c1".as("c1a")), "ba")
        .join(c1.select($"b".as("bb"), $"c1".as("c1b")), "bb")
        .crossJoin(broadcast(nBaskets))
        .select($"ba", $"bb", $"c12",
          (floor(($"c12".cast("double") / $"n") * 1e6 + 0.5) / 1e6).as("support"),
          (floor(($"c12".cast("double") / $"c1a") * 1e6 + 0.5) / 1e6).as("confidence"),
          (floor(($"c12".cast("double") * $"n" / ($"c1a" * $"c1b")) * 1e6 + 0.5) / 1e6)
            .as("lift"))
        .orderBy($"lift".desc, $"ba", $"bb")
        .limit(15)
    }

    // ---- encode parallelism: encodedSets repartitions AFTER its heavy
    // projection (shingles + array_distinct + xxhash64 + sort per doc),
    // so on a single-split input the whole encode runs in ONE task and
    // only the already-encoded rows fan out. Challenger moves the
    // round-robin fan-out BEFORE the projection (the order
    // invertedIndexPairs already uses), so the encode itself spreads
    // across all cores; the exchange then carries raw text instead of
    // encoded arrays (comparable bytes). ----
    def ngramJaccardRepartFirst: DataFrame = {
      val withShingles = docs
        .select($"doc_id", TextOps.shingles($"text", 2).as("shingles"))
      val sets = withShingles
        .repartition(par)
        .select($"doc_id".as("id"),
          sort_array(transform(array_distinct($"shingles"), t => xxhash64(t))).as("s"))
        .withColumn("sz", size($"s"))
        .cut(eager = false)
      val threshold = 0.5
      val lengthOk = least($"a.sz", $"b.sz").cast("double") >=
        greatest($"a.sz", $"b.sz") * threshold
      sets.as("a").join(sets.as("b"), $"a.id" < $"b.id" && lengthOk)
        .select($"a.id".as("id_a"), $"b.id".as("id_b"),
          graft.functions.SortedLongOverlapCount($"a.s", $"b.s").as("common"),
          ($"a.sz" + $"b.sz").as("szsum"))
        .filter(graft.functions.OptimizerBarrier(
          $"common".cast("double") / ($"szsum" - $"common") >= threshold))
        .select($"id_a", $"id_b", (floor(($"common".cast("double") /
          ($"szsum" - $"common")) * 1e6 + 0.5) / 1e6).as("jaccard"))
        .repartition(par)
        .orderBy($"id_a", $"id_b")
    }

    // raw-docs fan-out: repartition the (doc_id, text) rows BEFORE the
    // shingles projection, so shingling AND the md5 sketch both run
    // parallel and the exchange carries ~3 KB text rows instead of fat
    // shingle-string arrays
    def bottomkRepartRaw: DataFrame = {
      val sets = docs
        .repartition(par)
        .select($"doc_id", TextOps.shingles($"text", 3).as("shingles"))
        .select($"doc_id".as("id"),
          sort_array(array_distinct(
            transform(array_distinct($"shingles"), t => TextOps.hash32(t))))
            .as("hs"))
        .withColumn("sz", size($"hs"))
        .filter($"sz" > 0)
        .cut(eager = false)
      val posting = sets.select($"id", explode($"hs").as("h"))
      val probe = sets.select($"id", $"sz", explode(slice($"hs", 1, 16)).as("h"))
      val directed = probe.as("p")
        .join(posting.as("q"), $"p.h" === $"q.h" && $"p.id" =!= $"q.id")
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

    // the superseded order for the bottom-k containment sketch build
    // (repartition AFTER the md5 sketch projection — single-task encode
    // on a single-split input); the registry adopted repartition-first
    // on this case's 1.11–1.13× evidence
    def bottomkRepartLast: DataFrame = {
      val sets = docs
        .select($"doc_id", TextOps.shingles($"text", 3).as("shingles"))
        .select($"doc_id".as("id"),
          sort_array(array_distinct(
            transform(array_distinct($"shingles"), t => TextOps.hash32(t))))
            .as("hs"))
        .withColumn("sz", size($"hs"))
        .filter($"sz" > 0)
        .repartition(par)
        .cut(eager = false)
      val posting = sets.select($"id", explode($"hs").as("h"))
      val probe = sets.select($"id", $"sz", explode(slice($"hs", 1, 16)).as("h"))
      val directed = probe.as("p")
        .join(posting.as("q"), $"p.h" === $"q.h" && $"p.id" =!= $"q.id")
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

    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("ppjoin_prefix_agg",
        () => ppjoinAgg, () => registry("dedup_ppjoin_jaccard")),
      ("training_corpus_prefix_agg",
        () => trainingCorpusAgg, () => registry("pipeline_training_corpus")),
      ("pq_recon_kernel",
        () => pqReconLeg(true), () => pqReconLeg(false)),
      ("ivfpq_recon_kernel",
        () => ivfpqReconLeg(true), () => ivfpqReconLeg(false)),
      ("stored_batched_writes",
        () => registry("dedup_minhash_delta_stored"),
        () => minhashDeltaStoredSequential),
      ("cc_edges_partitioned",
        () => componentsEdgesPartitioned, () => registry("dedup_components")),
      ("cc_union_agg",
        () => componentsUnionAgg, () => registry("dedup_components")),
      ("semdedup_union_agg",
        () => semdedupUnionAgg, () => registry("pipeline_semdedup_embeddings")),
      ("bounded_dispatch",
        () => registry("dedup_components"), () => componentsFullCountDispatch),
      // order-flipped twin of bounded_dispatch: the query is ~70% CC loop
      // whose run-to-run spread this session is 2.0-3.6 s, so a 1 s gap
      // with identical job counts smells like position, not plan — the
      // flip separates the two (the isolated probe pins the probe-form
      // delta itself at ~8 ms)
      ("bounded_dispatch_flip",
        () => componentsFullCountDispatch, () => registry("dedup_components")),
      ("basket_collect_pairs",
        () => basketCollectPairs, () => registry("stats_basket_lift")),
      ("encode_repart_first",
        () => ngramJaccardRepartFirst, () => registry("dedup_ngram_jaccard")),
      ("bottomk_repart_first",
        () => registry("dedup_containment_bottomk"), () => bottomkRepartLast),
      ("bottomk_repart_raw",
        () => bottomkRepartRaw, () => bottomkRepartLast),
      ("bottomk_repart_raw_vs_reg",
        () => bottomkRepartRaw, () => registry("dedup_containment_bottomk")))
      .filter { case (n, _, _) => only.isEmpty || only(n) }

    // warmup: JVM + codegen on the first case's both forms
    run(cases.head._2()); run(cases.head._3())
    val out = cases.map { case (name, challenger, incumbent) =>
      val (tCh, jCh) = run(challenger())
      val (tInc, jInc) = run(incumbent())
      val mismatch = challenger().exceptAll(incumbent()).count() +
        incumbent().exceptAll(challenger()).count()
      require(mismatch == 0, s"$name A/B forms disagree on $mismatch rows")
      println(f"$name%-28s challenger=$tCh%.3f (jobs=$jCh) incumbent=$tInc%.3f (jobs=$jInc)  (${tInc / tCh}%.2fx win if >1)")
      s""""$name":{"challenger_sec":$tCh,"challenger_jobs":$jCh,"incumbent_sec":$tInc,"incumbent_jobs":$jInc}"""
    }
    println(s"""{"metric":"opt15_ab","sf":"$sfDir","passes":$passes,${out.mkString(",")},"forms_identical":true}""")
    spark.stop()
  }
}
