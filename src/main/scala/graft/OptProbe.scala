package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the round-14 optimization targets: times
  * each hot query's internal stages separately (noop sink, min-of-N) so
  * the optimization effort lands where the seconds actually are (guide
  * §1.1 — empirical loop). Read-only: no registry form is changed here.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.OptProbe [passes]"`.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-opt-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(df: => DataFrame): Unit = {
      val t = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        // NOTE: no unpersist here — probes share hoisted lineage cuts
        // across time() calls, unlike Bench where each query is closed
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[probe] $name%-46s $t%7.3f s")
    }

    import graft.operators.{DedupOps, TextOps, VectorOps, HygieneOps}
    import graft.core.Lineage.LineageOps
    def docs = graft.core.Tables(spark, sfDir).documents
    def emb = graft.core.Tables(spark, sfDir).embeddings

    // ---- sim_pq family ------------------------------------------------
    val tFit0 = System.nanoTime()
    val cbs = VectorOps.pqTrainCodebooks(emb, "embedding", m = 16, k = 16)
    println(f"[probe] pq_codebook_fit_16x16                        ${(System.nanoTime() - tFit0) / 1e9}%7.3f s")
    time("pq_encode_corpus") {
      emb.select($"vec_id", VectorOps.pqEncode($"embedding", cbs).as("codes"))
    }
    time("pq_adc_topk_full(memoized fit)") {
      VectorOps.pqAdcTopK(emb.filter($"vec_id" < 5), emb, "vec_id",
          "embedding", cbs, 10)
        .withColumn("adc2", (floor(($"adc2") * 1e6 + 0.5) / 1e6))
        .orderBy($"query_id", $"rank")
    }

    // ---- dedup_minhash_delta_stored ------------------------------------
    val withShingles = docs
      .select($"doc_id", TextOps.shingles($"text", 2).as("shingles"))
      .select($"doc_id", array_distinct($"shingles").as("shingles"))
      .cut(eager = false)
    val signed = DedupOps.minhashSignatures(withShingles, "doc_id",
        "shingles", 16)
      .withColumnRenamed("id", "doc_id")
      .cut(eager = false)
    time("mds_signatures")(signed)
    val idx = java.nio.file.Files.createTempDirectory("probe_idx").toString
    val tW0 = System.nanoTime()
    DedupOps.writeBandedIndex(signed.filter($"doc_id" % 3 === 1),
      "doc_id", "sig", 4, 4, idx)
    val tW1 = System.nanoTime()
    DedupOps.writeBandedIndex(signed.filter($"doc_id" % 3 === 2),
      "doc_id", "sig", 4, 4, idx, append = true)
    val tW2 = System.nanoTime()
    println(f"[probe] mds_write_index_initial                      ${(tW1 - tW0) / 1e9}%7.3f s")
    println(f"[probe] mds_write_index_append                       ${(tW2 - tW1) / 1e9}%7.3f s")
    time("mds_probe_candidates") {
      DedupOps.lshProbeCandidatesStored(spark, idx,
        signed.filter($"doc_id" % 3 === 0), "doc_id", "sig", 4, 4)
    }
    time("mds_probe_plus_verify") {
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

    // ---- dedup_excise_spans --------------------------------------------
    val wins = docs
      .select($"doc_id".as("id"), posexplode(TextOps.shingles($"text", 8)))
      .select($"id", $"pos".as("start"), $"col".as("win"))
      .cut(eager = false)
    time("excise_wins_materialize")(wins)
    time("excise_keepers_agg") {
      wins.groupBy($"win").agg(min(struct($"id", $"start")).as("keeper"))
    }
    time("excise_covered") {
      val keepers = wins.groupBy($"win").agg(min(struct($"id", $"start")).as("keeper"))
      wins.join(keepers, "win")
        .filter(struct($"id", $"start") =!= $"keeper")
        .select($"id", explode(sequence($"start", $"start" + lit(7))).as("pos"))
        .distinct()
    }
    time("excise_full") {
      HygieneOps.exciseDuplicateSpans(docs, "doc_id", "text", 8)
        .orderBy($"doc_id")
    }

    // ---- pipeline_training_corpus ---------------------------------------
    val d = docs
    val gophered = HygieneOps.gopherRules(d, "doc_id", "text")
      .filter($"passes").select($"doc_id")
    time("ptc_gates")(gophered)
    val train = d.join(gophered, "doc_id").filter($"doc_id" % 50 =!= 0)
    val benchmark = d.filter($"doc_id" % 50 === 0)
    time("ptc_contamination") {
      HygieneOps.contaminationHits(train, benchmark, "doc_id", "text", 3,
        minHits = 5L).select($"doc_id").distinct()
    }
    val contaminated = HygieneOps
      .contaminationHits(train, benchmark, "doc_id", "text", 3, minHits = 5L)
      .select($"doc_id").distinct()
    val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
    val exactKept = clean
      .withColumn("keep", min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5($"text"))))
      .filter($"doc_id" === $"keep").drop("keep")
      .cut(eager = false)
    time("ptc_exact_kept")(exactKept)
    val sh = exactKept.select($"doc_id", TextOps.shingles($"text", 2).as("sh"))
    time("ptc_pairs_ppjoin") {
      DedupOps.jaccardPairs(sh, "doc_id", "sh", 0.9)
    }
    time("ptc_pairs_plus_cc") {
      DedupOps.connectedComponents(
        DedupOps.jaccardPairs(sh, "doc_id", "sh", 0.9), "id_a", "id_b")
    }
    time("ptc_full")(SparkEntry.queries("pipeline_training_corpus")(spark, sfDir))

    // ---- pipeline_semdedup_embeddings ------------------------------------
    time("semdedup_full")(SparkEntry.queries("pipeline_semdedup_embeddings")(spark, sfDir))

    spark.stop()
  }
}
