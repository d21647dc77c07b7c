package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Corpus-hygiene operators for LLM training-data pipelines:
  * benchmark decontamination (shared-n-gram detection, the GPT-3-style
  * 13-gram rule generalized to any n) and Gopher-style repetition /
  * quality gates (Rae et al. 2021 §A1.1: doc length, mean word length,
  * duplicate-n-gram fraction, top-token dominance).
  *
  * Scale posture: decontamination is an equi-join on the shingle with the
  * (tiny) benchmark side broadcast — never a pair scan; the quality gates
  * are per-row column expressions plus two hash aggregates (top-token),
  * all scan-local.
  *
  * Fixed-point ratio outputs round via the deterministic floor form
  * `floor(x·10ⁿ + 0.5) / 10ⁿ` (half toward +∞ — differs from HALF_UP on
  * negative ties; all ratios here are non-negative). See TextOps.
  */
object HygieneOps {

  /** Benchmark decontamination: one row per (train doc, benchmark doc)
    * pair sharing ≥ `minHits` distinct word n-grams, with the shared
    * count. Self-contamination rows (same id on both sides) are dropped so
    * the benchmark may be a subset of the corpus itself. */
  def contaminationHits(train: DataFrame, benchmark: DataFrame,
                        idCol: String, textCol: String, n: Int,
                        minHits: Long = 1L): DataFrame = {
    def posting(df: DataFrame, out: String) =
      df.select(col(idCol).as(out),
        explode(array_distinct(TextOps.shingles(col(textCol), n))).as("sh"))
    // repartition the (big) train side before the interpreted shingle HOF:
    // a single parquet split would run the whole posting build one-threaded
    posting(train
        .repartition(train.sparkSession.sparkContext.defaultParallelism),
        "doc_id")
      .join(broadcast(posting(benchmark, "bench_id")), "sh")
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Span-level decontamination (the Dolma/RefinedWeb EXCISION shape):
    * instead of dropping a contaminated document wholesale
    * ([[contaminationHits]] + filter), remove ONLY the token windows that
    * reproduce a benchmark n-gram and reassemble the rest — the policy
    * real curation pipelines prefer when a long document quotes one
    * benchmark item. A token is excised iff ANY matching n-window covers
    * it (overlapping hits merge naturally through the position set).
    * Returns every train doc: (doc_id, clean_text, n_tokens, n_removed);
    * fully-excised docs come back with empty text, not dropped — the
    * keep-or-drop policy composes downstream.
    *
    * Scale: benchmark n-grams broadcast (tiny vs the corpus, the same
    * 100 TB shape as [[contaminationHits]]); windows and covered
    * positions are scan-local explodes over the scan+broadcast join.
    * UNTOUCHED documents (the overwhelming majority of a real corpus)
    * never explode into tokens or shuffle — they pass through with their
    * text verbatim after one anti-join on the tiny hit-id set; only
    * contaminated docs pay the (id, pos) anti-join and the reassembly
    * aggregate, so the token-level shuffle is ∝ contaminated tokens,
    * not corpus tokens. Never a pair join. */
  def exciseContaminatedSpans(train: DataFrame, benchmark: DataFrame,
                              idCol: String, textCol: String,
                              n: Int): DataFrame = {
    val benchGrams = benchmark.select(
      explode(array_distinct(TextOps.shingles(col(textCol), n))).as("sh"))
      .distinct()
    val wins = train
      .select(col(idCol).as("id"), posexplode(TextOps.shingles(col(textCol), n)))
      .select(col("id"), col("pos").as("start"), col("col").as("sh"))
    val covered = wins.join(broadcast(benchGrams), "sh")
      .select(col("id"),
        explode(sequence(col("start"), col("start") + lit(n - 1))).as("pos"))
      .distinct()
    exciseCovered(train, idCol, textCol, covered)
  }

  /** Corpus-internal duplicate-SPAN excision (the ExactSubstr dedup of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", as a relational plan): every k-token window occurring ≥ 2
    * times ANYWHERE in the corpus keeps its FIRST occurrence (min
    * (doc_id, start) — the deterministic cross-engine tiebreak) and has
    * every other occurrence's positions excised; overlapping duplicated
    * windows merge through the covered-position set, so a long repeated
    * passage is cut once as a span, not window-by-window. Completes the
    * substring family: [[graft.operators.DedupOps.substringDupProfile]]
    * MEASURES duplication, this REMOVES it.
    *
    * Scale: one hash aggregate on the window (min-struct keeper — no
    * corpus-wide window sort), join-back on the same key (AQE reuses the
    * partitioning), then the same touched-docs-only reassembly as
    * [[exciseContaminatedSpans]] — linear, never a pair join. At 100 TB
    * group on xxhash64(win) to cut shuffle bytes; the text key is kept
    * so the DuckDB twin pins the arithmetic (collision-free). */
  def exciseDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                           k: Int): DataFrame = {
    import graft.core.Lineage.LineageOps
    // lazily cut: the posting feeds the keeper aggregate AND the
    // join-back — the (interpreted) shingle build runs once, not twice
    val wins = docs
      .select(col(idCol).as("id"), posexplode(TextOps.shingles(col(textCol), k)))
      .select(col("id"), col("pos").as("start"), col("col").as("win"))
      .cut(eager = false)
    val keepers = wins.groupBy(col("win"))
      .agg(min(struct(col("id"), col("start"))).as("keeper"))
    val covered = wins.join(keepers, "win")
      .filter(struct(col("id"), col("start")) =!= col("keeper"))
      .select(col("id"),
        explode(sequence(col("start"), col("start") + lit(k - 1))).as("pos"))
      .distinct()
    exciseCovered(docs, idCol, textCol, covered)
  }

  /** Shared excision core: given the (id, pos) covered-position set,
    * return every doc as (doc_id, clean_text, n_tokens, n_removed).
    * Untouched docs (no covered positions) pass through scan-local with
    * their text verbatim after one anti-join on the tiny hit-id set;
    * only touched docs explode into tokens and pay the (id, pos)
    * anti-join + ordered reassembly aggregate. */
  private def exciseCovered(docs: DataFrame, idCol: String, textCol: String,
                            coveredPositions: DataFrame): DataFrame = {
    import graft.core.Lineage.LineageOps
    // lazily cut: covered feeds the hit-id split AND the position anti-join
    val covered = coveredPositions.cut(eager = false)
    // reserved join-key name: a caller passing idCol = "id" would make
    // col(idCol) === col("id") ambiguous at analysis time
    val hitIds = covered.select(col("id").as("__hit_id")).distinct()
    val untouched = docs.join(hitIds, col(idCol) === col("__hit_id"), "left_anti")
      .select(col(idCol).as("doc_id"), col(textCol).as("clean_text"),
        TextOps.tokenCount(col(textCol)).cast("int").as("n_tokens"),
        lit(0).as("n_removed"))
    val touchedDocs = docs.join(hitIds, col(idCol) === col("__hit_id"), "left_semi")
    val toks = touchedDocs
      .select(col(idCol).as("id"), posexplode(TextOps.tokens(col(textCol))))
      .select(col("id"), col("pos"), col("col").as("tok"))
    val reassembled = toks.join(covered, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            _.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
      .withColumnRenamed("id", "doc_id")
    val touched = touchedDocs.select(col(idCol).as("doc_id"),
        TextOps.tokenCount(col(textCol)).as("n_tokens"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens").cast("int").as("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .cast("int").as("n_removed"))
    untouched.unionByName(touched)
  }

  /** Duplicate-n-gram fraction: 1 − distinct/total word n-grams — the
    * Gopher repetition signal. Documents shorter than n tokens score 0.
    * The shingle HOF (interpreted — CodegenFallback) appears exactly ONCE
    * in the expression tree: the total count and the guard come from the
    * token count instead (total n-grams = tokens − n + 1). */
  def repetitionRatio(text: Column, n: Int): Column = {
    val total = TextOps.tokenCount(text) - (n - 1)
    when(total <= 0, lit(0.0)).otherwise(
      (floor((lit(1.0) - size(array_distinct(TextOps.shingles(text, n)))
        .cast("double") / total) * 1e6 + 0.5) / 1e6))
  }

  /** Top-token dominance: most frequent token's share of all tokens.
    * Relational form (explode → two hash aggregates), not a per-row HOF:
    * stays in whole-stage codegen and scales scan-local. */
  def topTokenRatio(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg((floor((max(col("n")).cast("double") / sum(col("n"))) * 1e6 + 0.5) / 1e6)
        .as("top_token_ratio"))

  /** Gopher-style quality gate: per-doc metrics plus the conjunction
    * verdict. Thresholds are fixed (documented in the query oracle) —
    * tuned so the synthetic corpus splits meaningfully. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // fan a single input split across every core before the per-row work
    val d = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    // LEFT join + coalesce(passes → false): a NULL-text doc (e.g. a
    // corrupt record) has no explode rows, so an inner join would make the
    // garbage rows INVISIBLE to the gate instead of failing them
    d.select(col(idCol),
        TextOps.tokenCount(col(textCol)).as("n_tokens"),
        TextOps.meanTokenLength(col(textCol)).as("mean_token_len"),
        repetitionRatio(col(textCol), 2).as("rep_2gram"))
      .join(topTokenRatio(d, idCol, textCol), Seq(idCol), "left")
      .withColumn("passes", coalesce(
        col("n_tokens").between(20, 1000) &&
          col("mean_token_len").between(3.0, 10.0) &&
          col("rep_2gram") <= 0.05 &&
          col("top_token_ratio") <= 0.12, lit(false)))
  }

  /** Semantic (embedding-space) decontamination: for every corpus vector,
    * the max cosine against ANY benchmark vector — flagging rows whose
    * nearest benchmark similarity clears `threshold`. The semantic
    * complement to [[contaminationHits]]: catches paraphrased benchmark
    * leakage that shares no shingles.
    *
    * Scale posture: the benchmark set is small by nature (eval suites) —
    * broadcast; scoring is |corpus| × |benchmark| scan-local cosines that
    * partial-aggregate (max per id) map-side before the one shuffle on the
    * corpus id. Cosines are 6dp-prerounded before max so the flag
    * boundary is engine-stable. */
  def semanticContamination(corpus: DataFrame, benchmark: DataFrame,
                            idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
        VectorOps.toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
    val b = benchmark.select(VectorOps.toDouble(col(vecCol)).as("bv"))
      .withColumn("bnrm", VectorOps.norm(col("bv")))
    c.crossJoin(broadcast(b))
      .withColumn("cos", (floor((
        VectorOps.cosinePrenormed(col("v"), col("bv"), col("nrm"), col("bnrm"))) * 1e6 + 0.5) / 1e6))
      .groupBy(col("id"))
      .agg(max(col("cos")).as("max_cos"))
      .withColumn("contaminated", col("max_cos") >= threshold)
  }
}
