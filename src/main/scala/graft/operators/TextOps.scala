package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Text-analysis operator library (SURVEY §2E): token counting,
  * quality scoring, language ID, fingerprinting — over `documents.text`.
  *
  * Scale posture: every op here is a pure column expression (whole-stage
  * codegen, zero UDFs, zero shuffles) — at 100 TB these run scan-local at
  * parquet-read speed. Hashing is portable-by-construction: the 32-bit
  * integer hash of a string is the first 8 hex digits of its md5, so the
  * DuckDB oracle can compute bit-identical values.
  *
  * Rounding semantics (deliberate, engine-portable): every fixed-point
  * output here (stopwordRatio, punctRatio, meanTokenLength, qualityScore)
  * rounds via the floor form `floor(x·10ⁿ + 0.5) / 10ⁿ` — IEEE ops on
  * identical inputs, bit-deterministic on any engine. The form rounds
  * half-cases toward +∞ (a negative tie like −0.5 rounds to 0, not −1),
  * which differs from `round()`'s HALF_UP (away-from-zero) on negative
  * ties and from shortest-decimal ties on binary halves. All values here
  * are non-negative ratios, so only the binary-half behavior applies.
  */
object TextOps {

  /** Whitespace tokenizer (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** BPE-ish sub-word token count: runs of letters, runs of digits, and
    * single other non-space chars each count as one token. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Portable 32-bit string hash: first 8 md5 hex digits as unsigned int.
    * DuckDB twin: `('0x' || substr(md5(s),1,8))::BIGINT`. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Stopword list shared with the oracle side (subset of the synthetic
    * vocabulary playing the role of function words). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Ratio of stopword tokens to all tokens. Codegen'd set-membership
    * count (graft.functions.StringSetCount) — the HOF form
    * `size(filter(toks, isin))` runs interpreted and re-splits the text
    * per element. */
  def stopwordRatio(text: Column): Column =
    (floor((graft.functions.StringSetCount(tokens(text), stopwords)
      .cast("double") / size(tokens(text))) * 1e6 + 0.5) / 1e6)

  /** Ratio of non-alphanumeric, non-space chars to total length. */
  def punctRatio(text: Column): Column =
    (floor((length(regexp_replace(text, "[a-zA-Z0-9 ]", ""))
      .cast("double") / length(text)) * 1e6 + 0.5) / 1e6)

  /** Mean token length — a crude fluency signal. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    (floor(((length(text) - size(toks) + 1).cast("double") / size(toks)) * 1e6 + 0.5) / 1e6)
  }

  /** Composite quality score in [0,1]: long enough, low punctuation,
    * sane stopword density. Weights are arbitrary but fixed; the oracle
    * twin recomputes the same formula. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    (floor((lenScore * 0.5 + punctPenalty * 0.3 + stopScore * 0.2) * 1e6 + 0.5) / 1e6)
  }

  /** Per-language marker tokens for the n-gram-ish language heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "und", "das"),
    "es" -> Seq("el", "la", "que"),
    "fr" -> Seq("le", "et", "les"),
    "zh" -> Seq("de5", "shi4", "le5"))

  /** Heuristic language ID: argmax of marker-token hit counts, ties and
    * zero-hits fall back to "und"→first maximal in declaration order. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> graft.functions.StringSetCount(toks, markers)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, "und")) { case (acc, (lang, s)) =>
      acc.when(s === best, lang)
    }.otherwise("und")
  }

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * token bag — identical docs (up to word order/duplication) collide. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Order-sensitive rolling fingerprint: left-fold polynomial hash
    * `acc = (acc*31 + hash32(token)) mod 1e9+7` — mod keeps the fold in
    * 64-bit range under ANSI arithmetic on both engines. */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * 31 + hash32(t)) % 1000000007L)

  /** TF-IDF over a tokenized corpus: returns one row per (docId, token)
    * with tf (term count / doc length), df, and tf·idf where
    * idf = ln((N+1)/(df+1)) (smoothed). Two shuffles: token stats per doc,
    * document frequency per token — both plain hash aggregates. N is a
    * one-row aggregate broadcast-cross-joined like BM25's corpus stats —
    * no driver count, the whole thing stays one plan. */
  def tfIdf(docs: org.apache.spark.sql.DataFrame, idCol: String,
            textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), size(col("toks")).as("doc_len"),
        explode(col("toks")).as("token"))
    val tf = toks.groupBy("id", "doc_len", "token")
      .agg(count(lit(1)).as("term_count"))
      .withColumn("tf", col("term_count").cast("double") / col("doc_len"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val corpusN = docs.agg(count(lit(1)).as("__n"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(corpusN))
      .withColumn("idf", log((col("__n") + 1.0) / (col("df") + 1.0)))
      .withColumn("tf_idf", col("tf") * col("idf"))
      .select(col("id"), col("token"), col("tf"), col("df"), col("tf_idf"))
  }

  /** Sparse TF-IDF cosine top-k retrieval through the inverted index —
    * the classic ranked-retrieval shape: document similarity search
    * WITHOUT embeddings, complementing the dense ANN family
    * (VectorOps.ivfTopK / rpSignature). For each query document, score
    * every candidate that shares at least one surviving token via a
    * postings equi-join on the token, then keep the top `k` by cosine.
    *
    * Scale posture: the query side is bounded (broadcast into the
    * postings join), so cost is |queries| × postings-touched, never
    * corpus × corpus; `dfCapFrac` drops stop-tokens (df > frac·N) from
    * the weight space — on a real corpus that caps per-token posting
    * lists, which is THE sparse-retrieval scale lever (this fixture's
    * 31-token vocabulary keeps everything at 0.9). Top-k runs as the
    * bounded-heap TopKAggregator (map-side partial heaps, ≤k rows per
    * partition shuffled), not a window sort over all candidates.
    *
    * Cross-engine exactness: weights are 6dp-rounded DECIMAL(18,6), so
    * dot products and squared norms are exact decimal sums (order-
    * independent); the one float step per pair (sqrt, divide, 6dp round)
    * computes on identical inputs in both engines. */
  def sparseCosineTopK(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String,
                       queryIds: org.apache.spark.sql.DataFrame, k: Int,
                       dfCapFrac: Double = 0.9)
      : org.apache.spark.sql.DataFrame = {
    import graft.core.Lineage.LineageOps
    val n = broadcast(docs.agg(count(lit(1)).as("__n")))
    // the weight table feeds THREE consumers (norms agg, postings side,
    // query side) — cut its lineage so the tokenize+tf+df chain runs
    // once, not per consumer; likewise the normed postings table feeds
    // both join sides
    val w = tfIdf(docs, idCol, textCol)
      .crossJoin(n)
      .filter(col("df") <= lit(dfCapFrac) * col("__n"))
      .select(col("id"), col("token"),
        (floor((col("tf_idf")) * 1e6 + 0.5) / 1e6).cast("decimal(18,6)").as("w"))
      .cut(eager = false)
    val norms = w.groupBy(col("id"))
      .agg(sqrt(sum(col("w") * col("w")).cast("double")).as("nrm"))
    val wn = w.join(norms, "id").cut(eager = false)
    val q = wn.join(
        queryIds.toDF("id").select(col("id")), Seq("id"), "left_semi")
      .select(col("id").as("qid"), col("token"), col("w").as("qw"),
        col("nrm").as("qn"))
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKAggregator(k))
    broadcast(q).join(wn, "token")
      .filter(col("qid") =!= col("id"))
      .groupBy(col("qid"), col("id"), col("qn"), col("nrm"))
      .agg(sum(col("qw") * col("w")).as("dot"))
      .select(col("qid"),
        (floor((col("dot").cast("double") / (col("qn") * col("nrm"))) * 1e6 + 0.5) / 1e6)
          .as("cos"),
        col("id"))
      .groupBy(col("qid"))
      .agg(topk(col("cos"), col("id")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
        col("col._2").as("neighbor_id"), col("col._1").as("cos"))
  }

  /** BM25 relevance per (docId, token): Robertson idf
    * `ln(1 + (N − df + 0.5)/(df + 0.5))` with the standard
    * `tc·(k1+1) / (tc + k1·(1 − b + b·len/avgdl))` length normalization.
    *
    * Corpus stats (N, Σlen) are a one-row aggregate broadcast-cross-joined
    * into the term table — no driver-side `count()`, the whole thing stays
    * one plan. Two hash-aggregate shuffles (term counts, document
    * frequency), same as [[tfIdf]]. Arithmetic is written in the exact
    * operator order the DuckDB twin uses so both engines produce
    * bit-identical doubles (see text_bm25_top_docs). */
  def bm25(docs: org.apache.spark.sql.DataFrame, idCol: String,
           textCol: String, k1: Double = 1.2,
           b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .select(col("id"), size(col("toks")).as("doc_len"),
        explode(col("toks")).as("token"))
      .groupBy("id", "doc_len", "token")
      .agg(count(lit(1)).as("tc"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(tokens(col(textCol)))).as("total_len"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("total_len").cast("double") / col("n_docs"))
      .withColumn("score",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tc") * (k1 + 1.0)) /
          (col("tc") + lit(k1) * (lit(1.0) - b + lit(b) * col("doc_len") / col("avgdl"))))
      .select(col("id"), col("token"), col("tc"), col("df"), col("score"))
  }

  /** PII patterns shared with the oracle — RE2-safe (no backreferences or
    * lookaround), so Java regex and DuckDB's RE2 match identical spans. */
  val emailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Regex = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** PII redaction: emails → [EMAIL] FIRST (an email's local/domain parts
    * contain digit-and-dot runs the IPv4 pattern could otherwise claim),
    * then IPv4 → [IP]. Pure column expression — scan-local, no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRegex, "[EMAIL]"),
      ipv4Regex, "[IP]")

  /** Unicode punctuation the normalizer folds to ASCII (curly quotes,
    * en/em dash, NBSP) — one string so the Spark `translate` and the
    * DuckDB twin share it character-for-character. */
  val normFrom = "\u2018\u2019\u201C\u201D\u2013\u2014\u00A0"
  val normTo = "''\"\"-- "

  /** CCNet/C4-style text normalization: control chars → space, unicode
    * punctuation folded to ASCII, runs of spaces collapsed, trimmed,
    * lowercased. Pure column expression (scan-local, codegen'd); both
    * regexes are RE2-safe so the DuckDB oracle applies the identical
    * pipeline. Normalizing already-clean text is the identity. */
  def normalizeText(text: Column): Column = {
    val noCtl = regexp_replace(text, "[\\x00-\\x1f\\x7f]", " ")
    val ascii = translate(noCtl, normFrom, normTo)
    lower(trim(regexp_replace(ascii, " {2,}", " ")))
  }

  /** Per-document bigram list as (w1, w2) structs — the same
    * evaluate-arrays-once zip_with construction as [[shingles]] (a
    * `transform` + `element_at` lambda would re-split the text per
    * element). Documents under 2 tokens yield an empty array. */
  def bigramPairs(text: Column): Column = {
    val toks = tokens(text)
    val zipped = slice(zip_with(toks, slice(toks, lit(2), size(toks) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2"))), lit(1), size(toks) - 1)
    when(size(toks) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(zipped)
  }

  /** Bigram language-model quality score (the CCNet perplexity-filter
    * shape, self-trained): fit add-one-smoothed bigram conditionals
    * P(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V) on the corpus itself, then score
    * each document as avg −log2 P — bits per token; high bits = surprising
    * = low-quality/outlier text. Returns (id, n_bigrams, bits_per_token).
    *
    * Scale posture: the doc→bigram scan feeds both the count fit and the
    * scoring join, so it is lineage-cut to materialize once. The fitted
    * model is O(observed bigrams) rows — small on this corpus but
    * UNBOUNDED on a real one (vocab² worst case), so the scoring join is
    * NOT hint-broadcast: Catalyst/AQE broadcasts it when its measured
    * size allows and falls back to a (w1,w2)-keyed shuffle join when it
    * doesn't. Only the provably-one-row vocabulary size is explicitly
    * broadcast. The shuffles: two count hash-aggregates, the scoring
    * join, the final per-doc average. */
  def bigramLmBits(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame = {
    import graft.core.Lineage.LineageOps
    val pairs = docs
      .select(col(idCol).as("id"), explode(bigramPairs(col(textCol))).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .cut(eager = false)
    val bigramCounts = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val contextCounts = bigramCounts.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = docs.select(explode(tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val model = bigramCounts.join(contextCounts, "w1")
    pairs.join(model, Seq("w1", "w2"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll",
        -log2((col("c12") + 1.0) / (col("c1") + col("v"))))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        avg(col("nll")).as("bits_per_token"))
  }

  /** Word-level n-gram shingles: token[i..i+n-1] joined by a space.
    * Documents shorter than n tokens yield an empty array.
    *
    * Zero-copy byte-slice kernel ([[graft.functions.ShinglesKernel]],
    * r14): joining consecutive single-space-split tokens with the same
    * single space reconstructs the original span exactly, so each
    * shingle is a byte-range slice of the text — one boundary scan per
    * row, no string building. The previous (n−1)-fold zip_with chain
    * built n−1 intermediate concatenated arrays per row in interpreted
    * HOFs (measured +1.3 s per corpus scan at n = 8). Bit-identical
    * output — the fold form stays below as the property-test twin. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.ShinglesKernel(text, n)

  /** The superseded fold form of [[shingles]] — kept as the
    * property-test twin pinning the kernel's boundary semantics.
    * (Built as an (n−1)-fold `zip_with` of the token array against its
    * own shifted slices, NOT as `transform` with `element_at` in the
    * lambda, which would re-run the regex split once per element.) */
  private[graft] def shinglesHof(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val folded = (1 until n).foldLeft(toks) { (acc, j) =>
      slice(zip_with(acc, slice(toks, lit(j + 1), size(toks) - j),
        (a, b) => concat_ws(" ", a, b)), lit(1), size(toks) - j)
    }
    when(size(toks) < n, array().cast("array<string>")).otherwise(folded)
  }

  /** Fasttext-style hashed-feature linear document scorer — the
    * quality-classifier filter stage of an LLM data pipeline (CCNet /
    * DataComp / FineWeb keep-drop gates), with the TRAINED WEIGHTS
    * standing in as a deterministic function of the feature bucket (the
    * same stub policy the multimodal decode uses: the container has no
    * training stack, so the model parameters are a fixed fake while the
    * engine surface — hashing-trick featurization, sparse linear score,
    * length normalization, thresholding — is real and oracle-pinned).
    *
    * Features: unigrams ++ word-2-grams (occurrence multiset, not set —
    * fasttext sums over occurrences), bucketed by the portable 32-bit
    * hash mod `dim`. Weight of bucket i: hash32("w#" ‖ i) mod 2001 −
    * 1000, an integer in [−1000, 1000] acting as a fixed-point
    * milli-weight. The raw margin `z` is therefore an exact INTEGER sum
    * — no float accumulation anywhere, so partial-aggregation order can
    * never flip the keep decision — and the reported score is the single
    * double division z / (1000·n_feats) at the end.
    *
    * Scale: pure scan-local expression (two md5s per gram, all inside
    * one `aggregate` fold evaluated once per row); no UDF, no join, no
    * shuffle — at 100 TB this is a map-only pass whose cost is the scan
    * itself. Returns struct(n_feats, z_milli). */
  private def classifierWeights(dim: Int): Seq[Long] =
    Seq.tabulate(dim) { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"w#$i".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) %
        2001 - 1000
    }

  def classifierMargin(text: Column, dim: Int = 1024): Column =
    // per-row kernel (graft.functions.ClassifierMarginKernel, r14): one
    // md5 per gram with grams sliced zero-copy from the text bytes (the
    // ShinglesKernel identity) — the HOF form below folded an
    // interpreted lambda per gram over concatenated token+bigram arrays.
    // Same exact integer margin; property-tested against the twin.
    graft.functions.ClassifierMarginKernel(text, classifierWeights(dim), dim)

  /** The superseded HOF form — kept as the property-test twin. (The
    * weight of bucket i is a pure function of i — materialized ONCE on
    * the driver, java MD5 ≡ the md5 expression, spec-pinned.) */
  private[graft] def classifierMarginHof(text: Column, dim: Int = 1024): Column = {
    val weights = typedLit(classifierWeights(dim))
    val grams = concat(tokens(text), shingles(text, 2))
    val z = aggregate(grams, lit(0L), (acc, t) =>
      acc + element_at(weights, (hash32(t) % dim).cast("int") + 1))
    struct(size(grams).as("n_feats"), z.as("z_milli"))
  }

  /** URL canonicalization — the dedup key for web corpora (two crawls of
    * the same page must collapse BEFORE content dedup ever runs): scheme
    * and host lowercased, default ports dropped, fragment dropped,
    * tracking params (utm_*, fbclid, gclid, ref) removed with their
    * separators, a dangling `?`/`&` cleaned, and the trailing slash
    * dropped (root included — both root forms name the same resource; the
    * scheme's `//` survives via the char class). Pure regexp_replace
    * chain — scan-local
    * (no java.net.URI, no UDF), identical PCRE on the oracle side. */
  def canonicalizeUrl(url: Column): Column = {
    // lower the scheme+host prefix without touching path case: split the
    // prefix out, lower it, and re-concat
    val prefix = lower(regexp_extract(url, "^[A-Za-z]+://[^/?#]*", 0))
    val rest = regexp_replace(url, "^[A-Za-z]+://[^/?#]*", "")
    val recombined = concat(prefix, rest)
    val noDefaultPort = regexp_replace(recombined, ":(80|443)(/|\\?|$)", "$2")
    val noFragment = regexp_replace(noDefaultPort, "#.*$", "")
    val noTracking = regexp_replace(noFragment,
      "[?&](utm_[A-Za-z]+|fbclid|gclid|ref)=[^&#]*", "")
    // a removed FIRST param leaves "...&x=1" — promote the & back to ?
    val fixedSep = regexp_replace(noTracking, "^([^?]*)&", "$1?")
    val noDanglingQ = regexp_replace(fixedSep, "\\?$", "")
    regexp_replace(noDanglingQ, "([^/:])/$", "$1")
  }

  /** Vocabulary construction + out-of-vocabulary rate: fit the top-`v`
    * tokens by corpus frequency (tie → token asc, so the vocabulary is
    * deterministic) and score each document's fraction of token
    * OCCURRENCES outside it — the tokenizer-coverage metric that decides
    * whether a corpus needs vocab retraining.
    *
    * One token scan feeds both the fit and the scoring join (lineage-cut,
    * materialized once). The vocab fit is a hash aggregate + bounded
    * TakeOrdered (v rows to the driver plan, never the token table); the
    * fitted vocab is explicitly broadcast into the scoring join, so
    * scoring adds a scan-local probe + one per-doc aggregate. */
  /** Encode documents to token-id sequences under a fitted top-`v`
    * vocabulary (ids = frequency-rank order, OOV → −1) — the text→ids
    * step that feeds a trainer. The fitted vocab is bounded (`v` rows) and
    * ships to executors as a BROADCAST VARIABLE probed per row: encoding
    * stays scan-local (zero joins, zero shuffles on the corpus), and the
    * serialized plan stays O(1) in v — a `typedLit` literal map would
    * compile all v entries into the plan, bloating it and risking codegen
    * method limits at the documented V=50k–100k. The probe is the one
    * deliberate UDF in the engine: a hash-map lookup over the token array
    * has no Catalyst equivalent that avoids either the literal plan or a
    * corpus-side join, and the per-row cost is the same map probe a native
    * kernel would do. Driver materialization is the v-row vocab itself
    * (same bounded-state contract as IVF centroids). */
  def encodeIds(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, v: Int): org.apache.spark.sql.DataFrame = {
    val vocab: Map[String, Int] = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(v)
      .collect().zipWithIndex
      .map { case (r, i) => r.getString(0) -> i }.toMap
    val bc = docs.sparkSession.sparkContext.broadcast(vocab)
    // null-safe: tokens() propagates a NULL text to a NULL array, and a
    // Scala UDF receives that as a null Seq — guard it back to null ids
    // (the same null propagation the previous Catalyst-expression form had)
    val encode = udf { (toks: Seq[String]) =>
      if (toks == null) null else toks.map(t => bc.value.getOrElse(t, -1))
    }
    encoderBroadcasts.add(bc)
    docs.select(col(idCol).as("id"),
      encode(tokens(col(textCol))).as("ids"))
    // broadcast lifetime: bc is NOT unpersisted here — the returned plan
    // is lazy and probes bc at execution, which may be long after this
    // call returns. The v-row map is freed with the session (same
    // lifetime contract as Spark's own broadcast joins). Each fit costs
    // ~v·60 B (≈6 MB at V=100k) on the driver and every live executor, so
    // a long-lived session re-fitting per epoch accumulates E·6 MB —
    // bounded but real; call [[releaseEncoderBroadcasts]] between epochs
    // to reclaim it.
  }

  private val encoderBroadcasts =
    new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.broadcast.Broadcast[_]]()

  /** Re-fit hygiene hook for [[encodeIds]]: non-blocking `unpersist` of
    * every encoder vocab broadcast out of executor memory, returning how
    * many were released. Safe to call while earlier plans are still held:
    * `unpersist` (unlike `destroy`) leaves the driver copy, so a stale
    * plan that re-executes just re-fetches — correctness is unaffected,
    * only the cached executor bytes are reclaimed. */
  def releaseEncoderBroadcasts(): Int = {
    var n = 0
    var b = encoderBroadcasts.poll()
    while (b != null) { b.unpersist(false); n += 1; b = encoderBroadcasts.poll() }
    n
  }

  /** BPE tokenizer TRAINING (Sennrich et al. 2016 §3.2), distributed:
    * `merges` rounds of (count weighted adjacent symbol pairs → take the
    * max-count pair, ties lexicographic → merge its occurrences
    * leftmost-greedily in every word). Returns the learned merge table
    * (step, lhs, rhs, merged, pair_count) — the tokenizer artifact.
    *
    * Scale shape: the corpus is touched ONCE (token hash-aggregate); all
    * iteration happens on the distinct-WORD table, which is
    * dictionary-sized at any corpus scale — the same bounded-state
    * contract as [[encodeIds]]. Per round: one pair explode + hash agg
    * over the word table, a 1-row argmax broadcast back, one scan-local
    * string rewrite; lineage cut per round so plans don't snowball.
    *
    * Words are carried as DOUBLE-SPACE-joined symbol strings
    * (`"␣␣a␣␣bc␣␣"`), and a merge of (a,b) is
    * `replace(w, " a  b ", " ab ")`: the single boundary spaces in the
    * pattern anchor whole symbols (a symbol-SUFFIX never matches), the
    * double separator keeps consecutive merges independent, and both
    * engines' `replace` scans left-to-right non-overlapping — exactly
    * BPE's leftmost-greedy rule (`a a a → (aa) a`), so a fixed-k oracle
    * can replay training verbatim in SQL. */
  def bpeTrain(docs: org.apache.spark.sql.DataFrame, textCol: String,
               merges: Int): org.apache.spark.sql.DataFrame = {
    import graft.core.Lineage.LineageOps
    require(merges >= 1, "need at least one merge round")
    var words = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(concat(lit("  "),
        array_join(filter(split(col("word"), ""), c => c =!= ""), "  "),
        lit("  ")).as("w"), col("wc"))
      .cut(eager = false)
    val steps = (1 to merges).map { step =>
      val syms = filter(split(col("w"), "  "), s => s =!= "")
      val best = words
        .select(col("wc"), syms.as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("wc"), explode(transform(
          sequence(lit(1), size(col("s")) - 1),
          i => struct(element_at(col("s"), i).as("a"),
            element_at(col("s"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("a"), col("b"))
        .limit(1)
        .withColumn("step", lit(step))
        .cut(eager = false)
      words = words.crossJoin(broadcast(best.select(col("a"), col("b"))))
        .select(expr(
          "replace(w, concat(' ', a, '  ', b, ' '), concat(' ', a, b, ' '))")
          .as("w"), col("wc"))
        .cut(eager = false)
      best
    }
    steps.reduce(_ unionByName _)
      .select(col("step"), col("a").as("lhs"), col("b").as("rhs"),
        concat(col("a"), col("b")).as("merged"), col("pair_count"))
  }

  def vocabOov(docs: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String, v: Int): org.apache.spark.sql.DataFrame = {
    import graft.core.Lineage.LineageOps
    val toks = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .cut(eager = false)
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(v)
      .select(col("token"), lit(true).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        (floor((avg(when(col("__in_vocab"), 0.0).otherwise(1.0))) * 1e6 + 0.5) / 1e6)
          .as("oov_rate"))
  }
}
