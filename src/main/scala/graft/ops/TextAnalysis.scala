package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality and language heuristics for training-data pipelines.
  *
  * Everything here is pure Catalyst column math (no UDFs): each metric is a
  * per-row expression over the tokenized text, so the whole stage stays in
  * whole-stage codegen and runs as a map-only pass over the corpus.
  */
object TextAnalysis {

  import Dedup.tokens

  /** Memoized tokenized corpus: `docs` with `textCol` replaced by its
    * whitespace-token array (`toks`), persisted once per (session, corpus
    * plan, textCol). Tokenize-and-carry is the shared prefix of the
    * length-band filter, BM25, perplexity, and token-budget queries — each
    * re-derived it from raw text, so a family of text queries paid the
    * split + explode chain once per CONSUMER instead of once per corpus
    * (the same multi-consumer recompute the round-3 simhash fix removed).
    * Weak-keyed on the session; [[invalidate]] is wired into
    * [[graft.Caches.reset]] so suite boundaries still drop it.
    */
  def tokensRelation(docs: DataFrame, textCol: String): DataFrame = {
    val s = docs.sparkSession
    val perSession = tokCache.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    val key = s"${docs.queryExecution.logical.semanticHash()}/$textCol"
    perSession.computeIfAbsent(key, _ => {
      val rel = Spread.ensure(docs)
        .withColumn("toks", tokens(col(textCol))).drop(textCol)
      rel.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rel
    })
  }

  private val tokCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  /** Drop this session's memoized tokenized corpora and perplexity
    * relations (see [[graft.Caches]]).
    */
  private[graft] def invalidate(spark: org.apache.spark.sql.SparkSession): Unit = {
    Option(tokCache.get(spark)).foreach(_.clear())
    Option(pplCache.get(spark)).foreach(_.clear())
  }

  /** Marker words per language for the n-gram/stopword language heuristic. */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "es" -> Seq("el", "los", "de", "y", "es", "un", "una"),
    "fr" -> Seq("le", "la", "et", "est", "les", "un", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Count of tokens belonging to `words`. */
  def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Predicted language: argmax of marker hits, ties broken by language
    * code (deterministic). Emits one `hits_<lang>` column per language plus
    * `pred_lang`.
    */
  def languageId(docs: DataFrame, idCol: String, textCol: String,
      keep: Seq[Column] = Nil): DataFrame = {
    // `keep`: extra columns computed in the SAME projection — composite
    // pipelines (t18) fuse their other per-doc map work (content
    // fingerprint) into this scan so the corpus is read once and later
    // exchanges carry small derived columns, never the text.
    val toks = tokens(col(textCol))
    val withHits = docs.select(
      Seq(col(idCol).as("doc_id")) ++ keep ++
        StopwordSets.map { case (lang, words) =>
          markerHits(toks, words).as(s"hits_$lang")
        }: _*)
    // Deterministic argmax: fold langs in alphabetical order, keep strictly
    // greater — first (alphabetically smallest) lang wins ties.
    val pred = StopwordSets.map(_._1).foldLeft((lit(""), lit(-1))) {
      case ((bestLang, bestHits), lang) =>
        val hits = col(s"hits_$lang")
        (when(hits > bestHits, lit(lang)).otherwise(bestLang),
          when(hits > bestHits, hits).otherwise(bestHits))
    }._1
    withHits.withColumn("pred_lang", pred)
  }

  /** Per-document quality metrics: token count, average token length,
    * punctuation ratio, stopword ratio, and a composite score in [0,1].
    * All ratios are exact integer divisions widened to double.
    */
  def qualityMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nTokens = size(toks)
    val nChars = length(text)
    val punct = nChars - length(regexp_replace(text, "[.,!?;:]", ""))
    val enHits = markerHits(toks, StopwordSets.toMap.apply("en"))
    docs.select(
      col(idCol).as("doc_id"),
      nTokens.as("n_tokens"),
      nChars.as("n_chars"),
      (length(concat_ws("", toks)).cast("double") / nTokens.cast("double"))
        .as("avg_token_len"),
      (punct.cast("double") / nChars.cast("double")).as("punct_ratio"),
      (enHits.cast("double") / nTokens.cast("double")).as("stopword_ratio"))
  }

  /** Composite quality score: favors mid-length docs with low punctuation
    * noise and a plausible stopword rate. Deterministic rational arithmetic.
    */
  def qualityScore(m: DataFrame): DataFrame =
    m.withColumn("quality_score",
      least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.4 +
        (lit(1.0) - least(col("punct_ratio") * 10.0, lit(1.0))) * 0.3 +
        least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.3)

  /** PII scrubbing for training corpora: replace emails, URLs, and long
    * digit runs (phone/account numbers) with typed placeholder tokens.
    * Patterns are RE2-safe (no lookaround) so the same regexes run on any
    * engine; map-only pass, composes before dedup/packing.
    */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val url = "https?://[^\\s]+"
    val longDigits = "[0-9][0-9 ()+.-]{7,}[0-9]"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        url, "<URL>"),
      longDigits, "<NUMBER>")
  }

  /** Per-document PII hit counts (emails, URLs, digit runs) for corpus
    * auditing before scrubbing.
    */
  def piiCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def hits(pattern: String) =
      size(filter(split(col(textCol), " "),
        t => t.rlike(pattern)))
    docs.select(col(idCol).as("doc_id"),
      hits("@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}").as("n_emails"),
      hits("^https?://").as("n_urls"),
      hits("^[0-9]{8,}$").as("n_long_numbers"))
  }

  /** Approximate token count for budgeting: whitespace tokens plus an extra
    * token per 4 characters of long words (a BPE-ish upper bound).
    */
  def tokenEstimate(text: Column): Column = {
    val toks = tokens(text)
    val extra = aggregate(
      transform(toks, t => greatest(length(t) - 4, lit(0)) / 4),
      lit(0L), (acc, x) => acc + x.cast("long"))
    size(toks).cast("long") + extra
  }

  /** Per-document repetition metrics (the Gopher-style "repetitious text"
    * signals, adapted to single-line documents): the distinct-token ratio
    * and the share of word bigrams taken by the single most frequent
    * bigram. Both expose boilerplate/template spam that survives exact and
    * near dedup because the repetition is internal to the document.
    *
    * Map-only by construction: all four counts come from ONE fused byte
    * walk per row ([[graft.functions.RepetitionStats]] — value-identical
    * to the interpreted sort+`aggregate`-fold HOF chain it replaced,
    * pinned in OpsSpec), so no token row is ever exploded or shuffled —
    * per-row cost is O(tokens), independent of corpus size.
    * `keep` applies the standard cutoffs (low distinctness or a dominant
    * bigram -> drop).
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String,
      minDistinctRatio: Double = 0.4, maxTopBigramFrac: Double = 0.18): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      graft.functions.RepetitionStats(col(textCol)).as("st"))
    val n = col("st.n_tokens")
    val nDistinct = col("st.n_distinct")
    val distinctRatio = nDistinct.cast("double") / n.cast("double")
    val topFrac = when(col("st.n_bigrams") > 0,
      col("st.top_bigram_n").cast("double") / col("st.n_bigrams").cast("double"))
      .otherwise(lit(0.0))
    // coalesce: NULL text kept its HOF value 0 (the fold ran over the
    // `otherwise(array())` branch) while the fused struct is null — the
    // other columns were null under the HOF form too.
    base
      .select(col("doc_id"),
        n.as("n_tokens"),
        nDistinct.as("n_distinct"),
        distinctRatio.as("distinct_ratio"),
        coalesce(col("st.top_bigram_n"), lit(0)).as("top_bigram_n"),
        topFrac.as("top_bigram_frac"))
      .withColumn("keep",
        col("distinct_ratio") >= minDistinctRatio &&
          // A bigram seen once is not repetition — short distinct docs
          // would otherwise fail on 1/(n-1) alone.
          (col("top_bigram_n") <= 1 ||
            col("top_bigram_frac") <= maxTopBigramFrac))
  }

  /** Positional k-gram hashes of a text column — the rolling-hash pass
    * under winnowing fingerprints. One 60-bit md5-derived hash per
    * character position (NOT distinct: winnowing needs positions).
    * Project the result to an attribute before handing it to [[winnow]]:
    * Catalyst substitutes non-attribute arguments into HOF lambdas, which
    * would re-hash the whole text once per window element.
    */
  /** Unigram language-model perplexity per document — the statistical
    * quality score (a document far from the corpus distribution reads as
    * boilerplate, gibberish, or another register) that LM-based filtering
    * pipelines compute before training. The model is the corpus itself:
    * Laplace-smoothed unigram probabilities p(t) = (c_t + 1) / (N + V),
    * perplexity = exp(mean over the doc's tokens of -ln p).
    *
    * Plan at 100 TB: token explode -> one token-keyed count (vocab is
    * Zipf-bounded — it grows ~sublinearly with the corpus and the count
    * is partial-aggregated), a 1-row total for (N, V) shipped as
    * literals, then tokens join vocab on the token key (AQE broadcasts
    * the vocab side when it fits) and one doc-keyed mean. Nothing is
    * driver-side except the two scalars. Output rounds to 4 decimals:
    * ln/exp and float summation order differ across engines at ~1 ulp.
    * Documents with no tokens have no perplexity and drop out.
    */
  def unigramPerplexity(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // Memoized per (session, corpus, cols) like [[tokensRelation]]: the
    // scored relation is consumed by t13 directly AND as the perplexity
    // stage of composite pipelines (t18's CCNet terciles) — without the
    // memo each consumer re-runs the full token-join scoring pass
    // (measured ~2 s of t18's 2.6 s at sf0.1).
    val session = docs.sparkSession
    val perSession = pplCache.computeIfAbsent(session,
      _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    val key =
      s"${docs.queryExecution.logical.semanticHash()}/$idCol/$textCol"
    perSession.computeIfAbsent(key, _ => {
      val rel = computeUnigramPerplexity(docs, idCol, textCol)
      rel.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rel
    })
  }

  private val pplCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  private def computeUnigramPerplexity(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = tokensRelation(docs, textCol)
      .select(col(idCol), explode(col("toks")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    vocab.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val s = vocab.agg(sum(col("c")), count(lit(1))).first()
    val (n, v) = (s.getLong(0), s.getLong(1))
    // The vocab side of the token join is Zipf-bounded but not always
    // broadcast-small: hint the broadcast only when the measured V fits a
    // driver-safe bound, and let AQE decide from runtime stats otherwise —
    // V is already on the driver for free from the (N, V) scalar pass.
    val vocabSide = if (v <= 2000000L) broadcast(vocab) else vocab
    toks.join(vocabSide, "tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(exp(avg(-log((col("c") + lit(1.0)) / lit((n + v).toDouble)))), 4)
          .as("ppl"))
  }

  /** Conditional bigram-LM perplexity per document — the next step up
    * from [[unigramPerplexity]] and the shape of the KenLM-style quality
    * filters production pipelines run: the model is the corpus's own
    * Laplace-smoothed bigram distribution, p(w2|w1) = (c(w1,w2) + 1) /
    * (c(w1,·) + V), scored as exp(mean(-ln p)) over each document's
    * bigrams.
    *
    * Plan at 100 TB: one bigram explode persisted and consumed two ways
    * (bigram counts, the scoring join); context counts come from
    * re-aggregating the Zipf-bounded bigram-count relation — c(w1,·) =
    * Σ_w2 c(w1,w2) exactly, so the corpus-sized relation is never scanned
    * a second time for them. Both count relations are Zipf-bounded
    * (≤ V² and ≤ V rows) and broadcast when the measured V says they
    * fit, with AQE deciding otherwise. V rides to the score as a literal
    * from the same scalar pass. Output rounds to 4 decimals (ln/exp
    * cross-engine ulp noise, as t13). Documents with fewer than two
    * tokens have no bigrams and drop out.
    */
  def bigramPerplexity(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = tokensRelation(docs, textCol)
    val v = toks.select(explode(col("toks")).as("tok"))
      .agg(countDistinct(col("tok"))).first().getLong(0)
    // Fused adjacent-pair walk (graft.functions.BigramStructs): the
    // transform/element_at HOF lambda is interpreted per pair; the fused
    // form is one JIT'd pass per row, element-identical (OpsSpec).
    val bi = toks.filter(size(col("toks")) >= 2)
      .select(col(idCol),
        explode(graft.functions.BigramStructs(col("toks"))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    bi.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bigramCounts = bi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // c(w1,·) = Σ_w2 c(w1,w2): fold the bounded count relation, not the
    // corpus-sized bigram relation a second time.
    val contextCounts = bigramCounts.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"))
    val bigramSide =
      if (v.toDouble * v.toDouble <= 2e6) broadcast(bigramCounts) else bigramCounts
    val contextSide = if (v <= 2000000L) broadcast(contextCounts) else contextCounts
    bi.join(bigramSide, Seq("w1", "w2"))
      .join(contextSide, Seq("w1"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(avg(-log((col("c12") + lit(1.0)) /
          (col("c1") + lit(v.toDouble))))), 4).as("ppl"))
  }

  /** BM25 relevance scores (Robertson/Okapi) of every document against a
    * fixed term set — extracted from the t12 query so retrieval surfaces
    * (plain ranking, hybrid RRF fusion) share one implementation. One
    * pass over the shared [[tokensRelation]] derives doc length AND the
    * per-doc query-term bags; `dl` rides the tf grouping key (it is
    * functionally dependent on the doc id), which removes the doc-length
    * join entirely. Two shuffles at any scale: the keyed (doc, term)
    * frequency aggregation and the final per-doc sum; the document-
    * frequency relation is |queryTerms| rows, broadcast. Output: idCol,
    * bm25 (rounded).
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 4): DataFrame = {
    val base = tokensRelation(docs, textCol)
      .filter(size(col("toks")) > 0)
      .select(col(idCol),
        size(col("toks")).cast("double").as("dl"),
        filter(col("toks"), tk => tk.isin(queryTerms: _*)).as("qtoks"))
    val nAndAvg = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = base
      .select(col(idCol), col("dl"), explode(col("qtoks")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfRel = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfRel), "term")
      .crossJoin(broadcast(nAndAvg))
      .select(col(idCol),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("term_score"))
      .groupBy(col(idCol))
      .agg(round(sum(col("term_score")), roundTo).as("bm25"))
  }

  /** DSIR-style importance weights for data selection (Xie et al. 2023,
    * arXiv:2302.03169): model the target and raw corpora as bag-of-
    * hashed-token distributions over `buckets` buckets, and score each
    * document by its log importance ratio
    * `Σ_b c_doc[b]·(ln p_target[b] − ln p_raw[b])` (add-one smoothed) —
    * documents that look like the target domain get high weights, and
    * sampling ∝ weight reshapes the raw corpus toward the target without
    * training a model. Hashing uses the same md5 bucket as every sampler
    * here ([[Sampling.hashBucket]]), so weights are engine- and
    * partition-invariant.
    *
    * Shape at scale: tokenize+explode is map-side off the shared
    * [[tokensRelation]]; the bucket distribution table is `buckets` rows
    * (broadcast); per-doc bucket counts take ONE keyed shuffle and the
    * final per-doc sum folds ≤ `buckets` exact-integer counts — rounded
    * at 4 decimals so double summation order cannot leak cross-engine.
    * Output: idCol, n_tokens, log_weight.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 64, roundTo: Int = 4): DataFrame = {
    val terms = tokensRelation(docs, textCol)
      .select(col(idCol), isTarget.as("is_tgt"), explode(col("toks")).as("term"))
      .select(col(idCol), col("is_tgt"),
        Sampling.hashBucket(col("term"), buckets).as("bucket"))
    val dist = terms.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_raw"),
        count(when(col("is_tgt"), 1)).as("n_tgt"))
      .agg(collect_list(struct(col("bucket"), col("n_raw"), col("n_tgt")))
        .as("rows"),
        sum(col("n_raw")).as("tot_raw"), sum(col("n_tgt")).as("tot_tgt"))
      .select(explode(col("rows")).as("r"),
        col("tot_raw"), col("tot_tgt"))
      .select(col("r.bucket").as("bucket"),
        (log((col("r.n_tgt") + lit(1.0)) / (col("tot_tgt") + lit(buckets.toDouble))) -
          log((col("r.n_raw") + lit(1.0)) / (col("tot_raw") + lit(buckets.toDouble))))
          .as("log_ratio"))
    val perDoc = terms.groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("c"))
    perDoc.join(broadcast(dist), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        round(sum(col("c") * col("log_ratio")), roundTo).as("log_weight"))
  }

  /** Supervised quality classifier — multinomial Naive Bayes over hashed
    * token buckets, the learned-filter stage the big LM pipelines run
    * after rule batteries (GPT-3's WebText-vs-CommonCrawl classifier,
    * CCNet's fastText stage, LLaMA's Wikipedia-reference classifier).
    * The seed sets carry the labels: `isPositive` marks curated-quality
    * documents, `isNegative` the low-quality background; every document
    * (labeled or not) is scored with the class log-likelihood ratio
    *
    *   score(d) = sum_b c_b(d) * [ln p(b|+) - ln p(b|-)] +
    *              ln((P + 1) / (N + 1))
    *
    * with add-one smoothing over the `buckets` hashed features and the
    * labeled-document counts P/N as the prior. score > 0 reads
    * "curated-like". Hashing (md5-derived, [[Sampling.hashBucket]])
    * makes the feature space engine-portable and fixed-size: the whole
    * trained model is a `buckets`-row broadcast table.
    *
    * Plan at 100 TB — identical shape to [[importanceWeights]]: ONE
    * token-keyed shuffle for per-(doc, bucket) counts; the class
    * distribution aggregates to `buckets` rows and broadcasts; the
    * prior rides as two scalars folded into the broadcast rows. Scoring
    * is the keyed join + one doc-keyed sum. Training and inference are
    * the same two exchanges — there is no iterative fit.
    */
  def nbQualityScores(docs: DataFrame, idCol: String, textCol: String,
      isPositive: Column, isNegative: Column, buckets: Int = 64,
      roundTo: Int = 4): DataFrame = {
    val terms = tokensRelation(docs, textCol)
      .select(col(idCol), isPositive.as("is_pos"), isNegative.as("is_neg"),
        explode(col("toks")).as("term"))
      .select(col(idCol), col("is_pos"), col("is_neg"),
        Sampling.hashBucket(col("term"), buckets).as("bucket"))
    // Per-bucket class token counts -> smoothed log-likelihood ratio.
    // The collect_list/explode fold keeps the totals alongside each
    // bucket row without a second aggregation pass (as importanceWeights).
    val weights = terms.groupBy(col("bucket"))
      .agg(count(when(col("is_pos"), 1)).as("n_pos"),
        count(when(col("is_neg"), 1)).as("n_neg"))
      .agg(collect_list(struct(col("bucket"), col("n_pos"), col("n_neg")))
        .as("rows"),
        sum(col("n_pos")).as("tot_pos"), sum(col("n_neg")).as("tot_neg"))
      .select(explode(col("rows")).as("r"), col("tot_pos"), col("tot_neg"))
      .select(col("r.bucket").as("bucket"),
        (log((col("r.n_pos") + lit(1.0)) /
            (col("tot_pos") + lit(buckets.toDouble))) -
          log((col("r.n_neg") + lit(1.0)) /
            (col("tot_neg") + lit(buckets.toDouble)))).as("w"))
    val prior = docs.agg(
      log((count(when(isPositive, 1)) + lit(1.0)) /
        (count(when(isNegative, 1)) + lit(1.0))).as("log_prior"))
      .first().getDouble(0)
    val perDoc = terms.groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("c"))
    perDoc.join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        round(sum(col("c") * col("w")) + lit(prior), roundTo).as("nb_score"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021,
    * arXiv:2112.11446 Table A1) — the rule battery web-scale LM corpora
    * are filtered with before any learned scorer runs. Each rule is a
    * per-row column expression (map-only, whole-stage codegen; zero
    * shuffles at any corpus size):
    *
    *   - word count in [minWords, maxWords] (paper: 50..100k)
    *   - mean word length in [3, 10]
    *   - symbol-to-word ratio ('#' or '...') <= 0.1
    *   - < 90% of lines start with a bullet ('- ', '* ', '•')
    *   - < 30% of lines end with '...'
    *   - >= 80% of words contain at least one alphabetic character
    *   - >= 2 distinct "required" English stopwords present
    *     (the/be/to/of/and/that/have/with)
    *
    * All ratios are exact integer divisions (rounded for presentation
    * only), so the keep decision is engine- and partition-invariant.
    */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val m = gopherMetricCols(textCol)
    val keep = (m("n_words") >= minWords) && (m("n_words") <= maxWords) &&
      (m("mean_word_len") >= 3.0) && (m("mean_word_len") <= 10.0) &&
      (m("symbol_ratio") <= 0.1) && (m("bullet_line_ratio") < 0.9) &&
      (m("ellipsis_line_ratio") < 0.3) && (m("alpha_word_ratio") >= 0.8) &&
      (m("n_req_stopwords") >= 2)
    docs.select(
      col(idCol).as("doc_id"),
      m("n_words").as("n_words"),
      round(m("mean_word_len"), 6).as("mean_word_len"),
      round(m("symbol_ratio"), 6).as("symbol_ratio"),
      round(m("bullet_line_ratio"), 6).as("bullet_line_ratio"),
      round(m("ellipsis_line_ratio"), 6).as("ellipsis_line_ratio"),
      round(m("alpha_word_ratio"), 6).as("alpha_word_ratio"),
      m("n_req_stopwords").as("n_req_stopwords"),
      keep.cast("int").as("keep"))
  }

  /** First-failing-rule attribution over the Gopher battery — the pipeline
    * debugging view: not "is this doc kept" (t16) but "which stage kills
    * it", evaluated in the battery's fixed rule order so every rejected doc
    * is attributed to exactly ONE stage. Map-only like the battery itself;
    * comparisons run on the UNROUNDED ratios, identical to the keep
    * decision, so `stage == 'kept'` iff t16's `keep == 1`.
    */
  def gopherFirstFail(textCol: String, minWords: Int = 50,
      maxWords: Int = 100000, minStopwords: Int = 2): Column = {
    val m = gopherMetricCols(textCol)
    when(m("n_words") < minWords || m("n_words") > maxWords, "words")
      .when(m("mean_word_len") < 3.0 || m("mean_word_len") > 10.0,
        "word_shape")
      .when(m("symbol_ratio") > 0.1, "symbols")
      .when(m("bullet_line_ratio") >= 0.9 ||
        m("ellipsis_line_ratio") >= 0.3, "layout")
      .when(m("alpha_word_ratio") < 0.8, "alpha")
      .when(m("n_req_stopwords") < minStopwords, "stopwords")
      .otherwise("kept")
  }

  /** The unrounded Gopher rule metrics as named column expressions —
    * shared by the keep decision (t16) and first-fail attribution (t28)
    * so the two can never drift.
    */
  private def gopherMetricCols(textCol: String): Map[String, Column] = {
    val text = col(textCol)
    val toks = tokens(text)
    val nWords = size(toks)
    val meanLen = length(concat_ws("", toks)).cast("double") /
      nWords.cast("double")
    // '#' count + occurrences of the three-char ellipsis.
    val hashCount = length(text) - length(expr(s"replace($textCol, '#', '')"))
    val ellipsisCount =
      (length(text) - length(expr(s"replace($textCol, '...', '')"))) / 3
    val symbolRatio = (hashCount + ellipsisCount).cast("double") /
      nWords.cast("double")
    val lines = filter(split(text, "\n"), l => trim(l) =!= "")
    val nLines = size(lines)
    val bulletLines = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•")))
    val ellipsisLines = size(filter(lines, l => rtrim(l).endsWith("...")))
    val bulletRatio = when(nLines > 0,
      bulletLines.cast("double") / nLines.cast("double")).otherwise(lit(0.0))
    val ellipsisLineRatio = when(nLines > 0,
      ellipsisLines.cast("double") / nLines.cast("double")).otherwise(lit(0.0))
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val alphaRatio = alphaWords.cast("double") / nWords.cast("double")
    val required = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val nRequired = size(array_intersect(array_distinct(toks),
      array(required.map(lit): _*)))
    Map(
      "n_words" -> nWords,
      "mean_word_len" -> meanLen,
      "symbol_ratio" -> symbolRatio,
      "bullet_line_ratio" -> bulletRatio,
      "ellipsis_line_ratio" -> ellipsisLineRatio,
      "alpha_word_ratio" -> alphaRatio,
      "n_req_stopwords" -> nRequired)
  }

  def kgramHashes(text: Column, k: Int): Column =
    // Fused one-pass expression (see KgramHashes60): bit-identical to the
    // transform + hash60 HOF chain it replaced, which re-evaluated the
    // Substring/Md5/Conv tree interpreted per position. Null text maps to
    // an empty array (the old CaseWhen's otherwise-branch behavior), so
    // downstream array ops stay total.
    coalesce(graft.functions.KgramHashes60(text, k),
      array().cast("array<long>"))

  /** Content-defined chunking (the FastCDC/rsync family, Xia et al., ATC
    * '16): cut a document wherever the rolling k-gram hash ≡ 0 mod
    * `modulus`, giving ~modulus-char chunks whose BOUNDARIES move with
    * the content. Unlike fixed-stride windows (t11), an insertion near
    * the front shifts no downstream chunk identity: every chunk whose
    * bytes are unchanged keeps its hash — the property that makes
    * chunk-level dedup/caching work under edits.
    *
    * Entirely map-side (one HOF chain per row, no shuffle at any corpus
    * size). Output: idCol, chunk_idx, start, len, chunk_md5 — one row
    * per non-empty chunk, linear in corpus bytes.
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, modulus: Int = 64): DataFrame = {
    // Two structural rules keep this linear (HOFs are interpreted, and a
    // per-lambda-element reference to a DERIVED array re-derives its whole
    // chain per element — the O(len²) trap wordShingled documents):
    //  1. expensive arrays appear only as HOF ARGUMENTS, never indexed
    //     inside a lambda;
    //  2. each derived array is materialized as a NAMED column in its own
    //     projection (t06's pattern) — CollapseProject declines to inline
    //     a non-cheap alias referenced more than once, so `hs` and `cuts`
    //     evaluate exactly once per row however many times the next stage
    //     reads them.
    val hs = col("hs"); val cuts = col("cuts")
    Spread.ensure(docs)
      .select(col(idCol), col(textCol).as("txt"),
        kgramHashes(col(textCol), k).as("hs"))
      // Two-arg transform supplies the element index directly — no
      // sequence/zip_with/struct intermediates over the corpus-sized
      // hash array; non-boundary positions become nulls and one filter
      // pass drops them.
      .select(col(idCol), col("txt"),
        concat(
          array(lit(0)),
          filter(
            transform(hs, (h, i) =>
              when(h % modulus === 0 && i > 0, i)),
            x => x.isNotNull),
          array(length(col("txt")).cast("int"))).as("cuts"))
      // Adjacent cut pairs: zip cuts against its own tail; the final
      // (last, null) pad row dies on the len > 0 filter below.
      .select(col(idCol), col("txt"),
        zip_with(cuts, slice(cuts, lit(2), greatest(size(cuts), lit(2))),
          (s, e) => struct(s.as("s"), (e - s).as("len"))).as("chunks"))
      // posexplode_OUTER on purpose: the non-outer form triggers
      // InferFiltersFromGenerate, whose size(...)>0 guard is pushed below
      // the staged projections WITH THE WHOLE CHAIN SUBSTITUTED — the
      // scan-side filter then re-derives the md5 chain ~10x per row
      // (measured 21 s -> 1.4 s at sf0.1). The len > 0 filter below
      // already drops the outer-null pad rows the guard would have.
      .select(col(idCol), col("txt"),
        posexplode_outer(col("chunks")).as(Seq("chunk_idx", "c")))
      .filter(col("c.len") > 0)
      .select(col(idCol), col("chunk_idx"),
        col("c.s").cast("long").as("start"),
        col("c.len").cast("long").as("len"),
        md5(col("txt").substr(col("c.s") + 1, col("c.len"))).as("chunk_md5"))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03): over the positional k-gram hashes, keep the minimum of
    * each `w`-length sliding window, deduplicated. Any substring of
    * length >= k + w - 1 shared by two documents is GUARANTEED to
    * contribute a shared fingerprint — the local, position-robust
    * document fingerprint that whole-doc hashing (d01) cannot give.
    * Map-only per row; the fingerprint set (not the text) is what joins
    * downstream.
    */
  def winnow(hs: Column, w: Int): Column =
    // Fused one-pass expression (see WinnowMins): monotonic-deque sliding
    // min + first-occurrence dedup, identical to the array_distinct +
    // per-position array_min(slice) HOF chain it replaced (interpreted,
    // one w-slice allocation per position; InterpretedParitySpec pins
    // exact equality, order included). Null input maps to an empty array
    // (the old when/otherwise behavior on null size).
    coalesce(graft.functions.WinnowMins(hs, w),
      array().cast("array<long>"))

  /** Per-domain unigram-distribution divergence from the corpus mixture:
    * KL(p_domain || p_corpus) = sum_t p(t|d) * ln(p(t|d) / p(t)) in nats,
    * plus token/vocabulary counts. This is the data-mixture diagnostic a
    * curation pipeline runs before choosing domain weights (the quantity
    * DoReMi-style reweighting, arXiv:2305.10429, optimizes against): a
    * domain with high KL is far from the corpus average and dominates or
    * starves tokens under naive proportional mixing.
    *
    * Scale shape: ONE corpus scan (the shared [[tokensRelation]]) feeds a
    * (domain, token)-keyed count — everything after runs on that relation,
    * which is |domains| x |vocab| rows (Zipf-bounded, NOT corpus-sized).
    * The corpus marginal `ct` and domain totals `ns` are windows over it,
    * and the single-partition grand-total window is over the same
    * vocab-bounded relation (at 100 TB this is ~domains x millions of
    * rows of longs — trivially one executor's work; the corpus itself
    * never re-shuffles). KL terms sum per domain with round-at-4 for
    * cross-engine float parity (each domain folds over <= |vocab| terms).
    */
  def domainDivergence(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokensRelation(docs, textCol)
    val st = toks
      .select(col(domainCol).as("domain"), explode(col("toks")).as("token"))
      .groupBy(col("domain"), col("token"))
      .agg(count(lit(1)).cast("double").as("c"))
    val j = st
      .withColumn("ns", sum(col("c")).over(Window.partitionBy(col("domain"))))
      .withColumn("ct", sum(col("c")).over(Window.partitionBy(col("token"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
    j.groupBy(col("domain"))
      .agg(
        sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(sum((col("c") / col("ns")) *
          log((col("c") / col("ns")) / (col("ct") / col("n")))), 4).as("kl"))
      .orderBy(col("domain"))
  }

  /** Per-domain distinctive terms (class-based TF-IDF, the BERTopic
    * "c-TF-IDF" shape): each domain is treated as ONE pseudo-document,
    * tf = c/ns over its token counts, idf = ln(1 + |domains|/df) with df
    * counted over domains (not documents) — so shared vocabulary scores
    * ~0 and the top terms are what a human would label the domain with.
    *
    * Same scale shape as [[domainDivergence]]: ONE corpus-sized keyed
    * shuffle builds the (domain, token) counts off the shared
    * [[tokensRelation]]; every window and the final rank run on that
    * vocab-bounded relation. Scores are one float expression over exact
    * integers, rounded at 6 BEFORE ranking so both engines rank the
    * identical value (ties break on token).
    */
  def distinctiveTerms(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokensRelation(docs, textCol)
    val st = toks
      .select(col(domainCol).as("domain"), explode(col("toks")).as("token"))
      .groupBy(col("domain"), col("token"))
      .agg(count(lit(1)).as("c"))
    val withStats = st
      .withColumn("ns", sum(col("c")).over(Window.partitionBy(col("domain"))))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("token"))))
    val nDomains = st.agg(countDistinct(col("domain")).as("n_dom"))
    val scored = withStats.crossJoin(nDomains)
      .withColumn("score",
        round((col("c").cast("double") / col("ns").cast("double")) *
          log(lit(1.0) + col("n_dom").cast("double") /
            col("df").cast("double")), 6))
    val rankWin = Window.partitionBy(col("domain"))
      .orderBy(col("score").desc, col("token"))
    scored
      .withColumn("rk", row_number().over(rankWin))
      .filter(col("rk") <= topK)
      .select(col("domain"), col("rk"), col("token"), col("score"))
  }

  /** Line-level boilerplate dedup (the CCNet per-paragraph pass, Wenzek et
    * al. 2020 §3.1, and the C4 "three-sentence dedup" cousin): a line that
    * occurs in at least `minDocs` DISTINCT documents is boilerplate
    * (headers, footers, cookie banners, nav chrome) and is removed from
    * every document; document-unique content is untouched. This is the
    * dedup tier BELOW document granularity — d01/d02 drop whole near-dup
    * docs, this strips the shared furniture inside otherwise-unique docs.
    *
    * Returns one row per document: `doc_id`, `n_lines`, `n_removed`, and
    * `clean_text` (surviving lines rejoined in original order).
    *
    * Scale shape, per 100 TB pass: explode lines map-side; ONE
    * doc-frequency count whose partial stage groups on (line-hash,
    * doc_id) — within-doc repeats collapse map-side, and the exchange
    * carries one row per distinct (line, doc) incidence, i.e. it is
    * bounded by the corpus's total line count (a header in 10^9 docs
    * ships 10^9 rows once, not once per occurrence). The count produces
    * the boilerplate set,
    * which is tiny BY DEFINITION (only lines repeated across >= minDocs
    * docs survive the filter) so the flag-back join broadcasts under AQE;
    * then ONE doc-keyed shuffle reassembles. The exploded line relation is
    * persisted because both the frequency pass and the reassembly consume
    * it — the multi-consumer rule applied at birth. Lines are joined by
    * md5 hash, not text, so the exchange carries 32-hex keys instead of
    * whole paragraphs.
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Long): DataFrame = {
    val lines = Spread.ensure(docs)
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .withColumn("lh", md5(col("line")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val boiler = lines
      .groupBy(col("lh"))
      .agg(countDistinct(col("doc_id")).as("line_docs"))
      .filter(col("line_docs") >= minDocs)
      .select(col("lh"), lit(true).as("boiler"))
    lines
      .join(boiler, Seq("lh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_removed"),
        concat_ws("\n",
          transform(
            array_sort(collect_list(when(col("boiler").isNull,
              struct(col("line_no").as("line_no"), col("line").as("line"))))),
            x => x.getField("line"))).as("clean_text"))
  }

  /** Per-domain vocabulary-growth statistics — the Heaps'-law diagnostic a
    * corpus audit runs before tokenizer training or mixing: total token
    * count N, distinct type count V, hapax legomena (types seen once),
    * type-token ratio V/N, hapax share, and the Heaps exponent estimate
    * beta = ln V / ln N (V ~ K*N^beta). Low TTR / low hapax share flags
    * templated or looping text (the t08 repetition signal at corpus
    * grain); an out-of-family beta flags a domain whose vocabulary grows
    * unlike the rest (OCR noise mints unbounded types, logs mint none).
    *
    * Scale shape: ONE (domain, token)-keyed count off the shared
    * [[tokensRelation]] — Zipf-bounded output, partial-aggregated — then a
    * per-domain fold over that vocab-sized relation. The corpus shuffles
    * once. Ratios are exact-integer divisions rounded at 6 (identical
    * IEEE doubles cross-engine); beta holds two `ln` calls, so it rounds
    * at 4 like t19's KL terms to absorb libm last-bit drift.
    */
  def vocabGrowth(docs: DataFrame, textCol: String,
      domainCol: String): DataFrame = {
    val toks = tokensRelation(docs, textCol)
    val tc = toks
      .select(col(domainCol).as("domain"), explode(col("toks")).as("token"))
      .groupBy(col("domain"), col("token"))
      .agg(count(lit(1)).as("c"))
    tc.groupBy(col("domain"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
        round(count(lit(1)).cast("double") / sum(col("c")), 6).as("ttr"),
        round(sum(when(col("c") === 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 6).as("hapax_ratio"),
        round(log(count(lit(1)).cast("double")) /
          log(sum(col("c")).cast("double")), 4).as("heaps_beta"))
      .orderBy(col("domain"))
  }
}
