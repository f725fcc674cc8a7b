package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sampling, Spread, TextAnalysis}

/** Training-data pipeline surfaces added in round 4: domain mixing with
  * fractional epochs, deterministic global shuffle into training shards,
  * C4-style heuristic quality filtering, and shared-substring dedup over
  * winnowed fingerprints. All results are pure functions of document ids
  * and text, so the DuckDB oracle reproduces them bit-for-bit.
  */
object MixQueries {

  /** Memoized winnowed-fingerprint relation (doc_id, fp): the k-gram md5
    * chain is the expensive part of d07 and its plan is consumed three
    * times (document-frequency pass + both sides of the pair self-join),
    * so it is materialized once per (session, corpus, params) — the same
    * share-the-built-artifact pattern as [[graft.ops.Ivf.buildCached]] and
    * the Dedup pair cache. Weak-keyed on the session so stopped sessions
    * free it.
    */
  private def fingerprintsCached(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame, k: Int, w: Int)
      : org.apache.spark.sql.DataFrame = {
    val perSession = fpCache.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String,
        org.apache.spark.sql.DataFrame]())
    val key = s"${docs.queryExecution.logical.semanticHash()}/$k/$w"
    perSession.computeIfAbsent(key, _ => {
      // explode_OUTER + null filter, NOT explode: the non-outer generator
      // triggers InferFiltersFromGenerate, whose size(..)>0 guard is
      // pushed below these projections WITH THE WHOLE winnow+kgram CHAIN
      // SUBSTITUTED — re-deriving the fingerprint sweep per row at the
      // scan (t22's trap; measured 114 s vs 13 s for the staged outer
      // form at 10^6 docs in SimBench). The length filter above already
      // guarantees winnow emits a non-empty array, so the null-fp filter
      // drops nothing in practice.
      val fps = Spread.ensure(docs)
        .filter(length(col("text")) >= k + w - 1)
        .select(col("doc_id"),
          TextAnalysis.kgramHashes(col("text"), k).as("hs"))
        .select(col("doc_id"),
          TextAnalysis.winnow(col("hs"), w).as("fps"))
        .select(col("doc_id"), explode_outer(col("fps")).as("fp"))
        .filter(col("fp").isNotNull)
      fps.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fps
    })
  }

  private val fpCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String,
        org.apache.spark.sql.DataFrame]]())

  /** Map-side (doc_a, doc_b) pair explosion over a postings relation's
    * sorted `docs` lists. explode_OUTER + null filter on purpose: the
    * non-outer generator's inferred size()>0 filter re-evaluates the
    * whole O(df²) pair-construction chain per row as a pre-filter —
    * doubling the hot map stage (t22's inference trap; postings lists
    * are never empty here, df >= 2 by construction, so the outer form
    * changes nothing semantically).
    */
  private def postingsPairs(postings: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    postings
      .select(explode_outer(flatten(transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + lit(2), size(col("docs"))),
          b => struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .filter(col("p").isNotNull)
      .select(col("p.doc_a"), col("p.doc_b"))

  /** Drop this session's memoized fingerprint/postings relations (see
    * [[graft.Caches]]).
    */
  private[graft] def invalidate(spark: org.apache.spark.sql.SparkSession): Unit =
    Option(fpCache.get(spark)).foreach(_.clear())

  /** Memoized inverted-index postings over the winnowed fingerprints:
    * (fp, sorted doc list) for fingerprints seen in 2..maxDf documents.
    * The grouping shuffle over the full fingerprint relation is the
    * expensive half of both d07 (pair generation) and t09
    * (decontamination), so the grouped form is materialized once per
    * (session, corpus, params) and both read it. df=1 rows are dropped —
    * a fingerprint in one document can neither pair nor contaminate —
    * and df>maxDf rows are the shared-vocabulary noise both consumers
    * already exclude.
    */
  private def postingsCached(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame, k: Int, w: Int, maxDf: Int)
      : org.apache.spark.sql.DataFrame = {
    val perSession = fpCache.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String,
        org.apache.spark.sql.DataFrame]())
    val key = s"postings/${docs.queryExecution.logical.semanticHash()}/$k/$w/$maxDf"
    perSession.computeIfAbsent(key, _ => {
      val posts = fingerprintsCached(s, docs, k, w)
        .groupBy(col("fp"))
        .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
        .filter(size(col("docs")).between(2, maxDf))
      posts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      posts
    })
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      // Domain mixing: per-source epoch weights (floor(w) guaranteed copies
      // + a deterministic hash fraction for the remainder). Map-side
      // explode — output volume is sum(w_s * |s|) with no shuffle until
      // the audit aggregation.
      "s03_domain_mix",
      (s, dir) => {
        val t = Tables(s, dir)
        Sampling.epochMix(t.documents, "doc_id", "source",
            Map("src0" -> 0.25, "src1" -> 2.0, "src2" -> 1.5, "src3" -> 3.0))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("doc_id")).as("n_docs"),
            max(col("epoch")).as("max_epoch"))
          .orderBy(col("source"))
      },
      Some("""
        |WITH wt AS (
        |  SELECT doc_id, source,
        |         CASE source WHEN 'src0' THEN 0 WHEN 'src1' THEN 2
        |                     WHEN 'src2' THEN 1 WHEN 'src3' THEN 3
        |                     ELSE 1 END AS base,
        |         CASE source WHEN 'src0' THEN 2500 WHEN 'src1' THEN 0
        |                     WHEN 'src2' THEN 5000 WHEN 'src3' THEN 0
        |                     ELSE 0 END AS frac10k,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |           % 10000 AS bucket
        |  FROM documents
        |),
        |reps AS (
        |  SELECT doc_id, source,
        |         base + CASE WHEN bucket < frac10k THEN 1 ELSE 0 END AS reps
        |  FROM wt
        |),
        |exploded AS (
        |  SELECT doc_id, source, unnest(range(1, reps + 1)) AS epoch
        |  FROM reps WHERE reps >= 1
        |)
        |SELECT source, count(*) AS n_rows,
        |       count(DISTINCT doc_id)    AS n_docs,
        |       CAST(max(epoch) AS BIGINT) AS max_epoch
        |FROM exploded
        |GROUP BY source
        |ORDER BY source
        |""".stripMargin.trim)),

    QueryDef(
      // Deterministic global training-order shuffle: dense positions by
      // md5(seed+id), computed via hash-prefix buckets + broadcast offsets
      // so no window ever sees more than one bucket (survives 10^9 rows).
      // The oracle states the same order as one naive ROW_NUMBER.
      "s04_global_shuffle",
      (s, dir) => {
        val t = Tables(s, dir)
        Sampling.globalShuffle(t.documents, "doc_id", "shuf42", shards = 8)
          .select(col("position"), col("doc_id"), col("shard"))
          .orderBy(col("position"))
      },
      Some("""
        |SELECT row_number() OVER (ORDER BY md5('shuf42:' || doc_id), doc_id)
        |         AS position,
        |       doc_id,
        |       (row_number() OVER (ORDER BY md5('shuf42:' || doc_id), doc_id) - 1)
        |         % 8 AS shard
        |FROM documents
        |ORDER BY position
        |""".stripMargin.trim)),

    QueryDef(
      // C4-style heuristic quality filter: word count, mean word length
      // band, terminal punctuation, no code-ish braces. Map-only flags per
      // document; the keep decision composes with dedup/sampling upstream
      // of tokenization in a real pipeline.
      "t07_c4_filter",
      (s, dir) => {
        val t = Tables(s, dir)
        val text = col("text")
        val toks = Dedup.tokens(text)
        val nWords = size(toks)
        val meanLen = length(concat_ws("", toks)).cast("double") /
          nWords.cast("double")
        val endsPunct = expr("right(rtrim(text), 1)").isin(".", "!", "?")
        val hasBrace = text.contains("{") || text.contains("}")
        val keep = (nWords >= 5) && (meanLen >= 3.0) && (meanLen <= 10.0) &&
          endsPunct && !hasBrace
        t.documents.select(col("doc_id"),
            nWords.as("n_words"),
            round(meanLen, 6).as("mean_word_len"),
            endsPunct.cast("int").as("ends_punct"),
            hasBrace.cast("int").as("has_brace"),
            keep.cast("int").as("keep"))
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH base AS (
        |  SELECT doc_id,
        |         len(list_filter(string_split(text, ' '), x -> x <> ''))  AS n_words,
        |         length(array_to_string(list_filter(string_split(text, ' '),
        |            x -> x <> ''), ''))                                   AS tok_chars,
        |         CASE WHEN right(rtrim(text), 1) IN ('.', '!', '?')
        |              THEN 1 ELSE 0 END                                   AS ends_punct,
        |         CASE WHEN contains(text, '{') OR contains(text, '}')
        |              THEN 1 ELSE 0 END                                   AS has_brace
        |  FROM documents
        |),
        |m AS (
        |  SELECT doc_id, n_words,
        |         CAST(tok_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
        |         ends_punct, has_brace
        |  FROM base
        |)
        |SELECT doc_id, n_words, round(mean_word_len, 6) AS mean_word_len,
        |       ends_punct, has_brace,
        |       CASE WHEN n_words >= 5 AND mean_word_len >= 3.0
        |                 AND mean_word_len <= 10.0
        |                 AND ends_punct = 1 AND has_brace = 0
        |            THEN 1 ELSE 0 END AS keep
        |FROM m
        |ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Shared-substring near-dup pairs (MOSS-style): two docs pair when
      // they share >= 5 winnowed fingerprints (k=8, w=4 — any shared
      // substring of length >= 11 contributes one). Fingerprints seen in
      // more than 20 docs are dropped first, exactly the common-boilerplate
      // guard that bounds per-fingerprint join fan-out at corpus scale.
      "d07_shared_fingerprints",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = 8; val w = 4; val maxDf = 20; val minShared = 5
        // Inverted-index pair generation: ONE shuffle groups postings per
        // fingerprint, the df<=maxDf guard bounds each posting list, and
        // pairs explode map-side from the sorted list — no df-count join
        // and no 540k-row self-join (4 shuffles -> 2), the shape whose
        // shuffle volume stays proportional to the PAIRS at corpus scale.
        // The grouped relation is shared with t09 via postingsCached.
        val postings = postingsCached(s, t.documents, k, w, maxDf)
        postingsPairs(postings)
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= minShared)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        |WITH hs AS (
        |  SELECT doc_id,
        |         list_transform(range(length(text) - 7),
        |           i -> CAST(concat('0x', substr(md5('0:' ||
        |                  substr(text, CAST(i + 1 AS INTEGER), 8)), 1, 15))
        |                AS BIGINT)) AS hs
        |  FROM documents WHERE length(text) >= 11
        |),
        |fp AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(len(hs) - 3),
        |           j -> list_min(hs[j+1 : j+4]))) AS fps
        |  FROM hs
        |),
        |ex AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
        |rare AS (SELECT fp FROM ex GROUP BY fp HAVING count(*) <= 20),
        |fe AS (SELECT e.doc_id, e.fp FROM ex e JOIN rare r USING (fp)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |  FROM fe a JOIN fe b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, n_shared
        |FROM pairs WHERE n_shared >= 5
        |ORDER BY doc_a, doc_b
        |""".stripMargin.trim)),

    QueryDef(
      // Cross-source contamination matrix: for every source pair, how many
      // document pairs share winnowed fingerprints and how many
      // fingerprints they share in total — the "did corpus A leak into
      // corpus B" diagnostic run before mixing sources (the cross-corpus
      // view of d07/t09's within-corpus machinery). Rides the SAME
      // persisted postings relation as d07/t09; pairs explode map-side
      // from the df-bounded lists, sources attach via two id-keyed joins,
      // and the output is |sources|^2-bounded at any corpus size.
      "d10_source_overlap",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = 8; val w = 4; val maxDf = 20
        val postings = postingsCached(s, t.documents, k, w, maxDf)
        val srcOf = t.documents.select(col("doc_id"), col("source"))
        val pairs = postingsPairs(postings)
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("n_shared"))
        pairs
          .join(srcOf.select(col("doc_id").as("doc_a"),
            col("source").as("src_a")), "doc_a")
          .join(srcOf.select(col("doc_id").as("doc_b"),
            col("source").as("src_b")), "doc_b")
          .select(least(col("src_a"), col("src_b")).as("source_a"),
            greatest(col("src_a"), col("src_b")).as("source_b"),
            col("n_shared"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("n_doc_pairs"),
            sum(col("n_shared")).as("n_shared_fps"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some("""
        |WITH hs AS (
        |  SELECT doc_id,
        |         list_transform(range(length(text) - 7),
        |           i -> CAST(concat('0x', substr(md5('0:' ||
        |                  substr(text, CAST(i + 1 AS INTEGER), 8)), 1, 15))
        |                AS BIGINT)) AS hs
        |  FROM documents WHERE length(text) >= 11
        |),
        |fp AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(len(hs) - 3),
        |           j -> list_min(hs[j+1 : j+4]))) AS fps
        |  FROM hs
        |),
        |ex AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
        |rare AS (SELECT fp FROM ex GROUP BY fp HAVING count(*) BETWEEN 2 AND 20),
        |fe AS (SELECT e.doc_id, e.fp FROM ex e JOIN rare r USING (fp)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |  FROM fe a JOIN fe b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |),
        |sp AS (
        |  SELECT least(da.source, db.source)    AS source_a,
        |         greatest(da.source, db.source) AS source_b,
        |         p.n_shared
        |  FROM pairs p
        |  JOIN documents da ON da.doc_id = p.doc_a
        |  JOIN documents db ON db.doc_id = p.doc_b
        |)
        |SELECT source_a, source_b, count(*) AS n_doc_pairs,
        |       CAST(sum(n_shared) AS BIGINT) AS n_shared_fps
        |FROM sp GROUP BY 1, 2
        |ORDER BY source_a, source_b
        |""".stripMargin.trim)),

    QueryDef(
      // Near-INCLUSION pairs: containment C = |A∩B| / min(|A|,|B|) over
      // word-3-gram shingle sets — the quote/excerpt detector Jaccard
      // misses (a short doc embedded in a long one has high containment
      // but low Jaccard, so minhash bands under-recall it). Candidates
      // come from the shared-substring postings (d07's relation, shared
      // via postingsCached): any shared >= 11-char run pairs two docs
      // regardless of their size ratio. Verification is two id-keyed
      // joins against the hashed shingle sets — work stays proportional
      // to candidates at any corpus size.
      "d11_containment",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = 8; val w = 4; val maxDf = 20; val minShared = 3
        val postings = postingsCached(s, t.documents, k, w, maxDf)
        val cand = postingsPairs(postings)
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= minShared)
          .select(col("doc_a"), col("doc_b"))
        Dedup.containmentPairs(t.documents, "doc_id", "text", cand)
          .filter(col("containment") >= 0.5)
          .select(col("doc_a"), col("doc_b"), col("size_a"), col("size_b"),
            round(col("containment"), 6).as("containment"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        |WITH hs AS (
        |  SELECT doc_id,
        |         list_transform(range(length(text) - 7),
        |           i -> CAST(concat('0x', substr(md5('0:' ||
        |                  substr(text, CAST(i + 1 AS INTEGER), 8)), 1, 15))
        |                AS BIGINT)) AS hs
        |  FROM documents WHERE length(text) >= 11
        |),
        |fp AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(len(hs) - 3),
        |           j -> list_min(hs[j+1 : j+4]))) AS fps
        |  FROM hs
        |),
        |exf AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
        |rare AS (SELECT fp FROM exf GROUP BY fp HAVING count(*) BETWEEN 2 AND 20),
        |fe AS (SELECT e.doc_id, e.fp FROM exf e JOIN rare r USING (fp)),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM fe a JOIN fe b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 3
        |),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(len(toks) - 2),
        |           i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingles
        |  FROM tok WHERE len(toks) >= 3
        |),
        |hsets AS (
        |  SELECT doc_id,
        |         list_transform(shingles,
        |           s -> CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT)) AS hs
        |  FROM sh
        |),
        |verified AS (
        |  SELECT c.doc_a, c.doc_b,
        |         len(sa.hs) AS size_a, len(sb.hs) AS size_b,
        |         len(list_intersect(sa.hs, sb.hs)) * 1.0
        |           / least(len(sa.hs), len(sb.hs)) AS containment,
        |         len(list_intersect(sa.hs, sb.hs)) * 1.0
        |           / len(list_distinct(sa.hs || sb.hs)) AS jaccard
        |  FROM cand c
        |  JOIN hsets sa ON sa.doc_id = c.doc_a
        |  JOIN hsets sb ON sb.doc_id = c.doc_b
        |)
        |SELECT doc_a, doc_b, size_a, size_b,
        |       round(containment, 6) AS containment,
        |       round(jaccard, 6) AS jaccard
        |FROM verified WHERE containment >= 0.5
        |ORDER BY doc_a, doc_b
        |""".stripMargin.trim)),

    QueryDef(
      // Exact duplicated-SPAN detection (Lee et al., arXiv:2107.06499):
      // k-token grams occurring more than once corpus-wide mark spans;
      // overlapping marks merge into maximal per-doc spans — the
      // substring-level trim/drop feed that document-level dedup misses
      // (repeated boilerplate inside otherwise-unique pages). One
      // gram-keyed count shuffle + one per-doc window; linear in corpus
      // tokens, nothing pairwise (see Dedup.duplicatedSpans).
      "d09_span_dedup",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.duplicatedSpans(t.documents, "doc_id", "text", k = 8)
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |base AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM tok),
        |grams AS (
        |  SELECT doc_id,
        |         CAST(unnest(range(greatest(n_tokens - 7, 0))) AS BIGINT)
        |           AS pos,
        |         unnest(list_transform(range(greatest(n_tokens - 7, 0)),
        |           i -> md5(array_to_string(toks[i+1:i+8], ' '))))
        |           AS gram_key
        |  FROM base
        |),
        |dup AS (
        |  SELECT gram_key FROM grams GROUP BY gram_key HAVING count(*) > 1
        |),
        |cov AS (
        |  SELECT g.doc_id, g.pos, g.pos + 8 AS e
        |  FROM grams g JOIN dup USING (gram_key)
        |),
        |isl AS (
        |  SELECT doc_id, pos, e,
        |         CASE WHEN pos > coalesce(max(e) OVER (
        |                PARTITION BY doc_id ORDER BY pos
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |                -1)
        |              THEN 1 ELSE 0 END AS brk
        |  FROM cov
        |),
        |isl2 AS (
        |  SELECT doc_id, pos, e,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |                        ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl
        |),
        |spans AS (
        |  SELECT doc_id, island, min(pos) AS s, max(e) AS en
        |  FROM isl2 GROUP BY 1, 2
        |),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
        |         CAST(sum(en - s) AS BIGINT) AS dup_tokens
        |  FROM spans GROUP BY 1
        |)
        |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |       coalesce(a.n_dup_spans, 0) AS n_dup_spans,
        |       coalesce(a.dup_tokens, 0) AS dup_tokens,
        |       round(CAST(coalesce(a.dup_tokens, 0) AS DOUBLE)
        |             / b.n_tokens, 6) AS dup_frac
        |FROM base b LEFT JOIN agg a USING (doc_id)
        |ORDER BY b.doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Duplicated-span REMOVAL — d09's detect turned into the act: every
      // token inside a corpus-duplicated 8-gram span is cut and the doc
      // re-joined from the survivors. The hash-checked scrub_md5 proves
      // both engines rebuild byte-identical cleaned text, i.e. the
      // surgery (not just the span accounting) is exact. Spans collapse
      // to one per-doc array; the cut is a single map-side HOF — nothing
      // shuffles beyond d09's gram count at any corpus size.
      "d12_span_scrub",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.scrubDuplicatedSpans(t.documents, "doc_id", "text", k = 8)
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |base AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM tok),
        |grams AS (
        |  SELECT doc_id,
        |         CAST(unnest(range(greatest(n_tokens - 7, 0))) AS BIGINT)
        |           AS pos,
        |         unnest(list_transform(range(greatest(n_tokens - 7, 0)),
        |           i -> md5(array_to_string(toks[i+1:i+8], ' '))))
        |           AS gram_key
        |  FROM base
        |),
        |dup AS (
        |  SELECT gram_key FROM grams GROUP BY gram_key HAVING count(*) > 1
        |),
        |cov AS (
        |  SELECT g.doc_id, g.pos, g.pos + 8 AS e
        |  FROM grams g JOIN dup USING (gram_key)
        |),
        |isl AS (
        |  SELECT doc_id, pos, e,
        |         CASE WHEN pos > coalesce(max(e) OVER (
        |                PARTITION BY doc_id ORDER BY pos
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |                -1)
        |              THEN 1 ELSE 0 END AS brk
        |  FROM cov
        |),
        |isl2 AS (
        |  SELECT doc_id, pos, e,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |                        ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl
        |),
        |spans AS (
        |  SELECT doc_id, island, min(pos) AS s, max(e) AS en
        |  FROM isl2 GROUP BY 1, 2
        |),
        |spl AS (
        |  SELECT doc_id, list(s ORDER BY s) AS ss, list(en ORDER BY s) AS es
        |  FROM spans GROUP BY doc_id
        |),
        |scr AS (
        |  SELECT b.doc_id, b.n_tokens,
        |         list_transform(
        |           list_filter(range(len(b.toks)),
        |             i -> len(list_filter(range(len(coalesce(p.ss, []))),
        |                    j -> p.ss[j+1] <= i AND i < p.es[j+1])) = 0),
        |           i -> b.toks[i+1]) AS kept
        |  FROM base b LEFT JOIN spl p USING (doc_id)
        |)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(len(kept) AS BIGINT) AS kept_tokens,
        |       md5(coalesce(array_to_string(kept, ' '), '')) AS scrub_md5
        |FROM scr
        |ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Benchmark decontamination: flag training docs sharing winnowed
      // k-gram fingerprints with a held-out eval split (10% hash split
      // plays the benchmark). The winnowing guarantee makes this exact
      // for shared substrings >= k+w-1 chars. Ubiquitous fingerprints
      // (df > 20) are dropped first — same rarity guard as d07 — so hits
      // mean copied passages, not shared vocabulary. Shape: the corpus
      // fingerprint relation semi-joins a SMALL benchmark fingerprint
      // set (broadcast at scale); shuffle volume follows matches.
      "t09_decontaminate",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = 8; val w = 4; val maxDf = 20
        // Bounded posting lists make the whole check map-side from the
        // shared grouped relation: a fingerprint contaminates iff its
        // list holds a benchmark doc, and then each of its corpus docs
        // scores one hit — explode only those, one counting shuffle.
        // (df=1 fingerprints cannot contaminate, so sharing d07's
        // 2..maxDf postings loses nothing.)
        val isBench = (d: org.apache.spark.sql.Column) =>
          Sampling.hashBucket(d, 100) < 10
        postingsCached(s, t.documents, k, w, maxDf)
          .filter(exists(col("docs"), d => isBench(d)))
          .select(explode(filter(col("docs"), d => !isBench(d))).as("doc_id"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_hits"))
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH hs AS (
        |  SELECT doc_id,
        |         list_transform(range(length(text) - 7),
        |           i -> CAST(concat('0x', substr(md5('0:' ||
        |                  substr(text, CAST(i + 1 AS INTEGER), 8)), 1, 15))
        |                AS BIGINT)) AS hs
        |  FROM documents WHERE length(text) >= 11
        |),
        |fp AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(len(hs) - 3),
        |           j -> list_min(hs[j+1 : j+4]))) AS fps
        |  FROM hs
        |),
        |ex AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
        |rare AS (SELECT fp FROM ex GROUP BY fp HAVING count(*) <= 20),
        |fe AS (SELECT e.doc_id, e.fp,
        |         CAST(concat('0x', substr(md5(CAST(e.doc_id AS VARCHAR)), 1, 8))
        |              AS BIGINT) % 100 AS bucket
        |       FROM ex e JOIN rare r USING (fp)),
        |bench AS (SELECT DISTINCT fp FROM fe WHERE bucket < 10)
        |SELECT e.doc_id, count(DISTINCT e.fp) AS n_hits
        |FROM fe e JOIN bench b USING (fp)
        |WHERE e.bucket >= 10
        |GROUP BY e.doc_id
        |ORDER BY e.doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Quantile-band length trim: drop each source's shortest and longest
      // 5% of documents by token count — the relative-threshold outlier
      // filter that replaces hand-picked absolute length cutoffs. The
      // percent_rank tiebreak on doc_id makes the band edge deterministic;
      // one window pass per source, then the audit aggregate.
      "t10_length_band",
      (s, dir) => {
        val t = Tables(s, dir)
        val withTok = TextAnalysis.tokensRelation(t.documents, "text")
          .select(col("doc_id"), col("source"),
            size(col("toks")).cast("long").as("n_tokens"))
        Sampling.percentBandFilter(withTok, "n_tokens", "doc_id", "source",
            0.05, 0.95)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            min(col("n_tokens")).as("min_tokens"),
            max(col("n_tokens")).as("max_tokens"),
            sum(col("n_tokens")).as("sum_tokens"))
          .orderBy(col("source"))
      },
      Some("""
        |WITH toks AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
        |  FROM documents
        |),
        |pr AS (
        |  SELECT source, n_tokens,
        |         percent_rank() OVER (PARTITION BY source
        |           ORDER BY n_tokens, doc_id) AS pr
        |  FROM toks
        |)
        |SELECT source, count(*) AS n_kept,
        |       CAST(min(n_tokens) AS BIGINT) AS min_tokens,
        |       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
        |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM pr
        |WHERE pr >= 0.05 AND pr <= 0.95
        |GROUP BY source
        |ORDER BY source
        |""".stripMargin.trim)),

    QueryDef(
      // Token-budget selection: per source, take documents longest-first
      // until a 5000-token budget is spent (inclusive running total — a
      // deterministic prefix of the priority order). The data-selection
      // step that caps each domain's contribution to a training mix.
      "s05_token_budget",
      (s, dir) => {
        val t = Tables(s, dir)
        val withTok = TextAnalysis.tokensRelation(t.documents, "text")
          .select(col("doc_id"), col("source"),
            size(col("toks")).cast("long").as("n_tokens"))
        Sampling.selectUnderTokenBudget(withTok, "doc_id", "n_tokens",
            5000L, "source")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_selected"),
            sum(col("n_tokens")).as("sel_tokens"),
            min(col("n_tokens")).as("min_tokens"),
            max(col("cum_tokens")).as("used_budget"))
          .orderBy(col("source"))
      },
      Some("""
        |WITH toks AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
        |  FROM documents
        |),
        |sel AS (
        |  SELECT source, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY source
        |           ORDER BY n_tokens DESC, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM toks
        |)
        |SELECT source, count(*) AS n_selected,
        |       CAST(sum(n_tokens) AS BIGINT) AS sel_tokens,
        |       CAST(min(n_tokens) AS BIGINT) AS min_tokens,
        |       CAST(max(cum) AS BIGINT)      AS used_budget
        |FROM sel
        |WHERE cum <= 5000
        |GROUP BY source
        |ORDER BY source
        |""".stripMargin.trim)),

    QueryDef(
      // DSIR-style importance weights (arXiv:2302.03169): score every
      // document by how target-like its hashed-token distribution is
      // (target = English docs), the model-free data-selection signal
      // that reshapes a raw crawl toward a domain. Top 20 by weight —
      // highest-scoring docs must be overwhelmingly the target language,
      // which t01's langid heuristic confirms independently. The bucket
      // distribution table is 64 rows (broadcast); the per-doc fold is
      // exact-integer counts times a shared log-ratio, rounded at 4 so
      // summation order cannot leak cross-engine.
      "s06_dsir_weights",
      (s, dir) => {
        val t = Tables(s, dir)
        TextAnalysis.importanceWeights(t.documents, "doc_id", "text",
            isTarget = col("lang") === "en", buckets = 64)
          .orderBy(col("log_weight").desc, col("doc_id"))
          .limit(20)
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id, lang = 'en' AS is_tgt,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |           AS term
        |  FROM documents
        |),
        |b AS (
        |  SELECT doc_id, is_tgt,
        |         CAST(concat('0x', substr(md5(term), 1, 8)) AS BIGINT) % 64
        |           AS bucket
        |  FROM tok
        |),
        |dist AS (
        |  SELECT bucket,
        |         count(*) AS n_raw,
        |         count(*) FILTER (WHERE is_tgt) AS n_tgt
        |  FROM b GROUP BY bucket
        |),
        |tot AS (SELECT sum(n_raw) AS tr, sum(n_tgt) AS tt FROM dist),
        |lr AS (
        |  SELECT bucket,
        |         ln((n_tgt + 1.0) / (tt + 64.0)) -
        |         ln((n_raw + 1.0) / (tr + 64.0)) AS log_ratio
        |  FROM dist CROSS JOIN tot
        |),
        |pd AS (SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY doc_id, bucket)
        |SELECT pd.doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |       round(sum(c * log_ratio), 4) AS log_weight
        |FROM pd JOIN lr USING (bucket)
        |GROUP BY pd.doc_id
        |ORDER BY log_weight DESC, doc_id
        |LIMIT 20
        |""".stripMargin.trim)),

    QueryDef(
      // Learned quality filter — multinomial Naive Bayes over hashed
      // token buckets (the GPT-3/CCNet/LLaMA "quality classifier" stage;
      // see TextAnalysis.nbQualityScores). Seed labels play the curated
      // (src0/src1) vs background (src8/src9) reference sets; every doc
      // is scored by the class log-likelihood ratio + prior. The whole
      // trained model is a 64-row broadcast table; train and inference
      // share the same two keyed exchanges. Top-20 by score — rounding
      // at 4 decimals absorbs summation-order ulp noise, doc_id breaks
      // rank ties, exactly the s06 determinism recipe.
      "s07_nb_quality",
      (s, dir) => {
        val t = Tables(s, dir)
        TextAnalysis.nbQualityScores(t.documents, "doc_id", "text",
            isPositive = col("source").isin("src0", "src1"),
            isNegative = col("source").isin("src8", "src9"),
            buckets = 64)
          .orderBy(col("nb_score").desc, col("doc_id"))
          .limit(20)
      },
      Some("""
        |WITH lab AS (
        |  SELECT doc_id, text,
        |         source IN ('src0', 'src1') AS is_pos,
        |         source IN ('src8', 'src9') AS is_neg
        |  FROM documents
        |),
        |tok AS (
        |  SELECT doc_id, is_pos, is_neg,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |           AS term
        |  FROM lab
        |),
        |b AS (
        |  SELECT doc_id, is_pos, is_neg,
        |         CAST(concat('0x', substr(md5(term), 1, 8)) AS BIGINT) % 64
        |           AS bucket
        |  FROM tok
        |),
        |dist AS (
        |  SELECT bucket,
        |         count(*) FILTER (WHERE is_pos) AS n_pos,
        |         count(*) FILTER (WHERE is_neg) AS n_neg
        |  FROM b GROUP BY bucket
        |),
        |tot AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tn FROM dist),
        |w AS (
        |  SELECT bucket,
        |         ln((n_pos + 1.0) / (tp + 64.0)) -
        |         ln((n_neg + 1.0) / (tn + 64.0)) AS w
        |  FROM dist CROSS JOIN tot
        |),
        |prior AS (
        |  SELECT ln((count(*) FILTER (WHERE is_pos) + 1.0) /
        |            (count(*) FILTER (WHERE is_neg) + 1.0)) AS log_prior
        |  FROM lab
        |),
        |pd AS (SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY doc_id, bucket)
        |SELECT pd.doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |       round(sum(c * w) + any_value(log_prior), 4) AS nb_score
        |FROM pd JOIN w USING (bucket) CROSS JOIN prior
        |GROUP BY pd.doc_id
        |ORDER BY nb_score DESC, doc_id
        |LIMIT 20
        |""".stripMargin.trim)),

    QueryDef(
      // Uncertainty sampling (Lewis & Gale, SIGIR'94 — the active-learning
      // selection step): the docs the trained NB quality filter is LEAST
      // sure about (|log-likelihood ratio| closest to 0) are the ones
      // worth human labels next — annotating confident docs teaches the
      // model nothing. Same trained model and exact-integer scoring as
      // s07 (the oracle replays the full NB chain); only the ranking
      // changes, so the selection is engine-invariant under the identical
      // round-at-4 + doc_id tiebreak rule.
      "s10_uncertainty_sample",
      (s, dir) => {
        val t = Tables(s, dir)
        TextAnalysis.nbQualityScores(t.documents, "doc_id", "text",
            isPositive = col("source").isin("src0", "src1"),
            isNegative = col("source").isin("src8", "src9"),
            buckets = 64)
          .orderBy(abs(col("nb_score")), col("doc_id"))
          .limit(20)
      },
      Some("""
        |WITH lab AS (
        |  SELECT doc_id, text,
        |         source IN ('src0', 'src1') AS is_pos,
        |         source IN ('src8', 'src9') AS is_neg
        |  FROM documents
        |),
        |tok AS (
        |  SELECT doc_id, is_pos, is_neg,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |           AS term
        |  FROM lab
        |),
        |b AS (
        |  SELECT doc_id, is_pos, is_neg,
        |         CAST(concat('0x', substr(md5(term), 1, 8)) AS BIGINT) % 64
        |           AS bucket
        |  FROM tok
        |),
        |dist AS (
        |  SELECT bucket,
        |         count(*) FILTER (WHERE is_pos) AS n_pos,
        |         count(*) FILTER (WHERE is_neg) AS n_neg
        |  FROM b GROUP BY bucket
        |),
        |tot AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tn FROM dist),
        |w AS (
        |  SELECT bucket,
        |         ln((n_pos + 1.0) / (tp + 64.0)) -
        |         ln((n_neg + 1.0) / (tn + 64.0)) AS w
        |  FROM dist CROSS JOIN tot
        |),
        |prior AS (
        |  SELECT ln((count(*) FILTER (WHERE is_pos) + 1.0) /
        |            (count(*) FILTER (WHERE is_neg) + 1.0)) AS log_prior
        |  FROM lab
        |),
        |pd AS (SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY doc_id, bucket)
        |SELECT pd.doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |       round(sum(c * w) + any_value(log_prior), 4) AS nb_score
        |FROM pd JOIN w USING (bucket) CROSS JOIN prior
        |GROUP BY pd.doc_id
        |ORDER BY abs(round(sum(c * w) + any_value(log_prior), 4)), doc_id
        |LIMIT 20
        |""".stripMargin.trim)),

    QueryDef(
      // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
      // the k largest md5-derived u^(1/w) keys are an exact weighted
      // sample — here weight = n_chars, so selection probability scales
      // with document length. The uniform u is (v + 0.5)/2^32 from the
      // first 8 md5 hex chars — bit-identical on both engines — and keys
      // compare in log space to dodge pow's rounding. Plans as
      // TakeOrderedAndProject: per-partition top-k, no global sort.
      "s11_weighted_sample",
      (s, dir) => {
        val t = Tables(s, dir)
        // + 0.0 normalizes IEEE negative zero: a key in (-5e-7, 0) rounds
        // to -0.0 in one engine and 0.0 in the other (seen at the sf1
        // replay, where longer docs push keys toward zero); -0.0 + 0.0 is
        // +0.0 in both engines and every other value is unchanged.
        Sampling.weightedSample(t.documents, "doc_id", "n_chars",
            k = 20, salt = "ws42")
          .select(col("doc_id"), col("source"), col("n_chars"),
            (round(col("wkey"), 6) + lit(0.0)).as("wkey"))
      },
      Some("""
        |WITH k AS (
        |  SELECT doc_id, source, n_chars,
        |         ln((CAST(concat('0x',
        |               substr(md5(CAST(doc_id AS VARCHAR) || ':ws42'), 1, 8))
        |             AS BIGINT) + 0.5) / 4294967296.0) / n_chars AS key
        |  FROM documents
        |)
        |SELECT doc_id, source, n_chars, round(key, 6) + 0.0 AS wkey
        |FROM k
        |ORDER BY key DESC, doc_id
        |LIMIT 20
        |""".stripMargin.trim)),

    QueryDef(
      // Soft deduplication (reweight-don't-drop, arXiv:2407.04752):
      // duplicate clusters are down-weighted by 1/|cluster| instead of
      // deleted, so each distinct content contributes one row-equivalent
      // of signal. The testdata has no exact duplicates, so the query
      // PLANTS them the way an ingest sees re-crawls: the doc_id < 40
      // slice re-enters once (cluster size 2) and the doc_id < 10 slice
      // twice more (cluster size 4 for those). Per-source audit of rows
      // vs clusters vs effective (weighted) volume; one window count over
      // md5(text) — a single shuffle at any corpus size.
      "s12_soft_dedup",
      (s, dir) => {
        val t = Tables(s, dir)
        val base = t.documents
          .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
        val corpus = base
          .unionByName(base.filter(col("doc_id") < 40)
            .withColumn("doc_id", col("doc_id") + 200000L))
          .unionByName(base.filter(col("doc_id") < 10)
            .withColumn("doc_id", col("doc_id") + 300000L))
          .unionByName(base.filter(col("doc_id") < 10)
            .withColumn("doc_id", col("doc_id") + 400000L))
        Sampling.softDedupWeights(corpus, md5(col("text")))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(md5(col("text"))).as("n_clusters"),
            round(sum(col("soft_weight")), 6).as("effective_docs"),
            round(sum(col("n_chars") * col("soft_weight")), 4)
              .as("effective_chars"))
          .orderBy(col("source"))
      },
      Some("""
        |WITH corpus AS (
        |  SELECT doc_id, text, source, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000, text, source, n_chars FROM documents
        |  WHERE doc_id < 40
        |  UNION ALL
        |  SELECT doc_id + 300000, text, source, n_chars FROM documents
        |  WHERE doc_id < 10
        |  UNION ALL
        |  SELECT doc_id + 400000, text, source, n_chars FROM documents
        |  WHERE doc_id < 10
        |),
        |cl AS (
        |  SELECT source, n_chars, md5(text) AS ckey,
        |         count(*) OVER (PARTITION BY md5(text)) AS cluster_size
        |  FROM corpus
        |)
        |SELECT source,
        |       count(*) AS n_rows,
        |       count(DISTINCT ckey) AS n_clusters,
        |       round(sum(1.0 / cluster_size), 6) AS effective_docs,
        |       round(sum(n_chars * 1.0 / cluster_size), 4) AS effective_chars
        |FROM cl
        |GROUP BY source
        |ORDER BY source
        |""".stripMargin.trim)),

    QueryDef(
      // Character-distribution entropy: the one-pass compression-ratio
      // proxy (low entropy = boilerplate / repeated-keyword spam; natural
      // prose sits near the language's ~2.8-3.1 nat band). The fused
      // CharEntropy expression keeps the per-row distribution inside the
      // scan — map-only at any corpus size, versus token-level signals
      // that need a corpus aggregate. Keep decisions compare the ROUNDED
      // value, so they are engine-invariant by construction.
      "t25_char_entropy",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          .select(col("doc_id"), col("n_chars"),
            round(graft.functions.CharEntropy(col("text")), 4)
              .as("char_entropy"))
          .withColumn("keep", col("char_entropy") >= 2.0)
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH ch AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
        |  FROM documents
        |),
        |freq AS (
        |  SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c
        |),
        |freq2 AS (
        |  SELECT doc_id, k, sum(k) OVER (PARTITION BY doc_id) AS n
        |  FROM freq
        |),
        |ent AS (
        |  SELECT doc_id, -sum((k * 1.0 / n) * ln(k * 1.0 / n)) AS h
        |  FROM freq2 GROUP BY doc_id
        |)
        |SELECT d.doc_id, d.n_chars, round(e.h, 4) AS char_entropy,
        |       round(e.h, 4) >= 2.0 AS keep
        |FROM documents d JOIN ent e USING (doc_id)
        |ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Gopher quality rules (arXiv:2112.11446 Table A1): the rule battery
      // web-scale corpora run BEFORE any learned scorer — word count band,
      // mean word length band, symbol ratio, bullet/ellipsis line ratios,
      // alphabetic-word fraction, required-stopword floor. Map-only pass
      // (zero shuffles at any corpus size); every ratio is an exact
      // integer division so keep decisions are engine-invariant.
      "t16_gopher_rules",
      (s, dir) => {
        val t = Tables(s, dir)
        TextAnalysis.gopherQuality(t.documents, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |base AS (
        |  SELECT doc_id,
        |         len(toks) AS n_words,
        |         CAST(length(array_to_string(toks, '')) AS DOUBLE)
        |           / len(toks) AS mean_word_len,
        |         CAST(length(text) - length(replace(text, '#', ''))
        |              + (length(text) - length(replace(text, '...', ''))) // 3
        |              AS DOUBLE) / len(toks) AS symbol_ratio,
        |         list_filter(string_split(text, chr(10)),
        |                     l -> trim(l) <> '') AS lines,
        |         CAST(len(list_filter(toks,
        |                t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
        |           / len(toks) AS alpha_word_ratio,
        |         len(list_intersect(list_distinct(toks),
        |             ['the','be','to','of','and','that','have','with'])) AS n_req
        |  FROM tok
        |),
        |r AS (
        |  SELECT doc_id, n_words, mean_word_len, symbol_ratio,
        |         CASE WHEN len(lines) > 0
        |              THEN CAST(len(list_filter(lines,
        |                     l -> starts_with(l, '- ') OR starts_with(l, '* ')
        |                          OR starts_with(l, '•'))) AS DOUBLE)
        |                   / len(lines) ELSE 0.0 END AS bullet_line_ratio,
        |         CASE WHEN len(lines) > 0
        |              THEN CAST(len(list_filter(lines,
        |                     l -> ends_with(rtrim(l), '...'))) AS DOUBLE)
        |                   / len(lines) ELSE 0.0 END AS ellipsis_line_ratio,
        |         alpha_word_ratio, n_req
        |  FROM base
        |)
        |SELECT doc_id, n_words,
        |       round(mean_word_len, 6)      AS mean_word_len,
        |       round(symbol_ratio, 6)       AS symbol_ratio,
        |       round(bullet_line_ratio, 6)  AS bullet_line_ratio,
        |       round(ellipsis_line_ratio, 6) AS ellipsis_line_ratio,
        |       round(alpha_word_ratio, 6)   AS alpha_word_ratio,
        |       n_req AS n_req_stopwords,
        |       CASE WHEN n_words >= 50 AND n_words <= 100000
        |                 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |                 AND symbol_ratio <= 0.1 AND bullet_line_ratio < 0.9
        |                 AND ellipsis_line_ratio < 0.3
        |                 AND alpha_word_ratio >= 0.8 AND n_req >= 2
        |            THEN 1 ELSE 0 END AS keep
        |FROM r ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Filter-funnel attribution: every document attributed to the FIRST
      // pipeline stage that rejects it (exact-dup tier, then the Gopher
      // battery in its fixed rule order) — the "which rule is eating my
      // data" debugging view a curation pipeline needs before anyone tunes
      // thresholds. Battery configured for this corpus like p02 (stopword
      // floor 1 — the stock floor of 2 exceeds the synthetic vocabulary).
      // The dedup stage is made non-vacuous by planting a simulated
      // re-crawl (v06/s12 pattern): every 50th doc re-enters under a new id,
      // and the md5 window attributes exactly those copies to 'exact_dup'.
      // Scale shape: one md5-keyed window (the d01 tier) + map-only rule
      // metrics + one (source, stage) aggregation; the pct window runs on
      // the |sources|x|stages|-bounded relation.
      "t28_filter_funnel",
      (s, dir) => {
        val t = Tables(s, dir)
        val corpus = t.documents.select(col("doc_id"), col("text"),
            col("source"))
          .unionAll(t.documents
            .filter(pmod(col("doc_id"), lit(50)) === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
              col("source")))
        val rn = row_number().over(
          Window.partitionBy(md5(col("text").cast("binary")))
            .orderBy(col("doc_id")))
        val staged = corpus
          .withColumn("rn", rn)
          .withColumn("stage", when(col("rn") > 1, "exact_dup")
            .otherwise(TextAnalysis.gopherFirstFail("text",
              minStopwords = 1)))
        staged.groupBy(col("source"), col("stage"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("pct", round(col("n_docs").cast("double") /
            sum(col("n_docs")).over(Window.partitionBy(col("source"))), 6))
          .orderBy(col("source"), col("stage"))
      },
      Some("""
        |WITH corpus AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, source FROM documents
        |  WHERE doc_id % 50 = 0
        |),
        |dup AS (
        |  SELECT doc_id, text, source,
        |         row_number() OVER (PARTITION BY md5(text)
        |                            ORDER BY doc_id) AS rn
        |  FROM corpus
        |),
        |tok AS (
        |  SELECT doc_id, text, source, rn,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM dup
        |),
        |base AS (
        |  SELECT doc_id, source, rn,
        |         len(toks) AS n_words,
        |         CAST(length(array_to_string(toks, '')) AS DOUBLE)
        |           / len(toks) AS mean_word_len,
        |         CAST(length(text) - length(replace(text, '#', ''))
        |              + (length(text) - length(replace(text, '...', ''))) // 3
        |              AS DOUBLE) / len(toks) AS symbol_ratio,
        |         list_filter(string_split(text, chr(10)),
        |                     l -> trim(l) <> '') AS lines,
        |         CAST(len(list_filter(toks,
        |                t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
        |           / len(toks) AS alpha_word_ratio,
        |         len(list_intersect(list_distinct(toks),
        |             ['the','be','to','of','and','that','have','with'])) AS n_req
        |  FROM tok
        |),
        |r AS (
        |  SELECT doc_id, source, rn, n_words, mean_word_len, symbol_ratio,
        |         CASE WHEN len(lines) > 0
        |              THEN CAST(len(list_filter(lines,
        |                     l -> starts_with(l, '- ') OR starts_with(l, '* ')
        |                          OR starts_with(l, '•'))) AS DOUBLE)
        |                   / len(lines) ELSE 0.0 END AS bullet_line_ratio,
        |         CASE WHEN len(lines) > 0
        |              THEN CAST(len(list_filter(lines,
        |                     l -> ends_with(rtrim(l), '...'))) AS DOUBLE)
        |                   / len(lines) ELSE 0.0 END AS ellipsis_line_ratio,
        |         alpha_word_ratio, n_req
        |  FROM base
        |),
        |staged AS (
        |  SELECT doc_id, source,
        |         CASE WHEN rn > 1 THEN 'exact_dup'
        |              WHEN n_words < 50 OR n_words > 100000 THEN 'words'
        |              WHEN mean_word_len < 3.0 OR mean_word_len > 10.0
        |                THEN 'word_shape'
        |              WHEN symbol_ratio > 0.1 THEN 'symbols'
        |              WHEN bullet_line_ratio >= 0.9
        |                   OR ellipsis_line_ratio >= 0.3 THEN 'layout'
        |              WHEN alpha_word_ratio < 0.8 THEN 'alpha'
        |              WHEN n_req < 1 THEN 'stopwords'
        |              ELSE 'kept' END AS stage
        |  FROM r
        |),
        |agg AS (
        |  SELECT source, stage, count(*) AS n_docs FROM staged GROUP BY 1, 2
        |)
        |SELECT source, stage, n_docs,
        |       round(CAST(n_docs AS DOUBLE)
        |             / sum(n_docs) OVER (PARTITION BY source), 6) AS pct
        |FROM agg ORDER BY source, stage
        |""".stripMargin.trim)),

    QueryDef(
      // CCNet-shaped pipeline composition (Wenzek et al. 2020,
      // arXiv:1911.00359): exact-dedup -> language ID -> LM-perplexity
      // terciles (head/middle/tail), each stage one of this engine's
      // operators riding the SHARED corpus artifacts (fingerprint pass,
      // t01's langid, t13's persisted vocab relation). The tercile
      // assignment is the exact global ntile(3) over (ppl, doc_id) — but
      // computed from a (ppl, count) relation (q47's rank-from-counts
      // technique), never by sorting the document relation in one task:
      // the reported aggregates depend only on HOW MANY docs of each ppl
      // value land in each bucket, and docs with equal ppl are
      // interchangeable for count/avg/min/max, so the ntile boundary
      // arithmetic over cumulative value counts reproduces the window's
      // buckets exactly. The cumulative counts themselves ride
      // GlobalOrder's two-pass range/offset pass — no partition-less
      // window anywhere, at any scale.
      "t18_ccnet_pipeline",
      (s, dir) => {
        val t = Tables(s, dir)
        // ONE corpus scan computes the content fingerprint AND the langid
        // marker hits (languageId's `keep` fusion); the dedup window then
        // shuffles only (doc_id, fp, pred_lang) — the text never crosses
        // an exchange, and the old keepers-join-lang stage disappears.
        val scored = TextAnalysis.languageId(t.documents, "doc_id", "text",
          keep = Seq(Dedup.fingerprint(col("text")).as("fp")))
        val ppl = TextAnalysis.unigramPerplexity(t.documents, "doc_id", "text")
          .select(col("doc_id"), col("ppl"))
        val en = scored
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
          .filter(col("rn") === 1 && col("pred_lang") === "en")
          .select(col("doc_id"))
          .join(ppl, "doc_id")
        // Value counts: docs collapse to their (map-side partially
        // aggregated) rounded-ppl value — the only relation ranked.
        val pc = en.groupBy(col("ppl")).agg(count(lit(1)).as("cnt"))
        val (cum, n) = graft.ops.GlobalOrder.withRunningTotal(
          pc, Seq(col("ppl")), col("cnt"), "cum")
        // ntile(3) bucket i covers global sort positions (blo, bhi]; a ppl
        // group occupying (cum-cnt, cum] contributes its overlap with each
        // bucket interval. Integer overlap >= 1 is implied by the join
        // predicate, so min/max see exactly the contributing values.
        val b = graft.ops.GlobalOrder.ntileBounds(n, 3)
        val bounds = s.createDataFrame(Seq(
            (1, b(0), b(1)), (2, b(1), b(2)), (3, b(2), b(3))))
          .toDF("bucket", "blo", "bhi")
        cum.join(broadcast(bounds),
            col("cum") - col("cnt") < col("bhi") && col("cum") > col("blo"))
          .withColumn("nk",
            least(col("cum"), col("bhi")) -
              greatest(col("cum") - col("cnt"), col("blo")))
          .groupBy(col("bucket"))
          .agg(sum(col("nk")).as("n_docs"),
            round(sum(col("ppl") * col("nk")) / sum(col("nk")), 4)
              .as("avg_ppl"),
            min(col("ppl")).as("min_ppl"),
            max(col("ppl")).as("max_ppl"))
          .orderBy(col("bucket"))
      },
      Some("""
        |WITH fp AS (
        |  SELECT doc_id,
        |         md5(trim(regexp_replace(regexp_replace(lower(text),
        |             '[.,!?;:]', '', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents
        |),
        |keep AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |    FROM fp) WHERE rn = 1
        |),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |hits AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein'))) AS hits_de,
        |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','is','in')))         AS hits_en,
        |    len(list_filter(toks, x -> x IN ('el','los','de','y','es','un','una')))         AS hits_es,
        |    len(list_filter(toks, x -> x IN ('le','la','et','est','les','un','une')))       AS hits_fr,
        |    len(list_filter(toks, x -> x IN ('的','是','了','在','我')))                      AS hits_zh
        |  FROM tok
        |),
        |lang AS (
        |  SELECT doc_id,
        |         CASE greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh)
        |              WHEN hits_de THEN 'de' WHEN hits_en THEN 'en'
        |              WHEN hits_es THEN 'es' WHEN hits_fr THEN 'fr'
        |              ELSE 'zh' END AS pred_lang
        |  FROM hits
        |),
        |toksu AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
        |vocab AS (SELECT tok, count(*) AS c FROM toksu GROUP BY tok),
        |stats AS (SELECT sum(c) AS n, count(*) AS v FROM vocab),
        |ppl AS (
        |  SELECT t.doc_id, round(exp(avg(-ln((c + 1.0) / (n + v)))), 4) AS ppl
        |  FROM toksu t JOIN vocab USING (tok), stats
        |  GROUP BY t.doc_id
        |),
        |en AS (
        |  SELECT k.doc_id, p.ppl
        |  FROM keep k
        |  JOIN lang l ON l.doc_id = k.doc_id
        |  JOIN ppl p ON p.doc_id = k.doc_id
        |  WHERE l.pred_lang = 'en'
        |),
        |b AS (
        |  SELECT doc_id, ppl,
        |         ntile(3) OVER (ORDER BY ppl, doc_id) AS bucket
        |  FROM en
        |)
        |SELECT bucket, count(*) AS n_docs,
        |       round(avg(ppl), 4) AS avg_ppl,
        |       min(ppl) AS min_ppl, max(ppl) AS max_ppl
        |FROM b GROUP BY bucket ORDER BY bucket
        |""".stripMargin.trim)),

    QueryDef(
      // Per-domain unigram-distribution KL divergence from the corpus
      // mixture — the data-mixture diagnostic run before choosing domain
      // weights (the quantity DoReMi-style reweighting, arXiv:2305.10429,
      // optimizes against). One corpus scan feeds a (domain, token) count;
      // everything downstream is vocab-bounded, never corpus-sized.
      "t19_domain_kl",
      (s, dir) => {
        val t = Tables(s, dir)
        TextAnalysis.domainDivergence(t.documents, "doc_id", "text", "source")
          .withColumnRenamed("domain", "source")
      },
      Some("""
        |WITH tok AS (
        |  SELECT source,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents
        |),
        |st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |j AS (
        |  SELECT source, token, CAST(c AS DOUBLE) AS c,
        |         CAST(sum(c) OVER (PARTITION BY source) AS DOUBLE) AS ns,
        |         CAST(sum(c) OVER (PARTITION BY token) AS DOUBLE) AS ct,
        |         CAST(sum(c) OVER () AS DOUBLE) AS n
        |  FROM st
        |)
        |SELECT source,
        |       CAST(sum(c) AS BIGINT) AS n_tokens,
        |       count(*) AS n_distinct,
        |       round(sum((c / ns) * ln((c / ns) / (ct / n))), 4) AS kl
        |FROM j
        |GROUP BY source
        |ORDER BY source
        |""".stripMargin.trim)),

    QueryDef(
      // Per-source distinctive terms: class-based TF-IDF (the BERTopic
      // c-TF-IDF shape — each source is one pseudo-document, idf counts
      // the SOURCES containing a term). Top-5 per source labels what
      // makes each slice of a mixture different — the topic-card feed of
      // a corpus datasheet. Rides the shared tokensRelation; the only
      // corpus-sized shuffle is the (source, token) count, with every
      // window and the rank running on the vocab-bounded relation.
      // Scores round at 6 BEFORE ranking so both engines rank the
      // identical value; ties break on token.
      "t20_tfidf_terms",
      (s, dir) => {
        val t = Tables(s, dir)
        TextAnalysis.distinctiveTerms(t.documents, "doc_id", "text",
            "source", topK = 5)
          .withColumnRenamed("domain", "source")
          .orderBy(col("source"), col("rk"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT source,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents
        |),
        |st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |w AS (
        |  SELECT source, token, c,
        |         sum(c) OVER (PARTITION BY source) AS ns,
        |         count(*) OVER (PARTITION BY token) AS df,
        |         (SELECT count(DISTINCT source) FROM st) AS n_dom
        |  FROM st
        |),
        |scored AS (
        |  SELECT source, token,
        |         round((CAST(c AS DOUBLE) / CAST(ns AS DOUBLE)) *
        |               ln(1.0 + CAST(n_dom AS DOUBLE) / CAST(df AS DOUBLE)), 6)
        |           AS score
        |  FROM w
        |),
        |ranked AS (
        |  SELECT source, token, score,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY score DESC, token) AS rk
        |  FROM scored
        |)
        |SELECT source, rk, token, score
        |FROM ranked WHERE rk <= 5
        |ORDER BY source, rk
        |""".stripMargin.trim)),

    QueryDef(
      // Content-defined chunking (FastCDC/rsync family): cut wherever the
      // rolling 8-gram hash ≡ 0 mod 64 — boundaries move WITH the content,
      // so an edit near the front leaves every untouched chunk's identity
      // (start-relative bytes, hence md5) intact, unlike t11's fixed
      // stride. Chunk hashes are the unit of chunk-level dedup and
      // transfer caching. Map-only at any corpus size; the oracle replays
      // the identical hash/cut/md5 chain.
      "t22_cdc_chunks",
      (s, dir) => {
        val t = Tables(s, dir)
        TextAnalysis.cdcChunks(t.documents, "doc_id", "text",
            k = 8, modulus = 64)
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""
        |WITH h AS (
        |  SELECT doc_id, text,
        |         CASE WHEN length(text) >= 8
        |              THEN list_transform(range(length(text) - 7),
        |                     i -> CAST(concat('0x', substr(md5('0:' ||
        |                            substr(text, CAST(i + 1 AS INTEGER), 8)),
        |                            1, 15)) AS BIGINT))
        |              ELSE [] END AS hs
        |  FROM documents
        |),
        |c AS (
        |  SELECT doc_id, text,
        |         [0] ||
        |         list_filter(range(1, greatest(len(hs), 1)),
        |           i -> hs[i+1] % 64 = 0) ||
        |         [length(text)] AS cuts
        |  FROM h
        |),
        |e AS (
        |  SELECT doc_id, text, cuts, unnest(range(len(cuts) - 1)) AS j
        |  FROM c
        |)
        |SELECT doc_id, CAST(j AS INTEGER) AS chunk_idx,
        |       CAST(cuts[j+1] AS BIGINT) AS start,
        |       CAST(cuts[j+2] - cuts[j+1] AS BIGINT) AS len,
        |       md5(substr(text, CAST(cuts[j+1] + 1 AS INTEGER),
        |                  CAST(cuts[j+2] - cuts[j+1] AS INTEGER))) AS chunk_md5
        |FROM e
        |WHERE cuts[j+2] - cuts[j+1] > 0
        |ORDER BY doc_id, chunk_idx
        |""".stripMargin.trim)),

    QueryDef(
      // Tokenizer fertility evaluation: apply the corpus-trained BPE
      // (t17's cached merge table) to each source's vocabulary and grade
      // the result — the "is this tokenizer efficient on this mixture"
      // check run before committing a tokenizer to a training corpus.
      // Segmentation runs over the DISTINCT-word relation (Zipf-bounded),
      // never the corpus; per-source stats weight by word frequency.
      // n_tokens/n_distinct_words are SQL-exact; the BPE-dependent facts
      // ship as in-query contract booleans (the merge argmax is iterative,
      // not one SQL statement — t17's exemption): every segmented word
      // rejoins to its original, and weighted fertility lies in
      // [1, mean word chars].
      "t23_bpe_fertility",
      (s, dir) => {
        val t = Tables(s, dir)
        val merges = graft.ops.Bpe.trainCached(t.documents, "text",
          numMerges = 8).map(m => (m._2, m._3))
        val toks = TextAnalysis.tokensRelation(t.documents, "text")
        val words = toks
          .select(col("source"), explode(col("toks")).as("word"))
          .groupBy(col("source"), col("word"))
          .agg(count(lit(1)).as("freq"))
        graft.ops.Bpe.segment(words, "word", merges)
          .withColumn("n_pieces", size(col("pieces")))
          .withColumn("rejoined", concat_ws("", col("pieces")))
          .groupBy(col("source"))
          .agg(sum(col("freq")).as("n_tokens"),
            count(lit(1)).as("n_distinct_words"),
            (sum(when(col("rejoined") === col("word"), 0L).otherwise(1L))
              === 0L).as("rejoin_ok"),
            (sum(col("freq") * col("n_pieces")) >= sum(col("freq")))
              .as("fertility_ge_1"),
            (sum(col("freq") * col("n_pieces")) <=
              sum(col("freq") * length(col("word"))))
              .as("fertility_le_chars"))
          .orderBy(col("source"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT source,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        |  FROM documents
        |),
        |st AS (SELECT source, word, count(*) AS freq FROM tok GROUP BY 1, 2)
        |SELECT source, CAST(sum(freq) AS BIGINT) AS n_tokens,
        |       count(*) AS n_distinct_words,
        |       TRUE AS rejoin_ok, TRUE AS fertility_ge_1,
        |       TRUE AS fertility_le_chars
        |FROM st GROUP BY source
        |ORDER BY source
        |""".stripMargin.trim)),

    QueryDef(
      // Temperature-scaled domain mixing (XLM arXiv:1901.07291 §3.1 /
      // mT5): w_d = sqrt(|d|) / sum sqrt(|j|) flattens the domain size
      // distribution; each domain down-samples toward its share of a
      // 200-doc budget by the engine's deterministic md5-bucket rule.
      // The raw sources are uniform (25 docs each), so the domain is the
      // 4-char source prefix — which merges src10..src19 into "src1",
      // a deliberately SKEWED 11x grouping that makes the flattening
      // non-vacuous: "src1" holds 55% of the corpus but sqrt-temperature
      // caps it at ~28% of the weight. Output: per-domain corpus size,
      // weight, and sampled doc/char totals. The keep decision is an
      // integer bucket-vs-threshold comparison, so the sampled SET is
      // engine/partition-invariant.
      "s08_temperature_mix",
      (s, dir) => {
        val t = Tables(s, dir)
        val docs = t.documents
          .withColumn("domain", substring(col("source"), 1, 4))
        Sampling.temperatureMix(docs, "doc_id", "domain", budget = 200L)
          .groupBy(col("domain"), col("c_docs"), col("weight"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("n_chars")).as("sampled_chars"))
          .select(col("domain"), col("c_docs"),
            round(col("weight"), 4).as("weight"),
            col("n_sampled"), col("sampled_chars"))
          .orderBy(col("domain"))
      },
      Some("""
        |WITH d AS (SELECT doc_id, n_chars, substr(source, 1, 4) AS domain
        |           FROM documents),
        |c AS (SELECT domain, count(*) AS c_docs FROM d GROUP BY domain),
        |z AS (SELECT sum(sqrt(c_docs)) AS z FROM c),
        |r AS (
        |  SELECT domain, c_docs,
        |         sqrt(c_docs) / z AS weight,
        |         CAST(round(least(1.0, (sqrt(c_docs) / z) * 200 / c_docs) * 10000)
        |              AS BIGINT) AS thresh
        |  FROM c CROSS JOIN z
        |),
        |kept AS (
        |  SELECT d.domain, d.n_chars
        |  FROM d JOIN r USING (domain)
        |  WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |        % 10000 < r.thresh
        |)
        |SELECT r.domain, r.c_docs, round(r.weight, 4) AS weight,
        |       count(*) AS n_sampled,
        |       CAST(sum(k.n_chars) AS BIGINT) AS sampled_chars
        |FROM kept k JOIN r ON r.domain = k.domain
        |GROUP BY r.domain, r.c_docs, r.weight
        |ORDER BY r.domain
        |""".stripMargin.trim)),

    QueryDef(
      // Curriculum ordering (Bengio et al., ICML'09): rank the corpus by
      // LM perplexity (easy -> hard), cut into terciles, and interleave
      // them round-robin into a deterministic training order — every
      // consecutive block of 3 samples spans the difficulty range, so
      // early training isn't all-easy and the order is reproducible
      // bit-for-bit across engines (ntile over rounded ppl with doc_id
      // tiebreak). Rides the memoized perplexity relation (scored once
      // for t13 and every composite consumer). The interleave needs the
      // exact global rank under (ppl, doc_id) — computed by GlobalOrder's
      // two-pass range/offset rank, never a partition-less ntile window
      // (one task sorting the corpus) nor a 3-partition row_number window
      // (the q47 low-cardinality trap); tercile and position are then
      // pure arithmetic on the rank against the ntile(3) boundaries, and
      // only the 10 head ranks of each tercile survive to the final
      // TakeOrdered.
      "s09_curriculum",
      (s, dir) => {
        val t = Tables(s, dir)
        val ppl = TextAnalysis.unigramPerplexity(t.documents, "doc_id",
          "text")
        val (ranked, n) = graft.ops.GlobalOrder.withGlobalRank(
          ppl, Seq(col("ppl"), col("doc_id")), "_rk")
        val b = graft.ops.GlobalOrder.ntileBounds(n, 3)
        // position = (rank_within_tercile - 1) * 3 + tercile - 1, so
        // positions 0..29 are exactly rank_within_tercile <= 10 of each
        // tercile (every tercile holds >= 10 once n >= 30 — below that
        // the limit keeps all rows, so nothing is pre-filtered).
        val tercile = when(col("_rk") <= b(1), 1L)
          .when(col("_rk") <= b(2), 2L).otherwise(3L)
        val start = when(col("_rk") <= b(1), 0L)
          .when(col("_rk") <= b(2), b(1)).otherwise(b(2))
        val head =
          if (n < 30) ranked
          else ranked.filter(
            col("_rk") <= b(0) + 10 ||
              (col("_rk") > b(1) && col("_rk") <= b(1) + 10) ||
              (col("_rk") > b(2) && col("_rk") <= b(2) + 10))
        head
          .withColumn("tercile", tercile)
          .withColumn("position",
            (col("_rk") - start - 1) * 3 + col("tercile") - 1)
          .select(col("position"), col("doc_id"), col("tercile"), col("ppl"))
          .orderBy(col("position"))
          .limit(30)
      },
      Some("""
        |WITH toks AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents
        |),
        |vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |stats AS (SELECT sum(c) AS n, count(*) AS v FROM vocab),
        |ppl AS (
        |  SELECT t.doc_id, round(exp(avg(-ln((c + 1.0) / (n + v)))), 4) AS ppl
        |  FROM toks t JOIN vocab USING (tok), stats
        |  GROUP BY t.doc_id
        |),
        |tiered AS (
        |  SELECT doc_id, ppl,
        |         CAST(ntile(3) OVER (ORDER BY ppl, doc_id) AS BIGINT) AS tercile
        |  FROM ppl
        |),
        |ordered AS (
        |  SELECT CAST((row_number() OVER (PARTITION BY tercile
        |                                  ORDER BY ppl, doc_id) - 1) * 3
        |              AS BIGINT) + tercile - 1 AS position,
        |         doc_id, tercile, ppl
        |  FROM tiered
        |)
        |SELECT position, doc_id, tercile, ppl
        |FROM ordered
        |ORDER BY position
        |LIMIT 30
        |""".stripMargin.trim)),

    QueryDef(
      // Per-source data card ("Datasheets for Datasets", Gebru et al.,
      // arXiv:1803.09010, as a query): the per-domain summary a curated
      // corpus ships with — doc/token counts, exact- AND near-duplicate
      // incidence, dominant predicted language, mean LM perplexity, mean
      // heuristic quality. Every column rides an operator this engine
      // already memoizes (tokensRelation, fingerprint, the d02 minhash
      // pair cache, languageId, unigramPerplexity, qualityScore), so the
      // composed plan adds only id-keyed joins and ONE per-source fold —
      // no new corpus scans beyond the operators' own. n_dup_docs is
      // exact-fingerprint membership (legitimately 0 on this corpus —
      // the mechanism is pinned with planted dups in OpsSpec);
      // n_neardup_docs counts docs in any MinHash-verified pair at
      // jaccard >= 0.5, the same relation d02 certifies. The
      // dominant-language pick is (count desc, lang asc) —
      // deterministic on ties.
      "p03_data_card",
      (s, dir) => {
        val t = Tables(s, dir)
        val base = TextAnalysis.tokensRelation(t.documents, "text")
          .select(col("doc_id"), col("source"),
            size(col("toks")).cast("long").as("n_tokens"))
        val dup = t.documents
          .select(col("doc_id"), Dedup.fingerprint(col("text")).as("fp"))
          .withColumn("is_dup",
            (count(lit(1)).over(Window.partitionBy(col("fp"))) > 1)
              .cast("long"))
          .select(col("doc_id"), col("is_dup"))
        val neardup = Dedup.nearDuplicatesMinhashCached(t.documents,
            "doc_id", "text", threshold = 0.5, numHashes = 32, bands = 8,
            shingleN = 3)
          .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
          .distinct()
          .withColumn("is_neardup", lit(1L))
        val lang = TextAnalysis.languageId(t.documents, "doc_id", "text")
          .select(col("doc_id"), col("pred_lang"))
        val ppl = TextAnalysis.unigramPerplexity(t.documents, "doc_id", "text")
          .select(col("doc_id"), col("ppl"))
        val quality = TextAnalysis.qualityScore(
            TextAnalysis.qualityMetrics(t.documents, "doc_id", "text"))
          .select(col("doc_id"), col("quality_score"))
        val perDoc = base.join(dup, "doc_id").join(lang, "doc_id")
          .join(ppl, "doc_id").join(quality, "doc_id")
          .join(neardup, Seq("doc_id"), "left")
        val card = perDoc.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("is_dup")).as("n_dup_docs"),
          sum(coalesce(col("is_neardup"), lit(0L))).as("n_neardup_docs"),
          round(avg(col("ppl")), 4).as("avg_ppl"),
          round(avg(col("quality_score")), 4).as("avg_quality"))
        val topLang = perDoc
          .groupBy(col("source"), col("pred_lang"))
          .agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(Window.partitionBy(col("source"))
            .orderBy(col("c").desc, col("pred_lang"))))
          .filter(col("rn") === 1)
          .select(col("source"), col("pred_lang").as("top_lang"),
            col("c").as("top_lang_docs"))
        card.join(topLang, "source")
          .select(col("source"), col("n_docs"), col("total_tokens"),
            col("n_dup_docs"), col("n_neardup_docs"),
            col("top_lang"), col("top_lang_docs"),
            col("avg_ppl"), col("avg_quality"))
          .orderBy(col("source"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id, source,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |base AS (SELECT doc_id, source, len(toks) AS n_tokens FROM tok),
        |fp AS (
        |  SELECT doc_id,
        |         md5(trim(regexp_replace(regexp_replace(lower(text),
        |             '[.,!?;:]', '', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents
        |),
        |dup AS (
        |  SELECT doc_id,
        |         CASE WHEN count(*) OVER (PARTITION BY fp) > 1
        |              THEN 1 ELSE 0 END AS is_dup
        |  FROM fp
        |),
        |sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(toks) >= 3
        |              THEN list_distinct(list_transform(range(len(toks) - 2),
        |                     i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
        |              ELSE [] END AS shingles
        |  FROM tok
        |),
        |ex AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT)  AS h1,
        |         CAST(concat('0x', substr(md5(s), 13, 12)) AS BIGINT) AS h2
        |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE len(shingles) > 0)
        |),
        |hashed AS (
        |  SELECT doc_id, j, min((h1 + j * h2) % 2147483647) AS sigv
        |  FROM ex, range(32) t(j)
        |  GROUP BY doc_id, j
        |),
        |sigs AS (SELECT doc_id, list(sigv ORDER BY j) AS sig FROM hashed GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, b, array_to_string(sig[b*4+1 : b*4+4], ',') AS key
        |  FROM sigs, range(8) t(b)
        |),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
        |),
        |hsets AS (SELECT doc_id, list(h1) AS hs FROM ex GROUP BY doc_id),
        |verified AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c
        |  JOIN hsets sa ON sa.doc_id = c.doc_a
        |  JOIN hsets sb ON sb.doc_id = c.doc_b
        |  WHERE len(list_intersect(sa.hs, sb.hs)) * 1.0
        |        / len(list_distinct(sa.hs || sb.hs)) >= 0.5
        |),
        |nd AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_a AS doc_id FROM verified
        |    UNION ALL SELECT doc_b AS doc_id FROM verified)
        |),
        |hits AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein'))) AS hits_de,
        |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','is','in')))         AS hits_en,
        |    len(list_filter(toks, x -> x IN ('el','los','de','y','es','un','una')))         AS hits_es,
        |    len(list_filter(toks, x -> x IN ('le','la','et','est','les','un','une')))       AS hits_fr,
        |    len(list_filter(toks, x -> x IN ('的','是','了','在','我')))                      AS hits_zh
        |  FROM tok
        |),
        |lang AS (
        |  SELECT doc_id,
        |         CASE greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh)
        |              WHEN hits_de THEN 'de' WHEN hits_en THEN 'en'
        |              WHEN hits_es THEN 'es' WHEN hits_fr THEN 'fr'
        |              ELSE 'zh' END AS pred_lang
        |  FROM hits
        |),
        |toksu AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
        |vocab AS (SELECT tok, count(*) AS c FROM toksu GROUP BY tok),
        |stats AS (SELECT sum(c) AS n, count(*) AS v FROM vocab),
        |ppl AS (
        |  SELECT t.doc_id, round(exp(avg(-ln((c + 1.0) / (n + v)))), 4) AS ppl
        |  FROM toksu t JOIN vocab USING (tok), stats
        |  GROUP BY t.doc_id
        |),
        |qbase AS (
        |  SELECT doc_id,
        |         len(list_filter(string_split(text, ' '), x -> x <> ''))  AS n_tokens,
        |         length(text)                                             AS n_chars,
        |         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
        |         len(list_filter(string_split(text, ' '),
        |            x -> x IN ('the','a','of','and','to','is','in')))     AS en_hits
        |  FROM documents
        |),
        |quality AS (
        |  SELECT doc_id,
        |         least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
        |         + (1.0 - least(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) * 10.0, 1.0)) * 0.3
        |         + least(CAST(en_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 5.0, 1.0) * 0.3
        |           AS quality_score
        |  FROM qbase
        |),
        |perdoc AS (
        |  SELECT b.doc_id, b.source, b.n_tokens, d.is_dup, l.pred_lang,
        |         p.ppl, q.quality_score,
        |         CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_neardup
        |  FROM base b
        |  JOIN dup d USING (doc_id)
        |  JOIN lang l USING (doc_id)
        |  JOIN ppl p USING (doc_id)
        |  JOIN quality q USING (doc_id)
        |  LEFT JOIN nd n USING (doc_id)
        |),
        |card AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |         CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
        |         CAST(sum(is_neardup) AS BIGINT) AS n_neardup_docs,
        |         round(avg(ppl), 4) AS avg_ppl,
        |         round(avg(quality_score), 4) AS avg_quality
        |  FROM perdoc GROUP BY source
        |),
        |tl AS (
        |  SELECT source, pred_lang AS top_lang, c AS top_lang_docs FROM (
        |    SELECT source, pred_lang, count(*) AS c,
        |           row_number() OVER (PARTITION BY source
        |             ORDER BY count(*) DESC, pred_lang) AS rn
        |    FROM perdoc GROUP BY source, pred_lang)
        |  WHERE rn = 1
        |)
        |SELECT c.source, c.n_docs, c.total_tokens, c.n_dup_docs,
        |       c.n_neardup_docs, t.top_lang, t.top_lang_docs,
        |       c.avg_ppl, c.avg_quality
        |FROM card c JOIN tl t USING (source)
        |ORDER BY c.source
        |""".stripMargin.trim)),

    QueryDef(
      // Temporal (leakage-safe) split: train on the past, evaluate on the
      // future — the ONLY valid split for time-dependent data, where the
      // hash-bucket splits (s01/s13) would leak future information into
      // training. The cutoff is the 80th-percentile DAY by rank over the
      // distinct-day relation (exact integer rank math, no approx
      // percentile), so membership is a pure function of the data's day
      // set. The global rank window runs on the |days|-bounded relation,
      // never the events; train max_day < eval min_day by construction —
      // the hash pins the boundary.
      "s15_temporal_split",
      (s, dir) => {
        val t = Tables(s, dir)
        val ev = t.events.select(
          expr("ts div 86400000000000").as("day"))
        val days = ev.select(col("day")).distinct()
        val ranked = days
          .withColumn("rk", row_number().over(Window.orderBy(col("day"))))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(lit(1))))
          .withColumn("split",
            when(col("rk") <= expr("(8 * n) div 10"), "train")
              .otherwise("eval"))
        ev.join(ranked.select(col("day"), col("split")), Seq("day"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("day")).as("n_days"),
            min(col("day")).as("min_day"), max(col("day")).as("max_day"))
          .orderBy(col("split"))
      },
      Some("""
        |WITH ev AS (
        |  SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day
        |  FROM events
        |),
        |days AS (SELECT day FROM ev GROUP BY 1),
        |ranked AS (
        |  SELECT day, row_number() OVER (ORDER BY day) AS rk,
        |         count(*) OVER () AS n
        |  FROM days
        |),
        |lab AS (
        |  SELECT day,
        |         CASE WHEN rk <= (8 * n) // 10 THEN 'train' ELSE 'eval'
        |              END AS split
        |  FROM ranked
        |)
        |SELECT l.split, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT e.day) AS BIGINT) AS n_days,
        |       min(e.day) AS min_day, max(e.day) AS max_day
        |FROM ev e JOIN lab l USING (day)
        |GROUP BY 1 ORDER BY 1
        |""".stripMargin.trim)),

    QueryDef(
      // Distribution matching (histogram equalization): resample the
      // corpus so every length band contributes the SAME doc count — the
      // largest uniform-histogram subset, members picked per band by
      // deterministic content-hash rank (Sampling.flattenBands). The
      // kept_id_sum column pins EXACT membership cross-engine, not just
      // counts, so tiebreak drift can never hide. One band-keyed window
      // + a bands-bounded broadcast at any corpus size.
      "s14_distribution_match",
      (s, dir) => {
        val t = Tables(s, dir)
        val banded = t.documents.withColumn("band",
          least(expr("n_chars div 200"), lit(3)).cast("int"))
        val kept = Sampling.flattenBands(banded, "doc_id", "band", "s14")
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
        banded.groupBy(col("band")).agg(count(lit(1)).as("n_docs"))
          .join(kept, Seq("band"))
          .select(col("band"), col("n_docs"), col("n_kept"),
            col("kept_id_sum"),
            round(col("n_kept").cast("double") / col("n_docs").cast("double"),
              4).as("kept_frac"))
          .orderBy(col("band"))
      },
      Some("""
        |WITH banded AS (
        |  SELECT doc_id,
        |         CAST(least(n_chars // 200, 3) AS INTEGER) AS band
        |  FROM documents
        |),
        |sized AS (SELECT band, count(*) AS n_docs FROM banded GROUP BY 1),
        |m AS (SELECT min(n_docs) AS m_keep FROM sized),
        |ranked AS (
        |  SELECT doc_id, band,
        |         row_number() OVER (
        |           PARTITION BY band
        |           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':s14'), doc_id)
        |           AS rk
        |  FROM banded
        |),
        |kept AS (
        |  SELECT band, CAST(count(*) AS BIGINT) AS n_kept,
        |         CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
        |  FROM ranked WHERE rk <= (SELECT m_keep FROM m)
        |  GROUP BY 1
        |)
        |SELECT s.band, CAST(s.n_docs AS BIGINT) AS n_docs, k.n_kept,
        |       k.kept_id_sum,
        |       round(CAST(k.n_kept AS DOUBLE) / s.n_docs, 4) AS kept_frac
        |FROM sized s JOIN kept k USING (band)
        |ORDER BY s.band
        |""".stripMargin.trim)),

    QueryDef(
      // LSH banding tuning curve (MMDS ch. 3 s-curve measured on the
      // actual corpus): candidate volume, verified near-dup pairs, and
      // precision for band counts 4/8/16 over the SAME 32-hash MinHash
      // signature — the pre-flight query that prices recall-vs-volume
      // before a corpus-scale dedup commits its parameters (v22's nprobe
      // sweep for dedup). Contiguous band slicing makes the candidate
      // sets NEST as bands double (matching an r-row band implies
      // matching both r/2 halves), so counts are provably nondecreasing.
      // One persisted hashed-gram relation feeds every configuration;
      // the oracle replays all three bandings from d02's CTE machinery.
      "d14_lsh_tune",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.lshBandingSweep(t.documents, "doc_id", "text",
            threshold = 0.5, numHashes = 32, bandsSeq = Seq(4, 8, 16))
          .orderBy(col("bands"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |sh AS (
        |  SELECT doc_id,
        |         CASE WHEN len(toks) >= 3
        |              THEN list_distinct(list_transform(range(len(toks) - 2),
        |                     i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
        |              ELSE [] END AS shingles
        |  FROM tok
        |),
        |ex AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT)  AS h1,
        |         CAST(concat('0x', substr(md5(s), 13, 12)) AS BIGINT) AS h2
        |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE len(shingles) > 0)
        |),
        |hashed AS (
        |  SELECT doc_id, j, min((h1 + j * h2) % 2147483647) AS sigv
        |  FROM ex, range(32) t(j)
        |  GROUP BY doc_id, j
        |),
        |sigs AS (SELECT doc_id, list(sigv ORDER BY j) AS sig FROM hashed GROUP BY doc_id),
        |cfg AS (SELECT nb FROM (VALUES (4), (8), (16)) t(nb)),
        |bands AS (
        |  SELECT c.nb, s.doc_id, t.b,
        |         array_to_string(
        |           s.sig[CAST(t.b AS INTEGER) * (32 // c.nb) + 1 :
        |                 CAST(t.b AS INTEGER) * (32 // c.nb) + (32 // c.nb)],
        |           ',') AS key
        |  FROM sigs s CROSS JOIN cfg c CROSS JOIN range(16) t(b)
        |  WHERE t.b < c.nb
        |),
        |cand AS (
        |  SELECT DISTINCT a.nb, a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.nb = b.nb AND a.b = b.b AND a.key = b.key
        |   AND a.doc_id < b.doc_id
        |),
        |hsets AS (SELECT doc_id, list(h1) AS hs FROM ex GROUP BY doc_id),
        |ver AS (
        |  SELECT c.nb, count(*) AS n_candidates,
        |         sum(CASE WHEN round(len(list_intersect(sa.hs, sb.hs)) * 1.0
        |                   / len(list_distinct(sa.hs || sb.hs)), 6) >= 0.5
        |                  THEN 1 ELSE 0 END) AS n_verified
        |  FROM cand c
        |  JOIN hsets sa ON sa.doc_id = c.doc_a
        |  JOIN hsets sb ON sb.doc_id = c.doc_b
        |  GROUP BY c.nb
        |)
        |SELECT nb AS bands, CAST(32 // nb AS INTEGER) AS rows_per_band,
        |       CAST(n_candidates AS BIGINT) AS n_candidates,
        |       CAST(n_verified AS BIGINT) AS n_verified,
        |       CASE WHEN n_candidates = 0 THEN NULL
        |            ELSE round(n_verified * 1.0 / n_candidates, 4)
        |            END AS verify_precision
        |FROM ver ORDER BY bands
        |""".stripMargin.trim)),

    QueryDef(
      // Per-document n-gram novelty (memorization-risk scoring): the
      // fraction of each doc's distinct 8-token grams that occur in NO
      // other document — d09's span-dedup machinery turned from "what
      // repeats" into "how much is new". Within-doc repeats dedup
      // map-side (array_distinct), so the corpus pays one gram-keyed
      // count shuffle + one doc-keyed fold; linear at any scale, nothing
      // pairwise (Dedup.ngramNovelty).
      "t29_ngram_novelty",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.ngramNovelty(t.documents, "doc_id", "text", k = 8)
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |base AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM tok),
        |dg AS (
        |  SELECT DISTINCT doc_id, gram_key FROM (
        |    SELECT doc_id,
        |           unnest(list_transform(range(greatest(n_tokens - 7, 0)),
        |             i -> CAST(concat('0x', substr(
        |                    md5(array_to_string(toks[i+1:i+8], ' ')),
        |                    1, 12)) AS BIGINT)))
        |             AS gram_key
        |    FROM base)
        |),
        |df AS (SELECT gram_key, count(*) AS df FROM dg GROUP BY 1),
        |per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |         CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS novel_grams
        |  FROM dg JOIN df USING (gram_key) GROUP BY 1
        |)
        |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |       coalesce(p.n_grams, 0) AS n_grams,
        |       coalesce(p.novel_grams, 0) AS novel_grams,
        |       CASE WHEN coalesce(p.n_grams, 0) = 0 THEN NULL
        |            ELSE round(CAST(p.novel_grams AS DOUBLE) / p.n_grams, 6)
        |            END AS novelty
        |FROM base b LEFT JOIN per p USING (doc_id)
        |ORDER BY b.doc_id
        |""".stripMargin.trim))
  )
}
