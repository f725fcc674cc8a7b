package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Pca, Similarity, TextAnalysis}

/** Training-data pipeline coverage: dedup (exact fingerprint, MinHash+LSH,
  * SimHash), text quality/language heuristics, and embedding near-dup —
  * over `documents` / `embeddings`.
  *
  * Every hash is md5-derived (see [[graft.ops.Dedup.hash60]]) so the DuckDB
  * oracle reproduces signatures bit-for-bit; every similarity is a ratio of
  * exact integers, so rounded values match exactly.
  */
object TextQueries {

  /** t27's planted normalization dirt — shared verbatim by the Spark plan
    * and the DuckDB oracle so both engines see byte-identical input.
    * Declared BEFORE `defs`: the oracle SQL interpolates these eagerly at
    * object init (the Spark closures only read them lazily).
    */
  private val PlantDecomposed = " cafe\u0301 touche\u0301"
  private val PlantComposed = " caf\u00e9"
  private val PlantControl = "  \t mixed  space  "

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      // Exact-dup fingerprinting: normalized md5 + group size. A map-only
      // pass plus one keyed shuffle; first dedup tier at corpus scale.
      "d01_fingerprint",
      (s, dir) => {
        val t = Tables(s, dir)
        val fp = t.documents.select(col("doc_id"),
          Dedup.fingerprint(col("text")).as("fingerprint"))
        fp.withColumn("group_size",
            count(lit(1)).over(Window.partitionBy(col("fingerprint"))))
          .orderBy(col("doc_id"))
      },
      Some("""
        |SELECT doc_id,
        |       md5(trim(regexp_replace(regexp_replace(lower(text),
        |           '[.,!?;:]', '', 'g'), '\s+', ' ', 'g'))) AS fingerprint,
        |       count(*) OVER (PARTITION BY
        |         md5(trim(regexp_replace(regexp_replace(lower(text),
        |           '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')))) AS group_size
        |FROM documents
        |ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // MinHash(32) + LSH(8 bands of 4) over 3-gram word shingles,
      // verified with exact Jaccard >= 0.5. Candidate generation is a
      // bucket-keyed self hash-join — no cross join at any scale.
      "d02_minhash_pairs",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.nearDuplicatesMinhashCached(t.documents, "doc_id", "text",
            threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3)
          .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
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
        |  SELECT c.doc_a, c.doc_b,
        |         round(len(list_intersect(sa.hs, sb.hs)) * 1.0
        |               / len(list_distinct(sa.hs || sb.hs)), 6) AS jaccard
        |  FROM cand c
        |  JOIN hsets sa ON sa.doc_id = c.doc_a
        |  JOIN hsets sb ON sb.doc_id = c.doc_b
        |)
        |SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.5
        |ORDER BY doc_a, doc_b
        |""".stripMargin.trim)),

    QueryDef(
      // SimHash(32) near-dup pairs within Hamming distance 3. Spark pairs
      // via pigeonhole segment join (guaranteed-recall, no cross join);
      // the oracle brute-forces — identical result set by construction.
      "d03_simhash_pairs",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.simhashPairs(t.documents, "doc_id", "text", maxDistance = 3)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents
        |),
        |tf AS (
        |  SELECT doc_id, tok, count(*) AS f,
        |         CAST(concat('0x', substr(md5('0:' || tok), 1, 15)) AS BIGINT) AS h
        |  FROM tok GROUP BY doc_id, tok
        |),
        |bitsums AS (
        |  SELECT doc_id, b,
        |         sum(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN f ELSE -f END) AS bs
        |  FROM tf, range(32) t(b)
        |  GROUP BY doc_id, b
        |),
        |sh AS (
        |  SELECT doc_id,
        |         sum(CASE WHEN bs > 0 THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
        |                  ELSE 0 END) AS simhash
        |  FROM bitsums GROUP BY doc_id
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       bit_count(xor(a.simhash, b.simhash)) AS hamming
        |FROM sh a, sh b
        |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY doc_a, doc_b
        |""".stripMargin.trim)),

    QueryDef(
      // Stopword-marker language ID; deterministic argmax with alphabetical
      // tiebreak. Map-only pass.
      "t01_langid",
      (s, dir) => {
        val t = Tables(s, dir)
        TextAnalysis.languageId(t.documents, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH tok AS (
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
        |)
        |SELECT doc_id, hits_de, hits_en, hits_es, hits_fr, hits_zh,
        |       CASE greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh)
        |            WHEN hits_de THEN 'de' WHEN hits_en THEN 'en'
        |            WHEN hits_es THEN 'es' WHEN hits_fr THEN 'fr'
        |            ELSE 'zh' END AS pred_lang
        |FROM hits ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Classifier evaluation: t01's language predictor graded against the
      // labeled corpus — confusion counts and per-class precision/recall/
      // F1 (F1 as 2tp/(2tp+fp+fn): ONE float division from exact integer
      // counts, so both engines agree bit-for-bit; degenerate classes
      // yield null, not NaN). The companion of t21's NDCG on the ranking
      // side: every learned/heuristic stage in the pipeline gets an
      // evaluation harness, not just a score column.
      "t24_langid_eval",
      (s, dir) => {
        val t = Tables(s, dir)
        val pred = TextAnalysis.languageId(t.documents, "doc_id", "text")
          .select(col("doc_id"), col("pred_lang"))
        val j = t.documents.select(col("doc_id"), col("lang"))
          .join(pred, "doc_id")
        val per = j.groupBy(col("lang")).agg(
          count(lit(1)).as("n_true"),
          sum(when(col("pred_lang") === col("lang"), 1L).otherwise(0L))
            .as("tp"))
        val fpRel = j
          .filter(col("pred_lang") =!= col("lang"))
          .groupBy(col("pred_lang")).agg(count(lit(1)).as("fp"))
        per.join(fpRel, per("lang") === fpRel("pred_lang"), "left")
          .select(per("lang"), col("n_true"), col("tp"),
            coalesce(col("fp"), lit(0L)).as("fp"),
            (col("n_true") - col("tp")).as("fn"))
          .withColumn("precision",
            when(col("tp") + col("fp") > 0,
              round(col("tp").cast("double") /
                (col("tp") + col("fp")).cast("double"), 4)))
          .withColumn("recall",
            round(col("tp").cast("double") / col("n_true").cast("double"), 4))
          .withColumn("f1",
            when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
              round(lit(2.0d) * col("tp").cast("double") /
                (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"),
                4)))
          .orderBy(col("lang"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id, lang,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |hits AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein'))) AS hits_de,
        |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','is','in')))         AS hits_en,
        |    len(list_filter(toks, x -> x IN ('el','los','de','y','es','un','una')))         AS hits_es,
        |    len(list_filter(toks, x -> x IN ('le','la','et','est','les','un','une')))       AS hits_fr,
        |    len(list_filter(toks, x -> x IN ('的','是','了','在','我')))                      AS hits_zh
        |  FROM tok
        |),
        |pred AS (
        |  SELECT doc_id, lang,
        |         CASE greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh)
        |              WHEN hits_de THEN 'de' WHEN hits_en THEN 'en'
        |              WHEN hits_es THEN 'es' WHEN hits_fr THEN 'fr'
        |              ELSE 'zh' END AS pred_lang
        |  FROM hits
        |),
        |per AS (
        |  SELECT lang, count(*) AS n_true,
        |         count(CASE WHEN pred_lang = lang THEN 1 END) AS tp
        |  FROM pred GROUP BY lang
        |),
        |fpr AS (
        |  SELECT pred_lang, count(*) AS fp
        |  FROM pred WHERE pred_lang <> lang GROUP BY pred_lang
        |)
        |SELECT p.lang, p.n_true, p.tp,
        |       coalesce(f.fp, 0) AS fp,
        |       p.n_true - p.tp AS fn,
        |       CASE WHEN p.tp + coalesce(f.fp, 0) > 0
        |            THEN round(CAST(p.tp AS DOUBLE) /
        |                       CAST(p.tp + coalesce(f.fp, 0) AS DOUBLE), 4)
        |       END AS precision,
        |       round(CAST(p.tp AS DOUBLE) / CAST(p.n_true AS DOUBLE), 4)
        |         AS recall,
        |       CASE WHEN 2 * p.tp + coalesce(f.fp, 0) + (p.n_true - p.tp) > 0
        |            THEN round(2.0 * CAST(p.tp AS DOUBLE) /
        |                 CAST(2 * p.tp + coalesce(f.fp, 0) + (p.n_true - p.tp)
        |                      AS DOUBLE), 4)
        |       END AS f1
        |FROM per p LEFT JOIN fpr f ON p.lang = f.pred_lang
        |ORDER BY p.lang
        |""".stripMargin.trim)),

    QueryDef(
      // Quality metrics + composite score; all ratios are exact-integer
      // divisions so both engines produce identical doubles.
      "t02_quality",
      (s, dir) => {
        val t = Tables(s, dir)
        val m = TextAnalysis.qualityMetrics(t.documents, "doc_id", "text")
        TextAnalysis.qualityScore(m)
          .select(col("doc_id"), col("n_tokens"), col("n_chars"),
            round(col("avg_token_len"), 6).as("avg_token_len"),
            round(col("punct_ratio"), 6).as("punct_ratio"),
            round(col("stopword_ratio"), 6).as("stopword_ratio"),
            round(col("quality_score"), 6).as("quality_score"))
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH base AS (
        |  SELECT doc_id,
        |         len(list_filter(string_split(text, ' '), x -> x <> ''))  AS n_tokens,
        |         length(text)                                             AS n_chars,
        |         length(array_to_string(list_filter(string_split(text, ' '),
        |            x -> x <> ''), ''))                                   AS tok_chars,
        |         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
        |         len(list_filter(string_split(text, ' '),
        |            x -> x IN ('the','a','of','and','to','is','in')))     AS en_hits
        |  FROM documents
        |),
        |ratios AS (
        |  SELECT doc_id, n_tokens, n_chars,
        |         CAST(tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
        |         CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)    AS punct_ratio,
        |         CAST(en_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)   AS stopword_ratio
        |  FROM base
        |)
        |SELECT doc_id, n_tokens, n_chars,
        |       round(avg_token_len, 6)  AS avg_token_len,
        |       round(punct_ratio, 6)    AS punct_ratio,
        |       round(stopword_ratio, 6) AS stopword_ratio,
        |       round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
        |             + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.3
        |             + least(stopword_ratio * 5.0, 1.0) * 0.3, 6) AS quality_score
        |FROM ratios ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Corpus token budgeting per source: whitespace tokens plus a
      // BPE-ish surcharge of one token per 4 chars beyond 4 per word.
      "t03_token_stats",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          .select(col("source"), col("n_chars"),
            size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"),
            TextAnalysis.tokenEstimate(col("text")).as("est_tokens"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(col("est_tokens")).as("total_est_tokens"),
            round(avg(col("n_chars")), 6).as("avg_chars"))
          .orderBy(col("source"))
      },
      Some("""
        |WITH base AS (
        |  SELECT source, n_chars,
        |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
        |         len(list_filter(string_split(text, ' '), x -> x <> ''))
        |         + list_sum(list_transform(list_filter(string_split(text, ' '),
        |             x -> x <> ''),
        |             t -> CAST(greatest(length(t) - 4, 0) // 4 AS BIGINT))) AS est_tokens
        |  FROM documents
        |)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT)   AS total_tokens,
        |       CAST(sum(est_tokens) AS BIGINT) AS total_est_tokens,
        |       round(avg(n_chars), 6) AS avg_chars
        |FROM base GROUP BY source ORDER BY source
        |""".stripMargin.trim)),

    QueryDef(
      // Generator/UDTF coverage: explode documents into token rows, top-20
      // tokens by frequency. The explode is a Generate node feeding a
      // partial+final count — the canonical flatten-then-aggregate shape.
      "t04_top_tokens",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          // outer + null filter: avoids the inferred size()>0 pre-filter
          // that would tokenize each document twice (t22's trap).
          .select(explode_outer(graft.ops.Dedup.tokens(col("text"))).as("token"))
          .filter(col("token").isNotNull)
          .groupBy(col("token"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20)
      },
      Some("""
        |SELECT token, count(*) AS n
        |FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |      FROM documents)
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 20
        |""".stripMargin.trim)),

    QueryDef(
      // Deterministic content-hash train/val/test split: per-doc
      // assignment plus per-split stats. Pure function of doc_id — stable
      // across engines, runs, and partitionings.
      "s01_dataset_split",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          .withColumn("split", graft.ops.Sampling.splitLabel(col("doc_id"), 90, 5))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            min(col("doc_id")).as("min_id"))
          .orderBy(col("split"))
      },
      Some("""
        |WITH assigned AS (
        |  SELECT doc_id, n_chars,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |           % 100 AS bucket
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 90 THEN 'train'
        |            WHEN bucket < 95 THEN 'val'
        |            ELSE 'test' END AS split,
        |       count(*)      AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       min(doc_id)   AS min_id
        |FROM assigned
        |GROUP BY 1
        |ORDER BY split
        |""".stripMargin.trim)),

    QueryDef(
      // Stratified k-fold assignment (cross-validation splits): every doc
      // lands in exactly one of 5 folds by the same content-hash bucket
      // machinery as s01 — so folds are disjoint and exhaustive BY
      // CONSTRUCTION, engine/run/partition-invariant, and stable as the
      // corpus grows (a doc never migrates folds when other docs arrive).
      // Output pins per-fold balance (count, chars, per-source spread);
      // the pct column makes any skew in the hash visible. Map-only
      // assignment + one keyed aggregate at any corpus size.
      "s13_kfold",
      (s, dir) => {
        val t = Tables(s, dir)
        t.documents
          .withColumn("fold", graft.ops.Sampling.hashBucket(col("doc_id"), 5))
          .groupBy(col("fold"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            countDistinct(col("source")).as("n_sources"),
            min(col("doc_id")).as("min_id"))
          .withColumn("pct", round(col("n_docs").cast("double") /
            sum(col("n_docs")).over(Window.partitionBy()), 6))
          .orderBy(col("fold"))
      },
      Some("""
        |WITH assigned AS (
        |  SELECT doc_id, n_chars, source,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |           % 5 AS fold
        |  FROM documents
        |),
        |agg AS (
        |  SELECT fold, count(*) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |         count(DISTINCT source) AS n_sources,
        |         min(doc_id) AS min_id
        |  FROM assigned GROUP BY fold
        |)
        |SELECT fold, n_docs, total_chars, n_sources, min_id,
        |       round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS pct
        |FROM agg ORDER BY fold
        |""".stripMargin.trim)),

    QueryDef(
      // Column profiling (the ANALYZE TABLE / data-quality manifest shape):
      // per-column row/null/distinct counts and value bounds over the fact
      // table, unpivoted to one row per column. One pass over the scan;
      // the multi-column exact count(distinct) plans as Spark's standard
      // Expand + partial-aggregate (each distinct column shuffles its own
      // stream — at 100 TB a profiler swaps in approx_count_distinct,
      // a01's measured-accuracy pattern). Bounds are exact column values,
      // so both engines agree bit-for-bit.
      "p04_profile",
      (s, dir) => {
        val t = Tables(s, dir)
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount",
          "l_tax")
        val agg = t.lineitem.agg(
          count(lit(1)).as("n_rows"),
          cols.flatMap(c => Seq(
            count(col(c)).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c"),
            min(col(c)).cast("double").as(s"mn_$c"),
            max(col(c)).cast("double").as(s"mx_$c"))): _*)
        val rows = cols.map(c => agg.select(
          lit(c).as("column"), col("n_rows"),
          (col("n_rows") - col(s"nn_$c")).as("n_null"),
          col(s"nd_$c").as("n_distinct"),
          round(col(s"mn_$c"), 6).as("min_v"),
          round(col(s"mx_$c"), 6).as("max_v")))
        rows.reduce(_ unionByName _).orderBy(col("column"))
      },
      Some("""
        |WITH a AS (
        |  SELECT count(*) AS n_rows,
        |         count(l_quantity) AS nn_q, count(DISTINCT l_quantity) AS nd_q,
        |         round(CAST(min(l_quantity) AS DOUBLE), 6) AS mn_q,
        |         round(CAST(max(l_quantity) AS DOUBLE), 6) AS mx_q,
        |         count(l_extendedprice) AS nn_e,
        |         count(DISTINCT l_extendedprice) AS nd_e,
        |         round(CAST(min(l_extendedprice) AS DOUBLE), 6) AS mn_e,
        |         round(CAST(max(l_extendedprice) AS DOUBLE), 6) AS mx_e,
        |         count(l_discount) AS nn_d, count(DISTINCT l_discount) AS nd_d,
        |         round(CAST(min(l_discount) AS DOUBLE), 6) AS mn_d,
        |         round(CAST(max(l_discount) AS DOUBLE), 6) AS mx_d,
        |         count(l_tax) AS nn_t, count(DISTINCT l_tax) AS nd_t,
        |         round(CAST(min(l_tax) AS DOUBLE), 6) AS mn_t,
        |         round(CAST(max(l_tax) AS DOUBLE), 6) AS mx_t
        |  FROM lineitem
        |)
        |SELECT 'l_discount' AS "column", n_rows, n_rows - nn_d AS n_null,
        |       nd_d AS n_distinct, mn_d AS min_v, mx_d AS max_v FROM a
        |UNION ALL
        |SELECT 'l_extendedprice', n_rows, n_rows - nn_e, nd_e, mn_e, mx_e FROM a
        |UNION ALL
        |SELECT 'l_quantity', n_rows, n_rows - nn_q, nd_q, mn_q, mx_q FROM a
        |UNION ALL
        |SELECT 'l_tax', n_rows, n_rows - nn_t, nd_t, mn_t, mx_t FROM a
        |ORDER BY "column"
        |""".stripMargin.trim)),

    QueryDef(
      // Sequence packing: documents packed into 4096-token bins per
      // source, deterministic id order. Output: per-bin document counts
      // and token totals for the first bins of each source.
      "p01_packing",
      (s, dir) => {
        val t = Tables(s, dir)
        val withTokens = t.documents.select(col("doc_id"), col("source"),
          size(graft.ops.Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
        graft.ops.Sampling.packIntoBins(withTokens, "doc_id", "n_tokens",
            4096L, "source")
          .groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
          .orderBy(col("source"), col("bin"))
      },
      Some("""
        |WITH toks AS (
        |  SELECT doc_id, source,
        |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
        |  FROM documents
        |),
        |packed AS (
        |  SELECT source, n_tokens,
        |         coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           // 4096 AS bin
        |  FROM toks
        |)
        |SELECT source, CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |FROM packed
        |GROUP BY source, bin
        |ORDER BY source, bin
        |""".stripMargin.trim)),

    QueryDef(
      // The capstone composition: a COMPLETE training-data curation
      // pipeline in one declarative plan — Gopher rule battery (t16) ->
      // exact dedup keep-first (d01/t18) -> learned NB quality filter
      // (s07, score > 0) -> per-source sequence packing into 2048-token
      // bins (p01). Every stage is one of this engine's operators riding
      // the SHARED memoized relations (tokenized corpus, NB weight
      // table); composing them adds id-keyed joins of per-doc rows, not
      // new corpus scans — the corpus text is read once for the rule
      // scan, once for the fingerprint, once for tokenization, all
      // map-side, and everything after is small keyed exchanges. The
      // whole pipeline is one Catalyst plan: AQE sees the stage
      // selectivities at runtime and sizes the survivor joins itself.
      "p02_pipeline_pack",
      (s, dir) => {
        val t = Tables(s, dir)
        // Rule battery CONFIGURED FOR THE CORPUS (the paper's own advice:
        // thresholds are tuned per source): the synthetic gate corpus has
        // exactly one of Gopher's eight required stopwords in its
        // vocabulary, so the stock n_req >= 2 keeps nothing — the battery
        // here gates on the rounded metric columns (cross-engine equality
        // of which t16 hash-proves) with the stopword floor at 1.
        val rules = TextAnalysis.gopherQuality(t.documents, "doc_id", "text")
          .filter(col("n_words") >= 50 &&
            col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
            col("alpha_word_ratio") >= 0.8 && col("n_req_stopwords") >= 1)
          .select(col("doc_id"))
        val keepers = graft.ops.Dedup
          .dropExactDuplicates(t.documents, "doc_id", "text")
          .select(col("doc_id"))
        val quality = TextAnalysis.nbQualityScores(t.documents, "doc_id",
            "text",
            isPositive = col("source").isin("src0", "src1"),
            isNegative = col("source").isin("src8", "src9"), buckets = 64)
          .filter(col("nb_score") > 0)
          .select(col("doc_id"), col("n_tokens"))
        val survivors = t.documents.select(col("doc_id"), col("source"))
          .join(rules, Seq("doc_id")).join(keepers, Seq("doc_id"))
          .join(quality, Seq("doc_id"))
        graft.ops.Sampling.packIntoBins(survivors, "doc_id", "n_tokens",
            2048L, "source")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            (max(col("bin")) + 1).cast("long").as("n_bins"))
          .orderBy(col("source"))
      },
      Some("""
        |WITH gtok AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |rules AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |           len(toks) AS n_words,
        |           round(CAST(length(array_to_string(toks, '')) AS DOUBLE)
        |             / len(toks), 6) AS mean_word_len,
        |           round(CAST(len(list_filter(toks,
        |                  t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
        |             / len(toks), 6) AS alpha_word_ratio,
        |           len(list_intersect(list_distinct(toks),
        |               ['the','be','to','of','and','that','have','with']))
        |             AS n_req
        |    FROM gtok)
        |  WHERE n_words >= 50
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |    AND alpha_word_ratio >= 0.8 AND n_req >= 1
        |),
        |fp AS (
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
        |lab AS (
        |  SELECT doc_id, text,
        |         source IN ('src0', 'src1') AS is_pos,
        |         source IN ('src8', 'src9') AS is_neg
        |  FROM documents
        |),
        |ntok AS (
        |  SELECT doc_id, is_pos, is_neg,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |           AS term
        |  FROM lab
        |),
        |nb AS (
        |  SELECT doc_id, is_pos, is_neg,
        |         CAST(concat('0x', substr(md5(term), 1, 8)) AS BIGINT) % 64
        |           AS bucket
        |  FROM ntok
        |),
        |dist AS (
        |  SELECT bucket,
        |         count(*) FILTER (WHERE is_pos) AS n_pos,
        |         count(*) FILTER (WHERE is_neg) AS n_neg
        |  FROM nb GROUP BY bucket
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
        |pd AS (SELECT doc_id, bucket, count(*) AS c FROM nb GROUP BY doc_id, bucket),
        |q AS (
        |  SELECT pd.doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         round(sum(c * w) + any_value(log_prior), 4) AS nb_score
        |  FROM pd JOIN w USING (bucket) CROSS JOIN prior
        |  GROUP BY pd.doc_id
        |),
        |sv AS (
        |  SELECT d.doc_id, d.source, q.n_tokens
        |  FROM documents d
        |  JOIN rules USING (doc_id)
        |  JOIN keep USING (doc_id)
        |  JOIN q USING (doc_id)
        |  WHERE q.nb_score > 0
        |),
        |packed AS (
        |  SELECT source, doc_id, n_tokens,
        |         coalesce(sum(n_tokens) OVER (PARTITION BY source
        |           ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           // 2048 AS bin
        |  FROM sv
        |)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |       CAST(max(bin) + 1 AS BIGINT)  AS n_bins
        |FROM packed
        |GROUP BY source
        |ORDER BY source
        |""".stripMargin.trim)),

    QueryDef(
      // Multimodal plumbing, oracle-checked: documents' text bytes stand in
      // for opaque media payloads; the audit path (size + sha256, no
      // decode) is exactly Multimodal.describe. Payload bytes never
      // shuffle — map-only projection.
      "m01_media_audit",
      (s, dir) => {
        val t = Tables(s, dir)
        val media = t.documents.select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"))
        graft.ops.Multimodal.describe(media, "media_id", "payload")
          .orderBy(col("media_id"))
      },
      Some("""
        |SELECT doc_id AS media_id,
        |       octet_length(CAST(text AS BLOB)) AS payload_bytes,
        |       sha256(text)                     AS payload_sha256
        |FROM documents
        |ORDER BY media_id
        |""".stripMargin.trim)),

    QueryDef(
      // Raw-media lake ingest through Spark's binaryFile source — the
      // actual on-ramp for image/audio files into the binary-column
      // pipeline (m01-m05 operate after this step). Reads the committed
      // image fixtures, audits (bytes, content hash) AND runs the REAL
      // ImageIoDecoder on each payload; the oracle re-reads the same
      // files with DuckDB's read_blob and pins the true decoded
      // dimensions as literals (9x9 checker, 32x16 gradients — the same
      // ground truth MultimodalSpec asserts), so a decode regression
      // breaks the hash match. Content hash goes through lower(hex()) on
      // both engines because this DuckDB's md5 is VARCHAR-only.
      // Scale: binaryFile lists and reads files in parallel; everything
      // after is map-only per payload (mapPartitions decode).
      "m06_binary_ingest",
      (s, dir) => {
        import s.implicits._
        val files = s.read.format("binaryFile")
          .load(s"${Scratch.fixturesDir}/*")
          .select(regexp_extract(col("path"), "[^/]+$", 0).as("file"),
            col("length").cast("long").as("n_bytes"),
            md5(lower(hex(col("content")))).as("content_md5"),
            col("content"))
        val decoder = new graft.ops.Multimodal.ImageIoDecoder(grid = 2)
        files.as[(String, Long, String, Array[Byte])].map {
          case (f, n, m, bytes) =>
            val d = decoder.decode(
              graft.ops.Multimodal.MediaItem(0L, "image", bytes, f))
            (f, n, m, d.map(_.width).getOrElse(-1),
              d.map(_.height).getOrElse(-1),
              d.map(_.channels).getOrElse(-1))
        }.toDF("file", "n_bytes", "content_md5", "width", "height",
            "channels")
          .orderBy(col("file"))
      },
      Some(s"""
        |WITH f AS (
        |  SELECT regexp_extract(filename, '[^/]+$$') AS file,
        |         CAST(size AS BIGINT) AS n_bytes,
        |         md5(lower(hex(content))) AS content_md5
        |  FROM read_blob('${Scratch.fixturesDir}/*')
        |),
        |exp(file, width, height, channels) AS (VALUES
        |  ('checker_9x9.png',    CAST(9  AS INT), CAST(9  AS INT), CAST(3 AS INT)),
        |  ('gradient_32x16.jpg', CAST(32 AS INT), CAST(16 AS INT), CAST(3 AS INT)),
        |  ('gradient_32x16.png', CAST(32 AS INT), CAST(16 AS INT), CAST(3 AS INT)))
        |SELECT f.file, f.n_bytes, f.content_md5, e.width, e.height, e.channels
        |FROM f JOIN exp e USING (file)
        |ORDER BY f.file
        |""".stripMargin.trim)),

    QueryDef(
      // Embedding-cosine near-dup pairs (exact baseline; the scale path is
      // Similarity.signBucketJoin, exercised in tests/bench). The baseline
      // arm is bounded at Similarity.ExactArmCap ids in BOTH engines —
      // identical output at the gate SFs, constant work at sf1+.
      "e01_embed_neardup",
      (s, dir) => {
        val t = Tables(s, dir)
        Similarity.bruteForcePairs(
            t.embeddings.filter(col("vec_id") < Similarity.ExactArmCap),
            "vec_id", "embedding", threshold = 0.45)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND a.vec_id < 4000 AND b.vec_id < 4000
        |  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
        |ORDER BY id_a, id_b
        |""".stripMargin.trim)),

    QueryDef(
      // The 100 TB embedding-dedup path, driver-certified: sign-random-
      // projection LSH (Similarity.signBucketJoin — bucket-keyed join,
      // no cross join at any scale) checked against the exact all-pairs
      // relation through an in-query contract, a01-style.
      //
      // The testdata embeddings are near-orthogonal (max natural cosine
      // ~0.47 — the regime where ANY sign-LSH is near-random), so the
      // query PLANTS true near-duplicates the way a dedup workload sees
      // them: a shifted-id copy of the vec_id < 50 slice with its first 8
      // dims zeroed (cosine ~0.87-0.97 to its source) joins the corpus,
      // and detection runs at threshold 0.8. Subset holds by construction
      // (LSH candidates are verified with the same exact cosine the brute
      // path uses; an unrounded sim >= t always rounds to >= t at 6
      // decimals). Recall is bounded at 0.9: per planted pair the default
      // 32-plane/8-band signature misses with p = (1 - p_band)^8 ~ 7e-4,
      // so >= 6 misses out of 50 is a ~1e-11 event. n_exact is the one
      // data-derived column the DuckDB oracle recomputes independently —
      // and both engines agree on it even if a planted pair's geometry
      // lands below threshold, because each recomputes the pair set from
      // the same corpus.
      "e02_lsh_neardup_contract",
      (s, dir) => {
        val t = Tables(s, dir)
        // corpus bounded at ExactArmCap: the exact contract arm is
        // certification apparatus, SF-independent work by design
        val base = t.embeddings.filter(col("vec_id") < Similarity.ExactArmCap)
          .select(col("vec_id"), col("embedding"))
        val planted = base.filter(col("vec_id") < 50)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i < 8, lit(0.0f)).otherwise(x)).as("embedding"))
        val corpus = base.unionByName(planted)
        val exact = Similarity.bruteForcePairs(corpus, "vec_id",
            "embedding", threshold = 0.8)
          .select(col("id_a"), col("id_b"), lit(1).as("in_e"))
        val lsh = Similarity.signBucketJoin(corpus, "vec_id",
            "embedding", threshold = 0.8)
          .select(col("id_a"), col("id_b"), lit(1).as("in_p"))
        lsh.join(exact, Seq("id_a", "id_b"), "full_outer")
          .agg(count(col("in_e")).as("n_exact_raw"),
            count(when(col("in_p").isNotNull && col("in_e").isNotNull, 1))
              .as("n_both"),
            count(when(col("in_p").isNotNull && col("in_e").isNull, 1))
              .as("n_lsh_only"))
          .select(col("n_exact_raw").as("n_exact"),
            (col("n_lsh_only") === 0).as("subset_ok"),
            (col("n_both").cast("double") >=
              col("n_exact_raw").cast("double") * 0.9).as("recall_ok"))
      },
      Some("""
        |WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 4000
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding,
        |           (x, i) -> CASE WHEN i <= 8 THEN CAST(0 AS FLOAT) ELSE x END)
        |           AS embedding
        |  FROM embeddings WHERE vec_id < 50
        |)
        |SELECT count(*) AS n_exact, TRUE AS subset_ok, TRUE AS recall_ok
        |FROM corpus a, corpus b
        |WHERE a.vec_id < b.vec_id
        |  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.8
        |""".stripMargin.trim)),

    QueryDef(
      // The same contract as e02 for the WIDE form (signBucketJoinWide):
      // an independent signature per band, so selectivity (bitsPerBand)
      // and recall (bands) scale independently — the parameterization
      // that stays linear at 10^6+ rows (SCALING.md). Gate-size params
      // trade selectivity for recall: 16 bands x 8 bits gives a planted
      // pair (cosine 0.87-0.97, so p_plane >= 0.84) per-band collision
      // p >= 0.84^8 = 0.24 and overall miss p <= 0.76^16 = 0.012 —
      // deterministic here (seeded planes, fixed parquet), measured
      // recall 1.0 at sf0.001/sf0.01. Subset holds by construction:
      // candidates are verified with the same exact cosine as the brute
      // relation.
      "e03_wide_lsh_contract",
      (s, dir) => {
        val t = Tables(s, dir)
        // corpus bounded at ExactArmCap: the exact contract arm is
        // certification apparatus, SF-independent work by design
        val base = t.embeddings.filter(col("vec_id") < Similarity.ExactArmCap)
          .select(col("vec_id"), col("embedding"))
        val planted = base.filter(col("vec_id") < 50)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i < 8, lit(0.0f)).otherwise(x)).as("embedding"))
        val corpus = base.unionByName(planted)
        val exact = Similarity.bruteForcePairs(corpus, "vec_id",
            "embedding", threshold = 0.8)
          .select(col("id_a"), col("id_b"), lit(1).as("in_e"))
        val lsh = Similarity.signBucketJoinWide(corpus, "vec_id",
            "embedding", threshold = 0.8, bands = 16, bitsPerBand = 8)
          .select(col("id_a"), col("id_b"), lit(1).as("in_p"))
        lsh.join(exact, Seq("id_a", "id_b"), "full_outer")
          .agg(count(col("in_e")).as("n_exact_raw"),
            count(when(col("in_p").isNotNull && col("in_e").isNotNull, 1))
              .as("n_both"),
            count(when(col("in_p").isNotNull && col("in_e").isNull, 1))
              .as("n_lsh_only"))
          .select(col("n_exact_raw").as("n_exact"),
            (col("n_lsh_only") === 0).as("subset_ok"),
            (col("n_both").cast("double") >=
              col("n_exact_raw").cast("double") * 0.9).as("recall_ok"))
      },
      Some("""
        |WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 4000
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding,
        |           (x, i) -> CASE WHEN i <= 8 THEN CAST(0 AS FLOAT) ELSE x END)
        |           AS embedding
        |  FROM embeddings WHERE vec_id < 50
        |)
        |SELECT count(*) AS n_exact, TRUE AS subset_ok, TRUE AS recall_ok
        |FROM corpus a, corpus b
        |WHERE a.vec_id < b.vec_id
        |  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.8
        |""".stripMargin.trim)),

    QueryDef(
      // PCA over the embedding corpus (graft.ops.Pca): ONE GramAggregator
      // pass (partial-aggregated sufficient statistics — the corpus never
      // shuffles), driver-side Jacobi eigensolve of the 64x64 covariance,
      // then the map-only fused MatVecProduct projection. The contract:
      // total_var (trace of the covariance) is the data-derived column
      // DuckDB recomputes independently as sum over dims of var_pop;
      // proj_var_ok ties the DISTRIBUTED projection back to the driver
      // eigenvalues (population variance of coordinate j == eigval j,
      // tolerance covers the 1e-9 covariance rounding), orthonormal_ok
      // checks the recovered basis, explained_ok the eigval/trace sanity.
      "e04_pca_contract",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val model = Pca.fit(emb, "embedding", 4)
        val pv = Pca.transform(emb, "embedding", model)
          .select(posexplode(col("proj")).as(Seq("j", "x")))
          .groupBy(col("j")).agg(var_pop(col("x")).as("v"))
          .orderBy(col("j")).collect().map(_.getDouble(1))
        val projVarOk = pv.zip(model.eigenvalues).forall { case (v, e) =>
          math.abs(v - e) <= 1e-5 + 1e-5 * math.abs(e) }
        val orthonormalOk = (0 until model.k).forall { a =>
          (a until model.k).forall { b =>
            val g = model.components(a).zip(model.components(b))
              .map { case (x, y) => x * y }.sum
            math.abs(g - (if (a == b) 1.0 else 0.0)) < 1e-9 } }
        val explainedOk = model.eigenvalues.sum <= model.totalVar + 1e-9 &&
          model.eigenvalues.forall(_ >= -1e-12)
        val nRows = emb.count()
        val totalVar = emb
          .select(posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy(col("i")).agg(var_pop(col("x").cast("double")).as("v"))
          .agg(sum(col("v"))).head.getDouble(0)
        s.range(1).select(lit(nRows).as("n_rows"),
          round(lit(totalVar), 4).as("total_var"),
          lit(projVarOk).as("proj_var_ok"),
          lit(orthonormalOk).as("orthonormal_ok"),
          lit(explainedOk).as("explained_ok"))
      },
      Some("""
        |WITH el AS (
        |  SELECT generate_subscripts(embedding, 1) AS i,
        |         unnest(embedding) AS x
        |  FROM embeddings
        |),
        |pv AS (SELECT i, var_pop(CAST(x AS DOUBLE)) AS v FROM el GROUP BY i)
        |SELECT (SELECT count(*) FROM embeddings) AS n_rows,
        |       round(sum(v), 4) AS total_var,
        |       TRUE AS proj_var_ok, TRUE AS orthonormal_ok,
        |       TRUE AS explained_ok
        |FROM pv
        |""".stripMargin.trim)),

    QueryDef(
      // SemDeDup (cluster-scoped semantic dedup, arXiv:2303.09540) under
      // the same planted-signal contract as e02/e03: the corpus gains 50
      // true near-dups (cosine ~0.87-0.97), detection runs per k-means
      // cell (Similarity.clusterScopedPairs — candidates drop from n²/2
      // to Σ|cell|²/2, the join is keyed by cell id, no cross join).
      // MULTI-PROBE (probes = 2): each point enters its two nearest
      // cells, so a pair is missed only if the two points share neither
      // — the sf1 replay caught single-assignment recall collapsing to
      // 0.81 when the 10x fixture's k-means boundaries split planted
      // pairs (invisible at the gate SFs, where recall measured 1.0).
      // subset_ok holds by construction (candidates verified with the
      // exact cosine); recall_ok >= 0.9 is now structural, not tuned.
      // n_exact is the data-derived column DuckDB recomputes
      // independently.
      "e05_semdedup_contract",
      (s, dir) => {
        val t = Tables(s, dir)
        // corpus bounded at ExactArmCap: the exact contract arm is
        // certification apparatus, SF-independent work by design
        val base = t.embeddings.filter(col("vec_id") < Similarity.ExactArmCap)
          .select(col("vec_id"), col("embedding"))
        val planted = base.filter(col("vec_id") < 50)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i < 8, lit(0.0f)).otherwise(x)).as("embedding"))
        val corpus = base.unionByName(planted)
        val exact = Similarity.bruteForcePairs(corpus, "vec_id",
            "embedding", threshold = 0.8)
          .select(col("id_a"), col("id_b"), lit(1).as("in_e"))
        val clustered = Similarity.clusterScopedPairs(corpus, "vec_id",
            "embedding", threshold = 0.8, numCells = 16, probes = 2)
          .select(col("id_a"), col("id_b"), lit(1).as("in_p"))
        clustered.join(exact, Seq("id_a", "id_b"), "full_outer")
          .agg(count(col("in_e")).as("n_exact_raw"),
            count(when(col("in_p").isNotNull && col("in_e").isNotNull, 1))
              .as("n_both"),
            count(when(col("in_p").isNotNull && col("in_e").isNull, 1))
              .as("n_clu_only"))
          .select(col("n_exact_raw").as("n_exact"),
            (col("n_clu_only") === 0).as("subset_ok"),
            (col("n_both").cast("double") >=
              col("n_exact_raw").cast("double") * 0.9).as("recall_ok"))
      },
      Some("""
        |WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 4000
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding,
        |           (x, i) -> CASE WHEN i <= 8 THEN CAST(0 AS FLOAT) ELSE x END)
        |           AS embedding
        |  FROM embeddings WHERE vec_id < 50
        |)
        |SELECT count(*) AS n_exact, TRUE AS subset_ok, TRUE AS recall_ok
        |FROM corpus a, corpus b
        |WHERE a.vec_id < b.vec_id
        |  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.8
        |""".stripMargin.trim)),

    QueryDef(
      // Training-sample chunking: each document split into overlapping
      // token windows (64 tokens, stride 48) — the sequence-prep step
      // between cleaning and packing in an LLM data pipeline. Map-only:
      // start positions come from `sequence`, each chunk is a slice, and
      // the emitted fingerprint (md5 of the joined tokens) keeps the
      // output narrow while pinning exact chunk content cross-engine.
      // Output volume is ~len/stride rows per doc and nothing shuffles
      // until the final orderBy (driver-gate only).
      "t11_chunking",
      (s, dir) => {
        val t = Tables(s, dir)
        val chunk = 64
        val stride = 48
        val toks = t.documents
          .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
        toks
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
              .as("start"))
          .select(col("doc_id"),
            (col("start") / stride).cast("long").as("chunk_idx"),
            slice(col("toks"), col("start") + 1, lit(chunk)).as("chunk"))
          .select(col("doc_id"), col("chunk_idx"),
            size(col("chunk")).cast("long").as("n_tokens"),
            md5(array_join(col("chunk"), " ")).as("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |starts AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start
        |  FROM tok WHERE len(toks) > 0
        |)
        |SELECT doc_id,
        |       CAST(start // 48 AS BIGINT) AS chunk_idx,
        |       CAST(len(toks[start+1 : start+64]) AS BIGINT) AS n_tokens,
        |       md5(array_to_string(toks[start+1 : start+64], ' ')) AS chunk_md5
        |FROM starts
        |ORDER BY doc_id, chunk_idx
        |""".stripMargin.trim)),

    QueryDef(
      // Unigram LM perplexity per document (TextAnalysis.unigramPerplexity)
      // — the statistical quality filter (perplexity-vs-corpus) an LM data
      // pipeline runs before training. The model is the corpus's own
      // Laplace-smoothed unigram distribution; output rounds to 4 decimals
      // because ln/exp and summation order differ across engines at ~1 ulp.
      "t13_perplexity",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.ops.TextAnalysis.unigramPerplexity(t.documents, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH toks AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents
        |),
        |vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |stats AS (SELECT sum(c) AS n, count(*) AS v FROM vocab)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |       round(exp(avg(-ln((c + 1.0) / (n + v)))), 4) AS ppl
        |FROM toks t JOIN vocab USING (tok), stats
        |GROUP BY t.doc_id
        |ORDER BY t.doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Conditional bigram-LM perplexity (TextAnalysis.bigramPerplexity):
      // the KenLM-shaped statistical filter one notch above t13's unigram
      // model — p(w2|w1) Laplace-smoothed from the corpus's own bigram/
      // context counts. Same exactness discipline as t13: integer-valued
      // count arithmetic up to the ln, then round(4) for cross-engine ulp.
      "t14_bigram_ppl",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.ops.TextAnalysis.bigramPerplexity(t.documents, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |uni AS (
        |  SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(toks) AS tok FROM tok)
        |),
        |bi AS (
        |  SELECT doc_id, toks[i+1] AS w1, toks[i+2] AS w2
        |  FROM (SELECT doc_id, toks, unnest(range(len(toks) - 1)) AS i
        |        FROM tok WHERE len(toks) >= 2)
        |),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
        |ctx AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1)
        |SELECT bi.doc_id, count(*) AS n_bigrams,
        |       round(exp(avg(-ln((c12 + 1.0) / (c1 + v)))), 4) AS ppl
        |FROM bi
        |JOIN big USING (w1, w2)
        |JOIN ctx USING (w1)
        |CROSS JOIN uni
        |GROUP BY bi.doc_id
        |ORDER BY bi.doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // BM25 relevance scoring (Robertson/Okapi, k1=1.2 b=0.75) of the
      // corpus against a fixed query — the retrieval-quality scorer a
      // data pipeline runs to mine training examples for a topic. Two
      // shuffles total at any scale: one keyed aggregation for per-(doc,
      // term) frequencies, one broadcast-joined document-frequency
      // relation (|query terms| rows); the idf/tf math is map-side.
      "t12_bm25",
      (s, dir) => {
        val t = Tables(s, dir)
        TextAnalysis.bm25Scores(t.documents, "doc_id", "text",
            queryTerms = Seq("join", "scan", "vector"))
          .orderBy(col("bm25").desc, col("doc_id")).limit(20)
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |dl AS (
        |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl
        |  FROM tok WHERE len(toks) > 0
        |),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
        |),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
        |  WHERE term IN ('join', 'scan', 'vector')
        |  GROUP BY doc_id, term
        |),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term)
        |SELECT tf.doc_id,
        |       round(sum(
        |         ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
        |         (tf.tf * 2.2) /
        |         (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))), 4) AS bm25
        |FROM tf
        |JOIN df ON tf.term = df.term
        |JOIN dl ON tf.doc_id = dl.doc_id
        |CROSS JOIN stats
        |GROUP BY tf.doc_id
        |ORDER BY bm25 DESC, tf.doc_id
        |LIMIT 20
        |""".stripMargin.trim)),

    QueryDef(
      // Hybrid retrieval: fuse the sparse (BM25, t12's scorer) and dense
      // (embedding-cosine against a probe vector) top-50 lists with
      // reciprocal-rank fusion (Similarity.rrfFuse) — the standard
      // sparse+dense combination for mining training examples, score-
      // scale-free by construction. Each arm ends in TakeOrderedAndProject
      // (top-50, no global sort); ranks are assigned by a window over the
      // BOUNDED 50-row lists, so the single-partition window is free; the
      // fusion join touches <= 100 rows however large the corpus. Ranks
      // are exact integers cross-engine because both arms order by a
      // rounded score with an id tiebreak.
      "t15_hybrid_rrf",
      (s, dir) => {
        val t = Tables(s, dir)
        val byBm = Window.orderBy(col("bm25").desc, col("doc_id"))
        val sparse = TextAnalysis.bm25Scores(t.documents, "doc_id", "text",
            queryTerms = Seq("join", "scan", "vector"))
          .orderBy(col("bm25").desc, col("doc_id")).limit(50)
          .withColumn("rnk", row_number().over(byBm))
        val probe = broadcast(t.embeddings.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv")))
        val bySim = Window.orderBy(col("sim").desc, col("doc_id"))
        val dense = t.embeddings.filter(col("vec_id") =!= 0).crossJoin(probe)
          .select(col("vec_id").as("doc_id"),
            round(graft.functions.vector.cosine(col("embedding"), col("qv")), 6)
              .as("sim"))
          .orderBy(col("sim").desc, col("doc_id")).limit(50)
          .withColumn("rnk", row_number().over(bySim))
        Similarity.rrfFuse(Seq(sparse, dense), "doc_id")
          .orderBy(col("rrf").desc, col("doc_id")).limit(20)
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |dl AS (
        |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl
        |  FROM tok WHERE len(toks) > 0
        |),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
        |),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
        |  WHERE term IN ('join', 'scan', 'vector')
        |  GROUP BY doc_id, term
        |),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |bm AS (
        |  SELECT tf.doc_id,
        |         round(sum(
        |           ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
        |           (tf.tf * 2.2) /
        |           (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))), 4) AS bm25
        |  FROM tf
        |  JOIN df ON tf.term = df.term
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  CROSS JOIN stats
        |  GROUP BY tf.doc_id
        |),
        |stop AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50),
        |srank AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
        |  FROM stop
        |),
        |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        |dsim AS (
        |  SELECT vec_id AS doc_id,
        |         round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |                                      CAST(q AS DOUBLE[])), 6) AS sim
        |  FROM embeddings, qv WHERE vec_id <> 0
        |  ORDER BY sim DESC, doc_id LIMIT 50
        |),
        |drank AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS rnk
        |  FROM dsim
        |)
        |SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
        |       round(COALESCE(CAST(1 AS DOUBLE) / (60 + s.rnk), 0) +
        |             COALESCE(CAST(1 AS DOUBLE) / (60 + d.rnk), 0), 6) AS rrf
        |FROM srank s FULL OUTER JOIN drank d ON s.doc_id = d.doc_id
        |ORDER BY rrf DESC, doc_id
        |LIMIT 20
        |""".stripMargin.trim)),

    QueryDef(
      // Retrieval evaluation: NDCG@10 of the BM25 arm graded against
      // embedding-cosine relevance to the probe (vec_id 0) — the harness
      // that tells a pipeline whether its sparse retriever is worth
      // fusing (compare with t15's RRF). Gains clip at 0 and round at 6
      // before any ranking; both engines then discount/divide the same
      // doubles and round once at the end. The ideal ranking plans as
      // TakeOrderedAndProject — no global sort of the truth relation.
      "t21_ndcg",
      (s, dir) => {
        val t = Tables(s, dir)
        val byBm = Window.orderBy(col("bm25").desc, col("doc_id"))
        val run = TextAnalysis.bm25Scores(t.documents, "doc_id", "text",
            queryTerms = Seq("join", "scan", "vector"))
          .orderBy(col("bm25").desc, col("doc_id")).limit(10)
          .withColumn("rnk", row_number().over(byBm))
        val probe = broadcast(t.embeddings.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv")))
        val truth = t.embeddings.filter(col("vec_id") =!= 0).crossJoin(probe)
          .select(col("vec_id").as("doc_id"),
            greatest(lit(0.0),
              round(graft.functions.vector.cosine(col("embedding"), col("qv")),
                6)).as("gain"))
        Similarity.ndcgAtK(run, truth, "doc_id", k = 10)
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |dl AS (
        |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl
        |  FROM tok WHERE len(toks) > 0
        |),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
        |),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
        |  WHERE term IN ('join', 'scan', 'vector')
        |  GROUP BY doc_id, term
        |),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |bm AS (
        |  SELECT tf.doc_id,
        |         round(sum(
        |           ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
        |           (tf.tf * 2.2) /
        |           (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))), 4) AS bm25
        |  FROM tf
        |  JOIN df ON tf.term = df.term
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  CROSS JOIN stats
        |  GROUP BY tf.doc_id
        |),
        |runk AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
        |  FROM (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10)
        |),
        |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        |gains AS (
        |  SELECT vec_id AS doc_id,
        |         greatest(0.0,
        |           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |                                        CAST(q AS DOUBLE[])), 6)) AS gain
        |  FROM embeddings, qv WHERE vec_id <> 0
        |),
        |d AS (
        |  SELECT sum(coalesce(g.gain, 0.0) * ln(2.0) / ln(r.rnk + 1.0)) AS dcg
        |  FROM runk r LEFT JOIN gains g USING (doc_id)
        |  WHERE r.rnk <= 10
        |),
        |i AS (
        |  SELECT sum(gain * ln(2.0) / ln(irnk + 1.0)) AS idcg
        |  FROM (
        |    SELECT gain, row_number() OVER (ORDER BY gain DESC, doc_id) AS irnk
        |    FROM (SELECT doc_id, gain FROM gains
        |          ORDER BY gain DESC, doc_id LIMIT 10)
        |  )
        |)
        |SELECT round(dcg, 4) AS dcg, round(idcg, 4) AS idcg,
        |       round(dcg / idcg, 4) AS ndcg
        |FROM d, i
        |""".stripMargin.trim)),

    QueryDef(
      // Retrieval evaluation #2 — MRR and recall@10 of the 1-bit binary
      // retriever (v19's hamming ranking) against exact-cosine relevance
      // (threshold 0.30): the metric pair pipelines track per retriever
      // arm next to t21's graded NDCG. Run AND truth are both exact
      // deterministic functions of the data here (sign-bit packing +
      // hamming, exact cosine set), so unlike the v16-v20 recall
      // contracts every metric value is hash-checked end to end. Degenerate
      // probes (no relevant docs) yield NULL metrics, not divide-by-zero.
      "t26_retrieval_eval",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val probes = emb.filter(col("vec_id") < 5)
        val run = graft.ops.Quantize.hammingTopK(emb, probes, "vec_id",
            "embedding", k = 10)
          .select(col("query_id"), col("rnk"), col("vec_id"))
        val p = broadcast(probes.select(col("vec_id").as("query_id"),
          col("embedding").as("qv")))
        val rel = emb.crossJoin(p)
          .filter(col("vec_id") =!= col("query_id"))
          .filter(round(graft.functions.vector.cosine(col("embedding"),
            col("qv")), 6) >= 0.30)
          .select(col("query_id"), col("vec_id"), lit(1).as("relv"))
        val perQ = run.join(rel, Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg(min(when(col("relv").isNotNull, col("rnk"))).as("first_rel"),
            count(when(col("relv").isNotNull, 1)).as("hits"))
        val nrel = rel.groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_relevant"))
        p.select(col("query_id")).join(nrel, Seq("query_id"), "left")
          .na.fill(0, Seq("n_relevant"))
          .join(perQ, Seq("query_id"), "left")
          .select(col("query_id"), col("n_relevant"),
            when(col("n_relevant") > 0,
              round(col("hits").cast("double") /
                least(lit(10L), col("n_relevant")).cast("double"), 4))
              .as("recall_at10"),
            when(col("n_relevant") > 0,
              round(coalesce(lit(1.0) / col("first_rel").cast("double"),
                lit(0.0)), 4)).as("mrr"))
          .orderBy(col("query_id"))
      },
      Some("""
        |WITH sig AS (
        |  SELECT vec_id,
        |         CAST(list_sum(list_transform(range(1, 33), i ->
        |           CASE WHEN embedding[i] > 0
        |                THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END))
        |           AS BIGINT) AS s0,
        |         CAST(list_sum(list_transform(range(33, 65), i ->
        |           CASE WHEN embedding[i] > 0
        |                THEN (CAST(1 AS BIGINT) << (i - 33)) ELSE 0 END))
        |           AS BIGINT) AS s1
        |  FROM embeddings
        |),
        |cand AS (
        |  SELECT p.vec_id AS query_id, c.vec_id,
        |         bit_count(xor(p.s0, c.s0)) + bit_count(xor(p.s1, c.s1))
        |           AS hamming
        |  FROM sig p JOIN sig c ON c.vec_id <> p.vec_id
        |  WHERE p.vec_id < 5
        |),
        |run AS (
        |  SELECT query_id, vec_id, rnk FROM (
        |    SELECT query_id, vec_id,
        |           row_number() OVER (PARTITION BY query_id
        |                              ORDER BY hamming, vec_id) AS rnk
        |    FROM cand
        |  ) WHERE rnk <= 10
        |),
        |qv AS (
        |  SELECT vec_id AS query_id, embedding AS qv
        |  FROM embeddings WHERE vec_id < 5
        |),
        |rel AS (
        |  SELECT q.query_id, c.vec_id
        |  FROM embeddings c, qv q
        |  WHERE c.vec_id <> q.query_id
        |    AND round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                     CAST(q.qv AS DOUBLE[])), 6)
        |        >= 0.30
        |),
        |nrel AS (SELECT query_id, count(*) AS n_relevant FROM rel GROUP BY query_id),
        |j AS (
        |  SELECT run.query_id,
        |         min(CASE WHEN rel.vec_id IS NOT NULL THEN run.rnk END)
        |           AS first_rel,
        |         count(rel.vec_id) AS hits
        |  FROM run LEFT JOIN rel
        |    ON run.query_id = rel.query_id AND run.vec_id = rel.vec_id
        |  GROUP BY run.query_id
        |)
        |SELECT q.query_id,
        |       CAST(coalesce(n.n_relevant, 0) AS BIGINT) AS n_relevant,
        |       CASE WHEN coalesce(n.n_relevant, 0) > 0
        |            THEN round(CAST(j.hits AS DOUBLE)
        |                       / least(10, n.n_relevant), 4) END AS recall_at10,
        |       CASE WHEN coalesce(n.n_relevant, 0) > 0
        |            THEN round(coalesce(1.0 / j.first_rel, 0.0), 4) END AS mrr
        |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 5) q
        |LEFT JOIN nrel n USING (query_id)
        |LEFT JOIN j USING (query_id)
        |ORDER BY query_id
        |""".stripMargin.trim)),

    QueryDef(
      // Character 5-gram Jaccard near-dup pairs — same machinery as d02
      // over char shingles, but MinHash(64) in 8 bands of EIGHT: char-gram
      // similarity concentrates much higher than word-gram similarity on
      // template-generated corpora, and r=4 banding admitted ~22% of ALL
      // pairs as candidates (2.7M at sf0.1). r=8 keeps the mid-similarity
      // cloud out; the oracle replays the identical pipeline, so results
      // match by construction.
      "d04_ngram_jaccard",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.ngramJaccardPairs(t.documents, "doc_id", "text",
            threshold = 0.6, ngram = 5, numHashes = 64, bands = 8)
          .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        |WITH sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(length(text) - 4),
        |                       i -> substr(text, CAST(i + 1 AS INTEGER), 5))) AS shingles
        |  FROM documents WHERE length(text) >= 5
        |),
        |ex AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5(s), 1, 12)) AS BIGINT)  AS h1,
        |         CAST(concat('0x', substr(md5(s), 13, 12)) AS BIGINT) AS h2
        |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
        |),
        |hashed AS (
        |  SELECT doc_id, j, min((h1 + j * h2) % 2147483647) AS sigv
        |  FROM ex, range(64) t(j)
        |  GROUP BY doc_id, j
        |),
        |sigs AS (SELECT doc_id, list(sigv ORDER BY j) AS sig FROM hashed GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, b, array_to_string(sig[b*8+1 : b*8+8], ',') AS key
        |  FROM sigs, range(8) t(b)
        |),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
        |),
        |hsets AS (SELECT doc_id, list(h1) AS hs FROM ex GROUP BY doc_id),
        |verified AS (
        |  SELECT c.doc_a, c.doc_b,
        |         round(len(list_intersect(sa.hs, sb.hs)) * 1.0
        |               / len(list_distinct(sa.hs || sb.hs)), 6) AS jaccard
        |  FROM cand c
        |  JOIN hsets sa ON sa.doc_id = c.doc_a
        |  JOIN hsets sb ON sb.doc_id = c.doc_b
        |)
        |SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.6
        |ORDER BY doc_a, doc_b
        |""".stripMargin.trim)),

    QueryDef(
      // Deterministic stratified sampling: per-source keep fractions via
      // the same md5 bucket as s01 — membership is a pure function of
      // doc_id, stable across engines/runs/partitionings.
      "s02_stratified",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.ops.Sampling.stratifiedSample(t.documents, "doc_id", "source",
            Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"))
          .orderBy(col("source"))
      },
      Some("""
        |WITH bucketed AS (
        |  SELECT source, doc_id,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |           % 10000 AS bucket,
        |         CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
        |                     WHEN 'src2' THEN 2500  WHEN 'src3' THEN 1000
        |                     ELSE 0 END AS keep_below
        |  FROM documents
        |)
        |SELECT source, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM bucketed WHERE bucket < keep_below
        |GROUP BY source
        |ORDER BY source
        |""".stripMargin.trim)),

    QueryDef(
      // PII redaction/audit: the synthetic corpus carries no PII, so the
      // query plants a deterministic email/URL/number per document (pure
      // function of doc_id, reproduced verbatim by the oracle), then
      // counts hits and fingerprints the redacted text. Exercises the
      // exact RE2-safe patterns of TextAnalysis.redactPii.
      "t05_pii_redact",
      (s, dir) => {
        val t = Tables(s, dir)
        val planted = t.documents.select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@mail.example.com or"),
            lit(" https://ex.example/d/"), col("doc_id"),
            lit(" ref 55501000"), col("doc_id")).as("txt"))
        val counted = graft.ops.TextAnalysis.piiCounts(planted, "doc_id", "txt")
        planted
          .join(counted, "doc_id")
          .select(col("doc_id"), col("n_emails"), col("n_urls"),
            col("n_long_numbers"),
            md5(graft.ops.TextAnalysis.redactPii(col("txt"))).as("redacted_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH planted AS (
        |  SELECT doc_id,
        |         text || ' contact user' || doc_id || '@mail.example.com or' ||
        |         ' https://ex.example/d/' || doc_id ||
        |         ' ref 55501000' || doc_id AS txt
        |  FROM documents
        |),
        |toks AS (SELECT doc_id, txt, string_split(txt, ' ') AS ts FROM planted)
        |SELECT doc_id,
        |       len(list_filter(ts, t -> regexp_matches(t, '@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')))
        |         AS n_emails,
        |       len(list_filter(ts, t -> regexp_matches(t, '^https?://'))) AS n_urls,
        |       len(list_filter(ts, t -> regexp_matches(t, '^[0-9]{8,}$')))
        |         AS n_long_numbers,
        |       md5(regexp_replace(regexp_replace(regexp_replace(txt,
        |             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |             'https?://[^\s]+', '<URL>', 'g'),
        |             '[0-9][0-9 ()+.-]{7,}[0-9]', '<NUMBER>', 'g')) AS redacted_md5
        |FROM toks
        |ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Full multimodal decode path at the query surface: wrap documents
      // as opaque media payloads, run the pluggable decoder partition-
      // parallel (mapPartitions — payload bytes never shuffle), emit typed
      // metadata + a feature component. The decoder is the deterministic
      // sha256-window stub (no codecs in this container), so the oracle
      // replays the identical digest arithmetic in SQL and checks the
      // whole mapPartitions path end-to-end.
      "m02_media_decode",
      (s, dir) => {
        import s.implicits._
        val t = Tables(s, dir)
        val media = t.documents.select(
          col("doc_id").as("media_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          col("text").cast("binary").as("payload"),
          col("source"))
          .as[graft.ops.Multimodal.MediaItem]
        graft.ops.Multimodal.decodeAll(media, new graft.ops.Multimodal.FakeDecoder(16))
          .toDF()
          .select(col("media_id"), col("kind"), col("width"), col("height"),
            col("duration_ms"), col("channels"),
            round(element_at(col("feature"), 1).cast("double"), 6).as("f0"),
            round(element_at(col("feature"), 16).cast("double"), 6).as("f15"))
          .orderBy(col("media_id"))
      },
      Some("""
        |WITH med AS (
        |  SELECT doc_id AS media_id,
        |         CASE CAST(doc_id % 3 AS INTEGER)
        |              WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |              ELSE 'video' END AS kind,
        |         sha256(text) AS hx
        |  FROM documents
        |  WHERE octet_length(CAST(text AS BLOB)) > 0
        |)
        |SELECT media_id, kind,
        |       CASE WHEN kind = 'audio' THEN 0
        |            ELSE 64 + CAST(concat('0x', substr(hx, 1, 6)) AS BIGINT) % 512
        |            END AS width,
        |       CASE WHEN kind = 'audio' THEN 0
        |            ELSE 64 + CAST(concat('0x', substr(hx, 7, 6)) AS BIGINT) % 512
        |            END AS height,
        |       CASE WHEN kind = 'image' THEN 0
        |            ELSE 1000 + CAST(concat('0x', substr(hx, 13, 6)) AS BIGINT) % 60000
        |            END AS duration_ms,
        |       1 + CAST(concat('0x', substr(hx, 19, 6)) AS BIGINT) % 4 AS channels,
        |       round(CAST(CAST(concat('0x', substr(hx, 25, 6)) AS BIGINT) % 1000
        |             AS DOUBLE) / 1000.0, 6) AS f0,
        |       round(CAST(CAST(concat('0x', substr(hx, 55, 6)) AS BIGINT) % 1000
        |             AS DOUBLE) / 1000.0, 6) AS f15
        |FROM med
        |ORDER BY media_id
        |""".stripMargin.trim)),

    QueryDef(
      // Energy-based voice-activity detection over the decoded RMS
      // envelope: contiguous windows at-or-above threshold merge into
      // activity segments; per clip the audit reports segment count,
      // active windows, longest run, and exact-integer active
      // milliseconds — the silence-trim pass of a speech pipeline. The
      // island scan folds INSIDE the decode map (Multimodal.vadSummary),
      // so the whole query is one shuffle-free pass at any corpus size.
      // The decoder is the sha256-window stub; the oracle replays its
      // envelope arithmetic (window i active iff digest window i mod
      // 1000 >= 500 — 0.5 in [0,1) thousandths, compared in exact
      // integers) and the same island merge in SQL. The REAL
      // AudioWavDecoder path through the identical segmentBounds scan is
      // pinned in MultimodalSpec on synthesized tone/silence WAVs.
      "m07_audio_vad",
      (s, dir) => {
        import s.implicits._
        val t = Tables(s, dir)
        val media = t.documents.select(
          col("doc_id").as("media_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          col("text").cast("binary").as("payload"),
          col("source"))
          .filter(col("kind") === "audio")
          .as[graft.ops.Multimodal.MediaItem]
        val decoded = graft.ops.Multimodal.decodeAll(media,
          new graft.ops.Multimodal.FakeDecoder(16))
        graft.ops.Multimodal.vadSummary(decoded, threshold = 0.5f)
          .orderBy(col("media_id"))
      },
      Some("""
        |WITH med0 AS (
        |  SELECT doc_id AS media_id, sha256(text) AS hx
        |  FROM documents
        |  WHERE CAST(doc_id % 3 AS INTEGER) = 1
        |    AND octet_length(CAST(text AS BLOB)) > 0
        |),
        |med AS (
        |  SELECT media_id, hx,
        |         1000 + CAST(concat('0x', substr(hx, 13, 6)) AS BIGINT) % 60000
        |           AS duration_ms
        |  FROM med0
        |),
        |win AS (
        |  SELECT media_id, CAST(t.i AS INTEGER) AS i,
        |         CASE WHEN CAST(concat('0x', substr(hx, 25 + 2 * t.i, 6))
        |                    AS BIGINT) % 1000 >= 500
        |              THEN 1 ELSE 0 END AS active
        |  FROM med, range(16) t(i)
        |),
        |seg AS (
        |  SELECT media_id, i, active,
        |         CASE WHEN active = 1 AND coalesce(lag(active) OVER (
        |                PARTITION BY media_id ORDER BY i), 0) = 0
        |              THEN 1 ELSE 0 END AS brk
        |  FROM win
        |),
        |seg2 AS (
        |  SELECT media_id, i, active,
        |         sum(brk) OVER (PARTITION BY media_id ORDER BY i
        |                        ROWS UNBOUNDED PRECEDING) AS seg_id
        |  FROM seg
        |),
        |runs AS (
        |  SELECT media_id, seg_id, count(*) AS run_len
        |  FROM seg2 WHERE active = 1 GROUP BY 1, 2
        |),
        |agg AS (
        |  SELECT media_id, CAST(count(*) AS BIGINT) AS n_segments,
        |         CAST(sum(run_len) AS BIGINT) AS active_windows,
        |         CAST(max(run_len) AS BIGINT) AS longest_run
        |  FROM runs GROUP BY 1
        |)
        |SELECT m.media_id, m.duration_ms,
        |       coalesce(a.n_segments, 0) AS n_segments,
        |       coalesce(a.active_windows, 0) AS active_windows,
        |       coalesce(a.longest_run, 0) AS longest_run,
        |       m.duration_ms * coalesce(a.active_windows, 0) // 16 AS active_ms
        |FROM med m LEFT JOIN agg a USING (media_id)
        |ORDER BY m.media_id
        |""".stripMargin.trim)),

    QueryDef(
      // End-to-end corpus dedup: MinHash near-dup pairs -> connected-
      // component canonicalization (union-find / iterative min-label
      // propagation) -> keep each cluster's min-id doc. The oracle replays
      // the d02 pair pipeline, then resolves components with a recursive
      // transitive-closure CTE (fine at oracle scale; the Spark side is
      // what scales) and anti-joins the losers.
      "d05_dedup_corpus",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.ops.Dedup.dedupCorpus(t.documents, "doc_id", "text",
            threshold = 0.5)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_id"))
          .orderBy(col("source"))
      },
      Some("""
        |WITH RECURSIVE
        |tok AS (
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
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM verified
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM verified
        |),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS keeper_id
        |  FROM reach GROUP BY src
        |),
        |losers AS (SELECT doc_id FROM labels WHERE keeper_id < doc_id)
        |SELECT source, count(*) AS n_kept, min(doc_id) AS min_id
        |FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        |GROUP BY source
        |ORDER BY source
        |""".stripMargin.trim)),

    QueryDef(
      // Duplicate-cluster size distribution — the dedup AUDIT that tells
      // an operator whether near-dup structure is pairwise noise or deep
      // template families (a heavy tail here means one boilerplate source
      // dominates and minhash parameters/thresholds deserve a look).
      // Rides the SAME cached pair relation and canonicalization as d05;
      // the histogram is two keyed aggregates over the |pair-graph| label
      // relation, never the corpus. Oracle replays the full recursive
      // transitive closure.
      "d13_cluster_sizes",
      (s, dir) => {
        val t = Tables(s, dir)
        val pairs = graft.ops.Dedup.nearDuplicatesMinhashCached(
          t.documents, "doc_id", "text", threshold = 0.5)
        graft.ops.Dedup.canonicalize(pairs)
          .groupBy(col("keeper_id"))
          .agg(count(lit(1)).as("cluster_size"))
          .groupBy(col("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("cluster_size")).as("n_docs"))
          .orderBy(col("cluster_size"))
      },
      Some("""
        |WITH RECURSIVE
        |tok AS (
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
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM verified
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM verified
        |),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS keeper_id
        |  FROM reach GROUP BY src
        |),
        |comp AS (
        |  SELECT keeper_id, count(*) AS cluster_size FROM labels GROUP BY keeper_id
        |)
        |SELECT cluster_size, count(*) AS n_clusters,
        |       CAST(sum(cluster_size) AS BIGINT) AS n_docs
        |FROM comp
        |GROUP BY cluster_size
        |ORDER BY cluster_size
        |""".stripMargin.trim)),

    QueryDef(
      "m03_frame_sample",
      (s, dir) => {
        import s.implicits._
        val t = Tables(s, dir)
        // Sample 4 "frames" (payload slices) per video-kind document —
        // the explode-to-(media_id, frame_idx, payload) plumbing a real
        // frame decoder would feed. Output metadata only; frame bytes
        // never aggregate. The slice offsets are pure integer arithmetic
        // on the payload byte length, so the oracle reproduces them.
        val media = t.documents
          .filter(col("doc_id") % 3 === 2) // the "video" kind of m02
          .select(col("doc_id").as("media_id"), lit("video").as("kind"),
            col("text").cast("binary").as("payload"), col("source"))
          .as[graft.ops.Multimodal.MediaItem]
        graft.ops.Multimodal.sampleFrames(media, n = 4)
          .select(col("media_id"), col("frame_idx"),
            length(col("frame_payload")).as("frame_bytes"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""
        |WITH vids AS (
        |  SELECT doc_id AS media_id, octet_length(CAST(text AS BLOB)) AS len
        |  FROM documents WHERE doc_id % 3 = 2
        |)
        |SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
        |       least((len * i) // 4 + greatest(len // 4, 1), len)
        |         - (len * i) // 4 AS frame_bytes
        |FROM vids, range(4) t(i)
        |WHERE len > 0
        |ORDER BY media_id, frame_idx
        |""".stripMargin.trim)),

    QueryDef(
      // Cross-video shared-frame dedup — the video twin of d09's span
      // dedup: sample 8 frames per video (deterministic payload slices —
      // a real decoder swaps in behind the same (media_id, frame_idx,
      // bytes) shape), fingerprint each with sha256, and pair videos
      // sharing >= 4 of 8 frame fingerprints via a fingerprint-keyed
      // equi-join — linear in total frames, nothing pairwise (each
      // fingerprint bucket joins only its own occupants, the d07
      // postings shape). Fingerprints dedup per video map-side, so
      // n_shared counts distinct shared frames. Re-uploads are planted
      // in-query (every 10th video duplicated under id+100000 — v06's
      // non-vacuous pattern); every planted pair shares ALL its distinct
      // frames and must surface.
      "m08_frame_dedup",
      (s, dir) => {
        import s.implicits._
        val t = Tables(s, dir)
        val vids = t.documents
          .filter(col("doc_id") % 3 === 2)
          .select(col("doc_id").as("media_id"), lit("video").as("kind"),
            col("text").cast("binary").as("payload"), col("source"))
        val reuploads = vids.filter(col("media_id") % 10 === 2)
          .withColumn("media_id", col("media_id") + 100000L)
        val media = vids.unionByName(reuploads)
          .as[graft.ops.Multimodal.MediaItem]
        val prints = graft.ops.Multimodal.sampleFrames(media, n = 8)
          .select(col("media_id"), sha2(col("frame_payload"), 256).as("fp"))
          .distinct()
        val a = prints.select(col("media_id").as("media_a"), col("fp"))
        val b = prints.select(col("media_id").as("media_b"), col("fp"))
        a.join(b, Seq("fp"))
          .filter(col("media_a") < col("media_b"))
          .groupBy(col("media_a"), col("media_b"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 4)
          .orderBy(col("media_a"), col("media_b"))
      },
      Some("""
        |WITH vids0 AS (
        |  -- DuckDB's substring cannot slice BLOBs; the corpus is pure
        |  -- ASCII (octet_length == length for every doc), so VARCHAR
        |  -- slicing is byte slicing and sha256(varchar) hashes the same
        |  -- bytes Spark's binary path does.
        |  SELECT doc_id AS media_id, text AS payload
        |  FROM documents WHERE doc_id % 3 = 2
        |),
        |vids AS (
        |  SELECT media_id, payload FROM vids0
        |  UNION ALL
        |  SELECT media_id + 100000, payload FROM vids0 WHERE media_id % 10 = 2
        |),
        |frames AS (
        |  SELECT DISTINCT media_id,
        |         sha256(substring(payload,
        |           (length(payload) * i) // 8 + 1,
        |           least((length(payload) * i) // 8
        |                   + greatest(length(payload) // 8, 1),
        |                 length(payload))
        |             - (length(payload) * i) // 8)) AS fp
        |  FROM vids, range(8) t(i)
        |  WHERE length(payload) > 0
        |)
        |SELECT a.media_id AS media_a, b.media_id AS media_b,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM frames a JOIN frames b
        |  ON a.fp = b.fp AND a.media_id < b.media_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 4
        |ORDER BY media_a, media_b
        |""".stripMargin.trim)),

    QueryDef(
      // Multimodal resize plumbing: decoded media fitted into a 256-box
      // preserving aspect ratio (floor integer math — engine-exact), with
      // the 16-dim stub feature mean-pooled to 8 (two pooled lanes
      // audited). The pixel work of a real resize belongs to the codec
      // boundary; the engine owns this metadata/layout transform, typed
      // map, zero shuffles. Completes the decode / feature-extract /
      // resize / frame-sample verb set (m02/m04/m03).
      "m04_media_resize",
      (s, dir) => {
        import s.implicits._
        val t = Tables(s, dir)
        val media = t.documents.select(
          col("doc_id").as("media_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          col("text").cast("binary").as("payload"),
          col("source"))
          .as[graft.ops.Multimodal.MediaItem]
        val decoded = graft.ops.Multimodal.decodeAll(media,
          new graft.ops.Multimodal.FakeDecoder(16))
        def lane(i: Int) = round(
          (element_at(col("feature"), 2 * i + 1).cast("double") +
            element_at(col("feature"), 2 * i + 2).cast("double")) / 2.0, 6)
        graft.ops.Multimodal.resizeToFit(decoded, maxDim = 256)
          .toDF()
          .select(col("media_id"), col("kind"), col("width"), col("height"),
            col("out_width"), col("out_height"),
            lane(0).as("p0"), lane(7).as("p7"))
          .orderBy(col("media_id"))
      },
      Some("""
        |WITH med AS (
        |  SELECT doc_id AS media_id,
        |         CASE CAST(doc_id % 3 AS INTEGER)
        |              WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |              ELSE 'video' END AS kind,
        |         sha256(text) AS hx
        |  FROM documents
        |  WHERE octet_length(CAST(text AS BLOB)) > 0
        |),
        |dims AS (
        |  SELECT media_id, kind, hx,
        |         CASE WHEN kind = 'audio' THEN 0
        |              ELSE 64 + CAST(concat('0x', substr(hx, 1, 6)) AS BIGINT) % 512
        |              END AS width,
        |         CASE WHEN kind = 'audio' THEN 0
        |              ELSE 64 + CAST(concat('0x', substr(hx, 7, 6)) AS BIGINT) % 512
        |              END AS height
        |  FROM med
        |),
        |fit AS (
        |  SELECT *, greatest(width, height) AS longest FROM dims
        |)
        |SELECT media_id, kind,
        |       CAST(width AS INTEGER)  AS width,
        |       CAST(height AS INTEGER) AS height,
        |       CAST(CASE WHEN longest <= 256 THEN width
        |                 ELSE (width * 256) // longest END AS INTEGER)  AS out_width,
        |       CAST(CASE WHEN longest <= 256 THEN height
        |                 ELSE (height * 256) // longest END AS INTEGER) AS out_height,
        |       round((CAST(CAST(concat('0x', substr(hx, 25, 6)) AS BIGINT) % 1000 AS DOUBLE) / 1000.0
        |            + CAST(CAST(concat('0x', substr(hx, 27, 6)) AS BIGINT) % 1000 AS DOUBLE) / 1000.0) / 2.0, 6) AS p0,
        |       round((CAST(CAST(concat('0x', substr(hx, 53, 6)) AS BIGINT) % 1000 AS DOUBLE) / 1000.0
        |            + CAST(CAST(concat('0x', substr(hx, 55, 6)) AS BIGINT) % 1000 AS DOUBLE) / 1000.0) / 2.0, 6) AS p7
        |FROM fit
        |ORDER BY media_id
        |""".stripMargin.trim)),

    QueryDef(
      // Perceptual image near-dup: dHash 64-bit gradient fingerprints
      // joined by 4x16-bit segment pigeonhole (exact for hamming <= 3 —
      // Multimodal.hammingPairs, the image twin of d03's SimHash path).
      // As with m02, the driver-checked path derives the 9x8 gray grid
      // from md5 windows of the payload (a decode DuckDB can replay);
      // the REAL decoder path — ImageIO pixels -> box-mean gray ->
      // identical dHashBits — is pinned in MultimodalSpec on rendered
      // images. Near-dups are planted at the hash level (2 bits flipped,
      // one per half) the way re-encoded images land within a few
      // gradient bits of their source.
      "m05_image_dhash",
      (s, dir) => {
        val t = Tables(s, dir)
        // 72+ gray bytes from FIVE md5 digests (16 bytes each), not 72 —
        // the same windows-of-a-digest economy as FakeDecoder; 5 md5/row
        // keeps the stub decode at parquet-scan speed. The digest->gray->
        // neighbor-compare chain is the fused DhashBits expression: the
        // HOF spelling it replaces ran ~150 interpreted expression-tree
        // evaluations per row (hex round-trips, boxing; measured 1.08 s
        // at sf0.1 vs 0.61 s fused — and 4.6 s in the naive inlined-alias
        // form). Bit-identical by OpsSpec's HOF-parity pin.
        // media corpus bounded at 6000 ids (above sf0.1's 4999 max): the
        // DuckDB oracle replays pairs as a literal cross join, so the
        // certification arm is SF-independent work like the e-family caps
        val hashed = t.documents.filter(col("doc_id") < 6000)
          .select(col("doc_id").as("media_id"), col("text"))
          .withColumn("hl", graft.functions.DhashBits(col("text")))
          .select(col("media_id"), col("hl").getItem(0).as("hi"),
            col("hl").getItem(1).as("lo"))
        // Planted rows ride the SAME scan via a map-side explode (each
        // doc_id < 60 row emits its original and its 2-bit-flipped twin)
        // — one pass, no second read, and no Union for the constraint
        // rewriter to chase into the hash lambdas.
        val orig = struct(col("media_id"), col("hi"), col("lo"))
        val twin = struct((col("media_id") + 1000000L).as("media_id"),
          col("hi").bitwiseXOR(
            expr("shiftleft(1L, cast(media_id % 32 as int))")).as("hi"),
          col("lo").bitwiseXOR(
            expr("shiftleft(1L, cast((media_id * 7 + 3) % 32 as int))"))
            .as("lo"))
        val corpus = hashed
          .select(explode(when(col("media_id") < 60, array(orig, twin))
            .otherwise(array(orig))).as("r"))
          .select(col("r.media_id").as("media_id"), col("r.hi").as("hi"),
            col("r.lo").as("lo"))
        graft.ops.Multimodal.hammingPairs(
            corpus, "media_id", "hi", "lo", maxHam = 3)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""
        |WITH hx AS (
        |  SELECT doc_id AS media_id,
        |         list_transform(range(0, 5), j -> md5(text || ':g' || j))
        |           AS hx
        |  FROM documents WHERE doc_id < 6000
        |),
        |g AS (
        |  SELECT media_id,
        |         list_transform(range(0, 72), i ->
        |           CAST(concat('0x', substr(hx[CAST(i // 16 + 1 AS INTEGER)],
        |                  CAST((i % 16) * 2 + 1 AS INTEGER), 2))
        |                AS BIGINT)) AS g
        |  FROM hx
        |),
        |h AS (
        |  SELECT media_id,
        |         CAST(list_sum(list_transform(range(0, 32), b ->
        |           CASE WHEN g[(b // 8) * 9 + (b % 8) + 2] >
        |                     g[(b // 8) * 9 + (b % 8) + 1]
        |                THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
        |                ELSE 0 END)) AS BIGINT) AS hi,
        |         CAST(list_sum(list_transform(range(32, 64), b ->
        |           CASE WHEN g[(b // 8) * 9 + (b % 8) + 2] >
        |                     g[(b // 8) * 9 + (b % 8) + 1]
        |                THEN (CAST(1 AS BIGINT) << CAST(b - 32 AS INTEGER))
        |                ELSE 0 END)) AS BIGINT) AS lo
        |  FROM g
        |),
        |corpus AS (
        |  SELECT media_id, hi, lo FROM h
        |  UNION ALL
        |  SELECT media_id + 1000000,
        |         xor(hi, CAST(1 AS BIGINT) << CAST(media_id % 32 AS INTEGER)),
        |         xor(lo, CAST(1 AS BIGINT)
        |                 << CAST((media_id * 7 + 3) % 32 AS INTEGER))
        |  FROM h WHERE media_id < 60
        |)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |       CAST(bit_count(xor(a.hi, b.hi)) +
        |            bit_count(xor(a.lo, b.lo)) AS INTEGER) AS ham
        |FROM corpus a, corpus b
        |WHERE a.media_id < b.media_id
        |  AND bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        |ORDER BY id_a, id_b
        |""".stripMargin.trim)),

    QueryDef(
      // Winnowing document fingerprints (k=8 char grams, window w=4):
      // rolling positional hashes -> window-min selection -> distinct
      // fingerprint set per doc. Two-projection shape so the hash array
      // is an attribute when the window lambdas slice it (HOF re-eval
      // gotcha). The oracle replays the identical arithmetic with DuckDB
      // list functions.
      "t06_winnow_fingerprint",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = 8; val w = 4
        graft.ops.Spread.ensure(t.documents)
          .filter(length(col("text")) >= k + w - 1)
          .select(col("doc_id"),
            graft.ops.TextAnalysis.kgramHashes(col("text"), k).as("hs"))
          .select(col("doc_id"),
            graft.ops.TextAnalysis.winnow(col("hs"), w).as("fps"))
          .select(col("doc_id"), size(col("fps")).as("n_fp"),
            array_min(col("fps")).as("fp_min"), array_max(col("fps")).as("fp_max"))
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
        |)
        |SELECT doc_id, len(fps) AS n_fp,
        |       list_min(fps) AS fp_min, list_max(fps) AS fp_max
        |FROM fp
        |ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Edit-distance verification tier: exact Levenshtein over the
      // MinHash candidate pairs (never all pairs — the LSH stage bounds
      // the O(len^2)-per-pair cost to actual near-duplicates). The oracle
      // replays the identical candidate pipeline and DuckDB's levenshtein.
      "d06_edit_distance",
      (s, dir) => {
        val t = Tables(s, dir)
        val docs = t.documents
        val pairs = Dedup.nearDuplicatesMinhashCached(docs, "doc_id", "text",
          threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3)
        pairs
          .join(docs.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
          .join(docs.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            levenshtein(col("text_a"), col("text_b")).cast("long").as("edit_dist"))
          .orderBy(col("doc_a"), col("doc_b"))
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
        |)
        |SELECT v.doc_a, v.doc_b,
        |       levenshtein(da.text, db.text) AS edit_dist
        |FROM verified v
        |JOIN documents da ON da.doc_id = v.doc_a
        |JOIN documents db ON db.doc_id = v.doc_b
        |ORDER BY v.doc_a, v.doc_b
        |""".stripMargin.trim)),

    QueryDef(
      // Incremental (batch-vs-corpus) MinHash dedup: the daily-ingest
      // shape. A 20% hash split plays the "new batch"; candidates come
      // from joining the batch's LSH buckets against the corpus's — never
      // corpus x corpus — so the per-run cost follows the batch size.
      "d08_incremental_dedup",
      (s, dir) => {
        val t = Tables(s, dir)
        val bucket = graft.ops.Sampling.hashBucket(col("doc_id"), 100)
        Dedup.crossCorpusMinhashPairs(
            t.documents.filter(bucket < 20),
            t.documents.filter(bucket >= 20),
            "doc_id", "text",
            threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3)
          .select(col("doc_new"), col("doc_corpus"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy(col("doc_new"), col("doc_corpus"))
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
        |bands AS (
        |  SELECT doc_id, b, array_to_string(sig[b*4+1 : b*4+4], ',') AS key
        |  FROM sigs, range(8) t(b)
        |),
        |split AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |              AS BIGINT) % 100 AS bucket
        |  FROM documents
        |),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_corpus
        |  FROM bands a
        |  JOIN split sa ON sa.doc_id = a.doc_id AND sa.bucket < 20
        |  JOIN bands b ON a.b = b.b AND a.key = b.key
        |  JOIN split sb ON sb.doc_id = b.doc_id AND sb.bucket >= 20
        |),
        |hsets AS (SELECT doc_id, list(h1) AS hs FROM ex GROUP BY doc_id),
        |verified AS (
        |  SELECT c.doc_new, c.doc_corpus,
        |         len(list_intersect(sa.hs, sb.hs)) * 1.0
        |           / len(list_distinct(sa.hs || sb.hs)) AS j
        |  FROM cand c
        |  JOIN hsets sa ON sa.doc_id = c.doc_new
        |  JOIN hsets sb ON sb.doc_id = c.doc_corpus
        |)
        |SELECT doc_new, doc_corpus, round(j, 6) AS jaccard
        |FROM verified WHERE j >= 0.5
        |ORDER BY doc_new, doc_corpus
        |""".stripMargin.trim)),

    QueryDef(
      // Gopher-style repetition signals: distinct-token ratio and the
      // share of word bigrams taken by the most frequent bigram. Map-only
      // (all four counts come from the fused RepetitionStats byte walk) —
      // no token is ever exploded or shuffled.
      "t08_repetition",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.ops.TextAnalysis.repetitionMetrics(t.documents, "doc_id", "text")
          .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
            round(col("distinct_ratio"), 6).as("distinct_ratio"),
            col("top_bigram_n"),
            round(col("top_bigram_frac"), 6).as("top_bigram_frac"),
            col("keep"))
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |base AS (
        |  SELECT doc_id, len(toks) AS n_tokens,
        |         len(list_distinct(toks)) AS n_distinct,
        |         CASE WHEN len(toks) >= 2
        |              THEN list_transform(range(len(toks) - 1),
        |                     i -> toks[i+1] || ' ' || toks[i+2])
        |              ELSE [] END AS bgs
        |  FROM tok
        |),
        |cnt AS (
        |  SELECT doc_id, max(c) AS top_bigram_n
        |  FROM (SELECT doc_id, bg, count(*) AS c
        |        FROM (SELECT doc_id, unnest(bgs) AS bg FROM base)
        |        GROUP BY doc_id, bg)
        |  GROUP BY doc_id
        |),
        |m AS (
        |  SELECT b.doc_id, b.n_tokens, b.n_distinct,
        |         b.n_distinct * 1.0 / b.n_tokens AS distinct_ratio,
        |         coalesce(c.top_bigram_n, 0) AS top_bigram_n,
        |         CASE WHEN len(b.bgs) > 0
        |              THEN coalesce(c.top_bigram_n, 0) * 1.0 / len(b.bgs)
        |              ELSE 0.0 END AS top_bigram_frac
        |  FROM base b LEFT JOIN cnt c ON c.doc_id = b.doc_id
        |)
        |SELECT doc_id, n_tokens, n_distinct,
        |       round(distinct_ratio, 6) AS distinct_ratio,
        |       top_bigram_n,
        |       round(top_bigram_frac, 6) AS top_bigram_frac,
        |       (distinct_ratio >= 0.4 AND
        |        (top_bigram_n <= 1 OR top_bigram_frac <= 0.18)) AS keep
        |FROM m ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Distributed BPE vocabulary training (arXiv:1508.07909): the
      // tokenizer-construction step, run over the corpus the tokenizer
      // will serve. The corpus is touched exactly once (one tokenize +
      // count shuffle -> the Zipf-bounded word-frequency relation); each
      // of the 8 merge rounds is one keyed pair-count aggregation over
      // ~vocab rows plus a ONE-row driver pull (the argmax pair) and a
      // map-side re-segmentation fold. Deterministic by construction
      // (frequency ties break lexicographically), so the whole training
      // loop IS oracle-checkable: the merge count is a fixed constant (8),
      // and a fixed iteration count unrolls into straight-line SQL — each
      // round is one pair-count aggregation, one argmax, and one
      // window-function greedy merge application (see [[bpeOracleSql]]).
      // The oracle hash pins every round's argmax AND the leftmost-first
      // non-overlapping fold semantics (a==b chains included); BpeSpec
      // additionally pins the merge sequence on a hand-computed corpus.
      "t17_bpe_merges",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.ops.Bpe.trainTable(s, t.documents, "text", numMerges = 8)
          .orderBy(col("rank"))
      },
      Some(bpeOracleSql(8))),

    QueryDef(
      // Unicode canonicalization + whitespace/control scrub — the
      // normalization pass that runs BEFORE any hashing/dedup stage so
      // byte-distinct-but-visually-identical text (composed vs decomposed
      // accents, tab runs, stray control chars) collapses to one canonical
      // form. Non-vacuous by construction: accent/control dirt is planted
      // in-query on both engines (the synthetic corpus is clean ASCII), the
      // same pattern as v06's planted doubles. doc_id%4==0 appends
      // DECOMPOSED accents (e + U+0301), %4==1 the composed equivalents
      // (U+00E9 — NFC-invariant, so `changed` stays false), %4==2 control +
      // whitespace runs, %4==3 nothing. Map-only at any corpus size: the
      // fused NfcNormalize expression (codegen, zero-alloc fast path for
      // already-canonical rows) plus two codegen regexp_replaces in the
      // scan projection — zero shuffles before the output sort. Both
      // engines implement Unicode NFC (JDK Normalizer / utf8proc) and both
      // regex engines agree on the ASCII classes used, so md5 of the
      // cleaned text hash-matches exactly.
      "t27_nfc_normalize",
      (s, dir) => {
        val t = Tables(s, dir)
        val m = pmod(col("doc_id"), lit(4))
        val raw = concat(col("text"),
          when(m === 0, lit(PlantDecomposed))
            .when(m === 1, lit(PlantComposed))
            .when(m === 2, lit(PlantControl))
            .otherwise(lit("")))
        val clean = graft.functions.NfcNormalize(
          trim(regexp_replace(regexp_replace(col("raw"),
            "[\\x00-\\x1F\\x7F]", " "), "\\s+", " ")))
        t.documents
          .withColumn("raw", raw)
          .withColumn("clean", clean)
          .select(col("doc_id"),
            (col("clean") =!= col("raw")).as("changed"),
            length(col("raw")).as("n_raw"),
            length(col("clean")).as("n_clean"),
            md5(col("clean").cast("binary")).as("clean_md5"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        |WITH planted AS (
        |  SELECT doc_id,
        |         text || CASE CAST(doc_id % 4 AS INT)
        |           WHEN 0 THEN '$PlantDecomposed'
        |           WHEN 1 THEN '$PlantComposed'
        |           WHEN 2 THEN '$PlantControl'
        |           ELSE '' END AS raw
        |  FROM documents
        |),
        |cleaned AS (
        |  SELECT doc_id, raw,
        |         nfc_normalize(trim(regexp_replace(regexp_replace(raw,
        |           '[\\x00-\\x1F\\x7F]', ' ', 'g'), '\\s+', ' ', 'g'))) AS clean
        |  FROM planted
        |)
        |SELECT doc_id, (clean <> raw) AS changed, length(raw) AS n_raw,
        |       length(clean) AS n_clean, md5(clean) AS clean_md5
        |FROM cleaned ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // CCNet line-level boilerplate removal (Wenzek et al. 2020 §3.1):
      // a line occurring in >= 20 distinct docs is chrome and is stripped
      // from every doc; unique content survives. The corpus has no
      // newlines, so the dirt is planted in-query (v06's pattern) on BOTH
      // engines: a per-source subscribe header (~25 docs/source at
      // sf0.01), a global "all rights reserved" footer on even ids, and a
      // doc-unique "ref <id>" line that must NOT be removed. Exactly the
      // header+footer lines go (n_removed ties to the planting arithmetic)
      // and clean_md5 pins the surviving text byte-for-byte.
      "t30_line_dedup",
      (s, dir) => {
        val t = Tables(s, dir)
        val lined = t.documents.select(col("doc_id"),
          concat(
            lit("subscribe to the "), col("source"), lit(" newsletter\n"),
            col("text"),
            when(col("doc_id") % 2 === 0, lit("\nall rights reserved"))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              concat(lit("\nref "), col("doc_id").cast("string")))
              .otherwise(lit(""))).as("text2"))
        TextAnalysis.lineDedup(lined, "doc_id", "text2", minDocs = 20)
          .select(col("doc_id"), col("n_lines"), col("n_removed"),
            md5(col("clean_text").cast("binary")).as("clean_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH lined AS (
        |  SELECT doc_id,
        |         concat('subscribe to the ', source, ' newsletter') || chr(10) || text
        |         || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'all rights reserved' ELSE '' END
        |         || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'ref ' || CAST(doc_id AS VARCHAR) ELSE '' END
        |         AS text2
        |  FROM documents
        |),
        |ls AS (SELECT doc_id, string_split(text2, chr(10)) AS arr FROM lined),
        |lines AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(len(arr)),
        |           i -> {'line_no': CAST(i AS INTEGER), 'line': arr[CAST(i + 1 AS INTEGER)]}),
        |           recursive := true)
        |  FROM ls
        |),
        |freq AS (
        |  SELECT md5(line) AS lh, count(DISTINCT doc_id) AS line_docs
        |  FROM lines GROUP BY 1
        |),
        |flags AS (
        |  SELECT l.doc_id, l.line_no, l.line, f.line_docs >= 20 AS boiler
        |  FROM lines l JOIN freq f ON md5(l.line) = f.lh
        |)
        |SELECT doc_id, count(*) AS n_lines,
        |       CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |       md5(coalesce(string_agg(CASE WHEN NOT boiler THEN line END,
        |                               chr(10) ORDER BY line_no), '')) AS clean_md5
        |FROM flags GROUP BY doc_id
        |ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Vocabulary-growth audit (Heaps' law): per-source token/type/hapax
      // counts, type-token ratio, and the Heaps exponent ln V / ln N —
      // the pre-tokenizer-training diagnostic for templated text (low
      // hapax share) or vocabulary-minting noise (high beta). One
      // (source, token) keyed count off the shared tokenized relation;
      // everything downstream is vocab-sized.
      "t31_vocab_growth",
      (s, dir) => {
        val t = Tables(s, dir)
        TextAnalysis.vocabGrowth(t.documents, "text", "source")
      },
      Some("""
        |WITH tok AS (
        |  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents
        |),
        |tc AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2)
        |SELECT source AS domain,
        |       CAST(sum(c) AS BIGINT) AS n_tokens,
        |       count(*) AS n_types,
        |       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |       round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr,
        |       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS hapax_ratio,
        |       round(ln(CAST(count(*) AS DOUBLE)) / ln(CAST(sum(c) AS DOUBLE)), 4) AS heaps_beta
        |FROM tc GROUP BY source ORDER BY domain
        |""".stripMargin.trim)),

    QueryDef(
      // Split-leakage audit: near-dup pairs (the d02 MinHash+LSH relation,
      // shared via the pair cache) classified by which train/val/test
      // sides their endpoints hash into (s01's content-hash split). A
      // test^train near-dup is evaluation contamination the n-gram decon
      // tier (t09) exists to prevent — this query MEASURES the leak a
      // given split + dedup configuration leaves behind. Split labels
      // derive from ids (no join); the pair relation is the only
      // distributed work and is already persisted for d02/d05/s12.
      "s16_split_leakage",
      (s, dir) => {
        val t = Tables(s, dir)
        Dedup.nearDuplicatesMinhashCached(t.documents, "doc_id", "text",
            threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3)
          .withColumn("split_a", graft.ops.Sampling.splitLabel(col("doc_a"), 90, 5))
          .withColumn("split_b", graft.ops.Sampling.splitLabel(col("doc_b"), 90, 5))
          .withColumn("split_lo", least(col("split_a"), col("split_b")))
          .withColumn("split_hi", greatest(col("split_a"), col("split_b")))
          .groupBy(col("split_lo"), col("split_hi"))
          .agg(count(lit(1)).as("n_pairs"),
            round(min(col("jaccard")), 6).as("min_jaccard"),
            round(max(col("jaccard")), 6).as("max_jaccard"))
          .orderBy(col("split_lo"), col("split_hi"))
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
        |  SELECT c.doc_a, c.doc_b,
        |         round(len(list_intersect(sa.hs, sb.hs)) * 1.0
        |               / len(list_distinct(sa.hs || sb.hs)), 6) AS jaccard
        |  FROM cand c
        |  JOIN hsets sa ON sa.doc_id = c.doc_a
        |  JOIN hsets sb ON sb.doc_id = c.doc_b
        |),
        |pairs AS (SELECT * FROM verified WHERE jaccard >= 0.5),
        |lbl AS (
        |  SELECT jaccard,
        |    CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_a AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'train'
        |         WHEN CAST(concat('0x', substr(md5(CAST(doc_a AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 95 THEN 'val'
        |         ELSE 'test' END AS sa,
        |    CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_b AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'train'
        |         WHEN CAST(concat('0x', substr(md5(CAST(doc_b AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 95 THEN 'val'
        |         ELSE 'test' END AS sb
        |  FROM pairs
        |)
        |SELECT least(sa, sb) AS split_lo, greatest(sa, sb) AS split_hi,
        |       count(*) AS n_pairs,
        |       round(min(jaccard), 6) AS min_jaccard,
        |       round(max(jaccard), 6) AS max_jaccard
        |FROM lbl GROUP BY 1, 2
        |ORDER BY split_lo, split_hi
        |""".stripMargin.trim)),

    QueryDef(
      // Incremental cluster canonicalization (d08's daily-ingest shape
      // carried through to the KEEPER MAP): the 20% "new batch" updates
      // the corpus's existing keeper map via Dedup.extendCanonical —
      // new pairs lifted into keeper space, the batch-sized lifted graph
      // canonicalized, roots remapped back — never re-touching the
      // corpus pair graph. The oracle computes the FULL transitive
      // closure over ALL pairs (recursive CTE), so the hash match IS the
      // proof that incremental == full recanonicalization.
      "d16_incremental_canonical",
      (s, dir) => {
        val t = Tables(s, dir)
        // MinHash signatures are PER-DOC, so the corpus-only and new-pair
        // fronts are exactly endpoint-filters of the shared full pair
        // relation (the d02/d05/s12 persisted cache) — the query pays only
        // the keeper-map algebra. A production ingest swaps in
        // crossCorpusMinhashPairs (d08) as the batch front; the pair SETS
        // are identical either way, which is what makes the swap safe.
        def isNew(c: org.apache.spark.sql.Column) =
          graft.ops.Sampling.hashBucket(c, 100) < 20
        val pairs = Dedup.nearDuplicatesMinhashCached(t.documents,
            "doc_id", "text",
            threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3)
          .select(col("doc_a"), col("doc_b"))
        val base = Dedup.canonicalize(
          pairs.filter(!isNew(col("doc_a")) && !isNew(col("doc_b"))))
        val newP = pairs.filter(isNew(col("doc_a")) || isNew(col("doc_b")))
        Dedup.extendCanonical(base, newP)
          .withColumn("is_new", isNew(col("doc_id")))
          .orderBy(col("doc_id"))
      },
      Some("""
        |WITH RECURSIVE
        |tok AS (
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
        |pairs AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c
        |  JOIN hsets sa ON sa.doc_id = c.doc_a
        |  JOIN hsets sb ON sb.doc_id = c.doc_b
        |  WHERE len(list_intersect(sa.hs, sb.hs)) * 1.0
        |        / len(list_distinct(sa.hs || sb.hs)) >= 0.5
        |),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM pairs
        |),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS keeper_id
        |  FROM reach GROUP BY src
        |)
        |SELECT doc_id, keeper_id,
        |       (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |          % 100 < 20) AS is_new
        |FROM labels
        |ORDER BY doc_id
        |""".stripMargin.trim)),

    QueryDef(
      // Entity resolution / record linkage (the Fellegi-Sunter
      // block-match-cluster-survive pipeline): dirty variants are planted
      // in-query on BOTH engines (t30's planting rule) — a typo copy
      // ('Suplier#', id+1000) for every 7th supplier and a spacing copy
      // ('Supplier #', id+2000) for every 21st — then resolved back:
      // BLOCK on (nation, last-3-of-name) so candidate pairs are
      // per-block not corpus², MATCH within blocks at levenshtein <= 2
      // (d06's engine-parity function), CLUSTER matches via the same
      // transitive canonicalization the dedup family certifies, SURVIVE
      // by min-id keeper whose name becomes the entity's canonical name.
      // Expected arithmetic at sf0.01: 100 entities — 5 triples
      // (%21 == 0), 10 doubles (%7 but not %21), 85 singletons — and the
      // oracle replays plant + block + match + closure + survivorship.
      //
      // Scale shape: blocking is the whole story at 100 TB — candidates
      // are sum-over-blocks(|block|²), not corpus², so block-key design
      // (here: nation x name-suffix) bounds the quadratic term exactly
      // like LSH bands bound d02's. The match predicate runs only inside
      // blocks; clustering touches matched pairs only.
      "d17_entity_resolution",
      (s, dir) => {
        val t = Tables(s, dir)
        val sup = t.supplier
        def base(df: org.apache.spark.sql.DataFrame) = df.select(
          col("s_suppkey").as("id"), col("s_name").as("name"),
          col("s_nationkey"))
        val v1 = sup.filter(col("s_suppkey") % 7 === 0).select(
          (col("s_suppkey") + 1000).as("id"),
          expr("replace(s_name, 'Supplier#', 'Suplier#')").as("name"),
          col("s_nationkey"))
        val v2 = sup.filter(col("s_suppkey") % 21 === 0).select(
          (col("s_suppkey") + 2000).as("id"),
          expr("replace(s_name, 'Supplier#', 'Supplier #')").as("name"),
          col("s_nationkey"))
        val recs = base(sup).unionByName(v1).unionByName(v2)
          .withColumn("blk", concat(col("s_nationkey").cast("string"),
            lit("|"), expr("right(name, 3)")))
          .persist()
        val pairs = recs.as("a").join(recs.as("b"),
            col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
          .filter(levenshtein(col("a.name"), col("b.name")) <= 2)
          .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
        val canon = Dedup.canonicalize(pairs)
        recs.join(canon, recs("id") === canon("doc_id"), "left")
          .select(col("id"), col("name"),
            coalesce(col("keeper_id"), col("id")).as("entity_id"))
          .groupBy(col("entity_id"))
          .agg(count(lit(1)).as("n_members"),
            array_join(transform(array_sort(collect_list(col("id"))),
              x => x.cast("string")), ",").as("member_ids"),
            max(when(col("id") === col("entity_id"), col("name")))
              .as("canonical_name"))
          .orderBy(col("entity_id"))
      },
      Some("""
        |WITH RECURSIVE
        |recs AS (
        |  SELECT s_suppkey AS id, s_name AS name, s_nationkey FROM supplier
        |  UNION ALL
        |  SELECT s_suppkey + 1000, replace(s_name, 'Supplier#', 'Suplier#'),
        |         s_nationkey
        |  FROM supplier WHERE s_suppkey % 7 = 0
        |  UNION ALL
        |  SELECT s_suppkey + 2000, replace(s_name, 'Supplier#', 'Supplier #'),
        |         s_nationkey
        |  FROM supplier WHERE s_suppkey % 21 = 0
        |),
        |blocked AS (
        |  SELECT *, CAST(s_nationkey AS VARCHAR) || '|' || right(name, 3) AS blk
        |  FROM recs
        |),
        |pairs AS (
        |  SELECT a.id AS ia, b.id AS ib
        |  FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.id < b.id
        |  WHERE levenshtein(a.name, b.name) <= 2
        |),
        |edges AS (
        |  SELECT ia AS src, ib AS dst FROM pairs
        |  UNION
        |  SELECT ib AS src, ia AS dst FROM pairs
        |),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |labels AS (
        |  SELECT src AS id, least(src, min(dst)) AS entity_id
        |  FROM reach GROUP BY src
        |),
        |labeled AS (
        |  SELECT r.id, r.name, coalesce(l.entity_id, r.id) AS entity_id
        |  FROM recs r LEFT JOIN labels l ON l.id = r.id
        |)
        |SELECT entity_id, count(*) AS n_members,
        |       string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS member_ids,
        |       max(CASE WHEN id = entity_id THEN name END) AS canonical_name
        |FROM labeled GROUP BY entity_id ORDER BY entity_id
        |""".stripMargin.trim)),

    QueryDef(
      // Quality-aware survivorship: dedup clusters usually keep the
      // MIN-ID member (d05/d16 — cheap, deterministic, but arbitrary);
      // a curation pipeline instead keeps the BEST member of each
      // near-dup cluster (CCNet keeps lowest perplexity; here quality =
      // n_chars with min-id tiebreak, both exact integers so the choice
      // is engine-replayable). Rides the SAME cached d02/d16 pair
      // relation and the same transitive canonicalization — the only
      // new work is one documents join and a per-cluster argmax window
      // over the (tiny) clustered subset. The oracle replays the full
      // closure and re-derives the survivor independently, so a hash
      // match proves min-id labels and quality survivors agree on the
      // cluster PARTITION, not just on keeper choice.
      //
      // Scale shape: clusters are pair-graph-sized (orders of magnitude
      // below the corpus), so the argmax window runs on the small
      // relation; the documents join is keyed on doc_id.
      "d18_quality_keeper",
      (s, dir) => {
        val t = Tables(s, dir)
        val pairs = Dedup.nearDuplicatesMinhashCached(t.documents,
            "doc_id", "text",
            threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3)
          .select(col("doc_a"), col("doc_b"))
        val labels = Dedup.canonicalize(pairs)
          .withColumnRenamed("keeper_id", "cluster_id")
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        labels
          .join(t.documents.select(col("doc_id"), col("n_chars")), "doc_id")
          .withColumn("rk", row_number().over(w))
          .withColumn("n_members",
            count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
          .filter(col("rk") === 1)
          .select(col("cluster_id"), col("doc_id").as("survivor_id"),
            col("n_chars").as("survivor_chars"), col("n_members"))
          .orderBy(col("cluster_id"))
      },
      Some("""
        |WITH RECURSIVE
        |tok AS (
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
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM verified
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM verified
        |),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |  FROM reach GROUP BY src
        |),
        |ranked AS (
        |  SELECT l.cluster_id, l.doc_id, d.n_chars,
        |         row_number() OVER (PARTITION BY l.cluster_id
        |                            ORDER BY d.n_chars DESC, l.doc_id) AS rk,
        |         count(*) OVER (PARTITION BY l.cluster_id) AS n_members
        |  FROM labels l JOIN documents d ON d.doc_id = l.doc_id
        |)
        |SELECT cluster_id, doc_id AS survivor_id,
        |       n_chars AS survivor_chars, n_members
        |FROM ranked WHERE rk = 1
        |ORDER BY cluster_id
        |""".stripMargin.trim)),

    QueryDef(
      // Corpus diversity audit — distinct-n (Li et al., NAACL'16): the
      // share of unigrams/bigrams that are unique, per source. The
      // standard cheap tripwire for degenerate or templated text (and,
      // on model-generated corpora, for mode collapse): boilerplate-
      // heavy sources score low on distinct-2 long before perplexity
      // moves. ONE tokenize feeds both gram sizes — unigram and bigram
      // rows come out of a single fused transform+explode (no second
      // pass over text; t12's multi-consumer lesson applied inside the
      // row), then one partial+final aggregate per (source, kind).
      //
      // Scale shape: map-side explode (fan-out ~2x token count) into a
      // (source, kind)-keyed exact-distinct aggregate — the distinct is
      // the only shuffle, keyed by gram, and a 100 TB deployment swaps
      // count(DISTINCT) for the HLL-sketch arm (a03/q49) when +-1%
      // suffices. Ratios are exact-integer divisions rounded at 6.
      "t32_distinct_ngrams",
      (s, dir) => {
        val t = Tables(s, dir)
        // Fused one-pass (kind, gram) front (UniBiGramPairs): tokenize +
        // uni structs + bigram concat in one JIT'd byte walk. The HOF
        // chain it replaces (lambda-variable-bound tokenize feeding two
        // interpreted transforms) evaluated a boxed expression tree ~2x
        // per token per row — measured 3.8 s at sf1 vs 2.0 s fused.
        // Bit-parity with the HOF form pinned in OpsSpec.
        val grams = graft.functions.UniBiGramPairs(col("text"))
        t.documents
          .select(col("source"), explode_outer(grams).as("g"))
          .filter(col("g").isNotNull)
          .select(col("source"), col("g.kind"), col("g.gram"))
          .groupBy(col("source"), col("kind"))
          .agg(count(lit(1)).as("total_grams"),
            countDistinct(col("gram")).as("distinct_grams"))
          .withColumn("distinct_ratio",
            round(col("distinct_grams").cast("double") /
              col("total_grams").cast("double"), 6))
          .orderBy(col("source"), col("kind"))
      },
      Some("""
        |WITH tok AS (
        |  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents
        |),
        |uni AS (SELECT source, 'uni' AS kind, unnest(toks) AS gram FROM tok),
        |bi AS (
        |  SELECT source, 'bi' AS kind,
        |         unnest(CASE WHEN len(toks) >= 2
        |           THEN list_transform(range(len(toks) - 1),
        |                  i -> toks[i+1] || ' ' || toks[i+2])
        |           ELSE [] END) AS gram
        |  FROM tok
        |),
        |grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi)
        |SELECT source, kind, count(*) AS total_grams,
        |       count(DISTINCT gram) AS distinct_grams,
        |       round(CAST(count(DISTINCT gram) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE), 6) AS distinct_ratio
        |FROM grams GROUP BY source, kind ORDER BY source, kind
        |""".stripMargin.trim)),

    QueryDef(
      // Code-vs-prose detection — the router a mixed web crawl runs
      // before language-specific pipelines (code to the code filters and
      // dedupers, prose to the NL quality stack). Signal: density of
      // structural code marks ({}()[];=) per character — integer
      // cross-multiplied (marks·1000 ≥ 15·chars, i.e. 1.5%) so the
      // verdict is engine-exact. The natural corpus carries no code, so
      // code docs are PLANTED in-query on both engines (t30/d17's
      // planting rule): every 50th doc gains a generated snippet twin
      // under its source+'+code'; the classifier must route exactly the
      // planted set. Map-only scan, one keyed aggregate; the mark count
      // is ONE regexp_replace per doc (a class both Java regex and RE2
      // parse identically).
      "t33_code_detect",
      (s, dir) => {
        val t = Tables(s, dir)
        val snippet = concat(
          lit("int v"), col("doc_id").cast("string"),
          lit(" = "), col("doc_id").cast("string"),
          lit("; { x["), col("doc_id").cast("string"),
          lit("] += 1; } "))
        // Planted ids live in the negative range (-doc_id - 1): disjoint
        // from the natural non-negative ids at ANY corpus size, unlike a
        // fixed +100000 offset that collides past 100k docs.
        val planted = t.documents.filter(col("doc_id") % 50 === 0)
          .select((-col("doc_id") - 1L).as("doc_id"),
            repeat(snippet, 5).as("text"),
            concat(col("source"), lit("+code")).as("source"))
        val all = t.documents.select(col("doc_id"), col("text"), col("source"))
          .unionByName(planted)
        all
          .withColumn("chars", length(col("text")))
          .withColumn("marks", col("chars") -
            length(regexp_replace(col("text"), "[{}();=\\[\\]]", "")))
          .withColumn("is_code",
            col("marks") * 1000L >= col("chars") * 15L)
          .groupBy(col("source"), col("is_code"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("marks")).as("total_marks"),
            sum(col("chars")).as("total_chars"),
            round(sum(col("marks")).cast("double") * 1000.0 /
              sum(col("chars")).cast("double"), 6).as("mark_permille"))
          .orderBy(col("source"), col("is_code"))
      },
      Some("""
        |WITH planted AS (
        |  SELECT repeat('int v' || doc_id || ' = ' || doc_id ||
        |                '; { x[' || doc_id || '] += 1; } ', 5) AS text,
        |         -doc_id - 1 AS doc_id,
        |         source || '+code' AS source
        |  FROM documents WHERE doc_id % 50 = 0
        |),
        |all_docs AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id, text, source FROM planted
        |),
        |scored AS (
        |  SELECT source,
        |         length(text) AS chars,
        |         length(text) - length(regexp_replace(text,
        |           '[{}();=\[\]]', '', 'g')) AS marks
        |  FROM all_docs
        |)
        |SELECT source, (marks * 1000 >= chars * 15) AS is_code,
        |       count(*) AS n_docs,
        |       CAST(sum(marks) AS BIGINT) AS total_marks,
        |       CAST(sum(chars) AS BIGINT) AS total_chars,
        |       round(CAST(sum(marks) AS DOUBLE) * 1000.0
        |             / CAST(sum(chars) AS DOUBLE), 6) AS mark_permille
        |FROM scored
        |GROUP BY source, (marks * 1000 >= chars * 15)
        |ORDER BY source, is_code
        |""".stripMargin.trim)),

    QueryDef(
      // Join-free cross-shard exact dedup — the Bloom-gate form every
      // multi-shard ingest runs when a corpus-sized join per incoming
      // batch is unaffordable: the corpus publishes one KB-MB sketch of
      // its content fingerprints; each ingest batch drops rows whose
      // fingerprint the sketch admits. The batch here is planted
      // in-query on both engines (t30/d17's rule): every 25th doc
      // replayed verbatim (a true duplicate — the sketch MUST drop it:
      // Bloom filters have no false negatives, structurally) and every
      // 25th+7 doc lightly edited (genuinely new — droppable only as a
      // bounded false positive). Exact counts are oracle-checkable; the
      // engine-specific sketch verdicts fold to contract booleans
      // (a08's style). Bloom verdicts are DETERMINISTIC given
      // (keys, sizing) — the bound is a fixed fact of this corpus, not
      // a flake. At 100 TB: the d08 bucket join is the exact path; this
      // gate costs one broadcast sketch and a map-only scan, and its
      // false-positive loss rate is the fpp knob.
      "d19_bloom_dedup_gate",
      (s, dir) => {
        val t = Tables(s, dir)
        def fpLong(c: org.apache.spark.sql.Column) =
          conv(substring(md5(c), 1, 15), 16, 10).cast("long")
        val corpus = t.documents.select(fpLong(col("text")).as("fp"))
        val nKeys = corpus.agg(countDistinct(col("fp"))).head.getLong(0)
        val bf = graft.ops.RuntimeFilter.bloomSketch(
          corpus, "fp", expectedItems = nKeys, fpp = 0.001)
        // Planted batch ids in the negative range (t33's convention):
        // -doc_id-1 / -doc_id-2 are disjoint from natural ids at any SF
        // and from each other (the two source sets differ mod 25).
        val batch = t.documents.filter(col("doc_id") % 25 === 0)
          .select((-col("doc_id") - 1L).as("doc_id"), col("text"))
          .unionByName(t.documents.filter(col("doc_id") % 25 === 7)
            .select((-col("doc_id") - 2L).as("doc_id"),
              concat(col("text"), lit(" fresh")).as("text")))
        val gated = batch
          .join(corpus.distinct().withColumn("member", lit(true)),
            fpLong(col("text")) === col("fp"), "left")
          .select(col("doc_id"),
            coalesce(col("member"), lit(false)).as("member"),
            graft.ops.RuntimeFilter.mightContain(bf, fpLong(col("text")))
              .as("dropped"))
        gated.agg(
          count(lit(1)).as("n_batch"),
          sum(when(col("member"), 1L).otherwise(0L)).as("n_true_dup"),
          (sum(when(col("member") && !col("dropped"), 1L).otherwise(0L)) === 0L)
            .as("no_false_negatives"),
          (sum(when(!col("member") && col("dropped"), 1L).otherwise(0L))
            .cast("double") /
            sum(when(!col("member"), 1L).otherwise(0L)).cast("double")
            <= 0.05).as("fp_loss_bounded"))
      },
      Some("""
        |WITH batch AS (
        |  SELECT -doc_id - 1 AS doc_id, text
        |  FROM documents WHERE doc_id % 25 = 0
        |  UNION ALL
        |  SELECT -doc_id - 2 AS doc_id, text || ' fresh' AS text
        |  FROM documents WHERE doc_id % 25 = 7
        |)
        |SELECT count(*) AS n_batch,
        |       CAST(sum(CASE WHEN c.text IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_true_dup,
        |       TRUE AS no_false_negatives,
        |       TRUE AS fp_loss_bounded
        |FROM batch b
        |LEFT JOIN (SELECT DISTINCT text FROM documents) c ON c.text = b.text
        |""".stripMargin.trim)),

    QueryDef(
      // Leakage-SAFE splitting — the fix for what s16 audits: s16 found
      // near-dup pairs straddling train/test under the plain per-doc
      // content-hash split (memorized near-copies of test docs in
      // train inflate eval scores). Here the split unit is the near-dup
      // CLUSTER: every doc splits by its canonical keeper's hash, so
      // both endpoints of every dedup pair co-travel BY CONSTRUCTION —
      // cross-split pairs are structurally zero, and the query proves
      // it in-output (the oracle recomputes the same zero from the full
      // closure). Rides the cached d02/d16 pair relation +
      // canonicalization; unclustered docs split by their own id, so
      // the assignment remains a pure function of content identity.
      "s17_leakage_safe_split",
      (s, dir) => {
        val t = Tables(s, dir)
        val pairs = Dedup.nearDuplicatesMinhashCached(t.documents,
            "doc_id", "text",
            threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3)
          .select(col("doc_a"), col("doc_b"))
        val keepers = Dedup.canonicalize(pairs)
        val assigned = t.documents.select(col("doc_id"))
          .join(keepers, Seq("doc_id"), "left")
          .withColumn("unit_id", coalesce(col("keeper_id"), col("doc_id")))
          .withColumn("split",
            graft.ops.Sampling.splitLabel(col("unit_id"), 90, 5))
        val crossPairs = pairs
          .join(assigned.select(col("doc_id").as("doc_a"),
            col("split").as("split_a")), Seq("doc_a"))
          .join(assigned.select(col("doc_id").as("doc_b"),
            col("split").as("split_b")), Seq("doc_b"))
          .filter(col("split_a") =!= col("split_b"))
          .agg(count(lit(1)).as("n_cross"))
        assigned
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("unit_id")).as("n_units"))
          .crossJoin(broadcast(crossPairs))
          .select(col("split"), col("n_docs"), col("n_units"),
            (col("n_cross") === 0L).as("leakage_free"))
          .orderBy(col("split"))
      },
      Some("""
        |WITH RECURSIVE
        |tok AS (
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
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM verified
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM verified
        |),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS keeper_id
        |  FROM reach GROUP BY src
        |),
        |assigned AS (
        |  SELECT d.doc_id,
        |         coalesce(l.keeper_id, d.doc_id) AS unit_id,
        |         CASE WHEN CAST(concat('0x', substr(md5(CAST(
        |                     coalesce(l.keeper_id, d.doc_id) AS VARCHAR)), 1, 8))
        |                   AS BIGINT) % 100 < 90 THEN 'train'
        |              WHEN CAST(concat('0x', substr(md5(CAST(
        |                     coalesce(l.keeper_id, d.doc_id) AS VARCHAR)), 1, 8))
        |                   AS BIGINT) % 100 < 95 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
        |),
        |cross_pairs AS (
        |  SELECT count(*) AS n_cross
        |  FROM verified v
        |  JOIN assigned a ON a.doc_id = v.doc_a
        |  JOIN assigned b ON b.doc_id = v.doc_b
        |  WHERE a.split <> b.split
        |)
        |SELECT split, count(*) AS n_docs,
        |       count(DISTINCT unit_id) AS n_units,
        |       (SELECT n_cross FROM cross_pairs) = 0 AS leakage_free
        |FROM assigned
        |GROUP BY split
        |ORDER BY split
        |""".stripMargin.trim)),

    QueryDef(
      // MinHash estimator honesty — for every verified near-dup pair,
      // the signature-agreement ESTIMATE of Jaccard (share of the 32
      // Carter-Wegman members that collide — the quantity LSH banding
      // actually thresholds on) against the exact shingle-set Jaccard.
      // Both are exact rationals of engine-replayable integers, so the
      // whole honesty table hash-matches — no tolerance boolean needed;
      // the estimator's error is IN the output (st14's estimator-honesty
      // rule, applied to the dedup stack's own core estimator). At scale
      // this is the audit that justifies the banding threshold: if
      // |est − exact| drifted, d02/d14's s-curve math would be lying.
      "d20_minhash_estimator",
      (s, dir) => {
        val t = Tables(s, dir)
        val pairs = Dedup.nearDuplicatesMinhashCached(t.documents,
            "doc_id", "text",
            threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3)
          .select(col("doc_a"), col("doc_b"),
            round(col("jaccard"), 6).as("exact_j"))
        // Persisted: the signature relation feeds BOTH endpoint joins and
        // Spark does not common-subexpression-eliminate across join
        // branches — unpersisted, the corpus-wide fused signature scan
        // ran twice per run (hashedShingles' rule, applied here).
        val sigs = t.documents.select(col("doc_id"),
          graft.functions.MinhashSignature(
            graft.functions.WordGramPairs48(col("text"), 3), 32).as("sig"))
          .filter(size(col("sig")) > 0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pairs
          .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa")),
            Seq("doc_a"))
          .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb")),
            Seq("doc_b"))
          .withColumn("matches", aggregate(
            zip_with(col("sa"), col("sb"), (x, y) => (x === y).cast("int")),
            lit(0), (acc, v) => acc + v))
          .select(col("doc_a"), col("doc_b"), col("exact_j"),
            round(col("matches").cast("double") / 32.0, 6).as("est_j"),
            col("matches").cast("long").as("n_agree"))
          .orderBy(col("doc_a"), col("doc_b"))
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
        |  SELECT c.doc_a, c.doc_b,
        |         round(len(list_intersect(sa.hs, sb.hs)) * 1.0
        |               / len(list_distinct(sa.hs || sb.hs)), 6) AS exact_j
        |  FROM cand c
        |  JOIN hsets sa ON sa.doc_id = c.doc_a
        |  JOIN hsets sb ON sb.doc_id = c.doc_b
        |  WHERE len(list_intersect(sa.hs, sb.hs)) * 1.0
        |        / len(list_distinct(sa.hs || sb.hs)) >= 0.5
        |)
        |SELECT v.doc_a, v.doc_b, v.exact_j,
        |       round(len(list_filter(range(32),
        |               i -> a.sig[CAST(i AS INTEGER)+1]
        |                    = b.sig[CAST(i AS INTEGER)+1])) / 32.0, 6)
        |         AS est_j,
        |       CAST(len(list_filter(range(32),
        |               i -> a.sig[CAST(i AS INTEGER)+1]
        |                    = b.sig[CAST(i AS INTEGER)+1])) AS BIGINT)
        |         AS n_agree
        |FROM verified v
        |JOIN sigs a ON a.doc_id = v.doc_a
        |JOIN sigs b ON b.doc_id = v.doc_b
        |ORDER BY v.doc_a, v.doc_b
        |""".stripMargin.trim)),

    QueryDef(
      // Epoch/repetition planner — the data-constrained mixing schedule
      // (Muennighoff et al., arXiv:2305.16264): given a training token
      // budget split uniformly across sources, how many EPOCHS of each
      // source must repeat to meet its share, capped at 4 repeats (the
      // paper's ~4-epoch "repetition is nearly free" knee), and how much
      // of the share goes unmet once the cap binds. Everything is exact
      // integer arithmetic (ceil-div epochs, min for the cap, exact
      // token counts from the t03 tokenizer), so the plan is
      // engine-replayable. One tokenize aggregate; the planner itself
      // runs on the |sources|-row relation.
      "s18_epoch_plan",
      (s, dir) => {
        val t = Tables(s, dir)
        val budget = 500000L
        val avail = t.documents
          .select(col("source"),
            size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
          .groupBy(col("source"))
          .agg(sum(col("n_tokens")).as("avail_tokens"))
        avail
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
          .withColumn("target_tokens", expr(s"$budget div cnt"))
          .withColumn("epochs_needed",
            expr("(target_tokens + avail_tokens - 1) div avail_tokens"))
          .withColumn("epochs", least(col("epochs_needed"), lit(4L)))
          .withColumn("sampled_tokens",
            least(col("target_tokens"), col("avail_tokens") * 4L))
          .withColumn("unmet_tokens",
            col("target_tokens") - col("sampled_tokens"))
          .select(col("source"), col("avail_tokens"), col("target_tokens"),
            col("epochs"), col("sampled_tokens"), col("unmet_tokens"))
          .orderBy(col("source"))
      },
      Some("""
        |WITH avail AS (
        |  SELECT source,
        |         CAST(sum(len(list_filter(string_split(text, ' '),
        |                x -> x <> ''))) AS BIGINT) AS avail_tokens
        |  FROM documents GROUP BY source
        |),
        |planned AS (
        |  SELECT source, avail_tokens,
        |         CAST(500000 // (SELECT count(*) FROM avail) AS BIGINT)
        |           AS target_tokens
        |  FROM avail
        |)
        |SELECT source, avail_tokens, target_tokens,
        |       least((target_tokens + avail_tokens - 1) // avail_tokens, 4)
        |         AS epochs,
        |       least(target_tokens, avail_tokens * 4) AS sampled_tokens,
        |       target_tokens - least(target_tokens, avail_tokens * 4)
        |         AS unmet_tokens
        |FROM planned
        |ORDER BY source
        |""".stripMargin.trim)),

    QueryDef(
      // Zipf-slope audit — fit ln(freq) ~ a + b·ln(rank) over the top
      // tokens by OLS. Natural language sits near b = -1 (Zipf's law);
      // templated/synthetic corpora and tokenizer bugs bend the slope —
      // the one-number companion to t31's Heaps'-law growth audit. The
      // rank-frequency relation is exact integers with deterministic
      // ties (count desc, token asc — t04's rule); ln is the only
      // non-exact op and the OLS sums of ~1000 doubles drift orders of
      // magnitude below the round-4 output (t19's libm rule). One
      // tokenize-explode aggregate; everything after runs on the
      // 1000-row relation.
      "t34_zipf_slope",
      (s, dir) => {
        val t = Tables(s, dir)
        val top = t.documents
          .select(explode_outer(Dedup.tokens(col("text"))).as("token"))
          .filter(col("token").isNotNull)
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token")).limit(1000)
        val xy = top
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("n").desc, col("token"))))
          .select(log(col("rnk").cast("double")).as("x"),
            log(col("n").cast("double")).as("y"))
        xy.agg(count(lit(1)).cast("double").as("m"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("m").cast("long").as("n_tokens"),
            round((col("m") * col("sxy") - col("sx") * col("sy")) /
              (col("m") * col("sxx") - col("sx") * col("sx")), 4).as("slope"),
            round((col("sy") - (col("m") * col("sxy") - col("sx") * col("sy")) /
              (col("m") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
              col("m"), 4).as("intercept"))
      },
      Some("""
        |WITH counts AS (
        |  SELECT token, count(*) AS n
        |  FROM (SELECT unnest(list_filter(string_split(text, ' '),
        |                x -> x <> '')) AS token FROM documents)
        |  GROUP BY token
        |  ORDER BY n DESC, token
        |  LIMIT 1000
        |),
        |xy AS (
        |  SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, token) AS DOUBLE))
        |           AS x,
        |         ln(CAST(n AS DOUBLE)) AS y
        |  FROM counts
        |),
        |s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS m, sum(x) AS sx, sum(y) AS sy,
        |         sum(x*y) AS sxy, sum(x*x) AS sxx
        |  FROM xy
        |)
        |SELECT CAST(m AS BIGINT) AS n_tokens,
        |       round((m*sxy - sx*sy) / (m*sxx - sx*sx), 4) AS slope,
        |       round((sy - (m*sxy - sx*sy) / (m*sxx - sx*sx) * sx) / m, 4)
        |         AS intercept
        |FROM s
        |""".stripMargin.trim))
  )

  /** DuckDB oracle for t17: full corpus-level BPE training, unrolled.
    *
    * The trainer's loop (graft.ops.Bpe.train) runs a FIXED number of merge
    * rounds, so the "iterative, not one SQL statement" objection dissolves:
    * unroll the 8 rounds into 8 straight-line CTE blocks. Per round r:
    *
    *  - `p{r}`: adjacent-pair frequencies over the vocab relation —
    *    identical shape to Bpe.pairCounts.
    *  - `m{r}`: the argmax pair with the trainer's exact tie-break
    *    (ORDER BY n DESC, left, right LIMIT 1) and minFreq>=2 guard; an
    *    empty m{r} empties every later round, mirroring early stop.
    *  - `e/c/g/k/o{r}`: ONE merge application with the fold's exact
    *    leftmost-first non-overlapping semantics, positionally: a position
    *    is a candidate when (sym, next) == (left, right); candidates at
    *    consecutive positions only arise when left==right (chains), and the
    *    greedy fold takes the 1st, 3rd, ... of each maximal run — computed
    *    with two window row_numbers (run grouping via pos - rank, then
    *    odd-offset pick). A merged token never cascades within one round
    *    (left+right != left since right is nonempty), so this positional
    *    rule is EXACT, not an approximation of the sequential fold.
    *  - `v{r}`: reassembled symbol arrays (picked → left||right, the
    *    following consumed position dropped).
    *
    * CTEs are MATERIALIZED: each round references its predecessor twice,
    * so DuckDB's default inline expansion would blow up 2^rounds.
    * Validated against the Spark trainer at sf0.001/0.01/0.1 including a
    * frequency tie at sf0.001 (ranks 7/8 both 1873 — lexicographic
    * tie-break exercised).
    */
  private def bpeOracleSql(numMerges: Int): String = {
    def round(r: Int): String = {
      val pv = s"v${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT pr.l AS l, pr.r AS r, CAST(sum(freq) AS BIGINT) AS n
         |  FROM (SELECT freq, unnest(list_transform(range(1, len(syms)),
         |               i -> {'l': syms[i], 'r': syms[i+1]})) AS pr
         |        FROM $pv WHERE len(syms) >= 2)
         |  GROUP BY 1, 2
         |),
         |m$r AS MATERIALIZED (
         |  SELECT l, r, n FROM p$r WHERE n >= 2 ORDER BY n DESC, l, r LIMIT 1
         |),
         |e$r AS (
         |  SELECT word, freq,
         |         unnest(list_transform(range(1, len(syms)+1),
         |           i -> {'pos': i, 's': syms[i]})) AS u
         |  FROM $pv CROSS JOIN m$r
         |),
         |c$r AS (
         |  SELECT word, freq, u.pos AS pos, u.s AS s,
         |         coalesce(u.s = (SELECT l FROM m$r) AND
         |                  lead(u.s) OVER (PARTITION BY word ORDER BY u.pos) =
         |                  (SELECT r FROM m$r), FALSE) AS cand
         |  FROM e$r
         |),
         |g$r AS (
         |  SELECT *, CASE WHEN cand THEN pos -
         |    ROW_NUMBER() OVER (PARTITION BY word, cand ORDER BY pos) END AS grp
         |  FROM c$r
         |),
         |k$r AS (
         |  SELECT *, cand AND (ROW_NUMBER() OVER
         |    (PARTITION BY word, grp ORDER BY pos) % 2 = 1) AS picked
         |  FROM g$r
         |),
         |o$r AS (
         |  SELECT word, freq, pos,
         |         CASE WHEN picked
         |                THEN s || lead(s) OVER (PARTITION BY word ORDER BY pos)
         |              WHEN coalesce(lag(picked) OVER
         |                (PARTITION BY word ORDER BY pos), FALSE) THEN NULL
         |              ELSE s END AS outsym
         |  FROM k$r
         |),
         |v$r AS MATERIALIZED (
         |  SELECT word, freq,
         |         list(outsym ORDER BY pos) FILTER (outsym IS NOT NULL) AS syms
         |  FROM o$r GROUP BY word, freq
         |)""".stripMargin
    }
    val rounds = (1 to numMerges).map(round).mkString(",\n")
    val finals = (1 to numMerges).map(r =>
      s"""SELECT CAST($r AS INT) AS rank, l AS "left", r AS "right", n AS freq
         |FROM m$r""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH wf AS (
       |  SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
       |           AS tok
       |    FROM documents) GROUP BY 1
       |),
       |v0 AS MATERIALIZED (
       |  SELECT word, freq,
       |         list_transform(range(1, length(word)+1), i -> word[i]) AS syms
       |  FROM wf
       |),
       |$rounds
       |SELECT * FROM (
       |$finals
       |) ORDER BY rank""".stripMargin
  }

}
