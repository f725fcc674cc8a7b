package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Training-data pipeline coverage: dedup (exact fingerprint, MinHash+LSH,
  * SimHash), text quality/language heuristics, and embedding near-dup —
  * over `documents` / `embeddings`.
  *
  * Every hash is md5-derived (see [[graft.ops.Dedup.hash60]]) so the DuckDB
  * oracle reproduces signatures bit-for-bit; every similarity is a ratio of
  * exact integers, so rounded values match exactly.
  */
object TextQueries {

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
        Dedup.nearDuplicatesMinhash(t.documents, "doc_id", "text",
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
        |  SELECT doc_id, j, min(h1 + j * h2) AS sigv
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
        |verified AS (
        |  SELECT c.doc_a, c.doc_b,
        |         round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
        |               / len(list_distinct(sa.shingles || sb.shingles)), 6) AS jaccard
        |  FROM cand c
        |  JOIN sh sa ON sa.doc_id = c.doc_a
        |  JOIN sh sb ON sb.doc_id = c.doc_b
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
          .select(explode(graft.ops.Dedup.tokens(col("text"))).as("token"))
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
      // Embedding-cosine near-dup pairs (exact baseline; the scale path is
      // Similarity.signBucketJoin, exercised in tests/bench).
      "e01_embed_neardup",
      (s, dir) => {
        val t = Tables(s, dir)
        Similarity.bruteForcePairs(t.embeddings, "vec_id", "embedding",
            threshold = 0.45)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
        |ORDER BY id_a, id_b
        |""".stripMargin.trim))
  )
}
