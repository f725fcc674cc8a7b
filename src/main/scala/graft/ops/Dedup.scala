package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale text pipelines.
  *
  * Three tiers, all shuffle-lean by construction:
  *
  *  - exact: hash-groupBy on a normalized fingerprint — one shuffle keyed by
  *    a 128-bit hash, no pairwise work. At 100 TB this is the cheapest pass
  *    and runs first to shrink the candidate set.
  *  - MinHash + LSH banding: k deterministic hash functions over word
  *    shingles -> signature; signatures cut into bands; only documents
  *    sharing a (band index, band value) bucket are ever paired. Candidate
  *    generation is a self-equi-join on the bucket key — a shuffled hash
  *    join, never a cross join — and exact Jaccard verification runs only on
  *    candidates. Cost scales with bucket occupancy, not n².
  *  - SimHash: 32-bit locality-sensitive fingerprint; near-duplicates are
  *    pairs within a small Hamming radius.
  *
  * All hashing is md5-derived (first 15 hex chars as a 60-bit integer) so
  * results are engine-portable and seed-free deterministic: any system that
  * can compute md5 reproduces identical signatures — which is also what the
  * DuckDB correctness oracle does.
  */
object Dedup {

  /** Lowercase, strip punctuation, collapse whitespace — the normalization
    * under the exact-dup fingerprint.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[.,!?;:]", ""), "\\s+", " "))

  /** 128-bit content fingerprint of normalized text. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Whitespace tokens with empties dropped (split on single space —
    * deterministic across engines, unlike locale-aware \s classes).
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Deterministic 60-bit hash family: member `j` hashes `s` to the first
    * 15 hex chars of md5("j:" + s) read as an integer.
    */
  def hash60(j: Int, s: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), s)), 1, 15), 16, 10).cast("long")

  /** One md5 per value, two independent 48-bit halves (hex chars [1,12]
    * and [13,24]). The MinHash family is the Carter-Wegman combination
    * h_j = (h1 + j*h2) mod (2^31 - 1) — many hash members for the price of
    * one md5. 48-bit halves keep h1 + 63*h2 < 2^54, exact in BIGINT/long
    * on every engine, and the Mersenne-prime reduction is what makes the
    * members independent: without it argmin(h1 + j*h2) degenerates to
    * argmin(h2) as j grows (the members become copies, LSH bands collapse,
    * and candidate generation admits a fifth of all pairs — measured).
    */
  def hashPair48(s: Column): Column = {
    val m = md5(s)
    struct(
      conv(substring(m, 1, 12), 16, 10).cast("long").as("h1"),
      conv(substring(m, 13, 12), 16, 10).cast("long").as("h2"))
  }

  /** Distinct word n-gram shingles of a token array. */
  def wordShingles(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    when(size(toks) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct character n-gram shingles of a text column. Finer-grained
    * than word shingles: robust to tokenization differences and
    * non-whitespace scripts, at ~len(text) set elements per doc.
    */
  def charShingles(text: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), length(text) - n),
      i => text.substr(i + lit(1), lit(n)))
    when(length(text) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature as a single per-row column: for each of `k` hash
    * members, the minimum of h1 + j*h2 over the shingle set. Convenient
    * for one-off signatures; note Catalyst inlines the hash lambda into
    * each of the k array_min branches, so this form pays O(k * shingles)
    * md5 calls. [[nearDuplicatesMinhash]] uses the explode + partial-min
    * aggregation shape instead, which hashes each shingle exactly once.
    */
  /** Member j's hash of a pre-hashed (h1, h2) pair. */
  private val MinhashPrime = 2147483647L // 2^31 - 1 (Mersenne)
  private def member(p: Column, j: Int): Column =
    (p.getField("h1") + lit(j.toLong) * p.getField("h2")) % MinhashPrime

  def minhashSignature(shingles: Column, k: Int): Column = {
    val pairs = transform(shingles, s => hashPair48(s))
    array((0 until k).map(j =>
      array_min(transform(pairs, p => member(p, j)))): _*)
  }

  /** LSH band key: band `b` covers signature rows [b*r, (b+1)*r); the key is
    * the decimal-joined row values (portable across engines — no second
    * hash needed, the key is only a shuffle/join key).
    */
  def bandKey(sig: Column, b: Int, r: Int): Column =
    concat_ws(",", transform(slice(sig, b * r + 1, r), x => x.cast("string")))

  /** Exact-duplicate groups: every document whose normalized fingerprint
    * collides with at least one other, with the group's keeper (min id).
    * One wide shuffle on the fingerprint; no pairwise comparisons.
    */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = docs.select(col(idCol).as("doc_id"),
      fingerprint(col(textCol)).as("fingerprint"))
    val groups = fp.groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("group_size"), min(col("doc_id")).as("keeper_id"))
      .filter(col("group_size") > 1)
    fp.join(groups, "fingerprint")
      .select(col("doc_id"), col("fingerprint"), col("group_size"), col("keeper_id"))
  }

  /** Candidate near-duplicate pairs via MinHash LSH banding over word
    * `shingleN`-grams, verified with exact Jaccard >= `threshold`.
    *
    * Plan shape: narrow per-row signature computation -> explode to
    * (band, key) -> self hash-join on the bucket key -> distinct pairs ->
    * join back the two shingle sets -> exact verify. The only shuffles are
    * the bucket join and the distinct; both are keyed and partial-aggregated.
    */
  def nearDuplicatesMinhash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3): DataFrame = {
    minhashBandPairsHashed(wordHashedPairs(docs, idCol, textCol, shingleN),
      threshold, numHashes, bands)
  }

  /** Fused, PERSISTED (doc_id, pairs) relation over word `shingleN`-grams
    * (WordGramPairs48: tokenize + n-gram + dedup + one md5 per distinct
    * gram in a single string walk — the tokenize/shingle/hash HOF chain
    * it replaced re-evaluated interpreted expression trees per element).
    * Docs with fewer than n tokens yield empty arrays and drop here, the
    * old token-count guard. Persisted because signatures and both
    * verify-join sides consume it.
    */
  private def wordHashedPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    Spread.ensure(docs)
      // Guard on the CHEAP token count, not on the fused pairs array: a
      // size(pairs) predicate would be pushed below the Spread
      // repartition with the whole hash sweep substituted in — evaluated
      // serially in the scan stage and again above (the wordShingled
      // comment's trap, unchanged by the fusion). n tokens <=> >= 1
      // distinct n-gram, so the row sets are identical.
      .filter(size(tokens(col(textCol))) >= shingleN)
      .select(col(idCol).as("doc_id"),
        graft.functions.WordGramPairs48(col(textCol), shingleN).as("pairs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Memoized [[nearDuplicatesMinhash]]: the LSH candidate pipeline is the
    * shared front of every verification tier — pair listing, corpus
    * canonicalization ([[dedupCorpus]]), edit-distance verify — so the
    * verified pair relation is computed and PERSISTED once per (session,
    * corpus plan, parameters) and every tier reads the same materialized
    * set. Weak-keyed on the session like [[graft.queries.Tables]].
    */
  def nearDuplicatesMinhashCached(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3): DataFrame = {
    val perSession = pairCache.computeIfAbsent(docs.sparkSession,
      _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    val key = s"${docs.queryExecution.logical.semanticHash()}/$idCol/$textCol/" +
      s"$threshold/$numHashes/$bands/$shingleN"
    perSession.computeIfAbsent(key, _ =>
      nearDuplicatesMinhash(docs, idCol, textCol, threshold, numHashes, bands,
        shingleN).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  private val pairCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  /** Drop this session's memoized pair relations (see [[graft.Caches]]).
    * Unpersisting the underlying blocks is the caller's job (one
    * `catalog.clearCache()` covers every family).
    */
  private[graft] def invalidate(spark: org.apache.spark.sql.SparkSession): Unit =
    Option(pairCache.get(spark)).foreach(_.clear())

  /** LSH banding-parameter sweep — the tuning curve for
    * [[nearDuplicatesMinhash]]: for each band count `b` over the SAME
    * `numHashes`-member signature (rows per band r = numHashes/b), report
    * candidate pairs generated, pairs surviving the exact Jaccard verify
    * at `threshold`, and their ratio (precision). The s-curve
    * P(candidate) = 1-(1-j^r)^b (Leskovec/Rajaraman/Ullman, MMDS ch. 3)
    * says more/narrower bands buy recall at the price of candidate
    * volume; this sweep measures that trade on the actual corpus — the
    * query one runs BEFORE committing band parameters to a 100 TB dedup
    * pass, exactly as v22's nprobe sweep tunes the IVF index.
    *
    * Because bands slice the signature contiguously, a pair matching an
    * r-row band also matches both r/2-row halves — so candidate (and
    * verified) sets NEST as bands double: counts are provably
    * nondecreasing in `b`, which the spec asserts.
    *
    * Cost: the expensive fronts are shared — ONE persisted hashed-gram
    * relation feeds every configuration's signature projection and the
    * verify joins; per configuration the sweep pays one bucket self-join
    * over (doc_id, band, key) rows plus a verify join proportional to
    * its own candidates. Each candidate relation is persisted (consumed
    * by both the count and the verify), mirroring what a production
    * sweep would checkpoint.
    */
  def lshBandingSweep(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 32,
      bandsSeq: Seq[Int] = Seq(4, 8, 16),
      shingleN: Int = 3): DataFrame = {
    require(bandsSeq.nonEmpty && bandsSeq.forall(b => numHashes % b == 0),
      "every band count must divide numHashes")
    val hp = wordHashedPairs(docs, idCol, textCol, shingleN)
    val sets = hashSets(hp)
    bandsSeq.map { b =>
      val buckets = bandBuckets(hp, numHashes, b)
      val candidates = buckets.as("a")
        .join(buckets.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nCand = candidates.agg(count(lit(1)).as("n_candidates"))
      val nVer = verifyJaccard(candidates, sets, sets, "doc_a", "doc_b",
        threshold).agg(count(lit(1)).as("n_verified"))
      nCand.crossJoin(nVer)
        .select(lit(b).as("bands"), lit(numHashes / b).as("rows_per_band"),
          col("n_candidates"), col("n_verified"),
          // "precision" is a reserved word in ANSI/DuckDB — keep the
          // column oracle-portable.
          when(col("n_candidates") === 0, lit(null).cast("double"))
            .otherwise(round(col("n_verified").cast("double") /
              col("n_candidates").cast("double"), 4)).as("verify_precision"))
    }.reduce(_ unionByName _)
  }

  /** Near-duplicate pairs by CHARACTER n-gram Jaccard, same MinHash+LSH
    * machinery as [[nearDuplicatesMinhash]] over [[charShingles]]. The
    * finer shingles catch near-dups that word shingling misses (small
    * edits inside words, scripts without whitespace tokenization).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      ngram: Int = 5,
      numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    // Fused shingle+hash front (CharGramPairs48): one string walk dedups
    // grams and hashes each exactly once — the char-gram path produces
    // ~len(text) set elements per doc, so the per-gram Md5/Conv HOF tree
    // this replaces was d04's dominant cost.
    val hp = Spread.ensure(docs)
      .select(col(idCol).as("doc_id"), col(textCol).as("txt"))
      .filter(length(col("txt")) >= ngram)
      .select(col("doc_id"),
        graft.functions.CharGramPairs48(col("txt"), ngram).as("pairs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    minhashBandPairsHashed(hp, threshold, numHashes, bands)
  }

  /** MinHash + LSH banding over a prepared (doc_id, shingles) relation:
    * signatures, band buckets, candidate self-join, exact Jaccard verify.
    *
    * Persists the HASHED shingle sets (48-bit h1/h2 pairs, one md5 per
    * shingle) rather than the strings: signatures and verification both
    * read them, and Jaccard over the hashed sets equals Jaccard over the
    * shingle sets up to 48-bit collisions — the standard trade at corpus
    * scale, where raw shingle strings are ~6x the bytes of their hashes.
    * Persisted because the sets are consumed three times (bucket self-join
    * sides + verification) and Spark does not common-subexpression-
    * eliminate across self-join branches.
    */
  private def minhashBandPairs(
      shingled: DataFrame,
      threshold: Double,
      numHashes: Int,
      bands: Int): DataFrame =
    minhashBandPairsHashed(hashedShingles(shingled), threshold, numHashes,
      bands)

  /** The band pipeline over an already-hashed, PERSISTED (doc_id, pairs)
    * relation — shared by the HOF-hashed word path and the fused
    * char-gram path.
    */
  private def minhashBandPairsHashed(
      hp: DataFrame,
      threshold: Double,
      numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val buckets = bandBuckets(hp, numHashes, bands)

    // Deliberately unhinted: AQE turns this into a broadcast join when the
    // bucket side measures small at runtime, and keeps a shuffled hash join
    // at corpus scale where buckets are as big as the corpus.
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    verifyJaccard(candidates, hashSets(hp), hashSets(hp), "doc_a", "doc_b",
      threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** One md5 per shingle, persisted: the (h1, h2) pair relation is consumed
    * by both the signature projection and the verification joins, and Spark
    * does not common-subexpression-eliminate across join branches.
    */
  private def hashedShingles(shingled: DataFrame): DataFrame =
    shingled
      .select(col("doc_id"), transform(col("shingles"), s => hashPair48(s)).as("pairs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** (doc_id, band, key) LSH bucket relation. Signature fully map-side via
    * the codegen'd one-pass expression (all members accumulate in
    * registers; the k x array_min(transform(...)) HOF form is interpreted
    * and was the dominant cost of char-gram dedup). No shingle row is ever
    * exploded or shuffled — at corpus scale the only data crossing the wire
    * is (doc_id, band, key). Cheap projection of the cached pairs —
    * recomputing it per join side costs less than a persist barrier.
    */
  private def bandBuckets(hp: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val r = numHashes / bands
    val sigs = hp.select(col("doc_id"),
      graft.functions.MinhashSignature(col("pairs"), numHashes).as("sig"))
    sigs.select(col("doc_id"), posexplode(
      array((0 until bands).map(b => bandKey(col("sig"), b, r)): _*))
      .as(Seq("band", "key")))
  }

  /** 48-bit hashed shingle sets (h1 only) for exact Jaccard verification. */
  private def hashSets(hp: DataFrame): DataFrame =
    hp.select(col("doc_id"),
      transform(col("pairs"), p => p.getField("h1")).as("hs"))

  /** Exact shingle-set CONTAINMENT over caller-supplied candidate pairs:
    * C(A,B) = |S(A) ∩ S(B)| / min(|S(A)|, |S(B)|) — the near-INCLUSION
    * measure (Broder's containment coefficient). A short document embedded
    * in a long one has high containment but low Jaccard, so symmetric
    * minhash banding under-recalls it; candidates should come from a
    * shared-substring signal instead (the winnowed-fingerprint postings of
    * [[graft.ops.TextAnalysis.winnow]] — any shared run of >= k+w-1
    * characters contributes a candidate regardless of the size ratio).
    *
    * `candidates` must carry (doc_a, doc_b); output appends the two set
    * sizes plus exact `containment` and `jaccard` over the 48-bit hashed
    * word-`shingleN`-gram sets. Joins are id-keyed on the candidate
    * relation — work stays proportional to candidates, never pairs².
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      candidates: DataFrame, shingleN: Int = 3): DataFrame = {
    val sets = hashSets(wordHashedPairs(docs, idCol, textCol, shingleN))
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")),
        "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")),
        "doc_b")
      .withColumn("n_inter",
        size(array_intersect(col("hs_a"), col("hs_b"))))
      .select(col("doc_a"), col("doc_b"),
        size(col("hs_a")).as("size_a"), size(col("hs_b")).as("size_b"),
        (col("n_inter").cast("double") /
          least(size(col("hs_a")), size(col("hs_b"))).cast("double"))
          .as("containment"),
        (col("n_inter").cast("double") /
          size(array_union(col("hs_a"), col("hs_b"))).cast("double"))
          .as("jaccard"))
  }

  /** Join the two hashed-shingle sets onto candidate pairs and keep pairs
    * with exact hashed-set Jaccard >= threshold.
    */
  private def verifyJaccard(candidates: DataFrame, setsA: DataFrame,
      setsB: DataFrame, colA: String, colB: String,
      threshold: Double): DataFrame =
    candidates
      .join(setsA.select(col("doc_id").as(colA), col("hs").as("hs_a")), colA)
      .join(setsB.select(col("doc_id").as(colB), col("hs").as("hs_b")), colB)
      .withColumn("jaccard",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_union(col("hs_a"), col("hs_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)

  /** Incremental dedup: near-duplicate pairs BETWEEN a new batch and an
    * existing corpus — the daily-ingest shape, where the corpus's own
    * internal pairs are already resolved and must not be recomputed.
    *
    * Same MinHash(numHashes)+LSH(bands) machinery as
    * [[nearDuplicatesMinhash]], but candidate generation joins the batch's
    * band buckets against the corpus's instead of self-joining: the work is
    * O(batch buckets x occupancy), independent of corpus-internal
    * duplication. At production scale the corpus side's signatures/buckets
    * are computed once at ingest and stored; only the (small) batch side is
    * hashed per run, and AQE broadcasts it, so no corpus-sized shuffle
    * happens at any scale. A pair is reported iff the same pair would
    * survive the full-corpus run (identical bucket condition + identical
    * exact-Jaccard verify — asserted in OpsSpec).
    *
    * Output: (doc_new, doc_corpus, jaccard).
    */
  def crossCorpusMinhashPairs(
      newDocs: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val hpNew = wordHashedPairs(newDocs, idCol, textCol, shingleN)
    val hpOld = wordHashedPairs(corpus, idCol, textCol, shingleN)
    val candidates = bandBuckets(hpNew, numHashes, bands).as("a")
      .join(bandBuckets(hpOld, numHashes, bands).as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("a.doc_id").as("doc_new"), col("b.doc_id").as("doc_corpus"))
      .distinct()
    verifyJaccard(candidates, hashSets(hpNew), hashSets(hpOld),
      "doc_new", "doc_corpus", threshold)
      .select(col("doc_new"), col("doc_corpus"), col("jaccard"))
  }

  /** 32-bit SimHash over token frequencies: bit `b` of the result is set
    * when the frequency-weighted sum of (+f if bit b of hash60(0, token) is
    * set, else -f) is positive.
    *
    * Computed fully map-side: summing ±1 per token OCCURRENCE equals
    * summing ±f per distinct token, so no frequency grouping — and no
    * shuffle — is needed. Each row hashes its tokens once into an array
    * (own projection, so the per-bit lambdas see an attribute), then the
    * 32 bit-sums are arithmetic folds over that array.
    */
  def simhash32(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Zero-token documents are excluded (the exploded form had no rows for
    // them; emitting simhash=0 would pair all empty docs with each other).
    val hashed = Spread.ensure(docs)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        transform(col("toks"), t => hash60(0, t)).as("hs"))
    hashed.select(col("doc_id"),
      (0 until 32).map { b =>
        val bitSum = aggregate(col("hs"), lit(0L),
          (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L))
        when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _).as("simhash"))
  }

  /** Collapse near-duplicate PAIRS into clusters and pick one keeper per
    * cluster: connected components by iterative min-label propagation over
    * the pair graph (near-dup relations are not transitive, but dedup
    * policy treats the transitive closure as one group). Each iteration is
    * two keyed shuffles and converges in O(component diameter) rounds with
    * an early exit; near-dup clusters in practice have tiny diameters.
    * Every iteration truncates lineage (`localCheckpoint`) — without that,
    * the logical plan doubles per round and planning itself blows up. On a
    * cluster, point `spark.sparkContext.setCheckpointDir` at durable
    * storage and swap in `checkpoint` for executor-failure tolerance.
    *
    * Input: pairs (doc_a, doc_b); output: (doc_id, keeper_id) for every
    * document appearing in a pair, keeper = min id of its component.
    */
  def canonicalize(
      pairs: DataFrame,
      maxIterations: Int = 50,
      localThreshold: Long = 1L << 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint(true)

    // Hybrid: near-dup pair graphs are usually orders of magnitude smaller
    // than the corpus (the checkpoint above already materialized them), so
    // when the edge list fits comfortably on the driver a local union-find
    // resolves components exactly in one pass — no iteration rounds. The
    // distributed min-label loop below remains the path for graphs that
    // don't fit (billions of pairs) — and for non-long id types, which the
    // loop handles generically but the getLong-based local path cannot.
    val longIds = edges.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longIds && edges.count() <= localThreshold) {
      val spark = pairs.sparkSession
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val next = parent(c); parent(c) = r; c = next }
        r
      }
      edges.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          // union by min id: the smaller root wins, matching the
          // distributed path's min-label convergence exactly.
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val labeled = parent.keys.toSeq.sorted.map(id => (id, find(id)))
      import spark.implicits._
      return labeled.toDF("doc_id", "keeper_id")
    }

    var labels = edges.select(col("src").as("doc_id"))
      .distinct()
      .withColumn("label", col("doc_id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIterations && !converged) {
      // Each node adopts the min label among itself and its neighbors.
      val neighborLabels = edges
        .join(labels.withColumnRenamed("doc_id", "dst")
          .withColumnRenamed("label", "n_label"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("n_label")).as("n_label"))
      val next = labels.join(neighborLabels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("n_label"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old_label"), "doc_id")
        .filter(col("label") =!= col("old_label")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("doc_id"), col("label").as("keeper_id"))
  }

  /** Drop exact duplicates, keeping the min-id document per normalized
    * fingerprint — the first dedup tier, applied before any near-dup
    * machinery. One window pass keyed by the fingerprint.
    */
  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(fingerprint(col(textCol))).orderBy(col(idCol))
    docs.withColumn("_fp_rn", row_number().over(w))
      .filter(col("_fp_rn") === 1)
      .drop("_fp_rn")
  }

  /** End-to-end corpus dedup: near-duplicate detection (MinHash+LSH) plus
    * cluster canonicalization, returning the input with duplicates removed
    * — every document either had no near-duplicate or is its cluster's
    * keeper (min id). The pair set and keeper choice are deterministic.
    */
  /** Incremental cluster canonicalization — the daily-ingest successor to
    * re-running [[canonicalize]] over the whole corpus: given the current
    * keeper map (doc_id -> keeper_id, keeper = min member id, exactly
    * what [[canonicalize]] emits) and the NEW near-dup pairs a batch
    * introduced (batch-corpus from [[crossCorpusMinhashPairs]] plus
    * batch-batch), produce the updated keeper map WITHOUT touching the
    * corpus pair graph again.
    *
    * Both endpoints of every new pair are lifted into keeper space
    * (keeper-keyed left joins; an endpoint absent from the map is its own
    * label), the lifted graph — O(batch pairs), NOT O(corpus) — is
    * canonicalized, and the resulting root remap is applied back: old
    * clusters merge when a new doc bridges them, and min-of-mins keeps
    * the keeper = min-member invariant, so the output EQUALS a full
    * recanonicalization over the union graph (the d16 oracle checks that
    * equality cross-engine). Returns the full updated map: every
    * previously-mapped doc plus every new-pair endpoint.
    */
  def extendCanonical(keepers: DataFrame, newPairs: DataFrame): DataFrame = {
    val k = keepers.select(col("doc_id").as("kd"), col("keeper_id").as("kk"))
    val lifted = newPairs
      .join(k, newPairs("doc_a") === col("kd"), "left")
      .select(coalesce(col("kk"), newPairs("doc_a")).as("la"),
        newPairs("doc_b"))
      .join(k, col("doc_b") === col("kd"), "left")
      .select(col("la"), coalesce(col("kk"), col("doc_b")).as("lb"))
      .filter(col("la") =!= col("lb"))
      .select(least(col("la"), col("lb")).as("doc_a"),
        greatest(col("la"), col("lb")).as("doc_b"))
      .distinct()
    val remap = canonicalize(lifted)
      .select(col("doc_id").as("lbl"), col("keeper_id").as("root"))
    val remapped = keepers
      .join(remap, keepers("keeper_id") === col("lbl"), "left")
      .select(keepers("doc_id"),
        coalesce(col("root"), keepers("keeper_id")).as("keeper_id"))
    val newDocs = newPairs.select(col("doc_a").as("doc_id"))
      .union(newPairs.select(col("doc_b")))
      .distinct()
      .join(keepers.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val newMap = newDocs
      .join(remap, newDocs("doc_id") === col("lbl"), "left")
      .select(newDocs("doc_id"),
        coalesce(col("root"), newDocs("doc_id")).as("keeper_id"))
    remapped.unionByName(newMap)
  }

  def dedupCorpus(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val pairs = nearDuplicatesMinhashCached(docs, idCol, textCol, threshold)
    val losers = canonicalize(pairs)
      .filter(col("doc_id") =!= col("keeper_id"))
      .select(col("doc_id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** C(n, k) in Long — block-combination counts are tiny (<= C(16,3)). */
  private def comb(n: Int, k: Int): Long = {
    var r = 1L
    for (i <- 1 to k) r = r * (n - k + i) / i
    r
  }

  /** Block count for the SimHash pair join, sized to the number of
    * DISTINCT fingerprints `m` — the d03 sizing law (round-8 verdict
    * task 5, same class as ksubFor(n)). With B blocks over `bits` bits
    * and radius d, candidate generation probes every C(B, d) choice of
    * (B-d) blocks (Manku et al., WWW'07 — the block-permutation scheme);
    * a pair within Hamming radius d has >= B-d clean blocks, so by
    * pigeonhole it shares at least one probe key: recall stays EXACT for
    * every B, which is why the law can retune freely as corpora grow
    * without changing any answer.
    *
    * Cost per choice of B: C(B,d)*m probe rows plus
    * C(B,d) * m^2/2 / 2^keyBits expected random bucket collisions, where
    * keyBits >= bits - d*ceil(bits/B) (a probe key omits d blocks). Small
    * B under-keys the buckets (the old fixed B=4 probed 8-bit keys — 256
    * buckets, so candidates grew ~m^2/256: 47.8M verified pairs at sf1);
    * large B multiplies probe rows through C(B,d). The law just evaluates
    * the model at each feasible B and takes the argmin — gate-sized
    * corpora land on the old B=4, sf0.1 on B=5, sf1 on B=6-8, and the
    * quadratic term stays balanced against the linear one at any m.
    */
  private[graft] def simhashBlocksFor(m: Long, d: Int, bits: Int = 32): Int = {
    require(d >= 0 && d < 16,
      s"simhash radius $d out of range [0, 16) for a $bits-bit fingerprint" +
        " split into at most 16 blocks")
    ((d + 1) to 16).minBy { b =>
      val keyBits = math.max(0, bits - d * ((bits + b - 1) / b))
      val c = comb(b, d).toDouble
      c * m.toDouble +
        c * (m.toDouble * m.toDouble / 2.0) / math.pow(2.0, keyBits.toDouble)
    }
  }

  /** Near-duplicate pairs by SimHash Hamming distance <= maxDistance.
    *
    * Two structural levers keep candidate growth near-linear in corpus
    * size (the old fixed 4-segment probe measured 47.8M candidate pairs
    * at sf1 — quadratic in m over only 256 buckets):
    *
    *  1. Pair generation runs over DISTINCT fingerprints, not documents:
    *     exact/near-exact duplicates collapse onto shared simhash values
    *     (the common LLM-corpus shape), so the self-join space is m
    *     distinct values, and document pairs materialize only by
    *     expanding the (value_a, value_b) matches through the membership
    *     relation — output-proportional, never candidate-proportional.
    *  2. The block-combination probe ([[simhashBlocksFor]]): any pair
    *     within the radius agrees exactly on some (B-d)-block key, so the
    *     join is a bucket-key hash join with EXACT recall at every B, and
    *     B retunes to corpus size without changing results.
    */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 3): DataFrame = {
    val bits = 32
    require(maxDistance >= 0 && maxDistance < 16,
      s"simhash maxDistance $maxDistance out of range [0, 16) for the " +
        s"$bits-bit fingerprint (the block probe needs > maxDistance blocks)")
    // Persisted for the same reason as the MinHash hashed-shingle relation:
    // the distinct-value pass and both expansion joins consume it, and
    // Spark would otherwise recompute the full tokenize+hash+bitsum chain
    // per consumer (measured 6-14 s -> ~1.5 s at sf0.1).
    val hs = simhash32(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vals = hs.select(col("simhash")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val blocks = simhashBlocksFor(vals.count(), maxDistance, bits)
    // Block i covers a contiguous bit range (widths differ by <= 1); a
    // probe key is the fingerprint masked to one (blocks - d)-block
    // choice, so key equality == equality on every block in the choice.
    val base = bits / blocks
    val rem = bits % blocks
    val blockMasks = (0 until blocks).map { i =>
      val lo = i * base + math.min(i, rem)
      val w = base + (if (i < rem) 1 else 0)
      (((1L << w) - 1) << lo)
    }
    val comboMasks = blockMasks.indices.combinations(blocks - maxDistance)
      .map(c => c.map(blockMasks).reduce(_ | _)).toSeq
    val probes = vals.select(col("simhash"), posexplode(
        array(comboMasks.map(mk => col("simhash").bitwiseAND(lit(mk))): _*))
      .as(Seq("combo", "key")))
    val valPairs = probes.as("a")
      .join(probes.as("b"),
        col("a.combo") === col("b.combo") && col("a.key") === col("b.key") &&
          col("a.simhash") < col("b.simhash"))
      .select(col("a.simhash").as("ha"), col("b.simhash").as("hb"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      // Hamming filter BEFORE the distinct: the dedup shuffle then carries
      // only true value pairs (<= C(B,d) multiplicity), not every candidate.
      .filter(col("hamming") <= maxDistance)
      .distinct()
    // Expansion: each surviving value pair crosses its two membership
    // sets (each document pair materializes exactly once — a pair of docs
    // determines its pair of fingerprints); equal-fingerprint documents
    // pair at Hamming 0 through a membership self-join.
    val cross = valPairs
      .join(hs.as("ma"), col("ha") === col("ma.simhash"))
      .join(hs.as("mb"), col("hb") === col("mb.simhash"))
      .select(least(col("ma.doc_id"), col("mb.doc_id")).as("doc_a"),
        greatest(col("ma.doc_id"), col("mb.doc_id")).as("doc_b"),
        col("hamming"))
    val intra = hs.as("x")
      .join(hs.as("y"),
        col("x.simhash") === col("y.simhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(lit(0L)).as("hamming"))
    cross.unionByName(intra)
  }

  /** Exact duplicated-SPAN detection (the substring-level dedup of Lee et
    * al., arXiv:2107.06499 — "Deduplicating Training Data Makes Language
    * Models Better"): document-level dedup misses boilerplate repeated
    * INSIDE otherwise-distinct pages (headers, license blocks, templated
    * paragraphs), which that paper shows LLMs memorize. A k-token gram
    * occurring more than once corpus-wide marks every position it covers;
    * overlapping marks merge into maximal spans per document.
    *
    * The reference implementation builds a suffix array — a global sort
    * the Spark-native equivalent of which is this gram-keyed pipeline:
    *
    *  1. map-side: tokenize, slide a k-token window, md5 each gram —
    *     one narrow (doc, pos, gram_key) row per token, no shuffle;
    *  2. ONE shuffle keyed on gram_key for the `count > 1` duplicate set
    *     (partial-aggregated; gram keys are 128-bit md5, never the text);
    *  3. join positions back to duplicated keys (same gram_key
    *     partitioning — AQE reuses the exchange) and merge overlapping
    *     [pos, pos+k) intervals with ONE per-document window pass
    *     (classic island detection: a row starts a new span iff its start
    *     exceeds the running max end of everything before it).
    *
    * Cost is linear in corpus tokens at any scale; nothing pairwise ever
    * materializes (the duplicate SET is the join side, not dup x dup).
    * Output per document: `doc_id, n_tokens, n_dup_spans, dup_tokens,
    * dup_frac` — the trim/drop decision feed, exact integer math
    * throughout so the DuckDB oracle hash-matches (d09).
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val toks = tokensWithCount(docs, idCol, textCol)
    val spans = duplicatedSpanSet(toks, idCol, k)
    val perDoc = spans.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("en") - col("s")).as("dup_tokens"))
    toks.select(col(idCol), col("n_tokens").cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).cast("long").as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double"), 6).as("dup_frac"))
  }

  /** (idCol, toks, n_tokens) tokenization shared by the span ops. */
  private def tokensWithCount(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"), size(col("toks")).as("n_tokens"))

  /** Maximal duplicated spans (idCol, island, s, en) over a tokenized
    * relation — steps 1-3 of [[duplicatedSpans]]'s pipeline doc.
    */
  private def duplicatedSpanSet(toks: DataFrame, idCol: String,
      k: Int): DataFrame = {
    // Guard short docs explicitly: sequence(0, negative) would DESCEND.
    val starts = when(col("n_tokens") >= k,
      sequence(lit(0), col("n_tokens") - k)).otherwise(array())
    val grams = toks.select(col(idCol), posexplode_outer(
        transform(starts, i =>
          md5(concat_ws(" ", slice(col("toks"), i + 1, lit(k))))))
        .as(Seq("pos", "gram_key")))
      .filter(col("gram_key").isNotNull)
    val dupKeys = grams.groupBy(col("gram_key"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
      .select(col("gram_key"))
    val covered = grams.join(dupKeys, Seq("gram_key"))
      .select(col(idCol), col("pos"), (col("pos") + k).as("e"))
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val prevMax = max(col("e")).over(byPos.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val islands = covered
      .withColumn("brk",
        when(prevMax.isNull || col("pos") > prevMax, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(byPos.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    islands.groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("s"), max(col("e")).as("en"))
  }

  /** Per-document n-gram NOVELTY — the memorization-risk complement to
    * [[duplicatedSpans]]: instead of marking what repeats, score how much
    * of each document is corpus-UNIQUE. A doc whose k-token grams all
    * appear in other docs is pure boilerplate/recrawl material; a doc of
    * mostly singleton grams contributes genuinely new text to a training
    * mix (the signal Lee et al., arXiv:2107.06499 §6 use to show models
    * memorize the repeated tail). Per doc: distinct k-gram count, how
    * many of those occur in NO other document (doc-frequency 1), and
    * their ratio as `novelty` (null for docs shorter than k tokens).
    *
    * Scale shape: within-doc repeats are deduped MAP-SIDE
    * (`array_distinct` on the per-doc gram array) so the explode emits
    * one row per distinct (doc, gram); doc-frequency is then a plain
    * count — ONE gram-keyed shuffle (partial-aggregated, 128-bit md5
    * keys); the join back rides the same gram partitioning and the
    * per-doc fold is one more keyed aggregate. Linear in corpus tokens,
    * nothing pairwise at any scale.
    */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val base = docs.select(col(idCol),
      size(tokens(col(textCol))).as("n_tokens"))
    // Fused gram front (WordGramPairs48: tokenize + k-gram join + dedup +
    // one md5 per distinct gram in ONE string walk); the 48-bit h1 half
    // is the gram key -- the same engine-portable md5[1..12] BIGINT the
    // minhash oracles replay; 2.7x the interpreted slice/concat_ws/md5
    // HOF chain it replaces at 10^6 docs (27.0 -> 10.1 s, SimBench).
    // array_distinct guards the (rare, deterministic) case of two
    // distinct grams sharing h1, keeping both engines' per-doc counts
    // identical by construction.
    //
    // explode_outer + null filter: the non-outer generator's inferred
    // size()>0 pre-filter would re-run the fused sweep below the
    // projection (the t22 inference trap). Persisted: the gram relation
    // has TWO consumers (doc-frequency count + the join back) -- the
    // multi-consumer recompute rule (BENCH_NOTES, simhash/t12/loop
    // carriers). Internal persist, reclaimed by the family-boundary
    // `Caches.reset` like the hashed-shingle relations.
    val docGrams = docs.select(col(idCol),
        explode_outer(array_distinct(transform(
          graft.functions.WordGramPairs48(col(textCol), k),
          p => p.getField("h1")))).as("gram_key"))
      .filter(col("gram_key").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docFreq = docGrams.groupBy(col("gram_key"))
      .agg(count(lit(1)).as("df"))
    val perDoc = docGrams.join(docFreq, Seq("gram_key"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("novel_grams"))
    base
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(null).cast("double"))
          .otherwise(round(col("novel_grams").cast("double") /
            col("n_grams").cast("double"), 6)).as("novelty"))
  }

  /** Span REMOVAL — the "act" to [[duplicatedSpans]]'s "detect": every
    * token inside a duplicated span is cut and the document re-joined
    * from the survivors (the scrub policy of Lee et al. §4.1 applied to
    * ALL marked occurrences — deterministic, no keep-first tie to break).
    *
    * The spans per document collapse to ONE small array via an id-keyed
    * aggregate; the cut itself is then a single map-side HOF over the
    * token array (`filter` + `exists` over the span list — spans per doc
    * are few by construction, having merged to maximal islands). Nothing
    * new shuffles beyond [[duplicatedSpanSet]]'s gram count: the rebuild
    * cost is linear in corpus tokens.
    *
    * Output: idCol, n_tokens, kept_tokens, scrub_md5 (md5 of the
    * space-rejoined survivor text — whitespace-normalized like
    * [[normalize]], so both engines hash identical strings).
    */
  def scrubDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    val toks = tokensWithCount(docs, idCol, textCol)
    val spanArr = duplicatedSpanSet(toks, idCol, k)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("s").cast("long").as("s"),
        col("en").cast("long").as("en"))).as("sp"))
    val degenerate = array(struct(lit(0L).as("s"), lit(0L).as("en")))
    toks.join(spanArr, Seq(idCol), "left")
      .withColumn("spn", coalesce(col("sp"), degenerate))
      .withColumn("kept", transform(
        filter(
          transform(col("toks"), (tok, i) =>
            struct(i.cast("long").as("i"), tok.as("tok"))),
          p => !exists(col("spn"), sp =>
            p.getField("i") >= sp.getField("s") &&
              p.getField("i") < sp.getField("en"))),
        p => p.getField("tok")))
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        size(col("kept")).cast("long").as("kept_tokens"),
        md5(concat_ws(" ", col("kept"))).as("scrub_md5"))
  }
}
