package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Pipeline ops sanity: dedup tiers, text metrics, and the LSH similarity
  * path's recall against the exact baseline on real testdata.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("exactDuplicates finds normalized duplicates") {
    val docs = Seq(
      (1L, "Hello, world!"),
      (2L, "hello world"),
      (3L, "something else")
    ).toDF("doc_id", "text")
    val dups = Dedup.exactDuplicates(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(dups.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(dups.forall(_.getLong(3) == 1L)) // keeper is min id
  }

  test("dropExactDuplicates keeps the min-id doc per fingerprint") {
    val docs = Seq(
      (5L, "Hello, world!"),
      (2L, "hello world"),   // same normalized fingerprint, smaller id
      (3L, "something else")
    ).toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
  }

  test("minhash near-dup finds planted pairs and verifies jaccard") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = Dedup.nearDuplicatesMinhash(docs, "doc_id", "text", 0.5)
    val rows = pairs.collect()
    assert(rows.nonEmpty, "expected planted near-duplicates in testdata")
    assert(rows.forall(_.getDouble(2) >= 0.5))
  }

  test("MinhashSignature expression equals the HOF signature form") {
    // Same family, two execution paths: the codegen'd one-pass expression
    // (used in the dedup pipeline) and the composable HOF helper.
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val sh = docs
      .select($"doc_id", Dedup.tokens($"text").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", Dedup.wordShingles($"toks", 3).as("shingles"))
    val viaExpr = sh
      .select($"doc_id", transform($"shingles", s => Dedup.hashPair48(s)).as("pairs"))
      .select($"doc_id", graft.functions.MinhashSignature($"pairs", 32).as("sig"))
    val viaHof = sh.select($"doc_id", Dedup.minhashSignature($"shingles", 32).as("sig"))
    val exprRows = viaExpr.orderBy($"doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    val hofRows = viaHof.orderBy($"doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(exprRows.length === hofRows.length)
    exprRows.zip(hofRows).foreach { case ((ide, se), (idh, sh2)) =>
      assert(ide === idh)
      assert(se === sh2, s"signature mismatch for doc $ide")
    }
  }

  test("charShingles emits distinct n-grams; short text yields empty") {
    val df = Seq((1L, "abcab"), (2L, "ab")).toDF("doc_id", "txt")
    val got = df.select($"doc_id", Dedup.charShingles($"txt", 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(got(1L) === Set("abc", "bca", "cab"))
    assert(got(2L) === Set.empty[String])
  }

  test("ngramJaccardPairs finds planted char-level near-dups with exact jaccard") {
    // One-character edit: char 4-gram sets overlap heavily; unrelated doc
    // shares nothing. Verify the pair surfaces AND its jaccard equals the
    // exact distinct-set ratio computed independently.
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "the quick brown fox jumps over the lazy cog"
    val docs = Seq((1L, a), (2L, b), (3L, "completely different text entirely"))
      .toDF("doc_id", "text")
    val rows = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        threshold = 0.5, ngram = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(t => (t._1, t._2)).toSet === Set((1L, 2L)))
    def grams(s: String) = s.sliding(4).toSet
    val expected = grams(a).intersect(grams(b)).size.toDouble /
      grams(a).union(grams(b)).size
    assert(math.abs(rows.head._3 - expected) < 1e-12)
  }

  test("simhash pigeonhole join equals brute-force within the radius") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(100)
    val viaSegments = Dedup.simhashPairs(docs, "doc_id", "text", maxDistance = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hs = Dedup.simhash32(docs, "doc_id", "text")
    val brute = hs.as("a").join(hs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSegments === brute)
  }

  test("simhash radius is validated against the fingerprint width") {
    // a radius at/over the block ceiling must fail with the contract
    // message, not an empty-range collection error
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Dedup.simhashPairs(docs, "doc_id", "text", maxDistance = 16))
    assert(e.getMessage.contains("out of range [0, 16)"))
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(docs, "doc_id", "text", maxDistance = -1))
    // every in-range radius sizes a usable block count
    (0 until 16).foreach { d =>
      val b = Dedup.simhashBlocksFor(1000L, d)
      assert(b > d && b <= 16)
    }
  }

  test("canonicalize groups transitive near-dup chains under the min id") {
    // chain 1-2-3 (transitively one group), pair 7-9, singleton-free input
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val got = Dedup.canonicalize(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("extendCanonical merges bridged clusters and equals full recanonicalization") {
    // Existing clusters {1,2}, {5,6}, singleton {9}; the batch joins a
    // cluster (100-2), BRIDGES {5,6} and {9} through new doc 101, merges
    // two old clusters directly (2-5), and adds a batch-only pair
    // (200-201). The incremental result must equal canonicalizing the
    // union graph from scratch.
    val keepers = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (9L, 9L))
      .toDF("doc_id", "keeper_id")
    val newPairs = Seq((100L, 2L), (101L, 6L), (101L, 9L), (200L, 201L),
      (2L, 5L)).toDF("doc_a", "doc_b")
    val got = Dedup.extendCanonical(keepers, newPairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.canonicalize(
        Seq((1L, 2L), (5L, 6L)).toDF("doc_a", "doc_b").unionByName(newPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === full, s"incremental $got != full $full")
    assert(got(101L) === 1L && got(6L) === 1L && got(9L) === 1L,
      "bridge through the new doc must merge {5,6} and {9} into 1's component")
    assert(got(200L) === 200L && got(201L) === 200L)
  }

  test("distributed canonicalize path matches the local union-find path") {
    // localThreshold = 0 forces the iterative min-label loop; both paths
    // must produce identical components and keepers.
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L), (9L, 11L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val local = Dedup.canonicalize(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.canonicalize(pairs, localThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === local)
    assert(local(11L) === 7L && local(21L) === 20L)
  }

  test("canonicalize on real minhash pairs yields per-cluster keepers") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = Dedup.nearDuplicatesMinhash(docs, "doc_id", "text", 0.5)
    val labels = Dedup.canonicalize(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty)
    // every keeper is a member of its own cluster and is the minimum
    labels.groupBy(_._2).foreach { case (keeper, members) =>
      assert(members.keySet.min === keeper)
      assert(labels(keeper) === keeper)
    }
  }

  test("languageId emits deterministic argmax with alphabetical ties") {
    val docs = Seq((1L, "the of and le la"), (2L, "xyz")).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[String]("pred_lang") === "en") // 3 en hits vs 2 fr
    assert(out(1).getAs[String]("pred_lang") === "de") // all-zero tie -> first lang
  }

  test("sign-LSH bucket join recalls every exact pair at its threshold") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val exact = Similarity.bruteForcePairs(emb, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.signBucketJoin(emb, "vec_id", "embedding", 0.45,
        planes = 32, bands = 16, dims = 64)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH is a recall-oriented candidate generator; with 16 bands of 2 bits
    // recall should be total on this data.
    assert(exact.subsetOf(lsh) || exact.isEmpty)
    assert(lsh.subsetOf(exact)) // verification step keeps only true pairs
  }

  test("brute-force top-k is ranked and capped") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val probes = emb.filter($"vec_id" < 3)
    val knn = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 4)
    val byQuery = knn.collect().groupBy(_.getLong(0))
    assert(byQuery.keySet === Set(0L, 1L, 2L))
    byQuery.values.foreach { rows =>
      assert(rows.length === 4)
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.sliding(2).forall { case Array(x, y) => x >= y; case _ => true })
    }
  }

  test("deterministic sampling is partition-invariant and repeatable") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = graft.ops.Sampling.deterministicSample(docs, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.ops.Sampling.deterministicSample(docs.repartition(13), "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.nonEmpty && a.size < docs.count())
    // sample at larger fraction is a superset (bucket-threshold property)
    val c = graft.ops.Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(c))
  }

  test("stratified sample respects per-stratum fractions deterministically") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sampled = graft.ops.Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.0))
    val langs = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!langs.contains("de"))          // zero fraction excluded
    assert(langs.getOrElse("en", 0L) > 0L) // en sampled
    assert(langs.keySet.subsetOf(Set("en"))) // unlisted strata default to 0
  }

  test("redactPii replaces emails, urls, and digit runs with placeholders") {
    val df = Seq(
      "contact me at jane.doe@example.com or call 555 123 4567 today",
      "see https://example.com/page?q=1 for details",
      "plain text with no pii at all").toDF("text")
    val out = df.select(TextAnalysis.redactPii($"text").as("r"))
      .collect().map(_.getString(0))
    assert(out(0).contains("<EMAIL>") && out(0).contains("<NUMBER>"))
    assert(!out(0).contains("example.com") && !out(0).contains("4567"))
    assert(out(1) === "see <URL> for details")
    assert(out(2) === "plain text with no pii at all")
  }

  test("piiCounts audits documents without mutating them") {
    val df = Seq((1L, "mail a@b.co and https://x.y plus 123456789"),
      (2L, "clean")).toDF("doc_id", "text")
    val out = TextAnalysis.piiCounts(df, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out(0).getInt(1) === 1 && out(0).getInt(2) === 1 && out(0).getInt(3) === 1)
    assert(out(1).getInt(1) === 0 && out(1).getInt(2) === 0 && out(1).getInt(3) === 0)
  }

  test("winnowing: shared substring >= k+w-1 chars guarantees a shared fingerprint") {
    val k = 8; val w = 4
    val shared = "zebra quantum fingerprint"  // 25 chars >= k+w-1
    val df = Seq(
      (1L, s"alpha prefix text $shared"),
      (2L, s"$shared completely different suffix here"),
      (3L, "no overlap with the others at all in this document"))
      .toDF("doc_id", "text")
    val fps = df
      .select($"doc_id", TextAnalysis.kgramHashes($"text", k).as("hs"))
      .select($"doc_id", TextAnalysis.winnow($"hs", w).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared substring produced no shared fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty, "unrelated docs should not collide")
    // selection shrinks the hash set but never invents values
    val all1 = df.filter($"doc_id" === 1L)
      .select(TextAnalysis.kgramHashes($"text", k).as("hs"))
      .collect().head.getSeq[Long](0).toSet
    assert(fps(1L).subsetOf(all1) && fps(1L).size < all1.size)
  }

  test("winnow of short texts is empty, not an error") {
    val df = Seq((1L, "tiny")).toDF("doc_id", "text")
    val out = df.select(TextAnalysis.winnow(
      TextAnalysis.kgramHashes($"text", 8), 4).as("fps")).collect().head
    assert(out.getSeq[Long](0).isEmpty)
  }

  test("tokenEstimate adds BPE-ish surcharge for long words") {
    val df = Seq((1L, "a bb cccccccc")).toDF("id", "text")
    // tokens=3, "cccccccc" has len 8 -> (8-4)/4 = 1 extra
    val est = df.select(TextAnalysis.tokenEstimate($"text").as("e"))
      .collect().head.getLong(0)
    assert(est === 4L)
  }

  test("crossCorpusMinhashPairs equals the full run restricted to the split") {
    // A pair (new, old) is a candidate iff the two docs share a band
    // bucket — the same condition the full self-join run uses — so the
    // incremental result must equal the full pair set filtered to
    // cross-split pairs, with no batch-internal pairs reported.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bucket = graft.ops.Sampling.hashBucket($"doc_id", 100)
    val batch = docs.filter(bucket < 20)
    val corpus = docs.filter(bucket >= 20)
    val batchIds = batch.select($"doc_id").collect().map(_.getLong(0)).toSet
    val inc = Dedup.crossCorpusMinhashPairs(batch, corpus, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.nearDuplicatesMinhash(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => batchIds.contains(a) ^ batchIds.contains(b) }
      .map { case (a, b) => if (batchIds.contains(a)) (a, b) else (b, a) }
      .toSet
    assert(inc === full)
    assert(inc.forall { case (n, c) =>
      batchIds.contains(n) && !batchIds.contains(c) })
  }

  test("repetitionMetrics counts the dominant bigram via the sorted fold") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"), // "buy now" x4 of 7 bigrams
      (2L, "one two three four five six"),     // all distinct
      (3L, "solo")                             // no bigrams
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    val r1 = m(0)
    assert(r1.getAs[Int]("n_tokens") === 8)
    assert(r1.getAs[Int]("n_distinct") === 2)
    assert(r1.getAs[Int]("top_bigram_n") === 4) // "buy now" appears 4 times
    assert(math.abs(r1.getAs[Double]("top_bigram_frac") - 4.0 / 7.0) < 1e-12)
    assert(!r1.getAs[Boolean]("keep")) // distinct_ratio 0.25 < 0.4
    val r2 = m(1)
    assert(r2.getAs[Double]("distinct_ratio") === 1.0)
    assert(r2.getAs[Int]("top_bigram_n") === 1)
    assert(r2.getAs[Boolean]("keep"))
    val r3 = m(2)
    assert(r3.getAs[Int]("top_bigram_n") === 0)
    assert(r3.getAs[Double]("top_bigram_frac") === 0.0)
  }

  test("mergeUpsert applies insert/update/keep with partial-field updates") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (2L, null.asInstanceOf[String], 99.0), // update: name stays "b"
      (4L, "d", 40.0)                        // insert
    ).toDF("k", "name", "bal")
    val out = graft.ops.Lake.mergeUpsert(base, changes, "k")
      .orderBy($"k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
      r.getString(3))).toSeq === Seq(
      (1L, "a", 10.0, "keep"),
      (2L, "b", 99.0, "update"), // null name in change keeps base name
      (3L, "c", 30.0, "keep"),
      (4L, "d", 40.0, "insert")))
  }

  test("Quantize round-trips within the half-step bound; exact at the grid") {
    val rows = spark.range(300).select($"id",
      transform(sequence(lit(0), lit(7)), i =>
        (pmod(xxhash64($"id", i), lit(997L)).cast("double") / 498.0 - 1.0)
          .cast("float")).as("vec"))
    val model = graft.ops.Quantize.fit(rows, "vec")
    assert(model.dims === 8 && model.levels === 256)
    val q = rows.select($"vec",
      graft.ops.Quantize.quantize($"vec", model).as("q"))
    // Levels stay in [0, 255] and both extremes are hit per dimension
    // (min maps to 0, max to 255 exactly).
    val ext = q.select(posexplode($"q").as(Seq("i", "qv")))
      .groupBy($"i").agg(min($"qv").as("lo"), max($"qv").as("hi"))
      .collect()
    assert(ext.forall(r => r.getInt(1) === 0 && r.getInt(2) === 255))
    // Worst reconstruction error obeys the analytic bound.
    val worst = q.select(graft.ops.Quantize.mseColumn($"vec",
        graft.ops.Quantize.dequantize($"q", model)).as("mse"))
      .agg(max($"mse")).head.getDouble(0)
    assert(worst <= graft.ops.Quantize.mseBound(model), s"mse $worst")
    // A constant dimension quantizes to level 0 and reconstructs exactly.
    val const = spark.range(10).select(
      transform(sequence(lit(0), lit(1)), i =>
        when(i === 0, lit(0.75f)).otherwise($"id".cast("float"))).as("vec"))
    val cm = graft.ops.Quantize.fit(const, "vec")
    val cq = const.select(graft.ops.Quantize.quantize($"vec", cm).as("q"),
      graft.ops.Quantize.dequantize(
        graft.ops.Quantize.quantize($"vec", cm), cm).as("d")).collect()
    assert(cq.forall(_.getSeq[Int](0).head === 0))
    assert(cq.forall(r => math.abs(r.getSeq[Double](1).head - 0.75) < 1e-7))
  }

  test("jacobiEigen recovers a known symmetric eigensystem") {
    // A = Q diag(5, 2, 1) Q^T for an exact orthogonal Q built from a
    // 45-degree rotation in the (0, 1) plane.
    val r = math.sqrt(2.0) / 2.0
    val q = Array(Array(r, -r, 0.0), Array(r, r, 0.0), Array(0.0, 0.0, 1.0))
    val lam = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => q(i)(k) * lam(k) * q(j)(k)).sum)
    val (vals, vecs) = graft.ops.Pca.jacobiEigen(a)
    val order = vals.indices.sortBy(i => -vals(i))
    assert(order.map(vals).zip(lam).forall { case (g, w) => math.abs(g - w) < 1e-10 })
    // Each recovered eigenvector matches the constructed one up to sign.
    order.zipWithIndex.foreach { case (c, k) =>
      val v = Array.tabulate(3)(row => vecs(row)(c))
      val dot = math.abs(v.zip(q.map(_(k))).map { case (x, y) => x * y }.sum)
      assert(math.abs(dot - 1.0) < 1e-10)
    }
  }

  test("Pca.fit finds the planted dominant direction; transform matches eigvals") {
    // 400 vectors: strong variance along u = (1,1,0,0)/sqrt2, weak along
    // v = (0,0,1,-1)/sqrt2, deterministic "noise" from hash mixing.
    val r = math.sqrt(2.0) / 2.0
    val rows = spark.range(400).select($"id",
      transform(sequence(lit(0), lit(3)), i =>
        ((pmod(xxhash64($"id", lit(1)), lit(2001L)).cast("double") / 1000.5 - 1.0) *
          when(i === 0 || i === 1, lit(3.0 * r)).otherwise(lit(0.0)) +
         (pmod(xxhash64($"id", lit(2)), lit(2001L)).cast("double") / 1000.5 - 1.0) *
          when(i === 2, lit(0.5 * r)).when(i === 3, lit(-0.5 * r)).otherwise(lit(0.0))
        ).cast("float")).as("vec"))
    val model = graft.ops.Pca.fit(rows, "vec", 2)
    assert(model.k === 2)
    // Dominant component aligns with u (up to sign, already fixed).
    val u = Array(r, r, 0.0, 0.0)
    val align = math.abs(model.components(0).zip(u).map { case (a, b) => a * b }.sum)
    assert(align > 0.999, s"component 0 misaligned: $align")
    // Projected population variance equals the eigenvalue, per component.
    val pv = graft.ops.Pca.transform(rows, "vec", model)
      .select(posexplode($"proj").as(Seq("j", "x")))
      .groupBy($"j").agg(var_pop($"x").as("v"))
      .orderBy($"j").collect().map(_.getDouble(1))
    pv.zip(model.eigenvalues).foreach { case (v, e) =>
      assert(math.abs(v - e) <= 1e-6 + 1e-6 * e, s"proj var $v vs eigval $e") }
    // Components are orthonormal.
    val g01 = model.components(0).zip(model.components(1))
      .map { case (a, b) => a * b }.sum
    val n0 = model.components(0).map(x => x * x).sum
    assert(math.abs(g01) < 1e-9 && math.abs(n0 - 1.0) < 1e-9)
  }

  test("Pca.whiten yields identity covariance and guards null directions") {
    // Same planted corpus as the fit test: strong u-direction, weak
    // v-direction, dims 0..3. Dimensions outside span(u, v) are exactly
    // degenerate (eigenvalue 0) — the eps guard must map them to ~0
    // rather than amplifying noise by 1/sqrt(~0).
    val r = math.sqrt(2.0) / 2.0
    val rows = spark.range(400).select($"id",
      transform(sequence(lit(0), lit(3)), i =>
        ((pmod(xxhash64($"id", lit(1)), lit(2001L)).cast("double") / 1000.5 - 1.0) *
          when(i === 0 || i === 1, lit(3.0 * r)).otherwise(lit(0.0)) +
         (pmod(xxhash64($"id", lit(2)), lit(2001L)).cast("double") / 1000.5 - 1.0) *
          when(i === 2, lit(0.5 * r)).when(i === 3, lit(-0.5 * r)).otherwise(lit(0.0))
        ).cast("float")).as("vec"))
    val model = graft.ops.Pca.fit(rows, "vec", 4)
    val w = rows.select(graft.ops.Pca.whiten($"vec", model).as("w"))
    val stats = w.select(posexplode($"w").as(Seq("j", "x")))
      .groupBy($"j").agg(avg($"x").as("m"), var_pop($"x").as("v"))
      .orderBy($"j").collect()
    // Informative directions (j = 0, 1): mean 0, variance 1.
    stats.take(2).foreach { s =>
      assert(math.abs(s.getDouble(1)) < 1e-7, s"mean ${s.getDouble(1)}")
      assert(math.abs(s.getDouble(2) - 1.0) < 1e-4, s"var ${s.getDouble(2)}")
    }
    // Degenerate directions (eigenvalue ~ 0): coordinates stay ~0, never
    // blown up by the reciprocal scaling.
    stats.drop(2).foreach { s =>
      assert(s.getDouble(2) < 1e-3, s"degenerate var ${s.getDouble(2)}") }
    // Cross-covariance of the informative pair is 0 (decorrelated).
    val cross = w.agg(
      avg(element_at($"w", 1) * element_at($"w", 2))).head.getDouble(0)
    assert(math.abs(cross) < 1e-4, s"cross-cov $cross")
    // Whitening is the plain projection rescaled per coordinate.
    val both = rows.select(
        graft.ops.Pca.project($"vec", model).as("p"),
        graft.ops.Pca.whiten($"vec", model).as("w"))
      .limit(5).collect()
    both.foreach { row =>
      val pr = row.getSeq[Double](0); val wh = row.getSeq[Double](1)
      model.eigenvalues.zipWithIndex.foreach { case (e, j) =>
        val scaled = pr(j) / math.sqrt(math.max(e, 0.0) + 1e-9)
        assert(math.abs(wh(j) - scaled) < 1e-9) }
    }
  }

  test("cdcUpsert is last-write-wins and batch-order independent") {
    val b1 = Seq((1L, 10L, 5.0, "x"), (2L, 10L, 6.0, "y")).toDF("k", "ts", "v", "s")
    val b2 = Seq((1L, 20L, 7.0, "z"),                      // newer -> wins
                 (2L, 5L, 1.0, "old"),                     // older -> loses
                 (3L, 1L, 2.0, "new")).toDF("k", "ts", "v", "s")
    val empty = b1.limit(0)
    def apply2(first: org.apache.spark.sql.DataFrame,
        second: org.apache.spark.sql.DataFrame) = {
      val t1 = graft.ops.Lake.cdcUpsert(empty, first, "k", Seq("ts"))
      graft.ops.Lake.cdcUpsert(t1, second, "k", Seq("ts"))
        .orderBy($"k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
        .toSeq
    }
    val want = Seq((1L, 20L, 7.0, "z"), (2L, 10L, 6.0, "y"), (3L, 1L, 2.0, "new"))
    assert(apply2(b1, b2) === want)
    assert(apply2(b2, b1) === want) // same table in either arrival order
    // In-batch duplicates reduce to the per-key winner before the join.
    val dup = Seq((9L, 1L, 1.0, "a"), (9L, 3L, 3.0, "c"), (9L, 2L, 2.0, "b"))
      .toDF("k", "ts", "v", "s")
    val one = graft.ops.Lake.cdcUpsert(empty, dup, "k", Seq("ts")).collect()
    assert(one.length === 1 && one(0).getString(3) === "c")
  }

  test("MIPS norm-augmentation preserves inner-product order under cosine") {
    // Un-normalized vectors whose cosine and inner-product orders differ:
    // the long vector wins on ip, the aligned unit vector wins on cosine.
    val rows = Seq(
      (1L, Array(10.0f, 0.0f)),
      (2L, Array(0.6f, 0.8f)),
      (3L, Array(2.0f, 2.0f)),
      (4L, Array(0.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val probes = Seq((100L, Array(1.0f, 0.5f))).toDF("vec_id", "embedding")
    val exact = Similarity.mipsTopK(rows, probes, "vec_id", "embedding", k = 4)
      .orderBy($"rnk").collect().map(_.getLong(2)).toSeq
    val m = rows.agg(max(graft.functions.vector.magnitude($"embedding")))
      .collect().head.getDouble(0)
    val aug = rows.select($"vec_id",
      Similarity.augmentCorpusForMips($"embedding", lit(m)).as("embedding"))
    val augProbes = probes.select($"vec_id",
      Similarity.augmentProbeForMips($"embedding").as("embedding"))
    val viaCosine = Similarity.bruteForceTopK(aug, augProbes,
        "vec_id", "embedding", k = 4, roundTo = 9)
      .orderBy($"rnk").collect().map(_.getLong(2)).toSeq
    assert(exact === viaCosine,
      "cosine order over augmented vectors must equal inner-product order")
  }

  test("partial-aggregating top-k equals the window form, ties included") {
    import org.apache.spark.sql.expressions.Window
    // Scores engineered with ties ACROSS partitions: the aggregator's
    // merge must break them identically to (score desc, id asc).
    val cand = (1L to 400L).map(i => (i % 4, i, (i % 7).toDouble))
      .toDF("query_id", "vid", "sim").repartition(8)
    val viaAgg = graft.ops.Similarity.rankTopK(cand, "vid", "sim", k = 5)
      .orderBy($"query_id", $"rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"vid")
    val viaWindow = cand.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5)
      .select($"query_id", $"rnk", $"vid".as("vec_id"), $"sim")
      .orderBy($"query_id", $"rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(viaAgg === viaWindow)
  }

  test("scd2Intervals collapses repeats and chains validity boundaries") {
    // user 1: a a b a -> intervals a[10,30) b[30,40) a[40,null)
    // user 2: single event -> one open interval
    val log = Seq(
      (1L, 10L, "a", 101L), (1L, 20L, "a", 102L),
      (1L, 30L, "b", 103L), (1L, 40L, "a", 104L),
      (2L, 15L, "x", 201L)
    ).toDF("user_id", "ts", "v", "event_id")
    val iv = graft.ops.Lake.scd2Intervals(log, "user_id", "ts", "v", "event_id")
      .orderBy($"user_id", $"valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSeq
    assert(iv === Seq(
      (1L, "a", 10L, Some(30L), false),
      (1L, "b", 30L, Some(40L), false),
      (1L, "a", 40L, None, true),
      (2L, "x", 15L, None, true)))
  }

  test("scd2Intervals breaks timestamp ties by the tie column") {
    val log = Seq((1L, 10L, "b", 2L), (1L, 10L, "a", 1L))
      .toDF("user_id", "ts", "v", "event_id")
    val iv = graft.ops.Lake.scd2Intervals(log, "user_id", "ts", "v", "event_id")
      .orderBy($"valid_from", $"v").collect()
      .map(r => (r.getString(1), r.getBoolean(4))).toSeq
    // order is (ts, event_id): a first (closed), then b (current)
    assert(iv === Seq(("a", false), ("b", true)))
  }

  test("selectUnderTokenBudget keeps the longest-first prefix that fits") {
    val docs = Seq(
      (1L, "s", 40L), (2L, "s", 30L), (3L, "s", 30L), (4L, "s", 10L),
      (5L, "t", 100L)
    ).toDF("doc_id", "source", "n_tokens")
    val sel = graft.ops.Sampling
      .selectUnderTokenBudget(docs, "doc_id", "n_tokens", 100L, "source")
      .orderBy($"source", $"cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    // s: 40 (cum 40), 30 (cum 70, id 2 before 3), 30 (cum 100); 10 overflows.
    assert(sel === Seq((1L, 40L), (2L, 70L), (3L, 100L), (5L, 100L)))
  }

  test("percentBandFilter trims both tails deterministically") {
    // 11 rows, ranks 0..10 -> percent_rank k/10; band [0.1, 0.9] keeps 1..9.
    val rows = (1L to 11L).map(i => (i, "s", i * 10L))
      .toDF("doc_id", "source", "v")
    val kept = graft.ops.Sampling
      .percentBandFilter(rows, "v", "doc_id", "source", 0.1, 0.9)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === (2L to 10L).toSet)
  }

  test("clusterScopedPairs ⊆ exact pairs; near-dups in one cluster are found") {
    // Two tight clusters around orthogonal axes + a planted near-dup in
    // each: SemDeDup must find both within-cluster dup pairs, and every
    // pair it emits must also be in the exact relation.
    def v(axis: Int, eps: Float, d: Int = 8): Array[Float] =
      Array.tabulate(d)(i => (if (i == axis) 1.0f else 0.0f) +
        (if (i == (axis + 1) % d) eps else 0.0f))
    val rows = Seq(
      (0L, v(0, 0.00f)), (1L, v(0, 0.05f)), (2L, v(0, 0.60f)),
      (10L, v(4, 0.00f)), (11L, v(4, 0.05f)), (12L, v(4, 0.60f)))
    val df = rows.toDF("vec_id", "embedding")
    val exact = graft.ops.Similarity
      .bruteForcePairs(df, "vec_id", "embedding", threshold = 0.9)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val clustered = graft.ops.Similarity
      .clusterScopedPairs(df, "vec_id", "embedding", threshold = 0.9, numCells = 2)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clustered.subsetOf(exact))
    // the two tight dup pairs live inside one cluster each — found
    assert(clustered.contains((0L, 1L)) && clustered.contains((10L, 11L)))

    // multi-probe: still a subset of exact, at least single-probe recall,
    // and no duplicate pair rows from multiply-shared cells
    val multi = graft.ops.Similarity
      .clusterScopedPairs(df, "vec_id", "embedding", threshold = 0.9,
        numCells = 2, probes = 2)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(multi.length === multi.distinct.length, "duplicate pair rows")
    assert(multi.toSet.subsetOf(exact))
    assert(clustered.subsetOf(multi.toSet))
  }

  test("CentroidTopK: k=1 equals CentroidArgmax; top-2 is ordered by cosine") {
    import graft.functions.{CentroidArgmax, CentroidTopK}
    val cents = Array(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0.7f, 0.7f, 0f, 0f))
    val ids = Array(10, 20, 30, 40)
    val vecs = Seq(
      (1L, Array(0.9f, 0.1f, 0f, 0f)),   // nearest 10, then 40
      (2L, Array(0.6f, 0.62f, 0f, 0f)),  // nearest 40, then 20
      (3L, Array(0f, 0f, 1f, 0.2f)))     // nearest 30
      .toDF("id", "v")
    val got = vecs.select($"id",
        CentroidArgmax($"v", ids, cents).as("a1"),
        CentroidTopK($"v", ids, cents, 1).as("t1"),
        CentroidTopK($"v", ids, cents, 2).as("t2"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2), r.getSeq[Int](3))).sortBy(_._1)
    got.foreach { case (_, a1, t1, _) => assert(t1 === Seq(a1)) }
    assert(got(0)._4 === Seq(10, 40))
    assert(got(1)._4 === Seq(40, 20))
    assert(got(2)._4.head === 30)
  }

  test("semDedupKeep keeps the min-id representative of each dup group") {
    def v(axis: Int, eps: Float, d: Int = 8): Array[Float] =
      Array.tabulate(d)(i => (if (i == axis) 1.0f else 0.0f) +
        (if (i == (axis + 1) % d) eps else 0.0f))
    // numCells = 2 so the dup trio cannot straddle more cells than the
    // two natural directions — with numCells close to n, k-means may
    // split a dup group and SemDeDup (correctly, by design) loses those
    // cross-cell pairs.
    val df = Seq(
      (0L, v(0, 0.00f)), (1L, v(0, 0.02f)), (2L, v(0, 0.04f)), // dup group
      (10L, v(4, 0.00f)), (20L, v(4, 0.60f)))                  // other arm
      .toDF("vec_id", "embedding")
    val kept = graft.ops.Similarity
      .semDedupKeep(df, "vec_id", "embedding", threshold = 0.95, numCells = 2)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 10L, 20L)) // 1 and 2 removed; min id 0 survives
  }

  test("rrfFuse sums reciprocal ranks and scores absent entries as 0") {
    val a = Seq((7L, 1), (8L, 2)).toDF("doc_id", "rnk")
    val b = Seq((8L, 1), (9L, 2)).toDF("doc_id", "rnk")
    val out = graft.ops.Similarity.rrfFuse(Seq(a, b), "doc_id", kRrf = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out(7L) === (1.0 / 61).round6)
    assert(out(8L) === (1.0 / 62 + 1.0 / 61).round6)
    assert(out(9L) === (1.0 / 62).round6)
  }

  private implicit class R6(val d: Double) {
    def round6: Double = BigDecimal(d).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("gopherQuality applies each rule and keeps only clean long docs") {
    val good = ("the quick brown fox of and " * 10).trim // 60 words, clean
    val short = "the of tiny doc here"                    // 5 words
    val bullets = "- one two three\n- four five six\n- seven eight nine"
    val symbols = ("the of " + "### ## # " * 30).trim     // symbol-heavy
    val dots = "the of line one...\nline two...\nline three is fine"
    val docs = Seq(
      (1L, good), (2L, short), (3L, bullets), (4L, symbols), (5L, dots))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("keep") === 1)
    assert(out(2L).getAs[Int]("keep") === 0) // under the 50-word floor
    assert(out(3L).getAs[Double]("bullet_line_ratio") === 1.0)
    assert(out(4L).getAs[Double]("symbol_ratio") > 0.1)
    assert(out(4L).getAs[Int]("keep") === 0)
    assert(out(5L).getAs[Double]("ellipsis_line_ratio") === 0.666667) // round 6
    // required-stopword floor: the good doc carries the/of/and = 3
    assert(out(1L).getAs[Int]("n_req_stopwords") === 3)
  }

  test("importanceWeights up-weights target-like token distributions") {
    // Target docs speak {aa bb}, raw background speaks {zz yy}: the
    // held-out doc speaking the target vocabulary must score above the
    // one speaking the background vocabulary.
    val docs = Seq(
      (1L, "aa bb aa bb", true), (2L, "aa bb bb aa", true),
      (3L, "zz yy zz yy", false), (4L, "zz yy yy zz", false),
      (5L, "aa aa bb bb", false), // target-like but not labeled target
      (6L, "zz zz yy yy", false))
      .toDF("doc_id", "text", "is_en")
    val w = graft.ops.TextAnalysis
      .importanceWeights(docs, "doc_id", "text", isTarget = $"is_en",
        buckets = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(w(5L) > w(6L)) // target-like beats background-like
    assert(w(1L) > 0 && w(3L) < 0)
    // weights are a pure function of content: identical bags score equal
    assert(w(1L) === w(2L))
  }

  test("nbQualityScores separates classes and scores unlabeled docs") {
    // Curated seed speaks {aa bb}, background seed {zz yy}: the unlabeled
    // doc speaking the curated vocabulary must score above the one
    // speaking background, and the seeds themselves must rank sanely.
    val docs = Seq(
      (1L, "aa bb aa bb", "pos"), (2L, "aa bb bb aa", "pos"),
      (3L, "zz yy zz yy", "neg"), (4L, "zz yy yy zz", "neg"),
      (5L, "aa aa bb bb", "unlabeled"),
      (6L, "zz zz yy yy", "unlabeled"))
      .toDF("doc_id", "text", "seed")
    val scores = graft.ops.TextAnalysis
      .nbQualityScores(docs, "doc_id", "text",
        isPositive = $"seed" === "pos", isNegative = $"seed" === "neg",
        buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(5L) > scores(6L))
    assert(scores(1L) > 0 && scores(3L) < 0)
    // pure function of content: identical bags score identically
    assert(scores(1L) === scores(2L))
    assert(scores(1L) === scores(5L))
  }

  test("hammingTopK ranks by true sign-bit disagreement") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val probes = emb.filter($"vec_id" < 3)
    val got = graft.ops.Quantize
      .hammingTopK(emb, probes, "vec_id", "embedding", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getInt(3)))
      .toMap
    // Reference: recompute sign bits + Hamming on the driver.
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def bits(v: Array[Float]): Array[Boolean] = v.map(_ > 0f)
    def ham(a: Long, b: Long): Int =
      bits(vecs(a)).zip(bits(vecs(b))).count(p => p._1 != p._2)
    for (q <- 0L to 2L) {
      val want = vecs.keys.filter(_ != q).toSeq
        .map(id => (ham(q, id), id)).sorted.take(5)
      val gotQ = (1 to 5).map(r => got((q, r)))
      assert(gotQ.map(_._1) === want.map(_._2), s"rank ids for query $q")
      assert(gotQ.map(_._2) === want.map(_._1), s"distances for query $q")
    }
  }

  test("binaryRerankTopK scores shortlisted candidates with exact cosine") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val probes = emb.filter($"vec_id" < 5)
    val rer = graft.ops.Quantize
      .binaryRerankTopK(emb, probes, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    val exact = Similarity
      .bruteForceTopK(emb, probes, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    // Re-ranked sims are TRUE cosines: wherever the shortlist recovered
    // an exact top-5 member, the score must agree to the rounding digit.
    val hits = rer.keySet intersect exact.keySet
    assert(hits.nonEmpty, "shortlist recovered none of the exact top-5")
    hits.foreach(k => assert(rer(k) === exact(k)))
  }

  test("duplicatedSpans merges overlapping gram hits into maximal spans") {
    // doc 1 and doc 2 share a 10-token run -> with k=4 the 7 gram hits
    // must merge to ONE span of 10 tokens; doc 3 shares nothing.
    val run = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $run gamma"),
      (2L, s"$run delta epsilon"),
      (3L, "nothing shared here at all by design, tokens differ"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup
      .duplicatedSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) === ((13L, 1L, 10L, 0.769231)))
    assert(out(2L) === ((12L, 1L, 10L, 0.833333)))
    assert(out(3L)._2 === 0L)
    assert(out(3L)._3 === 0L)
  }

  test("duplicatedSpans counts within-doc gram repeats") {
    // The same 4-token phrase twice in ONE doc: both occurrences are
    // duplicated spans (corpus-wide count > 1 includes same-doc).
    val docs = Seq(
      (1L, "p q r s xx yy p q r s"),
      (2L, "completely different text tokens here"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup
      .duplicatedSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((2L, 8L))) // two disjoint 4-token spans
    assert(out(2L) === ((0L, 0L)))
  }

  test("domainDivergence: corpus-like domain scores near 0, skewed domain high") {
    // Domain "mix" mirrors the corpus mixture; domain "skew" is all one
    // token. KL(skew || corpus) must dominate, and every KL is >= 0 up to
    // the round-at-4 contract.
    val docs = (Seq.tabulate(40)(i => (i.toLong, "mix", "a b c d")) ++
      Seq.tabulate(10)(i => (100L + i, "skew", "a a a a")))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.domainDivergence(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("mix")._1 === 160L && out("mix")._2 === 4L)
    assert(out("skew")._1 === 40L && out("skew")._2 === 1L)
    assert(out.values.forall(_._3 >= -0.0001))
    assert(out("skew")._3 > out("mix")._3 + 0.5,
      s"skewed domain must diverge far more: $out")
    // Single-domain corpus: its distribution IS the corpus -> KL == 0.
    val one = TextAnalysis.domainDivergence(
      docs.filter($"source" === "mix"), "doc_id", "text", "source")
      .collect()
    assert(one.length === 1 && one.head.getDouble(3) === 0.0)
  }

  test("temperatureMix flattens skewed domains and is partition-invariant") {
    val docs = (Seq.tabulate(400)(i => (i.toLong, "big")) ++
      Seq.tabulate(25)(i => (1000L + i, "small")))
      .toDF("doc_id", "domain")
    val out = graft.ops.Sampling.temperatureMix(docs, "doc_id", "domain",
      budget = 100L)
    val byDom = out.groupBy($"domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt temperature: w_big = 20/25, w_small = 5/25 -> rates 0.2 and
    // 0.8 — the big domain samples at a 4x LOWER rate than the small one.
    val rateBig = byDom("big") / 400.0
    val rateSmall = byDom("small") / 25.0
    assert(rateBig < rateSmall / 2,
      s"big domain must be down-sampled harder: $byDom")
    // Sampled set is a pure function of ids: any partitioning, same rows.
    val again = graft.ops.Sampling.temperatureMix(docs.repartition(13),
      "doc_id", "domain", budget = 100L)
    assert(again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("v21 cluster diagnostics and p03 data card hold their contracts") {
    val diag = SparkEntry.queries("v21_cluster_diag")(spark, sf).collect()
    assert(diag.length === 1)
    assert(diag.head.getBoolean(2), "assign_ok must hold")
    assert(diag.head.getBoolean(3), "separation_ok must hold")

    val card = SparkEntry.queries("p03_data_card")(spark, sf).collect()
    val docs = graft.queries.Tables(spark, sf).documents
    assert(card.map(_.getLong(1)).sum === docs.count(),
      "per-source doc counts must partition the corpus")
    // Every near-dup count is bounded by its source's doc count, and the
    // card's totals column matches the independent token recount.
    assert(card.forall(r => r.getLong(4) <= r.getLong(1)))
    val tokTotal = docs.select(
      sum(size(graft.ops.Dedup.tokens($"text"))).cast("long")).head.getLong(0)
    assert(card.map(_.getLong(2)).sum === tokTotal)
  }

  test("d10 overlap matrix is canonically ordered with positive counts") {
    val m = SparkEntry.queries("d10_source_overlap")(spark, sf).collect()
    assert(m.nonEmpty)
    assert(m.forall(r => r.getString(0) <= r.getString(1)),
      "source pairs must be canonicalized (a <= b)")
    assert(m.forall(r => r.getLong(2) > 0 && r.getLong(3) >= r.getLong(2)),
      "each doc pair shares at least one fingerprint")
  }

  test("io08 bucketed join equals the plain parquet join") {
    val t = graft.queries.Tables(spark, sf)
    val expect = t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("revenue"))
      .orderBy($"o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = SparkEntry.queries("io08_bucketed_join")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === expect.toSeq)
  }

  test("containmentPairs: embedded doc has containment 1.0, low jaccard") {
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val small = (10 to 16).map(i => s"w$i").mkString(" ") // strict substring
    val docs = Seq((1L, big), (2L, small),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8")).toDF("doc_id", "text")
    val cand = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val rows = Dedup.containmentPairs(docs, "doc_id", "text", cand)
      .orderBy($"doc_b").collect()
    assert(rows.length === 2)
    val inc = rows(0) // (1, 2): every shingle of the small doc is in the big
    assert(inc.getAs[Double]("containment") === 1.0)
    assert(inc.getAs[Double]("jaccard") < 0.2,
      "asymmetric inclusion must NOT look like a symmetric near-dup")
    val disjoint = rows(1) // (1, 3): nothing shared
    assert(disjoint.getAs[Double]("containment") === 0.0)
  }

  test("distinctiveTerms ranks a domain-unique token above shared vocab") {
    val docs = Seq(
      (1L, "common common quantum quantum quantum", "physics"),
      (2L, "common common genome genome genome", "biology"),
      (3L, "common genome quantum", "mixed")
    ).toDF("doc_id", "text", "domain")
    val top = TextAnalysis.distinctiveTerms(docs, "doc_id", "text",
        "domain", topK = 1)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    // "common" appears in every domain -> idf ln(1+3/3)=ln 2 but tf is
    // diluted; the domain-heavy token wins in its home domain.
    assert(top("physics") === "quantum")
    assert(top("biology") === "genome")
  }

  test("scrubDuplicatedSpans cuts exactly the shared-gram spans") {
    val docs = Seq(
      (1L, "u1 u2 a b c u3 u4"),
      (2L, "v1 a b c v2"),
      (3L, "w1 w2 w3")
    ).toDF("doc_id", "text")
    val out = Dedup.scrubDuplicatedSpans(docs, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect()
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getAs[Long]("kept_tokens") === 4L)
    assert(out(0).getAs[String]("scrub_md5") === md5Of("u1 u2 u3 u4"))
    assert(out(1).getAs[Long]("kept_tokens") === 2L)
    assert(out(1).getAs[String]("scrub_md5") === md5Of("v1 v2"))
    // No duplicated gram -> untouched (rejoined with single spaces).
    assert(out(2).getAs[Long]("kept_tokens") === 3L)
    assert(out(2).getAs[String]("scrub_md5") === md5Of("w1 w2 w3"))
  }

  test("snapshotDiff classifies inserts/deletes/updates with null-safe compare") {
    val before = Seq((1L, Some("a"), 1.0), (2L, Some("b"), 2.0),
      (3L, None: Option[String], 3.0), (4L, Some("d"), 4.0))
      .toDF("k", "v", "x")
    val after = Seq((1L, Some("a"), 1.0),           // unchanged -> omitted
      (2L, Some("B"), 2.0),                          // value change
      (3L, Some("c"), 3.0),                          // NULL -> c is a change
      (5L, None: Option[String], 5.0))               // new key, null value
      .toDF("k", "v", "x")
    val got = graft.ops.Lake.snapshotDiff(before, after, "k", Seq("v", "x"))
      .select($"k", $"change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "updated", 3L -> "updated",
      4L -> "deleted", 5L -> "inserted"))
  }

  test("cdcChunks tiles each doc exactly and survives a front insertion") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy($"n_chars".desc).limit(1)
      .select($"doc_id", $"text")
    val tiling = TextAnalysis.cdcChunks(docs, "doc_id", "text")
      .groupBy($"doc_id").agg(sum($"len").as("covered"),
        min($"start").as("first"), count(lit(1)).as("n_chunks"))
      .join(docs.select($"doc_id", length($"text").as("n")), "doc_id")
      .collect()(0)
    assert(tiling.getAs[Long]("covered") === tiling.getAs[Int]("n").toLong)
    assert(tiling.getAs[Long]("first") === 0L)
    assert(tiling.getAs[Long]("n_chunks") > 2, "fixture long enough to chunk")

    // The CDC property: prepend an edit; every original chunk except the
    // first (whose bytes the insertion touches) keeps its identity.
    val edited = docs.select($"doc_id",
      concat(lit("EDITED PREFIX 123 "), $"text").as("text"))
    val orig = TextAnalysis.cdcChunks(docs, "doc_id", "text")
      .orderBy($"chunk_idx").collect().map(_.getAs[String]("chunk_md5"))
    val after = TextAnalysis.cdcChunks(edited, "doc_id", "text")
      .collect().map(_.getAs[String]("chunk_md5")).toSet
    assert(orig.drop(1).forall(after.contains),
      "all original chunks past the edit keep their content hash")
  }

  test("ndcgAtK matches the hand-computed discounted gains") {
    val run = Seq(("a", 1), ("b", 2)).toDF("id", "rnk")
    val truth = Seq(("a", 1.0), ("c", 3.0), ("b", 2.0)).toDF("id", "gain")
    val r = Similarity.ndcgAtK(run, truth, "id", k = 2).collect()(0)
    // DCG = 1.0 + 2.0*ln2/ln3 = 2.2619; IDCG = 3.0 + 2.0*ln2/ln3 = 4.2619
    assert(r.getAs[Double]("dcg") === 2.2619)
    assert(r.getAs[Double]("idcg") === 4.2619)
    assert(r.getAs[Double]("ndcg") === 0.5307)
    // A run that ranks truth's own top-k in order scores exactly 1.0.
    val ideal = Seq(("c", 1), ("b", 2)).toDF("id", "rnk")
    val p = Similarity.ndcgAtK(ideal, truth, "id", k = 2).collect()(0)
    assert(p.getAs[Double]("ndcg") === 1.0)
  }

  test("prototypicalityPrune drops exactly floor(eps*cell) core points") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val marked = Similarity.prototypicalityPrune(emb, "vec_id", "embedding",
      epsilon = 0.25, numCells = 4)
    val perCell = marked.groupBy($"cell", $"cell_n")
      .agg(sum(when($"dropped", 1L).otherwise(0L)).as("nd"),
        avg(when($"dropped", $"proto")).as("dm"),
        avg(when(!$"dropped", $"proto")).as("km"))
      .collect()
    assert(perCell.nonEmpty)
    perCell.foreach { r =>
      val expect = (r.getAs[Long]("cell_n") * 0.25).toLong
      assert(r.getAs[Long]("nd") === expect, s"cell ${r.get(0)} drop count")
      if (expect > 0)
        assert(r.getAs[Double]("dm") > r.getAs[Double]("km"),
          "dropped core must be more prototypical than the kept periphery")
    }
  }

  test("DhashBits is bit-identical to the HOF md5-gray-compare chain") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
      // Planted multibyte/edge rows: the digest bytes must come from the
      // same UTF-8 encoding the HOF md5(concat(...)) hashes. The NULL row
      // pins null propagation: the fused expression is null-safe (NULL
      // text -> NULL hash), and the comparison maps the HOF side through
      // the same contract below — the RAW HOF fold would instead coerce
      // the all-null gray array to hi=lo=0 via if(null)->0L, which is an
      // accident of the fold encoding, not dhash semantics.
      .unionByName(Seq((900001L, Some("")), (900002L, Some("héllo ☃ wörld")),
        (900003L, Some("a")), (900004L, Option.empty[String]))
        .toDF("doc_id", "text"))
    val hof = docs
      .withColumn("g", expr(
        "flatten(transform(" +
          "transform(sequence(0, 4), j -> " +
          "md5(concat(text, ':g', cast(j as string)))), " +
          "m -> transform(sequence(0, 15), b -> " +
          "cast(conv(substring(m, b * 2 + 1, 2), 16, 10) as bigint))))"))
      .withColumn("hi", expr(
        "aggregate(sequence(0, 31), 0L, (acc, b) -> acc + " +
          "if(element_at(g, cast((b div 8) * 9 + (b % 8) + 2 as int)) > " +
          "element_at(g, cast((b div 8) * 9 + (b % 8) + 1 as int)), " +
          "shiftleft(1L, b), 0L))"))
      .withColumn("lo", expr(
        "aggregate(sequence(32, 63), 0L, (acc, b) -> acc + " +
          "if(element_at(g, cast((b div 8) * 9 + (b % 8) + 2 as int)) > " +
          "element_at(g, cast((b div 8) * 9 + (b % 8) + 1 as int)), " +
          "shiftleft(1L, b - 32), 0L))"))
      .select($"doc_id",
        when($"text".isNotNull, $"hi").as("hi"),
        when($"text".isNotNull, $"lo").as("lo"))
    val fused = docs
      .withColumn("hl", graft.functions.DhashBits($"text"))
      .select($"doc_id", $"hl".getItem(0).as("hi"), $"hl".getItem(1).as("lo"))
    assert(hof.exceptAll(fused).isEmpty && fused.exceptAll(hof).isEmpty,
      "fused dhash must equal the HOF form row-for-row")
  }

  test("UniBiGramPairs is element-identical to the HOF uni+bi chain") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
      // Edge shapes: empty, single token, repeated/leading/trailing/double
      // spaces, multibyte tokens, and NULL (both sides must propagate
      // NULL: flatten(<null inner array>) on the HOF side, nullSafeEval
      // on the fused side).
      .unionByName(Seq((910001L, Some("")), (910002L, Some("one")),
        (910003L, Some("  a  b ")), (910004L, Some("héllo ☃ wörld")),
        (910005L, Some(" ")), (910006L, Option.empty[String]))
        .toDF("doc_id", "text"))
    val hof = docs.select($"doc_id", flatten(transform(
      array(graft.ops.Dedup.tokens($"text")), tks =>
        concat(
          transform(tks, tk =>
            struct(lit("uni").as("kind"), tk.as("gram"))),
          transform(
            when(size(tks) >= 2, sequence(lit(0), size(tks) - 2))
              .otherwise(array().cast("array<int>")),
            i => struct(lit("bi").as("kind"),
              concat_ws(" ", element_at(tks, i + 1),
                element_at(tks, i + 2)).as("gram")))))).as("g"))
    val fused = docs.select($"doc_id",
      graft.functions.UniBiGramPairs($"text").as("g"))
    // Arrays compared whole: order (unis in token order, then bis) must
    // match too, not just the multiset.
    assert(hof.exceptAll(fused).isEmpty && fused.exceptAll(hof).isEmpty,
      "fused gram pairs must equal the HOF form array-for-array")
  }

  test("RepetitionStats is value-identical to the sorted-fold HOF chain") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
      // Edges: empty, single token, dominant repeated bigram, all-same
      // token, multi-space, multibyte, and NULL (the HOF fold yields
      // top=0 for NULL — the `otherwise(array())` branch — which
      // repetitionMetrics preserves via coalesce; the raw struct is NULL).
      .unionByName(Seq((920001L, Some("")), (920002L, Some("one")),
        (920003L, Some("a b a b a b")), (920004L, Some("x x x x")),
        (920005L, Some("  a  b ")), (920006L, Some("héllo ☃ wörld ☃ héllo ☃")),
        (920007L, Option.empty[String])).toDF("doc_id", "text"))
    // The pre-round-11 HOF form, inlined: sorted bigram array + 3-field
    // run-length aggregate fold.
    val toks = graft.ops.Dedup.tokens($"text")
    val hofBase = docs.select($"doc_id", toks.as("toks"))
      .select($"doc_id", $"toks",
        when(size($"toks") >= 2,
          array_sort(transform(sequence(lit(0), size($"toks") - 2),
            i => concat_ws(" ", element_at($"toks", i + 1),
              element_at($"toks", i + 2)))))
          .otherwise(array().cast("array<string>")).as("bgs"))
    val top = aggregate($"bgs",
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val hof = hofBase.select($"doc_id",
      size($"toks").as("n_tokens"),
      size(array_distinct($"toks")).as("n_distinct"),
      when(size($"toks") >= 2, size($"toks") - 1).otherwise(
        when($"toks".isNotNull, 0)).as("n_bigrams"),
      top.as("top_bigram_n"))
    val fused = docs.select($"doc_id",
        graft.functions.RepetitionStats($"text").as("st"))
      .select($"doc_id", $"st.n_tokens", $"st.n_distinct", $"st.n_bigrams",
        coalesce($"st.top_bigram_n", lit(0)).as("top_bigram_n"))
    assert(hof.exceptAll(fused).isEmpty && fused.exceptAll(hof).isEmpty,
      "fused repetition stats must equal the HOF form row-for-row")
  }

  test("BigramStructs is element-identical to the transform/element_at chain") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
      .unionByName(Seq((930001L, Some("")), (930002L, Some("one")),
        (930003L, Some("a b")), (930004L, Some("a b a b c")),
        (930005L, Some("héllo ☃ wörld")), (930006L, Option.empty[String]))
        .toDF("doc_id", "text"))
      .select($"doc_id", graft.ops.Dedup.tokens($"text").as("toks"))
      // bigramPerplexity applies this filter before either form runs (its
      // NULL/short-doc rows never reach the pair walk); sequence(0, -1)
      // on the raw HOF side would throw below it.
      .filter(size($"toks") >= 2)
    val hof = docs.select($"doc_id",
      transform(sequence(lit(0), size($"toks") - 2),
        i => struct(element_at($"toks", i + 1).as("w1"),
          element_at($"toks", i + 2).as("w2"))).as("bg"))
    val fused = docs.select($"doc_id",
      graft.functions.BigramStructs($"toks").as("bg"))
    assert(hof.exceptAll(fused).isEmpty && fused.exceptAll(hof).isEmpty,
      "fused bigram structs must equal the HOF form array-for-array")
  }
}
