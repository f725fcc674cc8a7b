package graft

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.CharEntropy
import graft.ops.{Multimodal, Sampling, Similarity}

/** Round-5 late additions: weighted sampling, soft dedup, semantic
  * decontamination, character entropy, and perceptual image hashing.
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- weightedSample (Efraimidis–Spirakis A-ES) ----

  test("weightedSample is k-sized, partition-invariant, and length-biased") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val k = 20
    val one = Sampling.weightedSample(docs, "doc_id", "n_chars", k, "t1")
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(one.size === k)
    assert(one.distinct.size === k)
    val again = Sampling.weightedSample(docs.repartition(7), "doc_id",
        "n_chars", k, "t1")
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(one === again, "selection must not depend on partitioning")
    // Length-weighted keys overrepresent long documents: the sampled mean
    // n_chars must exceed the corpus mean (deterministic data + salt).
    val sampleMean = Sampling.weightedSample(docs, "doc_id", "n_chars",
        k, "t1")
      .agg(avg($"n_chars")).head.getDouble(0)
    val corpusMean = docs.agg(avg($"n_chars")).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("weightedSample with a dominating weight always selects that row") {
    val rows = (1L to 100L).map(i => (i, if (i == 42L) 1000000L else 1L))
      .toDF("doc_id", "w")
    (1 to 5).foreach { s =>
      val got = Sampling.weightedSample(rows, "doc_id", "w", 3, s"salt$s")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(got.contains(42L),
        s"weight 10^6 row missing from top-3 under salt$s")
    }
  }

  // ---- softDedupWeights ----

  test("softDedupWeights assigns 1/|cluster| and preserves effective mass") {
    val docs = Seq(
      (1L, "aaa"), (2L, "aaa"), (3L, "aaa"),
      (4L, "bbb"), (5L, "bbb"),
      (6L, "ccc")).toDF("doc_id", "text")
    val w = Sampling.softDedupWeights(docs, md5($"text"))
      .select($"doc_id", $"cluster_size", $"soft_weight")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(w(1L) === ((3L, 1.0 / 3)))
    assert(w(4L) === ((2L, 0.5)))
    assert(w(6L) === ((1L, 1.0)))
    val mass = w.values.map(_._2).sum
    assert(math.abs(mass - 3.0) < 1e-12,
      "total soft weight must equal the distinct-cluster count")
  }

  // ---- semanticDecontaminate ----

  test("semanticDecontaminate flags planted paraphrases with their source probe") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val probes = emb.filter($"vec_id" < 10)
    val planted = probes.select(($"vec_id" + 5000L).as("vec_id"),
      transform($"embedding",
        (x, i) => when(i < 8, lit(0.0f)).otherwise(x)).as("embedding"))
    val corpus = emb.filter($"vec_id" >= 10).unionByName(planted)
    val hits = Similarity.semanticDecontaminate(corpus, probes,
        "vec_id", "embedding", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(hits === (0L until 10L).map(i => (i + 5000L, i)),
      "each planted copy must match exactly its source probe")
  }

  test("semanticDecontaminateLsh equals the broadcast-exact path on planted data") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val probes = emb.filter($"vec_id" < 10)
    val planted = probes.select(($"vec_id" + 5000L).as("vec_id"),
      transform($"embedding",
        (x, i) => when(i < 8, lit(0.0f)).otherwise(x)).as("embedding"))
    val corpus = emb.filter($"vec_id" >= 10).unionByName(planted)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val exact = rows(Similarity.semanticDecontaminate(corpus, probes,
      "vec_id", "embedding", threshold = 0.8))
    val lsh = rows(Similarity.semanticDecontaminateLsh(corpus, probes,
      "vec_id", "embedding", threshold = 0.8))
    assert(lsh === exact,
      "bucket-routed decontamination must find the planted set the exact path finds")
  }

  // ---- CharEntropy ----

  test("CharEntropy matches closed forms and handles code points") {
    def h(s: String): Double =
      CharEntropy.compute(UTF8String.fromString(s))
    assert(h("") === 0.0)
    assert(h("aaaa") === 0.0)
    assert(math.abs(h("ab") - math.log(2)) < 1e-12)
    assert(math.abs(h("abcd") - math.log(4)) < 1e-12)
    // 2-of-3 / 1-of-3 distribution; the emoji is a supplementary-plane
    // code point (2 UTF-16 units) and must count ONCE per occurrence.
    val p1 = 2.0 / 3; val p2 = 1.0 / 3
    val want = -(p1 * math.log(p1) + p2 * math.log(p2))
    assert(math.abs(h("😀😀a") - want) < 1e-12)
  }

  test("CharEntropy interpreted eval matches the codegen'd query path") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val viaQuery = docs.select($"doc_id",
        CharEntropy($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = BoundReference(0, StringType, nullable = true)
    val expr = graft.functions.CharEntropy(ref)
    docs.select($"doc_id", $"text").collect().foreach { r =>
      val interp = expr.eval(InternalRow(UTF8String.fromString(r.getString(1))))
        .asInstanceOf[Double]
      assert(interp === viaQuery(r.getLong(0)),
        s"interpreted/codegen divergence on doc ${r.getLong(0)}")
    }
  }

  // ---- Lake versioned table ----

  test("versioned table: write, time travel, vacuum, and fail-fast reads") {
    import graft.ops.Lake
    val dir = s"/root/repo/target/graft-io/lakever_${System.nanoTime()}"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      assert(Lake.versions(spark, dir) === Seq.empty)
      assert(Lake.writeVersion(Seq((1L, "a")).toDF("k", "v"), dir) === 1L)
      assert(Lake.writeVersion(Seq((1L, "b"), (2L, "c")).toDF("k", "v"), dir) === 2L)
      assert(Lake.writeVersion(Seq((3L, "d")).toDF("k", "v"), dir) === 3L)
      assert(Lake.versions(spark, dir) === Seq(1L, 2L, 3L))
      // time travel: explicit version and latest
      assert(Lake.readVersion(spark, dir, Some(1L)).count() === 1L)
      assert(Lake.readVersion(spark, dir).collect().map(_.getString(1)).toSeq
        === Seq("d"))
      // retention keeps a contiguous SUFFIX
      assert(Lake.vacuum(spark, dir, keepLast = 2) === Seq(1L))
      assert(Lake.versions(spark, dir) === Seq(2L, 3L))
      // vacuumed and unknown versions fail fast, not empty-scan
      intercept[java.util.NoSuchElementException] {
        Lake.readVersion(spark, dir, Some(1L))
      }
      intercept[java.util.NoSuchElementException] {
        Lake.readVersion(spark, dir, Some(9L))
      }
      // next write continues the sequence past the vacuumed range
      assert(Lake.writeVersion(Seq((4L, "e")).toDF("k", "v"), dir) === 4L)
    } finally fs.delete(p, true)
  }

  // ---- dHash + hammingPairs ----

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def gradientImage(w: Int, h: Int, shift: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.min(255, x * 255 / w + shift)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("dHash survives resize and brightness; separates unrelated images") {
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val base = Multimodal.dHash(png(gradientImage(64, 48, 0))).get
    val resized = Multimodal.dHash(png(gradientImage(128, 96, 0))).get
    val brighter = Multimodal.dHash(png(gradientImage(64, 48, 30))).get
    assert(ham(base, resized) <= 6,
      s"resize moved dHash by ${ham(base, resized)} bits")
    assert(ham(base, brighter) <= 6,
      s"brightness shift moved dHash by ${ham(base, brighter)} bits")
    // Unrelated content: a vertical gradient flips most row-gradient bits.
    val vert = new java.awt.image.BufferedImage(64, 48,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val v = ((x * 7919 + y * 104729) % 256)
      vert.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val noise = Multimodal.dHash(png(vert)).get
    assert(ham(base, noise) > 16,
      s"unrelated images only ${ham(base, noise)} bits apart")
    // Determinism: same payload, same hash.
    assert(Multimodal.dHash(png(gradientImage(64, 48, 0))).get === base)
  }

  test("dHashBits sets exactly the strict-gradient bits") {
    val gray = Array.tabulate(72L.toInt)(i => (i % 9).toLong) // ascending rows
    val (hi, lo) = Multimodal.dHashBits(gray.map(_.toLong))
    assert(hi === 0xffffffffL && lo === 0xffffffffL) // every gradient rises
    val flat = Array.fill(72)(5L)
    assert(Multimodal.dHashBits(flat) === ((0L, 0L))) // strict >: no bits
  }

  test("edge cases: degenerate k, empty clusters, zero radius, over-vacuum") {
    // weightedSample with k > n returns every row, still ordered by key.
    val tiny = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "w")
    assert(Sampling.weightedSample(tiny, "doc_id", "w", 50, "s").count() === 2L)
    // hammingPairs at radius 0 finds exactly the identical-hash pairs.
    val dup = Seq((1L, 7L, 9L), (2L, 7L, 9L), (3L, 8L, 9L))
      .toDF("media_id", "hi", "lo")
    val same = Multimodal.hammingPairs(dup, "media_id", "hi", "lo", 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(same === Seq((1L, 2L, 0)))
    // radius above the pigeonhole guarantee is rejected, not silently lossy.
    intercept[IllegalArgumentException] {
      Multimodal.hammingPairs(dup, "media_id", "hi", "lo", 4)
    }
    // vacuum keeping more versions than exist deletes nothing; keep < 1
    // is rejected.
    import graft.ops.Lake
    val dir = s"/root/repo/target/graft-io/lakever2_${System.nanoTime()}"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      Lake.writeVersion(Seq((1L, "a")).toDF("k", "v"), dir)
      assert(Lake.vacuum(spark, dir, keepLast = 5) === Seq.empty)
      assert(Lake.versions(spark, dir) === Seq(1L))
      intercept[IllegalArgumentException] { Lake.vacuum(spark, dir, 0) }
    } finally fs.delete(p, true)
  }

  test("hammingPairs equals the exact cross-join result on planted flips") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 150L).map(i =>
      (i, rnd.nextLong() & 0xffffffffL, rnd.nextLong() & 0xffffffffL))
    val planted = base.take(30).map { case (i, hi, lo) =>
      (i + 10000L, hi ^ (1L << (i % 32).toInt), lo ^ (1L << ((i * 3 + 5) % 32).toInt))
    }
    val all = base ++ planted
    val df = all.toDF("media_id", "hi", "lo")
    val got = Multimodal.hammingPairs(df, "media_id", "hi", "lo", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (ia, ha, la) <- all; (ib, hb, lb) <- all if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 3
    } yield (ia, ib, d)).toSet
    assert(want.size >= 30, "planted pairs must be present in the truth set")
    assert(got === want)
  }

  // ---- lshBandingSweep (dedup tuning curve) ----

  test("lshBandingSweep nests: candidates/verified nondecreasing in bands") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.ops.Dedup.lshBandingSweep(docs, "doc_id", "text",
        threshold = 0.5)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq(4, 8, 16))
    // Contiguous band slicing: matching an r-row band implies matching
    // both r/2-row halves, so each config's candidate set contains the
    // previous one's — counts must be monotone.
    assert(out.sliding(2).forall { case Array(a, b) =>
      b._2 >= a._2 && b._3 >= a._3 })
    // The b=8 row IS the production configuration: its verified count
    // must equal the d02 pair relation exactly.
    val d02 = graft.ops.Dedup.nearDuplicatesMinhash(docs, "doc_id", "text",
      threshold = 0.5).count()
    assert(out.find(_._1 == 8).get._3 === d02)
  }

  // ---- flattenBands (distribution matching) ----

  test("flattenBands yields an exactly uniform band histogram") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("band", least(expr("n_chars div 200"), lit(3)).cast("int"))
    val before = docs.groupBy($"band").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val m = before.values.min
    val after = graft.ops.Sampling.flattenBands(docs, "doc_id", "band", "t")
      .groupBy($"band").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after.keySet === before.keySet)
    assert(after.values.toSet === Set(m),
      s"every band must keep exactly the min count $m: $after")
    // Partition invariance: membership is a pure function of (id, salt).
    val a = graft.ops.Sampling.flattenBands(docs, "doc_id", "band", "t")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.ops.Sampling.flattenBands(docs.repartition(7), "doc_id",
        "band", "t")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // A different salt picks a different (same-sized) subset: the rank
    // key is really salted, not an id sort in disguise.
    val c = graft.ops.Sampling.flattenBands(docs, "doc_id", "band", "u")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(c.size === a.size)
    assert(c !== a)
  }

  // ---- ngramNovelty (memorization-risk scoring) ----

  test("ngramNovelty scores corpus-unique grams per doc, hand-checked") {
    val docs = Seq(
      (1L, "a b c"),   // 2-grams: "a b" (shared with doc 2), "b c"
      (2L, "a b x"),   // "a b", "b x"
      (3L, "z z"),     // "z z" — corpus-unique
      (4L, "q"),       // shorter than k: no grams, null novelty
      (5L, "m m m")    // "m m" twice WITHIN the doc -> one distinct gram,
    ).toDF("doc_id", "text") // still novel (df counts docs, not positions)
    val out = graft.ops.Dedup.ngramNovelty(docs, "doc_id", "text", k = 2)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))
    assert(out.toSeq === Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 1L, 1L, 1.0),
      (4L, 0L, 0L, -1.0), (5L, 1L, 1L, 1.0)))
  }

  test("ngramNovelty is partition-invariant and bounded in [0, 1]") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = graft.ops.Dedup.ngramNovelty(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val b = graft.ops.Dedup.ngramNovelty(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(a === b)
    val bad = graft.ops.Dedup.ngramNovelty(docs, "doc_id", "text")
      .filter(col("novelty") < 0 || col("novelty") > 1 ||
        col("novel_grams") > col("n_grams")).count()
    assert(bad === 0L)
  }

  // ---- lineDedup (CCNet line-level boilerplate removal) ----

  test("lineDedup strips lines shared by >= minDocs docs, keeps unique lines in order") {
    val docs = ((1L to 30L).map(i => (i, s"HEADER\nbody $i first\nbody $i second\nFOOTER")) ++
      Seq((31L, "only unique content"), (32L, "HEADER")))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.lineDedup(docs, "doc_id", "text", minDocs = 10)
      .orderBy($"doc_id").collect()
    val d1 = out.find(_.getLong(0) == 1L).get
    assert(d1.getLong(1) === 4L && d1.getLong(2) === 2L)
    assert(d1.getString(3) === "body 1 first\nbody 1 second",
      "surviving lines must keep original order")
    // Doc 31: nothing shared, nothing removed.
    val d31 = out.find(_.getLong(0) == 31L).get
    assert(d31.getLong(2) === 0L && d31.getString(3) === "only unique content")
    // Doc 32 is ALL boilerplate: empty survivor text, not null.
    val d32 = out.find(_.getLong(0) == 32L).get
    assert(d32.getLong(1) === 1L && d32.getLong(2) === 1L)
    assert(d32.getString(3) === "")
  }

  test("lineDedup is partition-invariant and counts doc frequency, not occurrences") {
    // One doc repeats a line 9 times; 9 occurrences in ONE doc must not
    // reach the minDocs=3 document-frequency bar.
    val docs = (Seq((100L, Seq.fill(9)("echo echo").mkString("\n"))) ++
      (1L to 3L).map(i => (i, s"shared line\nbody $i")))
      .toDF("doc_id", "text")
    val one = graft.ops.TextAnalysis.lineDedup(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    val two = graft.ops.TextAnalysis.lineDedup(docs.repartition(7), "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(one === two, "result must not depend on partitioning")
    assert(one.find(_._1 == 100L).get._2 === 0L,
      "within-doc repetition must not count as cross-doc boilerplate")
    assert(one.find(_._1 == 1L).get === ((1L, 1L, "body 1")))
  }

  // ---- vocabGrowth (Heaps'-law vocabulary audit) ----

  test("vocabGrowth computes exact closed-form stats per domain") {
    val docs = Seq(
      (1L, "a a a b", "rep"),    // N=4 V=2 hapax=1
      (2L, "x y z", "uniq"))     // N=3 V=3 hapax=3
      .toDF("doc_id", "text", "source")
    val out = graft.ops.TextAnalysis.vocabGrowth(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(out === Seq(
      ("rep", 4L, 2L, 1L, 0.5, 0.5,
        BigDecimal(math.log(2) / math.log(4)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("uniq", 3L, 3L, 3L, 1.0, 1.0, 1.0)))
  }

  // ---- embedAudit (pre-index embedding QA gate) ----

  test("embedAudit flags zero, NaN, Inf, ragged, and duplicate vectors") {
    val vecs = Seq(
      (1L, Array(3f, 4f)),                        // norm 5
      (2L, Array(3f, 4f)),                        // exact dup of 1
      (3L, Array(0f, 0f)),                        // zero vector
      (4L, Array(Float.NaN, 1f)),                 // NaN element
      (5L, Array(Float.PositiveInfinity, 0f)),    // Inf element
      (6L, Array(1f, 0f, 0f)))                    // ragged (3 dims)
      .toDF("vec_id", "embedding")
    val r = Similarity.embedAudit(vecs, "embedding").head()
    assert(r.getLong(0) === 6L, "n_vecs")
    assert((r.getInt(1), r.getInt(2)) === ((2, 3)), "dims envelope")
    assert(r.getLong(3) === 1L, "n_zero")
    assert(r.getLong(4) === 2L, "n_nonfinite counts NaN and Inf")
    assert(r.getLong(5) === 1L, "one exact duplicate pair collapses to 1")
    assert(r.getDouble(6) === 0.0, "norm_min is the zero vector")
    // Spark (and DuckDB) order NaN above +Inf, so the NaN-norm row wins
    // the max — the audit surfaces the poisoned value, not hides it.
    assert(r.getDouble(8).isNaN, "norm_max surfaces the NaN norm")
  }

  // ---- ThetaSketch (set-expression sketches) ----

  test("theta sketches are exact below capacity and intersect/diff correctly") {
    import graft.functions.ThetaSketch
    // Two overlapping key sets: A = [0, 600), B = [400, 1000).
    // |A|=600, |B|=600, |A∩B|=200, |A\B|=400, |A∪B|=1000 — all below
    // nominalEntries=4096, so every estimate must be EXACT.
    val df = spark.range(1000).selectExpr(
      "id", "CASE WHEN id < 600 THEN 'a' ELSE 'x' END AS ga",
      "CASE WHEN id >= 400 THEN 'b' ELSE 'x' END AS gb")
    val skA = df.filter(col("ga") === "a")
      .repartition(7).agg(ThetaSketch.sketch(col("id")))
      .head().getAs[Array[Byte]](0)
    val skB = df.filter(col("gb") === "b")
      .repartition(3).agg(ThetaSketch.sketch(col("id")))
      .head().getAs[Array[Byte]](0)
    assert(ThetaSketch.estimate(skA) === 600.0)
    assert(ThetaSketch.estimate(skB) === 600.0)
    assert(ThetaSketch.intersectEstimate(skA, skB) === 200.0)
    assert(ThetaSketch.aNotBEstimate(skA, skB) === 400.0)
    assert(ThetaSketch.unionEstimate(skA, skB) === 1000.0)
  }

  test("theta sketch estimation mode stays within the RSE band at 100k keys") {
    import graft.functions.ThetaSketch
    // 100k distinct >> nominalEntries 4096: estimation mode. The theta
    // RSE is ~1/sqrt(k) ≈ 1.6%; assert a generous 5% band plus
    // partition invariance (the sketch is a pure function of the SET).
    def sk(parts: Int) = spark.range(100000).repartition(parts)
      .agg(graft.functions.ThetaSketch.sketch(col("id")))
      .head().getAs[Array[Byte]](0)
    val e = ThetaSketch.estimate(sk(5))
    assert(math.abs(e - 100000.0) < 5000.0, s"estimate $e off by >5%")
    assert(ThetaSketch.estimate(sk(11)) === e,
      "sketch estimate drifts with partitioning")
  }
}
