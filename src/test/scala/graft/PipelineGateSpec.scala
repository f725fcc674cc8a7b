package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sampling}

/** Round-5 continuation batch: pipeline-gate operators — quality-keeper
  * survivorship, leakage-safe splitting, bloom gates, table checksums,
  * incremental view maintenance, margin mining, code routing.
  *
  * The driver's DuckDB oracle proves cross-engine value equality for each
  * of these; the tests here pin the SEMANTIC invariants the oracle SQL
  * cannot state directly (argmax membership, structural zero-leakage, the
  * incremental==full identity as a DataFrame equality, non-vacuous
  * planting).
  */
class PipelineGateSpec extends SparkSpec {
  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  test("d18 survivor is a member of its cluster with the max quality") {
    val out = SparkEntry.queries("d18_quality_keeper")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out.nonEmpty, "no clusters at sf0.01 — vacuous")
    // Recompute the clusters independently and check the argmax rule.
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val pairs = Dedup.nearDuplicatesMinhashCached(docs, "doc_id", "text",
        threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3)
      .select(col("doc_a"), col("doc_b"))
    val members = Dedup.canonicalize(pairs)
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .collect()
      .groupBy(_.getLong(1)) // keeper_id = cluster
      .map { case (c, rows) =>
        c -> rows.map(r => (r.getLong(0), r.getLong(2))).toSeq }
    out.foreach { case (cluster, survivor, chars, nMembers) =>
      val mem = members(cluster)
      assert(mem.size === nMembers)
      assert(mem.contains((survivor, chars)), "survivor not in cluster")
      val best = mem.map(_._2).max
      assert(chars === best, s"survivor chars $chars != cluster max $best")
      // min-id tiebreak among max-quality members
      val tied = mem.filter(_._2 == best).map(_._1).min
      assert(survivor === tied, "tiebreak must pick the min id")
    }
  }

  test("s17 cluster split leaks zero pairs where the per-doc split leaks") {
    val out = SparkEntry.queries("s17_leakage_safe_split")(spark, sf01)
    assert(out.collect().forall(_.getBoolean(3)), "cluster split leaked")
    // Non-vacuous: the PLAIN per-doc split separates at least one near-dup
    // pair at sf0.01 (what s16 audits), so s17 is fixing a real failure.
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val pairs = Dedup.nearDuplicatesMinhashCached(docs, "doc_id", "text",
        threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3)
      .select(col("doc_a"), col("doc_b"))
    val byDoc = docs.select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"), 90, 5).as("split"))
    val crossPlain = pairs
      .join(byDoc.select(col("doc_id").as("doc_a"), col("split").as("sa")),
        Seq("doc_a"))
      .join(byDoc.select(col("doc_id").as("doc_b"), col("split").as("sb")),
        Seq("doc_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(crossPlain > 0,
      "per-doc split leaks nothing at sf0.01 — the fixture no longer " +
        "exercises the failure s17 exists to prevent")
  }

  test("q57 incremental aggregate equals the full recompute exactly") {
    val inc = SparkEntry.queries("q57_incremental_agg")(spark, sf01)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val full = spark.read.parquet(s"$sf01/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("q"))
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(inc.toSeq === full.toSeq)
  }

  test("t33 routes exactly the planted snippets to is_code") {
    val rows = SparkEntry.queries("t33_code_detect")(spark, sf01).collect()
    val (code, prose) = rows.partition(_.getBoolean(1))
    // every +code source row is code-classified, and no natural source is
    assert(code.nonEmpty && code.forall(_.getString(0).endsWith("+code")))
    assert(prose.forall(r => !r.getString(0).endsWith("+code")))
    val planted = spark.read.parquet(s"$sf01/documents.parquet")
      .filter(col("doc_id") % 50 === 0).count()
    assert(code.map(_.getLong(2)).sum === planted,
      "planted snippet count mismatch")
  }

  test("q56 table checksums are stable across runs and partitionings") {
    def run() = SparkEntry.queries("q56_table_checksum")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val a = run(); val b = run()
    assert(a === b)
    val counts = Map(
      "orders" -> spark.read.parquet(s"$sf001/orders.parquet").count(),
      "customer" -> spark.read.parquet(s"$sf001/customer.parquet").count())
    a.foreach { case (tbl, n, _, _) => assert(n === counts(tbl)) }
  }

  test("e12 margins are ranked, bounded, and deterministic") {
    def run() = SparkEntry.queries("e12_margin_mining")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    val a = run()
    assert(a.size === 20)
    assert(a === run(), "margin mining must be deterministic")
    val margins = a.map(_._4)
    assert(margins === margins.sorted.reverse, "not ranked by margin desc")
    // Ratio margin is cosine over the mean of two k-NN means: for the TOP
    // pairs it must exceed 1 (the pair beats its own neighborhoods'
    // average) — the criterion's defining property.
    assert(margins.head > 1.0, s"top margin ${margins.head} <= 1")
  }

  test("io16 writes real parquet bloom filters into the row-group footers") {
    // Run the query (which writes the file) then inspect the footer with
    // the parquet library directly: every row group must carry a bloom
    // filter offset for o_orderkey — without this the query would still
    // hash-match (the filter is an optimization), so the footer check is
    // what pins the feature.
    SparkEntry.queries("io16_parquet_bloom")(spark, sf001).count()
    val dir = new java.io.File(
      s"/root/repo/target/graft-io/io16_${math.abs(sf001.hashCode)}")
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks
      assert(!blocks.isEmpty)
      blocks.forEach { b =>
        val colMeta = b.getColumns.asScala
          .find(_.getPath.toDotString == "o_orderkey").get
        assert(colMeta.getBloomFilterOffset > 0,
          "no bloom filter offset for o_orderkey in row-group footer")
        assert(reader.readBloomFilter(colMeta) != null,
          "bloom filter offset present but filter unreadable")
      }
    } finally reader.close()
  }

  test("KllSketchAgg folds every row under any partitioning") {
    import graft.functions.KllSketch
    val vals = spark.range(10000L).select(($"id" * 7L % 10000L)
      .cast("double").as("v"))
    def build(parts: Int): Array[Byte] = vals.repartition(parts)
      .agg(KllSketch.sketch($"v").as("sk"))
      .head().getAs[Array[Byte]](0)
    Seq(3, 31).foreach { parts =>
      val sk = build(parts)
      assert(KllSketch.n(sk) === 10000L,
        s"sketch lost rows at $parts partitions")
      // Rank honesty: the p50 estimate's true rank within the KLL band.
      val est = KllSketch.quantile(sk, 0.5)
      val trueRank = vals.filter($"v" <= est).count().toDouble / 10000.0
      assert(math.abs(trueRank - 0.5) <= 0.035,
        s"p50 rank $trueRank out of band at $parts partitions")
    }
    // Driver-side mergeAll preserves N exactly (the sketch-store roll-up).
    val halves = Seq(
      vals.filter($"v" < 5000).agg(KllSketch.sketch($"v")).head().getAs[Array[Byte]](0),
      vals.filter($"v" >= 5000).agg(KllSketch.sketch($"v")).head().getAs[Array[Byte]](0))
    assert(KllSketch.n(KllSketch.mergeAll(halves)) === 10000L)
  }

  test("KllDoublesSketchAgg keeps large-long quantiles EXACT members of " +
      "the key set where the floats sketch narrows (the 2^24 gap)") {
    import graft.functions.KllSketch
    // ids far above 2^24: consecutive longs around 10^12 — adjacent values
    // are NOT distinguishable in float32 (ulp at 1e12 is 131072)
    val base = 1000000000000L
    val keys = spark.range(50000L).select(($"id" + base).as("k"))
    val keySet = keys.select($"k".cast("double")).as[Double]
      .collect().toSet
    // doubles sketch: every quantile read is an exact key
    val dsk = keys.repartition(13)
      .agg(KllSketch.doublesSketch($"k").as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(KllSketch.doublesN(dsk) === 50000L)
    Seq(0.1, 0.5, 0.9, 0.99).foreach { q =>
      val est = KllSketch.doublesQuantile(dsk, q)
      assert(keySet.contains(est),
        s"doubles p$q estimate $est is not a member of the key stream")
      val trueRank = keys.filter($"k".cast("double") <= est).count()
        .toDouble / 50000.0
      assert(math.abs(trueRank - q) <= 0.035,
        s"doubles p$q rank $trueRank out of band")
    }
    // the floats sketch on the same stream returns NON-members: the
    // narrowing collapses ~131072 consecutive ids onto each float, so a
    // returned quantile is a member only if the narrowed value happens to
    // round-trip — with ulp >> 1 it cannot for most keys
    val fsk = keys.repartition(13)
      .agg(KllSketch.sketch($"k").as("sk"))
      .head().getAs[Array[Byte]](0)
    val floatMembers = Seq(0.1, 0.5, 0.9, 0.99)
      .map(q => KllSketch.quantile(fsk, q)).count(keySet.contains)
    assert(floatMembers < 4,
      "floats sketch unexpectedly returned only exact members above 2^24")
  }

  test("bloom gates report zero false negatives and bounded fp at sf0.001") {
    val a08 = SparkEntry.queries("a08_bloom_contract")(spark, sf001).head()
    assert(a08.getBoolean(2) && a08.getBoolean(3))
    val d19 = SparkEntry.queries("d19_bloom_dedup_gate")(spark, sf001).head()
    assert(d19.getBoolean(2) && d19.getBoolean(3))
    assert(d19.getLong(1) > 0, "no planted replays — gate test vacuous")
  }
}
