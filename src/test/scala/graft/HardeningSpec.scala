package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Ivf, Lake, Similarity}

/** Regression pins for the round-4 hardening fixes: SCD2 null-transition
  * detection, rankTopK's null/NaN handling, IVF's degenerate-vector
  * guard, and the suite-boundary cache hygiene contract.
  */
class HardeningSpec extends SparkSpec {
  import spark.implicits._

  test("scd2Intervals treats NULL transitions as changes, NULL->NULL as none") {
    val log = Seq[(Long, Long, Option[String], Long)](
      (1L, 10L, Some("a"), 1L),
      (1L, 20L, None, 2L),      // a -> NULL: a real change
      (1L, 30L, None, 3L),      // NULL -> NULL: not a change
      (1L, 40L, Some("b"), 4L), // NULL -> b: a real change
      (2L, 10L, None, 5L))      // first row with NULL value survives
      .toDF("k", "ts", "v", "tie")
    val got = Lake.scd2Intervals(log, "k", "ts", "v", "tie")
      .orderBy($"k", $"valid_from")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      (1L, Some("a"), 10L, 20L, false),
      (1L, None, 20L, 40L, false),
      (1L, Some("b"), 40L, -1L, true),
      (2L, None, 10L, -1L, true)))
  }

  test("rankTopK drops null/NaN scores identically in both ranking paths") {
    val candidates = Seq[(Long, Long, java.lang.Double)](
      (1L, 11L, 0.9), (1L, 12L, Double.NaN), (1L, 13L, null),
      (1L, 14L, 0.7), (1L, 15L, 0.8),
      (2L, 21L, Double.NaN), (2L, 22L, null)) // query 2: nothing rankable
      .toDF("query_id", "id", "score")
    def ranks(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
      df.orderBy($"query_id", $"rnk").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // Aggregator path (long ids).
    val agg = ranks(Similarity.rankTopK(candidates, "id", "score", 2))
    // Window path (non-long ids).
    val win = ranks(Similarity.rankTopK(
      candidates.withColumn("id", $"id".cast("int")), "id", "score", 2)
      .withColumn("vec_id", $"vec_id".cast("long")))
    assert(agg === Seq((1L, 1, 11L), (1L, 2, 15L)))
    assert(win === agg) // identical semantics on degenerate scores
  }

  test("Ivf.build drops unembeddable rows instead of crashing or mis-cellng them") {
    val rows = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(0.9f, 0.1f)))
      .toDF("id", "vec")
      .unionByName(Seq((4L, null.asInstanceOf[Array[Float]]))
        .toDF("id", "vec"))
      .unionByName(Seq((5L, Array.empty[Float])).toDF("id", "vec"))
    val idx = Ivf.build(rows, "id", "vec", numCells = 2, iterations = 1)
    val ids = idx.cells.select($"id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L)) // 4 (null) and 5 (empty) dropped
  }

  test("signBucketJoinWide: verified subset of brute force, exact dups always found") {
    // 200 deterministic vectors + 20 shifted-id exact copies.
    val base = spark.range(200).select($"id",
      transform(sequence(lit(0), lit(15)), i =>
        (pmod($"id" * lit(2654435761L) + i.cast("long") * lit(40503L), lit(1000007L))
          .cast("double") / lit(500003.5) - lit(1.0)).cast("float")).as("vec"))
    val dups = base.filter($"id" < 20).select(($"id" + 1000L).as("id"), $"vec")
    val corpus = base.unionByName(dups)
    val wide = Similarity.signBucketJoinWide(corpus, "id", "vec",
      threshold = 0.9, bands = 6, bitsPerBand = 8, dims = 16)
    val brute = Similarity.bruteForcePairs(corpus, "id", "vec", threshold = 0.9)
    val wideSet = wide.select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteSet = brute.select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wideSet.subsetOf(bruteSet), "LSH pairs must verify against exact cosine")
    // Identical vectors collide in every band: all 20 planted pairs found.
    val plantedFound = wideSet.count { case (a, b) => b == a + 1000L }
    assert(plantedFound === 20)
  }

  test("Caches.reset unpersists cached plans and drops the memo registries") {
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, s"alpha beta gamma delta epsilon zeta token$i end"))
      .toDF("doc_id", "text")
    val first = Dedup.nearDuplicatesMinhashCached(docs, "doc_id", "text", 0.5)
    first.count() // materialize: registers persisted plans
    assert(!spark.sharedState.cacheManager.isEmpty,
      "the memoized pair relation should be cached")
    Caches.reset(spark)
    assert(spark.sharedState.cacheManager.isEmpty,
      "reset must clear every cached plan")
    // The memo registry was dropped too: the next call builds (and
    // re-persists) a fresh relation rather than returning the stale one.
    val second = Dedup.nearDuplicatesMinhashCached(docs, "doc_id", "text", 0.5)
    assert(!(second eq first))
    assert(!spark.sharedState.cacheManager.isEmpty)
    Caches.reset(spark) // leave the shared session clean for other suites
  }

  test("signBits/hammingTopK survive null, empty, and short vectors") {
    import org.apache.spark.sql.functions._
    val emb = Seq(
      (0L, Some(Seq(1f, -1f, 2f, 3f))),
      (1L, Some(Seq(-1f, 1f))),       // shorter: high bits stay clear
      (2L, Some(Seq.empty[Float])),   // empty: all-zero signature
      (3L, None))                     // null vector: null signature
      .toDF("vec_id", "embedding")
    val sigs = emb.select($"vec_id",
      graft.ops.Quantize.signBits($"embedding").as("sig"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(sigs(0L) === Seq(0xDL)) // bits 0,2,3
    assert(sigs(1L) === Seq(0x2L))
    assert(sigs(2L) === Seq.empty[Long])
    assert(sigs(3L) === null)
    // topK over the same relation: the null-vector row cannot crash the
    // scan — its null distance is dropped by rankTopK's null filter, so
    // exactly the two non-null non-self rows rank.
    val probes = emb.filter($"vec_id" === 0L)
    val got = graft.ops.Quantize
      .hammingTopK(emb, probes, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(2), r.getInt(3)))
    assert(got.map(_._1).toSet === Set(1L, 2L))
  }

  test("duplicatedSpans: empty corpus, no-text docs, and full-dup docs") {
    import org.apache.spark.sql.functions._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ops.Dedup.duplicatedSpans(empty, "doc_id", "text").count() === 0)
    // A doc below k tokens yields no grams but must still report a row;
    // two identical docs are 100% duplicated span.
    val docs = Seq((1L, "tiny"), (2L, "a b c d e f g h i"),
      (3L, "a b c d e f g h i")).toDF("doc_id", "text")
    val out = graft.ops.Dedup.duplicatedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) === ((0L, 0.0)))
    assert(out(2L) === ((9L, 1.0)))
    assert(out(3L) === ((9L, 1.0)))
  }

  test("ndcgAtK degenerate truths yield null ndcg, never NaN or Infinity") {
    val run = Seq(("a", 1), ("b", 2)).toDF("id", "rnk")
    // All-zero gains: dcg = idcg = 0, ndcg must be null (0/0 is NaN).
    val zeros = Seq(("a", 0.0), ("b", 0.0)).toDF("id", "gain")
    val z = Similarity.ndcgAtK(run, zeros, "id", k = 2).collect()(0)
    assert(z.getDouble(0) === 0.0 && z.getDouble(1) === 0.0)
    assert(z.isNullAt(2), "0/0 must surface as null, not NaN")
    // Empty truth: run rows score 0 (absent-entry rule), the ideal side
    // has nothing to sum -> idcg and ndcg null.
    val empty = Seq.empty[(String, Double)].toDF("id", "gain")
    val e = Similarity.ndcgAtK(run, empty, "id", k = 2).collect()(0)
    assert(e.getDouble(0) === 0.0)
    assert(e.isNullAt(1) && e.isNullAt(2))
  }

  test("cdcChunks: empty and short docs still tile exactly") {
    val docs = Seq((1L, ""), (2L, "short"), (3L, "x" * 100))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.cdcChunks(docs, "doc_id", "text")
    val byDoc = out.groupBy($"doc_id")
      .agg(sum($"len").as("covered"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!byDoc.contains(1L), "empty text yields no chunks")
    assert(byDoc(2L) === ((5L, 1L)), "sub-k text is one whole-doc chunk")
    assert(byDoc(3L)._1 === 100L, "chunks tile the full doc")
  }

  test("containmentPairs drops candidates whose doc has no shingle set") {
    // doc 2 has fewer tokens than the shingle width -> no set -> the
    // candidate involving it vanishes (inner join), rather than scoring
    // against an empty array as containment 0/0.
    val docs = Seq((1L, "a b c d e"), (2L, "xy")).toDF("doc_id", "text")
    val cand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    assert(Dedup.containmentPairs(docs, "doc_id", "text", cand).count() === 0)
  }

  test("ThetaSketchAgg skips nulls and an all-null group yields an empty sketch") {
    import graft.functions.ThetaSketch
    val df = Seq(Some(1L), None, Some(2L), None, Some(1L)).toDF("k")
    val sk = df.agg(ThetaSketch.sketch(col("k"))).head().getAs[Array[Byte]](0)
    assert(ThetaSketch.estimate(sk) === 2.0, "nulls must not be counted")
    val empty = df.filter(col("k").isNull)
      .agg(ThetaSketch.sketch(col("k"))).head().getAs[Array[Byte]](0)
    assert(ThetaSketch.estimate(empty) === 0.0, "empty sketch estimates 0")
    assert(ThetaSketch.intersectEstimate(sk, empty) === 0.0)
  }

  test("bruteForceTopKFused is row-identical to the broadcast-join form") {
    // Crafted corpus: duplicate vectors (rounded-sim ties -> id
    // tiebreaks), a zero vector (cosine guard -> sim 0.0), opposite
    // vectors (negative sims), fewer rows than k+1 for some queries'
    // candidate sets. Any drift in rounding order, tie handling, or the
    // zero guard splits the two forms.
    val rnd = new scala.util.Random(7)
    val rows = (1L to 40L).map { i =>
      val v =
        if (i == 13L) Array.fill(8)(0.0f)
        else if (i % 7 == 0) Array.tabulate(8)(d => (d + 1).toFloat) // dups
        else if (i % 5 == 0) Array.tabulate(8)(d => -(d + 1).toFloat)
        else Array.fill(8)(rnd.nextFloat() * 2 - 1)
      (i, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    def canon(r: org.apache.spark.sql.DataFrame) =
      r.orderBy($"query_id", $"rnk")
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2),
          x.getDouble(3))).toSeq
    val joined = canon(Similarity.bruteForceTopK(
      df, df, "vec_id", "embedding", k = 5))
    val fused = canon(Similarity.bruteForceTopKFused(
      df, df, "vec_id", "embedding", k = 5))
    assert(fused === joined)
    assert(fused.nonEmpty && fused.size === 40 * 5)
  }

  test("SqlOracle results are capped; a LIMIT-ed oracle still runs") {
    import graft.model.SumRecord
    import graft.oracle.{OracleRegistry, SqlOracle}
    import graft.store.RecordStore
    val store = RecordStore.fromRecords(spark, (1 to 3).map(i =>
      SumRecord(i.toLong, Array(1f), Map("k" -> "v"))))
    val prev = spark.conf.getOption(SqlOracle.MaxResultRowsKey)
    spark.conf.set(SqlOracle.MaxResultRowsKey, "2")
    try {
      val reg = new OracleRegistry
      val o = reg.createSql(spark, "allRows",
        "SELECT id FROM records ORDER BY id").toOption.get
      val big = reg.run(o.id, store, Seq.empty)
      assert(big.isLeft && big.swap.toOption.get.contains("exceeds 2 rows"),
        s"uncapped oracle result slipped through: $big")
      val ltd = reg.createSql(spark, "twoRows",
        "SELECT id FROM records ORDER BY id LIMIT 2").toOption.get
      assert(reg.run(ltd.id, store, Seq.empty) ===
        Right("""[{"id":1},{"id":2}]"""))
    } finally prev match {
      case Some(v) => spark.conf.set(SqlOracle.MaxResultRowsKey, v)
      case None => spark.conf.unset(SqlOracle.MaxResultRowsKey)
    }
  }

  test("findBy/list cap driver pulls; the Ds variants stay unbounded") {
    import graft.model.SumRecord
    import graft.store.RecordStore
    val store = RecordStore.fromRecords(spark, (1 to 3).map(i =>
      SumRecord(i.toLong, Array(1f), Map("tag" -> "same"))))
    val prev = spark.conf.getOption(RecordStore.MaxCollectRowsKey)
    spark.conf.set(RecordStore.MaxCollectRowsKey, "2")
    try {
      val e1 = intercept[IllegalStateException](store.findBy("tag", "same"))
      assert(e1.getMessage.contains("findByDs"))
      assert(store.findByDs("tag", "same").get.count() === 3L,
        "Dataset variant must not be capped")
      assert(store.findByDs("nope", "x") === None, "nil-vs-empty preserved")
      val e2 = intercept[IllegalStateException](store.list(1, 3))
      assert(e2.getMessage.contains("listDs"))
      assert(store.list(1, 2).records.map(_.id) === Seq(1L, 2L),
        "in-cap pages still serve")
      val (total, pages, pageDs) = store.listDs(2, 2)
      assert((total, pages) === ((3L, 2L)))
      assert(pageDs.collect().map(_.id).toSeq === Seq(3L))
      val (t2, p2, emptyDs) = store.listDs(9, 2)
      assert((t2, p2, emptyDs.count()) === ((3L, 2L, 0L)),
        "out-of-range page returns totals with no records")
    } finally prev match {
      case Some(v) => spark.conf.set(RecordStore.MaxCollectRowsKey, v)
      case None => spark.conf.unset(RecordStore.MaxCollectRowsKey)
    }
  }

  test("bloomSketch never inflates the caller session's clamp maxima") {
    // The raise/restore variant this pins against mutated session-global
    // runtime conf for the duration of the build: any query planned on
    // another thread in that window was planned under the inflated bloom
    // maxima. The clone-session build must leave the caller's conf
    // untouched AT EVERY INSTANT, not merely restored afterwards — so a
    // watcher thread polls the maxima throughout the build and records
    // every distinct value it observes.
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val prevI = spark.conf.getOption(itemsKey)
    val prevB = spark.conf.getOption(bitsKey)
    spark.conf.set(itemsKey, "1000")
    spark.conf.set(bitsKey, "100000")
    try {
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
      @volatile var stop = false
      val watcher = new Thread(() => {
        while (!stop) seen.add((spark.conf.get(itemsKey), spark.conf.get(bitsKey)))
      })
      watcher.start()
      try {
        // Sizing far above both squeezed maxima forces the raise path.
        val corpus = spark.range(50000L).select($"id".as("fp"))
        val bf = graft.ops.RuntimeFilter.bloomSketch(corpus, "fp",
          expectedItems = 50000L, fpp = 0.01)
        assert(bf != null)
        // The honored sketch still works despite the squeezed session.
        val misses = spark.range(10000L).select(($"id" + 1000000L).as("fp"))
          .select(graft.ops.RuntimeFilter.mightContain(bf, $"fp").as("p"))
          .agg(sum(when($"p", 1L).otherwise(0L))).head.getLong(0)
        assert(misses <= 10000L * 0.05, s"fp count $misses — clamped build")
      } finally { stop = true; watcher.join() }
      assert(seen.size === 1 && seen.contains(("1000", "100000")),
        s"concurrent thread observed inflated maxima: $seen")
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      restore(itemsKey, prevI)
      restore(bitsKey, prevB)
    }
  }
}
