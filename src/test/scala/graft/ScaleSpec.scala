package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Scale-technique evidence on real plans: salted joins are result-equal
  * to plain joins, and bucketed tables join without a shuffle.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join result") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val plain = li.join(o, "l_orderkey")
      .agg(count(lit(1)), round(sum($"l_quantity" * $"o_totalprice"), 2))
      .collect().head
    val salted = Skew.saltedJoin(li, o, "l_orderkey", salts = 8)
      .agg(count(lit(1)), round(sum($"l_quantity" * $"o_totalprice"), 2))
      .collect().head
    assert(salted.getLong(0) === plain.getLong(0))
    assert(salted.getDouble(1) === plain.getDouble(1))
  }

  test("adaptiveSaltedJoin equals the plain join with mixed hot/cold keys") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val plain = li.join(o, "l_orderkey")
      .agg(count(lit(1)), round(sum($"l_quantity" * $"o_totalprice"), 2))
      .collect().head
    // threshold 4: multi-line orders salt, small orders join plain
    val adaptive = Skew.adaptiveSaltedJoin(li, o, "l_orderkey",
        salts = 4, hotThreshold = 4L)
      .agg(count(lit(1)), round(sum($"l_quantity" * $"o_totalprice"), 2))
      .collect().head
    assert(adaptive.getLong(0) === plain.getLong(0))
    assert(adaptive.getDouble(1) === plain.getDouble(1))
  }

  test("distributed min-label canonicalize converges on deep chains") {
    // The billions-of-pairs path (Dedup.canonicalize's checkpointed
    // min-label loop, forced via localThreshold = 0): 8192 chains of 16
    // nodes — 123k edges whose worst-case component diameter needs ~15
    // propagation rounds, so the loop's convergence detection and
    // per-round localCheckpoint lineage truncation are genuinely
    // exercised, not just the 1-2 round graphs of OpsSpec.
    val n = 1L << 17
    val edges = spark.range(n).filter($"id" % 16 =!= 15)
      .select($"id".as("doc_a"), ($"id" + 1).as("doc_b"))
    val labels = graft.ops.Dedup.canonicalize(edges, localThreshold = 0L)
      .cache()
    try {
      assert(labels.count() === n)
      // Every node's keeper is its chain's min id.
      val bad = labels
        .filter($"keeper_id" =!= ($"doc_id" - ($"doc_id" % 16))).count()
      assert(bad === 0)
      assert(labels.select($"keeper_id").distinct().count() === n / 16)
    } finally labels.unpersist()
  }

  test("keyHistogram surfaces the heaviest keys first") {
    val h = Skew.keyHistogram(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
      "l_returnflag", topN = 3).collect()
    assert(h.length === 3)
    assert(h.sliding(2).forall { case Array(a, b) => a.getLong(1) >= b.getLong(1) })
  }

  test("filters and projections reach the parquet scan") {
    // The load-bearing 100 TB property: a selective query reads the
    // pushed-predicate row groups of 2 columns, not the whole table.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plan = li.filter($"l_quantity" > 45)
      .select($"l_orderkey", $"l_quantity")
      .queryExecution.executedPlan
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.metadata("PushedFilters").contains("GreaterThan(l_quantity"),
      s"predicate not pushed: ${scan.metadata("PushedFilters")}")
    assert(scan.schema.fieldNames.toSet === Set("l_orderkey", "l_quantity"),
      s"columns not pruned: ${scan.schema.fieldNames.mkString(",")}")
  }

  test("dimension joins plan as broadcast, fact-fact joins as shuffle") {
    val t = graft.queries.Tables(spark, "/root/testdata/sf0.001")
    // AQE wraps the executed plan in AdaptiveSparkPlanExec, which hides
    // join nodes until runtime; disable it so the static plan is visible.
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      // q03-shaped join: nation is an explicitly broadcast dimension.
      val customer = t.customer
      val nation = t.nation
      val dimJoin = customer.join(broadcast(nation),
        customer("c_nationkey") === nation("n_nationkey"))
      val dimPlan = dimJoin.queryExecution.executedPlan
      assert(dimPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.nonEmpty, "dimension join did not plan as broadcast hash join")

      // Fact-fact equi-join with auto-broadcast disabled must be a
      // shuffle-keyed join (sort-merge or shuffled-hash), never nested-loop.
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val lineitem = t.lineitem
        val orders = t.orders
        val ff = lineitem.join(orders,
          lineitem("l_orderkey") === orders("o_orderkey"))
        val plan = ff.queryExecution.executedPlan
        val keyed = plan.collect {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
          case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
        }
        assert(keyed.nonEmpty, s"fact-fact join not shuffle-keyed:\n$plan")
      }
    }
  }

  test("bloomSemiJoin prunes probe rows before the join and stays exact") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    val hot = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter($"o_totalprice" > 400000).select($"o_orderkey")
    val exact = li.join(hot, $"l_orderkey" === $"o_orderkey", "left_semi")
      .agg(count(lit(1)), sum($"l_quantity")).collect().head
    val bloomed = graft.ops.RuntimeFilter.bloomSemiJoin(
      li, hot, "l_orderkey", "o_orderkey", expectedItems = 1000L, fpp = 0.01)
    val got = bloomed.agg(count(lit(1)), sum($"l_quantity")).collect().head
    assert(got === exact)
    // The Bloom pre-filter is the codegen expression pair (might_contain
    // over a constant sketch), NOT a Scala UDF: it sits on the probe side
    // below the semi join inside whole-stage codegen (string-matched: AQE
    // wraps the tree, hiding join nodes from collect()).
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in plan:\n$plan")
    assert(plan.contains("might_contain"),
      s"might_contain pre-filter missing from plan:\n$plan")
    assert(!plan.contains("UDF"),
      s"per-row UDF back in the bloom path:\n$plan")
  }

  test("bloomSemiJoin with an empty build side is empty, not an NPE") {
    // BloomFilterAggregate over zero rows yields a NULL sketch; the semi
    // join must short-circuit to the (correct) empty result instead of
    // probing a null filter.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    val none = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter($"o_totalprice" > 1e18).select($"o_orderkey")
    assert(none.isEmpty)
    val out = graft.ops.RuntimeFilter.bloomSemiJoin(
      li, none, "l_orderkey", "o_orderkey", expectedItems = 10L, fpp = 0.01)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === li.columns.toSeq,
      "empty result must keep the probe schema")
  }

  test("bloomSketch honors its sizing above the session clamp maxima") {
    // BloomFilterAggregate silently clamps (estimatedNumItems, numBits)
    // to session maxima — at 10M keys the default-clamped sketch measured
    // an 11% fp rate against the 1% requested, with no error anywhere
    // (SimBench bloomgate). bloomSketch must raise the maxima for the
    // build. Reproduced small: with maxNumBits squeezed to 1M, a 1M-key /
    // 1% sketch needs 9.6M bits; a clamped build would run ~63% false
    // positives, an honored one ~1%.
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val prevI = spark.conf.getOption(itemsKey)
    val prevB = spark.conf.getOption(bitsKey)
    spark.conf.set(itemsKey, "100000")
    spark.conf.set(bitsKey, "1000000")
    try {
      val corpus = spark.range(1000000L).select($"id".as("fp"))
      val bf = graft.ops.RuntimeFilter.bloomSketch(corpus, "fp",
        expectedItems = 1000000L, fpp = 0.01)
      val r = spark.range(200000L).select(($"id" + 5000000L).as("fp"))
        .select(graft.ops.RuntimeFilter.mightContain(bf, $"fp").as("pass"))
        .agg(sum(when($"pass", 1L).otherwise(0L)), count(lit(1)))
        .collect().head
      val fpRate = r.getLong(0).toDouble / r.getLong(1)
      assert(fpRate <= 0.03,
        f"fp rate $fpRate%.4f — the sketch was built under the clamp")
      // The squeezed maxima are restored afterwards, not leaked.
      assert(spark.conf.get(itemsKey) == "100000")
      assert(spark.conf.get(bitsKey) == "1000000")
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      restore(itemsKey, prevI)
      restore(bitsKey, prevB)
    }
  }

  test("scd2Intervals plans both windows over one keyed exchange") {
    // The change-detect lag window and the boundary lead window share
    // (key, ts, tie) partitioning+ordering, and the filter between them
    // preserves sort order — so the whole history build must cost ONE
    // shuffle of the change log, the property that holds at 100 TB.
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      val log = graft.queries.Tables(spark, "/root/testdata/sf0.001").events
      val iv = graft.ops.Lake.scd2Intervals(
        log.select($"user_id", $"ts", $"event_type", $"event_id"),
        "user_id", "ts", "event_type", "event_id")
      val plan = iv.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.length === 1,
        s"expected one exchange, got ${exchanges.length}:\n$plan")
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.length === 2, "expected lag + lead windows")
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join with zero exchanges") {
    // Uses the session's default warehouse dir (static conf); tables are
    // dropped at the end.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey", $"o_totalprice")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        $"l_orderkey" === $"o_orderkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // Co-located bucketed join: no shuffle on either side.
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected no hash exchange in bucketed join plan:\n$plan")
    assert(joined.count() === 6000L)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
  }

  test("quantize checksum is partition-invariant at 10^6 rows") {
    // Guards the exact-IEEE oracle contract (v15's corpus checksum)
    // against shuffle-order drift: fit's min/max and the AffineQuantize
    // integer levels are per-row functions of the VALUES, and the checksum
    // is a long sum (associative+commutative exactly), so any
    // partitioning must reproduce it bit-for-bit.
    val dims = 16
    def corpus(parts: Int) = spark.range(1000000L).repartition(parts)
      .select($"id", transform(sequence(lit(0), lit(dims - 1)),
        j => (($"id" * 7 + j * 13) % 997).cast("float") / 31.0f)
        .cast("array<float>").as("vec"))
    val m1 = graft.ops.Quantize.fit(corpus(5), "vec")
    val m2 = graft.ops.Quantize.fit(corpus(61), "vec")
    assert(m1.mins.toSeq === m2.mins.toSeq, "fit mins drift with partitioning")
    assert(m1.scales.toSeq === m2.scales.toSeq, "fit scales drift with partitioning")
    def checksum(parts: Int): Long = corpus(parts)
      .select(graft.ops.Quantize.quantize($"vec", m1).as("q"))
      .select(aggregate(zip_with($"q",
          sequence(lit(1), lit(dims)), (qi, w) => qi.cast("long") * w.cast("long")),
        lit(0L), (acc, x) => acc + x).as("rowsum"))
      .agg(sum($"rowsum")).head().getLong(0)
    val c1 = checksum(5)
    assert(c1 === checksum(61), "quantized checksum drifts with partitioning")
    assert(c1 === checksum(32), "quantized checksum drifts with partitioning")
  }

  test("GramAggregator merge is partitioning-safe at 10^6 rows and across mixed d") {
    import graft.functions.GramAggregator
    // (a) associativity under repartition: double sums reorder, so values
    // agree to relative tolerance while the count is exact.
    def gram(parts: Int): Array[Double] = spark.range(1000000L)
      .select(transform(sequence(lit(0), lit(7)),
        j => (($"id" * 11 + j * 3) % 113).cast("float") / 7.0f)
        .cast("array<float>").as("v"))
      .select(udaf(new GramAggregator).apply($"v")).head().getSeq[Double](0).toArray
    val g1 = gram(4)
    val g2 = gram(37)
    assert(g1.length === g2.length && g1(0) === 1000000.0 && g2(0) === 1000000.0)
    g1.zip(g2).zipWithIndex.foreach { case ((x, y), i) =>
      assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)),
        s"gram buffer slot $i drifts across partitionings: $x vs $y")
    }
    // (b) partial buffers that fixed DIFFERENT d from their partitions'
    // first rows: the merge must re-map the smaller layout by (i, j) — a
    // flat element-wise add lands the d=4 triangle inside the d=8 sums
    // (the silent corruption from the round-4 advice). Exercised directly
    // on the Aggregator (both merge orders) because query-level local
    // relations collapse to one sequential fold and never hit this path.
    val a = (0 until 100).map(i => Array.tabulate(4)(j => (i + j).toFloat))
    val b = (0 until 100).map(i => Array.tabulate(8)(j => (2 * i + j).toFloat))
    val agg = new GramAggregator
    val bufA = a.foldLeft(agg.zero)(agg.reduce)
    val bufB = b.foldLeft(agg.zero)(agg.reduce)
    val rows = a ++ b
    def sumE(i: Int): Double =
      rows.filter(_.length > i).map(_(i).toDouble).sum
    def sumP(i: Int, j: Int): Double =
      rows.filter(_.length > j).map(r => r(i).toDouble * r(j).toDouble).sum
    for (buf <- Seq(agg.merge(bufA.clone(), bufB.clone()),
                    agg.merge(bufB.clone(), bufA.clone()))) {
      val d = buf(1).toInt
      assert(d === 8 && buf(0) === 200.0)
      for (i <- 0 until 8)
        assert(math.abs(buf(2 + i) - sumE(i)) < 1e-6, s"sum slot $i corrupted")
      for (i <- 0 until 8; j <- i until 8) {
        val at = 2 + d + i * d - i * (i - 1) / 2 + (j - i)
        assert(math.abs(buf(at) - sumP(i, j)) < 1e-6, s"moment ($i,$j) corrupted")
      }
    }
  }

  test("duplicatedSpans is partition-invariant with planted boilerplate") {
    // 100k synthetic docs, every 50th carrying the same 12-token
    // boilerplate block inside otherwise-unique filler: the d09 contract
    // (exact integer span math, oracle hash-check) requires the output
    // relation to be IDENTICAL under any partitioning — gram counting is
    // a commutative keyed count and island merging is per-doc windowed,
    // so nothing may depend on shuffle order.
    val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")
    def docs(parts: Int) = spark.range(100000L).repartition(parts)
      .select($"id".as("doc_id"),
        concat_ws(" ",
          concat(lit("u"), $"id", lit("a")), concat(lit("u"), $"id", lit("b")),
          when($"id" % 50 === 0, lit(boiler))
            .otherwise(concat(lit("filler"), $"id")),
          concat(lit("u"), $"id", lit("c")), concat(lit("u"), $"id", lit("d")))
          .as("text"))
    def summary(parts: Int): (Long, Long, Long) = {
      val out = graft.ops.Dedup.duplicatedSpans(docs(parts), "doc_id", "text",
        k = 8)
      val r = out.agg(sum($"dup_tokens"), sum($"n_dup_spans"),
        count(when($"dup_tokens" > 0, 1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val s1 = summary(7)
    assert(s1 === summary(63), "span stats drift with partitioning")
    // Every planted doc (2000 of them) carries exactly one merged span
    // covering the boilerplate run and nothing else.
    assert(s1._3 === 2000L, s"expected 2000 flagged docs, got ${s1._3}")
    assert(s1._2 === 2000L, "each flagged doc must merge to ONE span")
  }

  test("domainDivergence is partition-invariant at 10^5 docs; KL orders skew") {
    // The (domain, token) relation the KL windows run over is
    // vocab-bounded, so the only scale risk is double-summation order in
    // the per-domain fold — the round-at-4 contract must absorb it across
    // partitionings. Domain d0 draws from 16 tokens, d1 from the 4-token
    // SUBSET that dominates the corpus marginal less -> d1's KL must be
    // larger, at any partitioning.
    def docs(parts: Int) = spark.range(100000L).repartition(parts)
      .select($"id".as("doc_id"),
        when($"id" % 4 === 0, "d1").otherwise("d0").as("source"),
        concat_ws(" ",
          concat(lit("w"), when($"id" % 4 === 0, $"id" % 4)
            .otherwise($"id" % 16)),
          concat(lit("w"), when($"id" % 4 === 0, ($"id" + 1) % 4)
            .otherwise(($"id" + 7) % 16))).as("text"))
    def run(parts: Int): Map[String, (Long, Long, Double)] = {
      graft.ops.TextAnalysis.invalidate(spark)
      graft.ops.TextAnalysis.domainDivergence(docs(parts),
          "doc_id", "text", "source")
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    }
    val a = run(7)
    assert(a === run(61), "domain KL drifts with partitioning")
    assert(a("d1")._3 > a("d0")._3,
      s"narrow domain must diverge more: $a")
    assert(a("d0")._1 + a("d1")._1 === 200000L)
  }

  test("temperatureMix keeps an identical doc set at 10^6 rows under any partitioning") {
    val docs = spark.range(1000000L)
      .select($"id".as("doc_id"),
        when($"id" % 10 === 0, "small").otherwise("big").as("domain"))
    def sampleCount(parts: Int): (Long, Long, Long) = {
      val out = graft.ops.Sampling.temperatureMix(docs.repartition(parts),
        "doc_id", "domain", budget = 100000L)
      val r = out.agg(count(lit(1)),
        sum(when($"domain" === "small", 1L).otherwise(0L)),
        expr("bit_xor(xxhash64(doc_id))")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val s1 = sampleCount(9)
    assert(s1 === sampleCount(57), "sampled set drifts with partitioning")
    // sqrt temperature on a 9:1 skew: the small domain's sampling rate
    // must exceed the big domain's (flattening), and the total stays
    // near the budget.
    val (total, small, _) = s1
    val big = total - small
    assert(small / 100000.0 > big / 900000.0 * 1.5,
      s"flattening failed: small=$small big=$big")
    assert(total > 80000L && total < 120000L, s"budget off: $total")
  }

  test("scrubDuplicatedSpans rebuilds identical text at 10^5 docs under any partitioning") {
    // Same planted-boilerplate corpus as the d09 invariance test: every
    // 50th doc embeds a 12-token block whose duplicated 8-grams merge to
    // ONE 12-token span. The scrub must cut exactly those 12 tokens from
    // planted docs, leave the rest byte-identical, and the full
    // (kept_tokens, scrub_md5) relation may not depend on partitioning —
    // the gram-count shuffle and span window are the order-sensitive
    // spots the hash checksum guards.
    val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")
    def docs(parts: Int) = spark.range(100000L).repartition(parts)
      .select($"id".as("doc_id"),
        concat_ws(" ",
          concat(lit("u"), $"id", lit("a")), concat(lit("u"), $"id", lit("b")),
          when($"id" % 50 === 0, lit(boiler))
            .otherwise(concat(lit("filler"), $"id")),
          concat(lit("u"), $"id", lit("c")), concat(lit("u"), $"id", lit("d")))
          .as("text"))
    def summary(parts: Int): (Long, Long, Long, Long) = {
      val out = graft.ops.Dedup.scrubDuplicatedSpans(docs(parts),
        "doc_id", "text", k = 8)
      val r = out.agg(count(lit(1)), sum($"kept_tokens"),
        count(when($"kept_tokens" < $"n_tokens", 1)),
        expr("bit_xor(xxhash64(doc_id, scrub_md5))")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val s1 = summary(7)
    assert(s1 === summary(63), "scrubbed corpus drifts with partitioning")
    assert(s1._3 === 2000L, s"exactly the planted docs lose tokens: ${s1._3}")
    // 98k untouched docs keep 5 tokens; 2k planted docs keep 16 - 12 = 4.
    assert(s1._2 === 98000L * 5 + 2000L * 4, s"kept-token total: ${s1._2}")
  }

  test("distinctiveTerms is partition-invariant at 10^5 docs and surfaces the domain marker") {
    // d1 docs carry a marker token absent from d0; shared filler spans
    // both. The ranked output (rounded-before-rank scores, token
    // tiebreak) must be identical under any partitioning, and each
    // domain's top-1 must be its own marker (d0's most distinctive token
    // is whichever shared filler d1 dilutes least — so only d1's marker
    // is asserted, plus rank stability for both).
    def docs(parts: Int) = spark.range(100000L).repartition(parts)
      .select($"id".as("doc_id"),
        when($"id" % 4 === 0, "d1").otherwise("d0").as("source"),
        concat_ws(" ",
          when($"id" % 4 === 0, lit("markerone")).otherwise(lit("plainword")),
          concat(lit("shared"), $"id" % 8)).as("text"))
    def run(parts: Int): Seq[(String, Int, String, Double)] = {
      graft.ops.TextAnalysis.invalidate(spark)
      graft.ops.TextAnalysis.distinctiveTerms(docs(parts),
          "doc_id", "text", "source", topK = 3)
        .orderBy($"domain", $"rk")
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2),
          r.getDouble(3))).toSeq
    }
    val a = run(7)
    assert(a === run(61), "ranked terms drift with partitioning")
    val top = a.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    assert(top("d1") === "markerone")
    assert(top("d0") === "plainword")
  }

  test("weightedSample selects an identical set at 10^6 rows under any partitioning") {
    // A-ES selection must be a pure function of (id, salt, weight): the
    // TakeOrderedAndProject merge of per-partition top-k heaps cannot
    // depend on how rows were dealt. Weights span ~1-2 orders of
    // magnitude, so per-partition heaps genuinely differ between layouts.
    val n = 1000000L
    def corpus(parts: Int) = spark.range(n).repartition(parts)
      .select($"id".as("doc_id"),
        (pmod(xxhash64($"id"), lit(900L)) + lit(100L)).as("w"))
    def run(parts: Int): Seq[Long] =
      graft.ops.Sampling.weightedSample(corpus(parts), "doc_id", "w",
          100, "sc1")
        .select($"doc_id").collect().map(_.getLong(0)).toSeq
    val a = run(4)
    assert(a.size === 100)
    assert(a === run(97), "weighted sample drifts with partitioning")
  }

  test("hammingPairs is partition-invariant and exact at 10^5 hashes") {
    val n = 100000L
    def corpus(parts: Int) = {
      val base = spark.range(n).repartition(parts)
        .select($"id".as("media_id"),
          pmod(xxhash64($"id", lit(1)), lit(4294967296L)).as("hi"),
          pmod(xxhash64($"id", lit(2)), lit(4294967296L)).as("lo"))
      val orig = struct($"media_id", $"hi", $"lo")
      val twin = struct(($"media_id" + 1000000L).as("media_id"),
        $"hi".bitwiseXOR(expr("shiftleft(1L, cast(media_id % 32 as int))"))
          .as("hi"),
        $"lo".bitwiseXOR(
          expr("shiftleft(1L, cast((media_id * 3 + 5) % 32 as int))"))
          .as("lo"))
      base.select(explode(when($"media_id" < 500, array(orig, twin))
          .otherwise(array(orig))).as("r"))
        .select($"r.media_id".as("media_id"), $"r.hi".as("hi"),
          $"r.lo".as("lo"))
    }
    def run(parts: Int): Seq[(Long, Long, Int)] =
      graft.ops.Multimodal.hammingPairs(corpus(parts), "media_id",
          "hi", "lo", maxHam = 3)
        .orderBy($"id_a", $"id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val a = run(5)
    val planted = a.filter { case (ia, ib, d) => ib == ia + 1000000L && d == 2 }
    assert(planted.size === 500, s"${planted.size} of 500 planted twins found")
    assert(a === run(53), "pair set drifts with partitioning")
  }

  test("lineDedup at 10^5 docs strips exactly the planted chrome under any partitioning") {
    // Every doc carries a shared header; every 4th a shared footer; every
    // doc one unique body line. The doc-frequency bar (minDocs=1000) is
    // cleared ONLY by the planted chrome, so totals are closed-form:
    // removed = 100k headers + 25k footers, survivors = the unique bodies.
    def docs(parts: Int) = spark.range(100000L).repartition(parts)
      .select($"id".as("doc_id"),
        concat(
          lit("COOKIE BANNER\n"),
          concat(lit("unique body "), $"id"),
          when($"id" % 4 === 0, lit("\nALL RIGHTS RESERVED"))
            .otherwise(lit(""))).as("text"))
    def summary(parts: Int): (Long, Long, Long) = {
      val out = graft.ops.TextAnalysis.lineDedup(docs(parts), "doc_id",
        "text", minDocs = 1000)
      val r = out.agg(sum($"n_lines"), sum($"n_removed"),
        count(when($"clean_text" === concat(lit("unique body "), $"doc_id"),
          1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val s1 = summary(7)
    assert(s1 === ((225000L, 125000L, 100000L)),
      s"closed-form line totals drifted: $s1")
    assert(s1 === summary(63), "lineDedup drifts with partitioning")
  }
}
