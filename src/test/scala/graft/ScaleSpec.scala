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
    // The Bloom UDF filter sits on the probe side BELOW the semi join —
    // pushed all the way into the scan's DataFilters (string-matched: AQE
    // wraps the tree, hiding join nodes from collect()).
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in plan:\n$plan")
    val probeScan = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("lineitem.parquet"))
    assert(probeScan.exists(_.contains("UDF")),
      s"Bloom filter not pushed into the probe-side scan:\n$plan")
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
}
