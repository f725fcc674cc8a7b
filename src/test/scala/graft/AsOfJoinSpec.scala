package graft

import org.apache.spark.sql.functions._

import graft.plans.{AsOf, AsOfJoinExec}
import graft.queries.Tables

/** Custom as-of join operator: hand-built fixtures, equivalence with the
  * window-based composition on real event data, and plan-shape assertions.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the most recent right row per key, nulls when none") {
    val probes = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("uid", "t", "tag")
    val quotes = Seq((1L, 8L, "q8"), (1L, 15L, "q15"), (1L, 20L, "q20"),
      (3L, 1L, "qx"))
      .toDF("uid2", "t2", "qtag")
    val out = AsOf.join(probes, quotes, "uid", "uid2", "t", "t2")
      .select($"tag", $"qtag").orderBy($"tag")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // p1@10 -> q8; p2@20 -> q20 (equality included); p3 (uid 2) -> null
    assert(out === Seq(("p1", "q8"), ("p2", "q20"), ("p3", null)))
  }

  test("agrees with the window-based as-of on real events") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val ev = t.events.withColumn("tsu", expr("ts div 1000"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"tsu", $"event_id")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id".as("s_user"), $"tsu".as("s_tsu"),
        $"event_id".as("s_event"))

    val custom = AsOf.join(purchases, signups, "user_id", "s_user", "tsu", "s_tsu")
      .filter($"s_tsu".isNotNull)
      .select($"event_id", $"s_tsu")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // Window-based reference implementation (q15 shape).
    val p2 = purchases.withColumn("src", lit(1))
      .select($"user_id", $"tsu", $"event_id",
        lit(null).cast("long").as("sig_tsu"), $"src")
    val s2 = signups.select($"s_user".as("user_id"), $"s_tsu".as("tsu"),
      $"s_event".as("event_id"), $"s_tsu".as("sig_tsu"), lit(0).as("src"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"tsu", $"src", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ref = p2.unionByName(s2)
      .withColumn("m", last($"sig_tsu", ignoreNulls = true).over(w))
      .filter($"src" === 1 && $"m".isNotNull)
      .select($"event_id", $"m")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(custom === ref)
    assert(custom.nonEmpty)
  }

  test("randomized stress: agrees with window reference across many keys") {
    val rng = new scala.util.Random(11)
    val probes = (0 until 500).map(i =>
      (rng.nextInt(20).toLong, rng.nextInt(1000).toLong, i.toLong))
      .toDF("uid", "t", "pid")
    // unique t2 per quote: with (by, on) ties the matched row among equals
    // is implementation-defined, which would make the oracle ambiguous
    val quotes = (0 until 300).map(i =>
      (rng.nextInt(25).toLong, i.toLong * 3 + 1, 10000L + i))
      .toDF("uid2", "t2", "qid")

    val custom = AsOf.join(probes, quotes, "uid", "uid2", "t", "t2")
      .select($"pid", $"qid")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet

    // reference: for each probe, the max-(t2, qid) quote with t2 <= t.
    // Tie-break mirrors the exec's physical (by, on)-sorted scan, which
    // keeps the LAST row among equal on-values — i.e. max qid.
    val q = quotes.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = probes.collect().map { r =>
      val (uid, t, pid) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cands = q.filter(x => x._1 == uid && x._2 <= t)
      val best = if (cands.isEmpty) -1L else cands.maxBy(x => (x._2, x._3))._3
      (pid, best)
    }.toSet
    assert(custom === expected)
  }

  test("forward direction matches the next at-or-after right row") {
    val probes = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 30L, "p3"))
      .toDF("uid", "t", "tag")
    val quotes = Seq((1L, 8L, "q8"), (1L, 15L, "q15"), (1L, 20L, "q20"))
      .toDF("uid2", "t2", "qtag")
    val out = AsOf.join(probes, quotes, "uid", "uid2", "t", "t2",
        direction = graft.plans.AsOfDirection.Forward)
      .select($"tag", $"qtag").orderBy($"tag")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // p1@10 -> q15 (next at-or-after); p2@20 -> q20 (equality); p3@30 -> none
    assert(out === Seq(("p1", "q15"), ("p2", "q20"), ("p3", null)))
  }

  test("forward shares candidates across probes (head not consumed)") {
    val probes = Seq((1L, 10L, "p1"), (1L, 11L, "p2"), (1L, 12L, "p3"))
      .toDF("uid", "t", "tag")
    val quotes = Seq((1L, 15L, "q15")).toDF("uid2", "t2", "qtag")
    val out = AsOf.join(probes, quotes, "uid", "uid2", "t", "t2",
        direction = graft.plans.AsOfDirection.Forward)
      .select($"tag", $"qtag").orderBy($"tag")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // all three probes match the same single future quote
    assert(out === Seq(("p1", "q15"), ("p2", "q15"), ("p3", "q15")))
  }

  test("tolerance bounds the match distance in both directions") {
    val probes = Seq((1L, 100L, "p1"), (1L, 200L, "p2")).toDF("uid", "t", "tag")
    val quotes = Seq((1L, 90L, "q90"), (1L, 199L, "q199"))
      .toDF("uid2", "t2", "qtag")
    val back = AsOf.join(probes, quotes, "uid", "uid2", "t", "t2",
        tolerance = Some(5L))
      .select($"tag", $"qtag").orderBy($"tag")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // backward: p1's nearest (q90, distance 10) exceeds tol 5 -> null;
    // p2's nearest (q199, distance 1) matches
    assert(back === Seq(("p1", null), ("p2", "q199")))
    val fwd = AsOf.join(probes, quotes, "uid", "uid2", "t", "t2",
        direction = graft.plans.AsOfDirection.Forward, tolerance = Some(5L))
      .select($"tag", $"qtag").orderBy($"tag")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // forward: p1's next (q199, distance 99) exceeds tol -> null;
    // p2 has no at-or-after quote
    assert(fwd === Seq(("p1", null), ("p2", null)))
  }

  test("randomized forward direction agrees with a window reference") {
    val rnd = new scala.util.Random(7)
    val probes = (1 to 400).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
      .toDF("uid", "t", "pid")
    val quotes = (1 to 300).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong + 10000) }
      .toDF("uid2", "t2", "qid")
    val custom = AsOf.join(probes, quotes, "uid", "uid2", "t", "t2",
        direction = graft.plans.AsOfDirection.Forward)
      .select($"pid", $"t2").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // reference: min t2 >= t per (uid); ties on t2 arbitrary but t2 value unique enough
    val q = quotes.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ref = probes.collect().map { r =>
      val (u, t, pid) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cands = q.filter(x => x._1 == u && x._2 >= t).map(_._2)
      pid -> (if (cands.isEmpty) -1L else cands.min)
    }.toMap
    assert(custom === ref)
  }

  test("nearest direction picks the closer side, ties to backward") {
    val probes = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 30L, "p3"),
      (2L, 50L, "p4")).toDF("uid", "t", "tag")
    val quotes = Seq((1L, 8L, "q8"), (1L, 14L, "q14"), (1L, 26L, "q26"),
      (3L, 50L, "qx")).toDF("uid2", "t2", "qtag")
    val out = AsOf.join(probes, quotes, "uid", "uid2", "t", "t2",
        direction = graft.plans.AsOfDirection.Nearest)
      .select($"tag", $"qtag").orderBy($"tag")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // p1@10: q8 (d=2) beats q14 (d=4); p2@20: q14 (d=6) TIES q26 (d=6)
    // -> backward wins; p3@30: q26 (d=4) is the only candidate side;
    // p4 (uid 2): no quotes -> null.
    assert(out === Seq(("p1", "q8"), ("p2", "q14"), ("p3", "q26"),
      ("p4", null)))
  }

  test("nearest tolerance bounds |distance|; candidates shared across probes") {
    val probes = Seq((1L, 100L, "p1"), (1L, 101L, "p2"), (1L, 140L, "p3"))
      .toDF("uid", "t", "tag")
    val quotes = Seq((1L, 103L, "q103")).toDF("uid2", "t2", "qtag")
    val out = AsOf.join(probes, quotes, "uid", "uid2", "t", "t2",
        direction = graft.plans.AsOfDirection.Nearest, tolerance = Some(5L))
      .select($"tag", $"qtag").orderBy($"tag")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // p1 (d=3) and p2 (d=2) both match the one future quote without
    // consuming it; p3 (d=37) exceeds tol 5.
    assert(out === Seq(("p1", "q103"), ("p2", "q103"), ("p3", null)))
  }

  test("nearest ignores null on-values on either side") {
    val probes = Seq((1L, Some(10L), "p1"), (1L, None, "p2"))
      .toDF("uid", "t", "tag")
    // A null right on-value sorts first and would read as distance
    // lv - 0 in the merge; it must never out-compete the real quote.
    val quotes = Seq((1L, None: Option[Long], "qnull"), (1L, Some(100L), "q100"))
      .toDF("uid2", "t2", "qtag")
    val out = AsOf.join(probes, quotes, "uid", "uid2", "t", "t2",
        direction = graft.plans.AsOfDirection.Nearest)
      .select($"tag", $"qtag").orderBy($"tag")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // p1@10 -> q100 (the only candidate with a defined distance);
    // p2 (null on) -> no defined distance -> null match.
    assert(out === Seq(("p1", "q100"), ("p2", null)))
  }

  test("randomized nearest agrees with a brute-force reference") {
    val rnd = new scala.util.Random(11)
    val probes = (1 to 400).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
      .toDF("uid", "t", "pid")
    val quotes = (1 to 300).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong + 10000) }
      .toDF("uid2", "t2", "qid")
    val custom = AsOf.join(probes, quotes, "uid", "uid2", "t", "t2",
        direction = graft.plans.AsOfDirection.Nearest)
      .select($"pid", $"t2").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // Reference: per probe, the quote time minimizing |t2 - t|, ties to
    // the at-or-before side. Compare matched TIMES (several quotes can
    // share one time; any of them is the same t2 value).
    val q = quotes.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ref = probes.collect().map { r =>
      val (u, t, pid) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cands = q.filter(_._1 == u).map(_._2)
      pid -> (if (cands.isEmpty) -1L
      else cands.minBy(t2 => (math.abs(t2 - t), if (t2 <= t) 0 else 1)))
    }.toMap
    assert(custom === ref)
  }

  test("empty build side yields all-null matches; empty probe side is empty") {
    val probes = Seq((1L, 10L)).toDF("uid", "t")
    val empty = Seq.empty[(Long, Long)].toDF("uid2", "t2")
    val out = AsOf.join(probes, empty, "uid", "uid2", "t", "t2").collect()
    assert(out.length === 1 && out.head.isNullAt(2))
    val none = AsOf.join(empty.toDF("uid", "t"), probes.toDF("uid2", "t2"),
      "uid", "uid2", "t", "t2").collect()
    assert(none.isEmpty)
  }

  test("plans as AsOfJoinExec with sort-merge requirements satisfied") {
    val probes = Seq((1L, 10L)).toDF("uid", "t")
    val quotes = Seq((1L, 8L)).toDF("uid2", "t2")
    val df = AsOf.join(probes, quotes, "uid", "uid2", "t", "t2")
    df.collect() // force execution through EnsureRequirements
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
  }
}
