package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.NfcNormalize
import graft.ops.Graph

/** Graph analytics (PageRank, triangle counting) and Unicode NFC
  * normalization — round-5 continuation additions.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // ---- Graph.pagerank ----

  test("pagerank matches the hand-computed 2-node chain with dangling mass") {
    // 1 → 2, vertex 2 dangling. d=0.85, two iterations, worked by hand:
    //   r1 = (0.2875, 0.7125); r2 = (0.3778125, 0.6221875)
    // Both execution paths must reproduce it: the driver fixpoint
    // (default for small graphs) and the distributed join loop (forced
    // with driverSolveMax = 0).
    val verts = Seq(1L, 2L).toDF("v")
    val edges = Seq((1L, 2L, 1.0)).toDF("src", "dst", "cnt")
    for (cap <- Seq(1024, 0)) {
      val r = Graph.pagerank(verts, edges, iters = 2, damping = 0.85,
          driverSolveMax = cap)
        .orderBy($"v").collect().map(_.getDouble(1))
      assert(math.abs(r(0) - 0.3778125) < 1e-12, s"cap=$cap r(1)=${r(0)}")
      assert(math.abs(r(1) - 0.6221875) < 1e-12, s"cap=$cap r(2)=${r(1)}")
    }
  }

  test("driver fixpoint and distributed loop agree on the trade graph") {
    val q = SparkEntry.queries("g01_pagerank")
    val a = q(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    // Re-run the op with the driver path disabled over the same edges.
    val t = graft.queries.Tables(spark, "/root/testdata/sf0.001")
    val edges = t.lineitem.select("l_orderkey", "l_suppkey")
      .join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(t.supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val verts = t.nation.select(col("n_nationkey").cast("long").as("v"))
    val b = Graph.pagerank(verts, edges, iters = 5, damping = 0.85,
        driverSolveMax = 0)
      .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    assert(a.keySet === b.keySet)
    // g01 rounds at 8 decimals, so agreement is bounded by that rounding.
    a.foreach { case (k, v) =>
      assert(math.abs(v - b(k)) < 1e-7, s"nation $k: driver $v vs dist ${b(k)}")
    }
  }

  test("pagerank conserves total mass and favors the pure authority") {
    // Authority DAG: every leaf links to 1 only; 1 is dangling. No cycle,
    // so ranks converge monotonically (a cyclic graph oscillates for many
    // iterations before the damping contracts it).
    val verts = (1L to 5L).toDF("v")
    val edges = (2L to 5L).map(u => (u, 1L, 1.0)).toDF("src", "dst", "cnt")
    val rows = Graph.pagerank(verts, edges, iters = 8, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows.values.sum - 1.0) < 1e-9)
    assert(rows(1L) > 2 * rows(2L),
      s"expected the authority to dominate, got $rows")
    assert(rows(2L) === rows(3L) && rows(3L) === rows(4L) &&
      rows(4L) === rows(5L), "symmetric leaves must tie exactly")
  }

  test("g01 query: ranks form a distribution over all 25 nations") {
    val df = SparkEntry.queries("g01_pagerank")(spark,
      "/root/testdata/sf0.001")
    val ranks = df.collect().map(_.getDouble(2))
    assert(ranks.length === 25)
    assert(math.abs(ranks.sum - 1.0) < 1e-6, s"sum=${ranks.sum}")
    assert(ranks.forall(_ > 0.0))
  }

  // ---- Graph.triangleCounts ----

  test("triangleCounts: K4 puts every vertex in 3 triangles; a path has none") {
    val k4 = (for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)).toDF("a", "b")
    val got = Graph.triangleCounts(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))

    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(Graph.triangleCounts(path).count() === 0)
  }

  test("g02 query: the sf0.001 co-supply graph has the pinned triangle census") {
    val df = SparkEntry.queries("g02_triangles")(spark,
      "/root/testdata/sf0.001")
    val rows = df.collect()
    // 14 edges above the 75th-percentile support at sf0.001 → 11 triangles
    // over 7 participating nations (prototype-pinned; the DuckDB oracle
    // re-derives it independently in the driver gate).
    assert(rows.length === 7)
    assert(rows.map(_.getLong(2)).sum === 33, "11 triangles x 3 corners")
  }

  // ---- NfcNormalize ----

  test("NfcNormalize composes decomposed accents and is idempotent") {
    val decomposed = " cafe\u0301 touche\u0301"
    val composed = " caf\u00e9 touch\u00e9"
    val out = Seq(decomposed).toDF("s")
      .select(NfcNormalize($"s").as("n")).head.getString(0)
    assert(out === composed)
    val again = Seq(out).toDF("s")
      .select(NfcNormalize($"s").as("n")).head.getString(0)
    assert(again === out, "NFC must be idempotent")
  }

  test("NfcNormalize fast path returns the input object for canonical text") {
    val ascii = UTF8String.fromString("plain ascii, nothing to do")
    assert(NfcNormalize.compute(ascii) eq ascii,
      "already-NFC input must short-circuit without allocating")
  }

  test("labelPropagation finds two planted cliques across a weak bridge") {
    import graft.ops.Graph
    // Two 4-cliques {0..3} and {10..13} with weight-3 internal edges,
    // joined by ONE weight-1 bridge (3, 10): after 3 synchronous rounds
    // every vertex must carry its clique's minimum label, and the bridge
    // must NOT merge the communities (internal weight dominates the
    // argmax). Deterministic by construction — exact integer weights +
    // min-label ties.
    val cliqueA = for (a <- 0L to 3L; b <- 0L to 3L if a != b) yield (a, b, 3L)
    val cliqueB = for (a <- 10L to 13L; b <- 10L to 13L if a != b) yield (a, b, 3L)
    val bridge = Seq((3L, 10L, 1L), (10L, 3L, 1L))
    val edges = (cliqueA ++ cliqueB ++ bridge).toDF("src", "dst", "w")
    val verts = ((0L to 3L) ++ (10L to 13L) :+ 99L).toDF("v")
    def run(parts: Int): Map[Long, Long] =
      Graph.labelPropagation(verts, edges.repartition(parts), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(3)
    (0L to 3L).foreach(v => assert(got(v) === 0L, s"vertex $v not in community 0"))
    (10L to 13L).foreach(v => assert(got(v) === 10L, s"vertex $v not in community 10"))
    assert(got(99L) === 99L, "isolated vertex must keep its own label")
    assert(got === run(7), "labels drift with partitioning")
  }

  // ---- Graph.kcore ----

  /** Both directions of an undirected edge list. */
  private def und(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("kcore peels a path in cascading rounds") {
    // Path 1-2-3-4-5 with k=2: endpoints (deg 1) fall in round 1, then
    // 2 and 4 (deg now 1) in round 2, then 3 in round 3 — empty core.
    // The synchronous contract pins WHICH round each vertex drops.
    val verts = (1L to 5L).toDF("v")
    val edges = und(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val got = Graph.kcore(verts, edges, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getInt(3)))).toMap
    assert(got(1L) === ((false, 0L, 1)))
    assert(got(5L) === ((false, 0L, 1)))
    assert(got(2L) === ((false, 0L, 2)))
    assert(got(4L) === ((false, 0L, 2)))
    assert(got(3L) === ((false, 0L, 3)))
  }

  test("kcore keeps a clique, drops pendants and isolates, and is partition-invariant") {
    // K4 clique {1,2,3,4} + pendant 5 hanging off 1 + isolate 9.
    // k=3: pendant (deg 1) and isolate (deg 0) drop in round 1; the
    // clique survives with within-core degree 3 — NOT 4 for vertex 1,
    // because core_deg counts only surviving neighbors.
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("v")
    val cl = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val edges = und(cl ++ Seq((1L, 5L)))
    def run(parts: Int) =
      Graph.kcore(verts.repartition(parts), edges.repartition(parts),
          k = 3, rounds = 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getBoolean(1), r.getLong(2), r.getInt(3)))).toMap
    val got = run(3)
    (1L to 4L).foreach(v => assert(got(v) === ((true, 3L, 0)), s"v=$v"))
    assert(got(5L) === ((false, 0L, 1)))
    assert(got(9L) === ((false, 0L, 1)))
    assert(got === run(7), "kcore drifts with partitioning")
  }

  test("NfcNormalize interpreted eval matches the codegen dataframe path") {
    val inputs = Seq(" cafe\u0301", " caf\u00e9", "",
      "mixed e\u0301\u00e9", "s\u0323\u0307 \u1e69")
    val expr = NfcNormalize(BoundReference(0, StringType, nullable = true))
    val interpreted = inputs.map(s =>
      expr.eval(InternalRow(UTF8String.fromString(s))).toString)
    val codegen = inputs.toDF("s")
      .select(NfcNormalize($"s")).collect().map(_.getString(0)).toSeq
    assert(interpreted === codegen)
    assert(expr.eval(InternalRow(null)) === null)
  }
}
