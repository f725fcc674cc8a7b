package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as DataFrame loops — the Spark-first spelling
  * (GraphX's Pregel is RDD-based: no Tungsten, no codegen, no AQE, so a
  * Catalyst join loop beats it on tabular graphs).
  *
  * Scale shape shared by both operators: the edge relation is the only
  * corpus-sized artifact; per-iteration work is (edges ⋈ vertex-state),
  * keyed on one endpoint — co-partition edges by that key and every step is
  * ONE shuffle of the vertex-state relation (KB per vertex). Long loops
  * should checkpoint every ~5 steps to cut lineage depth; the query-facing
  * iteration counts here are small enough not to need it.
  */
object Graph {

  /** Weighted PageRank with uniform dangling-mass redistribution.
    *
    * `edges`: (src, dst, cnt) multiplicities — normalized to row-stochastic
    * transition weights internally. `verts`: (v) — the full vertex set,
    * including isolated vertices (they hold rank and redistribute it as
    * dangling mass). Returns (v, r) with Σr = 1 (up to float addition).
    *
    * Each step is one lazy Catalyst plan: contributions via edges⋈ranks
    * keyed on src, dangling mass via a one-row anti-join aggregate
    * broadcast back in — no per-iteration driver action. Ranks are exact
    * rational functions of the integer edge counts; only double summation
    * order varies across runs/engines (≤~1e-15 relative per step), so
    * callers round final ranks (≥6 decimals) for cross-engine hashing.
    */
  def pagerank(
      verts: DataFrame,
      edges: DataFrame,
      iters: Int,
      damping: Double): DataFrame = {
    val outdeg = edges.groupBy("src").agg(sum("cnt").as("tot"))
    val w = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), (col("cnt") / col("tot")).as("wt"))
      .persist()
    val n = verts.count().toDouble
    var ranks = verts.select(col("v"), lit(1.0 / n).as("r"))
    for (i <- 1 to iters) {
      // Truncate lineage every few steps: each iteration nests three joins
      // under the previous plan, and past ~5 levels Catalyst re-analysis
      // dominates the (vertex-bounded, KB-sized) actual work. localCheckpoint
      // keeps the blocks on the executors — no disk round-trip.
      if (i % 4 == 0) ranks = ranks.localCheckpoint()
      val contrib = w.join(ranks, w("src") === ranks("v"))
        .groupBy(col("dst")).agg(sum(col("wt") * col("r")).as("m"))
      val dangling = ranks
        .join(outdeg.select(col("src")), ranks("v") === col("src"),
          "left_anti")
        .agg(coalesce(sum("r"), lit(0.0)).as("dm"))
      ranks = verts
        .crossJoin(broadcast(dangling))
        .join(contrib, verts("v") === contrib("dst"), "left")
        .select(verts("v"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("m"), lit(0.0)) + col("dm") / lit(n))).as("r"))
    }
    ranks
  }

  /** Per-vertex triangle participation counts over canonical undirected
    * edges (a < b required — the node-iterator invariant). Returns
    * (v, n_triangles) for every vertex in ≥1 triangle.
    *
    * Wedge (a<b, b<c) closed by edge (a, c): three equi-joins, each keyed
    * on one endpoint of the vertex-bounded edge relation.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a"), col("e1.b"), col("e2.b").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
  }
}
