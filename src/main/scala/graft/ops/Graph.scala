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
      damping: Double,
      driverSolveMax: Int = 1024): DataFrame = {
    // Persist the edge relation BEFORE it fans out: outdeg and the
    // normalized-weight join both consume it, and without the cache the
    // (potentially corpus-sized) upstream edge build runs once per branch.
    val e = edges.persist()
    val nVerts = verts.count()
    val n = nVerts.toDouble

    // Dimension-graph driver fixpoint: when |V| <= driverSolveMax the
    // aggregated edge relation is |V|²-bounded (<= ~1M rows / ~24 MB at
    // the default cap) — the same driver-solve trade as Pca's 64x64
    // eigenproblem. One distributed aggregation builds the edges; the
    // 5-50 fixpoint iterations then cost MICROSECONDS in a dense loop
    // instead of ~4 scheduled stages each (measured 1-1.5 s/iteration of
    // pure scheduling for a 625-edge graph). Above the cap: distributed
    // join loop, where ranks/edges stay partitioned.
    if (nVerts <= driverSolveMax) {
      val spark = verts.sparkSession
      import spark.implicits._
      val vertIds = verts.select(col("v").cast("long")).collect()
        .map(_.getLong(0))
      val idx = vertIds.sorted.zipWithIndex.toMap
      val ed = e.select(col("src").cast("long"), col("dst").cast("long"),
        col("cnt").cast("double")).collect()
        .map(r => (idx(r.getLong(0)), idx(r.getLong(1)), r.getDouble(2)))
      val outTot = new Array[Double](idx.size)
      ed.foreach { case (s, _, c) => outTot(s) += c }
      var r = Array.fill(idx.size)(1.0 / n)
      // Deterministic summation order: edges sorted by (dst, src) so the
      // per-vertex fold is a pure function of the graph (the distributed
      // path's groupBy order differs only in sub-1e-15 float tails, under
      // any sane caller rounding).
      val byDst = ed.sortBy(t => (t._2, t._1))
      for (_ <- 1 to iters) {
        val next = Array.fill(idx.size)((1.0 - damping) / n)
        var dang = 0.0
        var i = 0
        while (i < r.length) {
          if (outTot(i) == 0.0) dang += r(i); i += 1
        }
        byDst.foreach { case (s, d, c) =>
          next(d) += damping * (c / outTot(s)) * r(s)
        }
        i = 0
        while (i < next.length) {
          next(i) += damping * dang / n; i += 1
        }
        r = next
      }
      val inv = idx.map(_.swap)
      return (0 until idx.size).map(i => (inv(i), r(i))).toDF("v", "r")
    }
    // Two knobs above the driver-solve cap, both keyed on |V|:
    //  - broadcastable (<= ~1M vertices, tens of MB of rank state): pin
    //    broadcast hash joins for every vertex-bounded side, so the edge
    //    relation is NEVER shuffled — each iteration is one map-side BHJ
    //    over the cached weights plus one dst-keyed aggregation exchange.
    //    A web-scale graph (10^9 vertices) exceeds any broadcast: it falls
    //    through to co-partitioned shuffle joins, the classic
    //    PageRank-on-Spark shape.
    //  - tiny (<= 4096 vertices, reachable only with a raised
    //    driverSolveMax): additionally coalesce the |V|²-bounded weight
    //    relation to one partition — near-empty 32-task stages otherwise
    //    dominate (measured 1-1.5 s/iteration for a 625-edge graph).
    val broadcastable = nVerts <= (1L << 20)
    val tiny = nVerts <= 4096
    val outdeg0 = e.groupBy("src").agg(sum("cnt").as("tot"))
    val outdeg = if (broadcastable) broadcast(outdeg0) else outdeg0
    val w0 = e.join(outdeg, "src")
      .select(col("src"), col("dst"), (col("cnt") / col("tot")).as("wt"))
    val w = (if (tiny) w0.coalesce(1) else w0).persist()
    def hinted(df: DataFrame): DataFrame =
      if (broadcastable) broadcast(df) else df

    var ranks = verts.select(col("v"), lit(1.0 / n).as("r"))
    for (_ <- 1 to iters) {
      val contrib = w.join(hinted(ranks), w("src") === col("v"))
        .groupBy(col("dst")).agg(sum(col("wt") * col("r")).as("m"))
      val dangling = ranks
        .join(hinted(outdeg0.select(col("src"))), ranks("v") === col("src"),
          "left_anti")
        .agg(coalesce(sum("r"), lit(0.0)).as("dm"))
      ranks = verts
        .crossJoin(broadcast(dangling))
        .join(hinted(contrib), verts("v") === contrib("dst"), "left")
        .select(verts("v"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("m"), lit(0.0)) + col("dm") / lit(n))).as("r"))
      // Materialize EVERY step: ranks is consumed twice next iteration
      // (contribution join + dangling-mass aggregate), so an unmaterialized
      // lineage doubles per step — measured 45 s for 5 iterations at
      // 100k x 2M edges vs ~7 s materialized. The vertex-bounded relation
      // is KB-MB; localCheckpoint keeps the blocks executor-local. On a
      // cluster needing executor-loss tolerance, swap in `checkpoint` with
      // a durable checkpoint dir every few steps.
      ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Deterministic fixed-iteration label propagation (community
    * detection; Raghavan et al. 2007, synchronous variant): every vertex
    * starts as its own label; each of `iters` steps relabels every vertex
    * to the neighbor label with the greatest total incoming edge weight,
    * ties broken by the SMALLEST label. Free-running asynchronous LPA is
    * run-order-dependent (the paper's known nondeterminism); pinning
    * synchronous updates + a fixed iteration count + the min-label tie
    * rule makes the output a pure function of the graph — replayable by
    * another engine step for step, which is what the g05 oracle does.
    *
    * `edges`: (src, dst, w) DIRECTED messages — pass both directions for
    * an undirected graph. Keep `w` integral: label picks then compare
    * exact integers and the argmax is engine-portable (float weights
    * would make near-ties summation-order-dependent).
    *
    * Scale shape, per step: one (dst-keyed) join of the edge relation
    * against the label state — one (v, l) long pair per vertex, ~16
    * bytes, at any graph size — one (vertex, label) partial-aggregated
    * count, one per-vertex top-1 window: the PageRank loop's cost
    * profile, with the same localCheckpoint per step to keep lineage
    * flat.
    */
  def labelPropagation(verts: DataFrame, edges: DataFrame,
      iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nVerts = verts.count()
    val broadcastable = nVerts <= (1L << 20)
    // Dimension-sized graphs (pagerank's `tiny` rule): run each round's
    // vertex-bounded relations on ONE partition — near-empty 32-task
    // window/checkpoint stages otherwise dominate the loop (measured
    // ~1 s/round for a 25-vertex graph).
    val tiny = nVerts <= 4096
    val e0 = edges.select(col("src"), col("dst"), col("w"))
    val e = (if (tiny) e0.coalesce(1) else e0).persist()
    def hinted(df: DataFrame): DataFrame =
      if (broadcastable) broadcast(df) else df
    var labels = verts.select(col("v"), col("v").as("l"))
    labels = if (tiny) labels.coalesce(1) else labels
    for (_ <- 1 to iters) {
      val msgs = e.join(hinted(labels), e("dst") === labels("v"))
        .groupBy(e("src").as("mv"), col("l").as("nl"))
        .agg(sum(col("w")).as("ws"))
      val pick = msgs
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("mv")).orderBy(col("ws").desc, col("nl"))))
        .filter(col("rk") === 1)
        .select(col("mv"), col("nl"))
      labels = labels.join(hinted(pick), labels("v") === col("mv"), "left")
        .select(labels("v"), coalesce(col("nl"), col("l")).as("l"))
        .localCheckpoint()
    }
    labels
  }

  /** Fixed-round k-core peeling (Seidman 1983 degeneracy cores; the
    * spam/link-farm density signal on web graphs, and the "dense cluster
    * of near-identical hosts" prior a crawl-curation pipeline uses).
    * Synchronous variant: each round computes every still-alive vertex's
    * degree WITHIN the alive subgraph and removes all vertices below `k`
    * at once — the free-running peel is removal-order-dependent in its
    * intermediate states, while the synchronous one is a pure function
    * of the graph at every round, so another engine can replay it stage
    * by stage (the g06 oracle does exactly that). The surviving set
    * converges to the true k-core once a round removes nothing; `rounds`
    * bounds the iteration count the way LPA's fixed T does, and the
    * returned `peel_round` (0 = survived all rounds, r = first round the
    * vertex fell below k) is the coreness-ordering diagnostic.
    *
    * `verts`: (v). `edges`: (src, dst) directed BOTH ways for an
    * undirected graph, deduplicated — degree = alive-neighbor count.
    * Returns (v, in_core, core_deg, peel_round) where core_deg is the
    * vertex's degree within the FINAL surviving subgraph (0 outside it).
    *
    * Scale shape, per round: one dst-keyed join of the edge relation
    * against the alive set (vertex-bounded — broadcast under the same
    * |V| <= 2^20 rule as LPA/PageRank), one src-side alive semi-join,
    * one partial-aggregated degree count, one vertex-bounded peel-state
    * update; localCheckpoint per round keeps lineage flat. All exact
    * integer arithmetic — no float drift anywhere.
    */
  def kcore(verts: DataFrame, edges: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    val nVerts = verts.count()
    val broadcastable = nVerts <= (1L << 20)
    val tiny = nVerts <= 4096
    val e0 = edges.select(col("src"), col("dst"))
    val e = (if (tiny) e0.coalesce(1) else e0).persist()
    def hinted(df: DataFrame): DataFrame =
      if (broadcastable) broadcast(df) else df
    // peel = 0 while alive; set to the round number when the vertex drops.
    var state = verts.select(col("v"), lit(0).as("peel"))
    state = if (tiny) state.coalesce(1) else state
    def degOver(alive: DataFrame): DataFrame =
      e.join(hinted(alive.select(col("v").as("dv"))), e("dst") === col("dv"))
        .join(hinted(alive.select(col("v").as("sv"))), e("src") === col("sv"))
        .groupBy(e("src").as("v")).agg(count(lit(1)).as("deg"))
    for (r <- 1 to rounds) {
      val alive = state.filter(col("peel") === 0).select(col("v"))
      val surv = degOver(alive).filter(col("deg") >= k)
        .select(col("v").as("sv"))
      state = state.join(hinted(surv), state("v") === col("sv"), "left")
        .select(state("v"),
          when(col("peel") =!= 0, col("peel"))
            .when(col("sv").isNull, lit(r))
            .otherwise(lit(0)).as("peel"))
        .localCheckpoint()
    }
    val core = state.filter(col("peel") === 0).select(col("v"))
    state.join(degOver(core).withColumnRenamed("v", "cv"),
        state("v") === col("cv"), "left")
      .select(state("v"), (col("peel") === 0).as("in_core"),
        coalesce(col("deg"), lit(0L)).as("core_deg"),
        col("peel").as("peel_round"))
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
