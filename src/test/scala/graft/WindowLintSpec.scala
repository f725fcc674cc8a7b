package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Global-window boundedness lint (round-10 verdict task 7).
  *
  * A `Window.orderBy(...)` with NO partitionBy executes as a single task
  * sorting its whole input — fine over a relation bounded by a limit or an
  * aggregation onto a bounded domain, a corpus-scale serialization point
  * otherwise (the t18/s09/q47 disease class). This lint walks the
  * optimized plan of EVERY registered query and enforces two invariants:
  *
  *  1. every partition-less Window sits above an Aggregate or Limit in
  *     its child subtree (never directly over a scan/join of a fact
  *     relation), and
  *  2. the exact set of queries that plan ANY partition-less Window is
  *     pinned — introducing a new one (even a bounded one) fails here and
  *     forces the justification below to be updated.
  *
  * Known limitation, stated: subtrees hidden behind a persisted relation
  * (InMemoryRelation) are not walked — the memoized family artifacts are
  * aggregation-shaped by construction, and the cachedPlan is inspected
  * where Spark exposes it.
  */
class WindowLintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries allowed to carry a partition-less Window, each with the
    * boundedness argument (checked against invariant 1 too):
    * see the assertion message for the live set on drift.
    */
  private val allowed: Set[String] = Set(
    "q40_histogram", // cumulative over the |bins| aggregate
    "s04_global_shuffle", // Sampling.globalShuffle bucket-offset relation
    "s13_kfold", // pct over the 5-row fold aggregate
    "s15_temporal_split", // rank over the |days| aggregate
    "s18_epoch_plan", // epoch totals over the |sources| aggregate
    "st18_stream_drift", // see boundedByConstruction
    "t15_hybrid_rrf", // ranks over the two top-50 limited arms
    "t19_domain_kl", // totals over the Zipf-bounded (domain, token) counts
    "t21_ndcg", // rank over the top-10 limited run
    "t34_zipf_slope", // rank over the 1000-row limited top
    "v09_ivf_topk", // recall compare over the k x probes limited lists
    "v22_nprobe_sweep") // sweep over the |nprobe grid| aggregate

  /** Exempt from invariant 1 ONLY: the window input is bounded by an
    * aggregation the plan walk cannot see (it sits behind a materialized
    * streaming result, not in this logical plan). Every entry must say
    * why.
    */
  private val boundedByConstruction: Map[String, String] = Map(
    "st18_stream_drift" -> ("the grand-total window runs over the CLOSED " +
      "hourly-count table runToTable materialized — an hours x types " +
      "bounded streaming aggregation output; the aggregation lives in the " +
      "stream, upstream of the scanned sink relation"))

  private def windowsOf(plan: LogicalPlan): Seq[Window] =
    plan.collect { case w: Window => w }

  test("partition-less windows are bounded and their query set is pinned") {
    val global = scala.collection.mutable.SortedSet.empty[String]
    val unbounded = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df =
        try fn(spark, sf)
        catch { case e: Exception => fail(s"$name failed to build: $e") }
      val plan = df.queryExecution.optimizedPlan
      windowsOf(plan).filter(_.partitionSpec.isEmpty).foreach { w =>
        global += name
        val bounded = w.child.collectFirst {
          case _: Aggregate => ()
          case _: GlobalLimit => ()
          case _: LocalLimit => ()
        }.isDefined
        if (!bounded && !boundedByConstruction.contains(name))
          unbounded += s"$name: ${w.simpleString(60)}"
      }
    }
    assert(unbounded.isEmpty,
      s"partition-less Window over an unbounded relation (the t18/q47 " +
        s"scale trap):\n  ${unbounded.mkString("\n  ")}")
    assert(global.toSet === allowed,
      s"the set of queries planning partition-less Windows drifted — " +
        s"justify and re-pin. Live set: ${global.mkString(", ")}")
  }
}
