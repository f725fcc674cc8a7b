package graft

import org.apache.spark.sql.functions._

import graft.functions.vector
import graft.plans.ApproxCosineJoinRule

/** The opt-in cross-join→LSH rewrite: plan shape changes (no cartesian
  * product), results stay correct (recall-complete settings on this data),
  * and the rule leaves plans alone when disabled.
  */
class ApproxCosineRuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def pairQuery = {
    val a = emb.select($"vec_id".as("id_a"), $"embedding".as("vec_a"))
    val b = emb.select($"vec_id".as("id_b"), $"embedding".as("vec_b"))
    a.crossJoin(b)
      .filter($"id_a" < $"id_b" &&
        vector.cosine($"vec_a", $"vec_b") >= 0.45)
      .select($"id_a", $"id_b")
  }

  test("rule fires with swapped operand sides too") {
    ApproxCosineJoinRule.install(spark)
    spark.conf.set(ApproxCosineJoinRule.EnabledKey, "true")
    try {
      val a = emb.select($"vec_id".as("id_a"), $"embedding".as("vec_a"))
      val b = emb.select($"vec_id".as("id_b"), $"embedding".as("vec_b"))
      // cosine(right_col, left_col): the conjunct's first arg comes from
      // the JOIN'S RIGHT side — exercises the side-swap path.
      val q = a.crossJoin(b)
        .filter($"id_a" < $"id_b" && vector.cosine($"vec_b", $"vec_a") >= 0.45)
        .select($"id_a", $"id_b")
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_"))
      assert(q.count() > 0)
    } finally spark.conf.set(ApproxCosineJoinRule.EnabledKey, "false")
  }

  test("disabled: plan keeps the cartesian/broadcast-nested-loop join") {
    spark.conf.set(ApproxCosineJoinRule.EnabledKey, "false")
    ApproxCosineJoinRule.install(spark)
    val plan = pairQuery.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_"))
  }

  test("enabled: cartesian product replaced by a bucket join, same results") {
    ApproxCosineJoinRule.install(spark)
    spark.conf.set(ApproxCosineJoinRule.EnabledKey, "false")
    val exact = pairQuery.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    spark.conf.set(ApproxCosineJoinRule.EnabledKey, "true")
    try {
      val rewritten = pairQuery
      val optimized = rewritten.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_"), s"rule did not fire:\n$optimized")
      val physical = rewritten.queryExecution.executedPlan.toString
      assert(!physical.contains("CartesianProduct"),
        s"cartesian survived:\n$physical")
      val approx = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // Precision is exact by construction (original predicate re-verified).
      assert(approx.subsetOf(exact))
      // With 16 two-bit bands on this data, recall is complete.
      assert(approx === exact, s"missed pairs: ${exact -- approx}")
      assert(exact.nonEmpty)
    } finally spark.conf.set(ApproxCosineJoinRule.EnabledKey, "false")
  }
}
