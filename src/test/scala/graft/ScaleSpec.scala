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

  test("keyHistogram surfaces the heaviest keys first") {
    val h = Skew.keyHistogram(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
      "l_returnflag", topN = 3).collect()
    assert(h.length === 3)
    assert(h.sliding(2).forall { case Array(a, b) => a.getLong(1) >= b.getLong(1) })
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
