package graft

import org.apache.spark.sql.functions._

import graft.functions.SpaceSavingTopK
import graft.ops.Dedup

/** SpaceSaving heavy hitters: exact when capacity covers the key space,
  * bounded over-estimates otherwise, correct partial merges across
  * partitions.
  */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  test("exact top-k when capacity exceeds distinct keys") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tokens = docs.select(explode(Dedup.tokens($"text")).as("token"))
      .repartition(8) // force multi-partition partials + merge
    val approx = tokens
      .select(SpaceSavingTopK.topK($"token", 10, capacity = 10000).as("m"))
      .collect().head.getMap[String, Long](0)
    val exact = tokens.groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token").limit(10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.toMap === exact)
  }

  test("capacity-bounded run never under-counts and keeps the heaviest key") {
    val skewed = (Seq.fill(500)("hot") ++ (1 to 300).map(i => s"cold$i"))
    val df = skewed.toDF("v").repartition(4)
    val m = df.select(SpaceSavingTopK.topK($"v", 3, capacity = 16).as("m"))
      .collect().head.getMap[String, Long](0).toMap
    assert(m.contains("hot"))
    assert(m("hot") >= 500L) // SpaceSaving over-estimates, never under
  }

  test("works with groupBy keys") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val byLang = docs
      .select($"lang", explode(Dedup.tokens($"text")).as("token"))
      .groupBy($"lang")
      .agg(SpaceSavingTopK.topK($"token", 3, capacity = 10000).as("top3"))
      .collect()
    assert(byLang.length === 5)
    byLang.foreach(r => assert(r.getMap[String, Long](1).size === 3))
  }
}
