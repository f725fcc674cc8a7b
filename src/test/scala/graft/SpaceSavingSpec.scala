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

  test("Summary's heap eviction replays the reference scan exactly") {
    // The O(log C) lazy-heap path must pick the SAME victim as the
    // reference minBy scan (min count, insertion-order tie-break) on an
    // eviction-heavy stream with many count ties — byte-identical wire
    // output, not just the same top-k.
    import graft.functions.SpaceSaving
    val rnd = new scala.util.Random(7)
    val stream = Seq.fill(20000)(s"k${rnd.nextInt(600)}") ++
      (1 to 400).map(i => s"fresh$i") // forced evictions at the tail
    val cap = 64
    val ref = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    stream.foreach(k => SpaceSaving.offer(ref, k, 1L, cap))
    val fast = SpaceSaving.emptySummary()
    stream.foreach(k => fast.offer(k, 1L, cap))
    assert(fast.buf.toSeq === ref.toSeq)
    assert(java.util.Arrays.equals(
      SpaceSaving.serialize(fast.buf), SpaceSaving.serialize(ref)))
    // And a serialize/deserialize round-trip mid-stream (the streaming
    // state-cell path) continues identically.
    val (head, tail) = stream.splitAt(9999)
    val a = SpaceSaving.emptySummary()
    head.foreach(k => a.offer(k, 1L, cap))
    val b = SpaceSaving.deserializeSummary(SpaceSaving.serialize(a.buf))
    tail.foreach(k => b.offer(k, 1L, cap))
    assert(b.buf.toSeq === ref.toSeq)
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
