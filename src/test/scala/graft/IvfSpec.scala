package graft

import graft.ops.{Ivf, Similarity}

/** IVF index/search: exact equivalence to brute force at full nprobe, and
  * sane recall at reduced nprobe.
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("search with nprobe == numCells is exactly brute force") {
    val index = Ivf.build(emb, "vec_id", "embedding", numCells = 8, iterations = 1)
    val probes = emb.filter($"vec_id" < 5)
    val ivf = Ivf.search(index, probes, "vec_id", "embedding", k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf === brute)
  }

  test("reduced nprobe keeps high recall on the top-5") {
    val index = Ivf.build(emb, "vec_id", "embedding", numCells = 8, iterations = 2)
    val probes = emb.filter($"vec_id" < 20)
    val ivf = Ivf.search(index, probes, "vec_id", "embedding", k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall too low for nprobe=4 of 8 cells")
    // every returned neighbor is ranked and unique per query
    assert(ivf.size === 20 * 5)
  }

  test("index cells partition the corpus") {
    val index = Ivf.build(emb, "vec_id", "embedding", numCells = 8, iterations = 1)
    val total = index.cells.count()
    assert(total === emb.count())
    val cellCount = index.cells.select(countDistinct(col("cell"))).collect().head.getLong(0)
    assert(cellCount > 1 && cellCount <= 8)
  }
}
