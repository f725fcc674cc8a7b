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

  test("search over an int8-quantized corpus keeps top-5 recall") {
    // The compressed serving path: store quantized (4x smaller), search
    // on the dequantized reconstruction — recall vs the float corpus is
    // what the half-step error bound buys end to end.
    val model = graft.ops.Quantize.fit(emb, "embedding")
    val deq = emb.select($"vec_id",
      graft.ops.Quantize.dequantize(
        graft.ops.Quantize.quantize($"embedding", model), model)
        .as("embedding"))
    val probes = emb.filter($"vec_id" < 20)
    val qTop = Similarity.bruteForceTopK(deq, probes, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val fTop = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (qTop & fTop).size.toDouble / fTop.size
    assert(recall >= 0.9, s"quantized-corpus recall $recall")
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

  test("semi-join pruning fallback returns exactly the IN-list path's results") {
    // Serving-path hardening: past maxInListCells routed cells the IN
    // literal (a codegen recompile per distinct probe set) gives way to a
    // broadcast semi join on the routed cell set. Same index, same probes,
    // maxInListCells = 0 forces the fallback — results must be identical
    // row-for-row, rank-for-rank.
    val index = Ivf.build(emb, "vec_id", "embedding", numCells = 8, iterations = 2)
    val probes = emb.filter($"vec_id" < 20)
    def run(maxInList: Int) =
      Ivf.search(index, probes, "vec_id", "embedding", k = 5, nprobe = 3,
          maxInListCells = maxInList)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val inList = run(maxInList = 256)
    val semiJoin = run(maxInList = 0)
    assert(inList === semiJoin)
    assert(inList.nonEmpty)
  }

  test("index cells partition the corpus") {
    val index = Ivf.build(emb, "vec_id", "embedding", numCells = 8, iterations = 1)
    val total = index.cells.count()
    assert(total === emb.count())
    val cellCount = index.cells.select(countDistinct(col("cell"))).collect().head.getLong(0)
    assert(cellCount > 1 && cellCount <= 8)
  }

  test("cell-partitioned lake layout prunes FILES to the routed cells") {
    // The 100 TB claim behind Ivf.search's routed-cell IN predicate: on a
    // lake the cells relation is written partitionBy("cell"), and the same
    // declarative filter then prunes at the file listing — a nprobe-cell
    // probe reads nprobe directories, not the corpus.
    val index = Ivf.build(emb, "vec_id", "embedding", numCells = 8, iterations = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-lake").toString
    index.cells.write.mode("overwrite").partitionBy("cell").parquet(dir)
    val lake = spark.read.parquet(dir)
    val cells = lake.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted.take(2)
    val routed = lake.filter(col("cell").isin(cells.map(Integer.valueOf): _*))
    // The physical scan's file listing after partition pruning holds only
    // the routed cell directories (inputFiles is pre-pruning, so the
    // assertion goes to FileSourceScanExec.selectedPartitions).
    val scan = routed.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty, "cell filter must prune at listing")
    assert(scan.selectedPartitions.partitionCount === cells.length,
      s"expected ${cells.length} partition dirs read")
    // And the pruned read still returns exactly those cells' rows.
    assert(routed.count() ===
      index.cells.filter(col("cell").isin(cells.map(Integer.valueOf): _*)).count())
  }

  test("extend appends the batch at unchanged centroids, existing rows untouched") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val idx = graft.ops.Ivf.build(base, "vec_id", "embedding",
      numCells = 8, iterations = 1)
    val ext = graft.ops.Ivf.extend(idx, batch, "vec_id", "embedding")
    assert(ext.cells.count() === emb.count())
    // Centroids are the SAME object relation — no re-clustering.
    assert(ext.centroids.collect().map(_.toString).sorted.toSeq ===
      idx.centroids.collect().map(_.toString).sorted.toSeq)
    // Existing rows keep their cell; batch rows land at their argmax cell
    // of the OLD centroids (re-assigning the union must change nothing).
    val reassigned = graft.ops.Ivf.extend(
      graft.ops.Ivf.IvfIndex(ext.cells.limit(0), idx.centroids), emb,
      "vec_id", "embedding").cells
    val joined = ext.cells.select(col("vec_id"), col("cell").as("c1"))
      .join(reassigned.select(col("vec_id"), col("cell").as("c2")), "vec_id")
    assert(joined.filter(col("c1") =!= col("c2")).count() === 0)
  }

  test("save/load round-trips the index: identical search, extendable") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = graft.ops.Ivf.build(emb, "vec_id", "embedding",
      numCells = 8, iterations = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf_saveload").toString
    graft.ops.Ivf.save(idx, dir)
    val loaded = graft.ops.Ivf.load(spark, dir, "vec_id", "embedding")
    assert(loaded.cells.count() === idx.cells.count())
    val probes = emb.filter(col("vec_id") < 5)
    val a = graft.ops.Ivf.search(idx, probes, "vec_id", "embedding", 5, 4)
      .collect().map(_.toString).sorted.toSeq
    val b = graft.ops.Ivf.search(loaded, probes, "vec_id", "embedding", 5, 4)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b, "loaded-index search must equal in-memory search")
    // The loaded index accepts incremental batches like the original.
    val more = emb.select((col("vec_id") + 100000L).as("vec_id"),
      col("embedding"))
    val ext = graft.ops.Ivf.extend(loaded, more, "vec_id", "embedding")
    assert(ext.cells.count() === 2 * emb.count())
  }

  test("filtered search: full probe == brute over the filtered corpus, pruned stays in-predicate") {
    val index = Ivf.build(emb, "vec_id", "embedding", numCells = 8,
      iterations = 1)
    val probes = emb.filter($"vec_id" < 5)
    val pred = $"label" === 3
    // Full probe: exactly brute force restricted to matching rows.
    val full = Ivf.searchFiltered(index, pred, probes, "vec_id", "embedding",
        k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(emb.filter(pred), probes,
        "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full === brute)
    // Every full-probe result satisfies the predicate (self-exclusion
    // still applies even when a probe itself matches).
    val matching = emb.filter(pred).select($"vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(full.forall(t => matching.contains(t._3)))
    // Pruned nprobe: results are a subset of matching rows too — the
    // predicate applies INSIDE the routed scan, not after ranking.
    val pruned = Ivf.searchFiltered(index, pred, probes, "vec_id",
        "embedding", k = 5, nprobe = 2)
      .collect().map(_.getLong(2)).toSet
    assert(pruned.subsetOf(matching))
  }

  test("cellsFor: gate corpora reproduce the measured constants") {
    // The contract that lets the law replace the gate constants without
    // moving any contract floor: the corpora every floor was measured at
    // size back to exactly the old constants.
    assert(Ivf.cellsFor(500) === 16) //  sf0.01 gate, raw-vector cells
    assert(Ivf.cellsFor(500, costRatio = 8.0) === 8) // IVFPQ gate
    // sqrt growth, pow2-rounded up.
    assert(Ivf.cellsFor(2000) === 32)
    assert(Ivf.cellsFor(20000) === 128)
    assert(Ivf.cellsFor(200000) === 512)
    assert(Ivf.cellsFor(200000, costRatio = 8.0) === 256)
    // Degenerate and capped ends.
    assert(Ivf.cellsFor(0) === 1)
    assert(Ivf.cellsFor(1) === 1)
    assert(Ivf.cellsFor(Long.MaxValue) === 4096)
    assert(Ivf.cellsFor(Long.MaxValue, cap = 1024) === 1024)
    // Exact pow2 boundary: sqrt(n/2) == 16 exactly must NOT jump to 32.
    assert(Ivf.cellsFor(512) === 16)
  }

  test("nprobeFor: 2/3-power growth from the gate point, clamped to [gate, cells]") {
    assert(Ivf.nprobeFor(16, 16, 4) === 4) // gate point is a fixpoint
    assert(Ivf.nprobeFor(8, 8, 4) === 4)
    assert(Ivf.nprobeFor(32, 16, 4) === 7)
    assert(Ivf.nprobeFor(128, 16, 4) === 16) // exact cube: 16^3 = 4096
    assert(Ivf.nprobeFor(512, 16, 4) === 41) // the measured sf10 point
    assert(Ivf.nprobeFor(256, 8, 4) === 41)
    assert(Ivf.nprobeFor(64, 8, 4) === 16)
    // Below the gate geometry: never probe more cells than exist.
    assert(Ivf.nprobeFor(2, 16, 4) === 2)
    assert(Ivf.nprobeFor(1, 16, 4) === 1)
  }

  test("law-sized full probe is still exactly brute force") {
    val n = emb.count()
    val cells = Ivf.cellsFor(n)
    val index = Ivf.build(emb, "vec_id", "embedding", numCells = cells,
      iterations = 1)
    val probes = emb.filter($"vec_id" < 5)
    val ivf = Ivf.search(index, probes, "vec_id", "embedding", k = 5,
        nprobe = cells)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding",
        k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf === brute)
  }
}
