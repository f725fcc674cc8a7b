package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pq, Similarity}

/** Product quantization: exactness when the codebook can represent every
  * sub-vector, recall sanity under real compression, determinism, and
  * codegen (no interpreted fallback on the scan path).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("ksub >= corpus size makes ADC scoring exactly the true dot") {
    // With one centroid available per training row and Lloyd converged,
    // every sub-vector is its own centroid: encoding is lossless and the
    // ADC score must equal the exact inner product to the last rounded
    // digit — the PQ analogue of v11's full-probe == brute contract.
    val tiny = emb.filter($"vec_id" < 8)
    val model = Pq.fit(tiny, "vec_id", "embedding", m = 8, ksub = 8,
      iterations = 2)
    val enc = Pq.encode(tiny, "vec_id", "embedding", model)
    val probes = tiny.filter($"vec_id" < 3)
    def collect(df: org.apache.spark.sql.DataFrame, score: String) = df
      .select($"query_id", $"rnk", $"vec_id", col(score).as("score"))
      .collect().map(r => ((r.getLong(0), r.getInt(1), r.getLong(2)), r.getDouble(3)))
      .sortBy(_._1)
    val adc = collect(
      Pq.adcTopK(enc, probes, "vec_id", "embedding", model, k = 5), "adc")
    val exact = collect(
      Similarity.mipsTopK(tiny, probes, "vec_id", "embedding", k = 5), "ip")
    // Rankings must be identical; scores agree to the centroid round-6
    // quantum (fit rounds means to 6 decimals for run-determinism, so the
    // "own centroid" reconstruction is the sub-vector +- 5e-7/element).
    assert(adc.map(_._1).toSeq === exact.map(_._1).toSeq)
    adc.zip(exact).foreach { case ((key, a), (_, e)) =>
      assert(math.abs(a - e) <= 5e-6, s"$key: adc $a vs exact $e")
    }
  }

  test("compressed search keeps top-10 recall on the real corpus") {
    // 64-dim float32 -> 8 codes of 5 bits: 51x compression. Recall@10 vs
    // the exact MIPS ranking is the quantity the PQ trade sells. The
    // synthetic embeddings are near-isotropic — PQ's worst case (no
    // cluster structure for the codebooks to exploit) — so the floor is
    // set above 10x chance (10/499 ~ 2%), not at production recall.
    val (model, enc) = Pq.encodeCached(emb, "vec_id", "embedding",
      m = 8, ksub = 32)
    val probes = emb.filter($"vec_id" < 20)
    val pq = Pq.adcTopK(enc, probes, "vec_id", "embedding", model, k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.mipsTopK(emb, probes, "vec_id", "embedding", k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"PQ recall@10 $recall below floor")
    assert(pq.size === 20 * 10)
  }

  test("fit is deterministic and encode survives repartitioning") {
    val m1 = Pq.fit(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val m2 = Pq.fit(emb.repartition(13), "vec_id", "embedding", m = 8, ksub = 16)
    assert(m1.codebooks.flatten.flatten.toSeq === m2.codebooks.flatten.flatten.toSeq)
    val c1 = Pq.encode(emb, "vec_id", "embedding", m1)
      .orderBy($"vec_id").collect().map(_.getSeq[Int](1))
    val c2 = Pq.encode(emb.repartition(7), "vec_id", "embedding", m2)
      .orderBy($"vec_id").collect().map(_.getSeq[Int](1))
    assert(c1.zip(c2).forall { case (a, b) => a == b })
    assert(c1.forall(codes => codes.length == 8 && codes.forall(k => k >= 0 && k < 16)))
  }

  test("IVF-PQ with full probe and lossless residual codes equals exact MIPS") {
    // nprobe == numCells removes routing loss; ksub >= corpus removes
    // quantization loss (every residual is its own centroid) — so the
    // whole composed path dot(q, c_cell) + ADC(residual codes) must
    // reproduce the exact inner-product ranking. The composed analogue of
    // v11's IVF contract and the lossless PQ case above.
    val tiny = emb.filter($"vec_id" < 16)
    val index = Pq.buildIvfPq(tiny, "vec_id", "embedding",
      numCells = 4, m = 8, ksub = 16, iterations = 2)
    val probes = tiny.filter($"vec_id" < 3)
    val composed = Pq.ivfPqTopK(index, probes, "vec_id", "embedding",
        k = 5, nprobe = 4)
      .select($"query_id", $"rnk", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    val exact = Similarity.mipsTopK(tiny, probes, "vec_id", "embedding", k = 5)
      .select($"query_id", $"rnk", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(composed === exact)
  }

  test("IVF-PQ routed search keeps recall while scanning only nprobe cells") {
    val index = Pq.buildIvfPqCached(emb, "vec_id", "embedding",
      numCells = 8, m = 8, ksub = 32)
    val probes = emb.filter($"vec_id" < 20)
    val routed = Pq.ivfPqTopK(index, probes, "vec_id", "embedding",
        k = 10, nprobe = 4)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.mipsTopK(emb, probes, "vec_id", "embedding", k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (routed & exact).size.toDouble / exact.size
    assert(recall >= 0.15, s"IVF-PQ recall@10 $recall below floor")
    assert(routed.size === 20 * 10)
    // The semi-join fallback returns the identical result set.
    val fallback = Pq.ivfPqTopK(index, probes, "vec_id", "embedding",
        k = 10, nprobe = 4, maxInListCells = 0)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fallback === routed)
  }

  test("IVF-PQ rerank: exact stage-2 scoring lifts recall over raw ADC order") {
    val index = Pq.buildIvfPqCached(emb, "vec_id", "embedding",
      numCells = 8, m = 8, ksub = 32)
    val probes = emb.filter($"vec_id" < 20)
    def recallOf(df: org.apache.spark.sql.DataFrame, exact: Set[(Long, Long)]) = {
      val got = df.select($"query_id", $"vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got, (got & exact).size.toDouble / exact.size)
    }
    val exact = Similarity.mipsTopK(emb, probes, "vec_id", "embedding", k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (plain, plainRecall) = recallOf(
      Pq.ivfPqTopK(index, probes, "vec_id", "embedding", k = 10, nprobe = 4),
      exact)
    val (reranked, rerankRecall) = recallOf(
      Pq.ivfPqTopKRerank(index, emb, probes, "vec_id", "embedding",
        k = 10, nprobe = 4, rerankFactor = 4), exact)
    assert(reranked.size === plain.size)
    // Stage 2 rescores a 4x shortlist exactly, so every true neighbor the
    // compressed scan surfaces anywhere in the top-40 is promoted: recall
    // can only improve over trusting the ADC order.
    assert(rerankRecall >= plainRecall,
      s"rerank $rerankRecall < plain ADC $plainRecall")
    // With routing loss removed (nprobe == numCells) and the whole corpus
    // in the shortlist, stage 2 IS exact MIPS — rank-for-rank.
    val n = emb.count().toInt
    val full = Pq.ivfPqTopKRerank(index, emb, probes, "vec_id", "embedding",
        k = 10, nprobe = 8, rerankFactor = (n / 10) + 1)
      .select($"query_id", $"rnk", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    val fullExact = Similarity.mipsTopK(emb, probes, "vec_id", "embedding", k = 10)
      .select($"query_id", $"rnk", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(full === fullExact)
  }

  test("the encode scan stays in whole-stage codegen") {
    val model = Pq.fit(emb, "vec_id", "embedding", m = 8, ksub = 16,
      iterations = 1)
    val df = Pq.encode(emb, "vec_id", "embedding", model)
    df.collect() // resolve AQE's final plan before reading it
    val plan = df.queryExecution.executedPlan.toString
    // The *(n) prefix is the whole-stage-codegen span marker: the encode
    // projection must carry one (an interpreted-fallback Project prints
    // without it — the round-4 trap this expression family exists to avoid).
    assert(plan.linesIterator.exists(l =>
        l.matches("""\*\(\d+\) Project.*graft_pq_encode.*""")),
      s"PqEncode fell out of whole-stage codegen:\n$plan")
  }
}
