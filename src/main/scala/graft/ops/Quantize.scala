package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension affine) quantization of an embedding column —
  * the storage-compression step for corpus-scale vector data: float32 ->
  * one byte per dimension is a 4x cut in what 100 TB of embeddings costs
  * to store, scan, and shuffle, at a bounded reconstruction error
  * (half a quantization step per dimension).
  *
  * [[fit]] is one partial-aggregated pass for per-dimension min/max (the
  * shuffle carries dims x partitions tiny rows, never the corpus);
  * [[quantize]] is a map-only scan through the fused
  * [[graft.functions.AffineQuantize]] expression. Every arithmetic step
  * is exact IEEE double math, so quantized values are engine-portable —
  * the v15 oracle cross-checks a corpus-wide checksum, not a tolerance.
  */
object Quantize {

  /** Per-dimension quantization parameters. `scales(i) = (levels-1) /
    * (max_i - min_i)`, 0 for a constant dimension (everything quantizes
    * to level 0 there, and [[dequantize]] restores the constant).
    */
  case class Model(mins: Array[Double], scales: Array[Double], levels: Int) {
    def dims: Int = mins.length
  }

  /** One pass over `vecCol` for per-dimension bounds. */
  def fit(df: DataFrame, vecCol: String, levels: Int = 256): Model = {
    val rows = df
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .orderBy(col("i"))
      .collect()
    val mins = rows.map(_.getDouble(1))
    val maxs = rows.map(_.getDouble(2))
    val scales = mins.zip(maxs).map { case (mn, mx) =>
      if (mx > mn) (levels - 1).toDouble / (mx - mn) else 0.0 }
    Model(mins, scales, levels)
  }

  /** Map-only quantization: `array<int>` of levels in [0, levels). */
  def quantize(vec: Column, model: Model): Column =
    graft.functions.AffineQuantize(vec, model.mins, model.scales, model.levels)

  /** Reconstruction: `x̂_i = q_i / scale_i + min_i` (the level-0 value for
    * constant dimensions). Emitted as `array<double>` so the downstream
    * error math ([[graft.functions.DotProduct]] composition) stays exact.
    */
  def dequantize(qcol: Column, model: Model): Column = {
    val inv = model.scales.map(s => if (s == 0.0) 0.0 else 1.0 / s)
    graft.functions.AffineDequantize(qcol, inv, model.mins)
  }

  /** Mean squared reconstruction error per dimension, computed with the
    * codegen'd dot expressions: `||x - x̂||² = x.x - 2 x.x̂ + x̂.x̂`.
    */
  def mseColumn(vec: Column, dequant: Column): Column = {
    import graft.functions.vector
    (vector.dot(vec, vec) - lit(2.0) * vector.dot(vec, dequant) +
      vector.dot(dequant, dequant)) / size(vec)
  }

  /** Worst-case per-dimension MSE bound: (step/2)² averaged over dims,
    * plus float32 representation noise.
    */
  def mseBound(model: Model): Double = {
    val steps = model.scales.map(s => if (s == 0.0) 0.0 else 1.0 / s)
    steps.map(st => (st / 2.0) * (st / 2.0)).sum / model.dims + 1e-9
  }

  // ---- 1-bit (sign) binary quantization ------------------------------
  //
  // The extreme compression point: float32 -> 1 bit/dim (32x), candidate
  // scoring = xor+popcount instead of dims multiply-adds. No fit pass at
  // all — the "model" is the sign function, so encode is embarrassingly
  // map-side and two corpora encoded independently are directly
  // comparable (unlike the PQ/affine codebooks, which pin a fitted
  // model). Hamming distance over sign bits approximates ANGULAR rank:
  // P[sign disagree on a random direction] = theta/pi, the same identity
  // sign-LSH relies on — so BQ shortlists re-ranked by exact cosine
  // (rerank pattern below) recover most of the exact top-k at a fraction
  // of the scan cost. This is the 100 TB serving shape: signatures
  // (16 B/row at 64 dims) live hot, raw vectors are fetched ONLY for the
  // shortlist via a keyed join.

  /** Map-only sign signature: `wordBits` dims per long ([[graft.functions.SignPack]]). */
  def signBits(vec: Column, wordBits: Int = 32): Column =
    graft.functions.SignPack(vec, wordBits)

  /** Exact top-k by Hamming distance of sign signatures. Output:
    * query_id, rnk, vec_id, hamming — ranked by (hamming asc, vec_id asc).
    * `probes` rows are broadcast; the corpus-side scan is one fused
    * signature + distance sweep, and the shuffle carries only the
    * partial top-k per partition ([[Similarity.rankTopK]]'s aggregator).
    */
  def hammingTopK(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val sigs = corpus.select(col(idCol),
      signBits(col(vecCol)).as("sig"))
    val p = broadcast(probes.select(col(idCol).as("query_id"),
      signBits(col(vecCol)).as("qsig")))
    val cand = Spread.ensure(sigs).crossJoin(p)
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("hamming",
        graft.functions.HammingWords(col("sig"), col("qsig")))
      // rankTopK ranks DESC: negated distance is the similarity view of
      // the same order (ties included), so ranks match (hamming asc, id).
      .withColumn("agree", -col("hamming").cast("double"))
    Similarity.rankTopK(cand, idCol, "agree", k)
      .select(col("query_id"), col("rnk"), col("vec_id"),
        (-col("agree")).cast("int").as("hamming"))
  }

  /** Two-stage binary-quantized search: Hamming shortlist of
    * `k * overfetch` per query over the 1-bit signatures, then exact
    * cosine re-rank of ONLY the shortlisted raw vectors (keyed join —
    * the full-precision corpus is touched shortlist-deep, never scanned).
    * Output matches [[Similarity.bruteForceTopK]]: query_id, rnk,
    * vec_id, sim.
    */
  def binaryRerankTopK(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, overfetch: Int = 4,
      roundTo: Int = 6): DataFrame = {
    val shortlist = hammingTopK(corpus, probes, idCol, vecCol, k * overfetch)
      .select(col("query_id"), col("vec_id"))
    val p = broadcast(probes.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec")))
    val cand = shortlist
      .join(corpus.select(col(idCol).as("vec_id"), col(vecCol)), Seq("vec_id"))
      .join(p, Seq("query_id"))
      .withColumn("sim",
        round(graft.functions.vector.cosine(col(vecCol), col("query_vec")),
          roundTo))
    Similarity.rankTopK(cand.withColumnRenamed("vec_id", idCol), idCol,
      "sim", k)
  }
}
