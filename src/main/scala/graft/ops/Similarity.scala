package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.vector

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, as a pipeline would deploy them:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k. The probe set is broadcast
  *    (it is small by definition); the corpus is scanned once map-side with
  *    the codegen'd cosine expression and per-probe top-k is a bounded
  *    window. Exact, and the right baseline for recall measurements.
  *  - [[signBucketJoin]]: sign-random-projection LSH. Each vector gets a
  *    `planes`-bit signature from deterministic pseudo-random hyperplanes;
  *    pairs are generated per matching (band, key) bucket via hash join.
  *    This is the 100 TB path: no cross join ever materializes, cost
  *    follows bucket occupancy.
  *
  * Hyperplanes are derived from a seeded splitmix-style generator so runs
  * are reproducible without shipping model files.
  */
object Similarity {

  /** Per-query exact top-k over a (query_id, id, score) candidate
    * relation via the partial-aggregating [[graft.functions.TopKByScore]]:
    * every map task collapses its candidates to <= k per query BEFORE the
    * exchange, so the shuffle carries partitions x queries x k structs —
    * not the full candidate set, which for brute-force search is the
    * corpus itself. Tie rule (score desc, id asc) matches the
    * row_number-window form it replaces exactly. Long ids (every search
    * surface here) take the aggregator; anything else falls back to the
    * window.
    *
    * Null and NaN scores are dropped before ranking: the two paths would
    * otherwise disagree (desc ordering ranks NaN first; the aggregator's
    * `better()` never admits it) and a null would crash the aggregator's
    * non-nullable encoder. A candidate without a finite score has no
    * defensible rank in either semantics.
    *
    * Output: query_id, rnk (1-based int), vec_id, `scoreName`.
    */
  private[graft] def rankTopK(rawCandidates: DataFrame, idCol: String,
      scoreName: String, k: Int): DataFrame = {
    val candidates = rawCandidates
      .filter(col(scoreName).isNotNull && !isnan(col(scoreName)))
    val idIsLong = candidates.schema(idCol).dataType ==
      org.apache.spark.sql.types.LongType
    if (idIsLong) {
      val topk = udaf(new graft.functions.TopKByScore(k))
      candidates
        .groupBy(col("query_id"))
        .agg(topk(col(idCol), col(scoreName)).as("top"))
        .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rnk"),
          col("e.id").as("vec_id"), col("e.score").as(scoreName))
    } else {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col(scoreName).desc, col(idCol))
      candidates
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select(col("query_id"), col("rnk"), col(idCol).as("vec_id"),
          col(scoreName))
    }
  }

  /** Exact cosine top-k of `corpus` for each row of `probes`.
    * Output: query_id, rnk (1-based), vec_id, sim (rounded to `roundTo`).
    * Ranking uses the rounded sim with id tiebreak so ordering is stable
    * across engines and runs.
    */
  def bruteForceTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String,
      k: Int, roundTo: Int = 6): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec")))
    val candidates = Spread.ensure(corpus).crossJoin(p)
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("sim", round(vector.cosine(col(vecCol), col("query_vec")), roundTo))
    rankTopK(candidates, idCol, "sim", k)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes: `planes` x `dims`
    * doubles in [-1, 1), derived from `seed` via a splitmix64 walk.
    */
  private[ops] def hyperplanes(planes: Int, dims: Int, seed: Long): Array[Array[Double]] = {
    var x = seed
    def next(): Double = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    }
    Array.fill(planes, dims)(next())
  }

  /** `planes`-bit sign signature of `vecCol` under the seeded hyperplanes.
    * Pure column math: one dot product per plane, sign bit packed into a
    * long. Codegen-friendly, no UDF.
    */
  def signSignature(vecCol: Column, planes: Int, dims: Int, seed: Long = 42L): Column = {
    val hp = hyperplanes(planes, dims, seed)
    val bits = hp.zipWithIndex.map { case (plane, b) =>
      val planeCol = array(plane.toIndexedSeq.map(lit): _*)
      when(vector.dot(vecCol, planeCol) > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Candidate pairs whose sign signatures agree on at least one of
    * `bands` bands (pigeonhole over the signature), verified with exact
    * cosine >= `threshold`. The join is bucket-keyed — linear in bucket
    * occupancy, suitable for corpus-scale near-duplicate detection.
    */
  def signBucketJoin(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 32, bands: Int = 8,
      dims: Int = 64, seed: Long = 42L): DataFrame = {
    val segBits = planes / bands
    val sigs = Spread.ensure(df).select(col(idCol).as("vid"), col(vecCol).as("vec"),
      signSignature(col(vecCol), planes, dims, seed).as("sig"))
    val probes = sigs.select(col("vid"), col("vec"), posexplode(
      array((0 until bands).map(s =>
        shiftright(col("sig"), s * segBits).bitwiseAND((1L << segBits) - 1)): _*))
      .as(Seq("seg", "segval")))
    probes.as("a")
      .join(probes.as("b"),
        col("a.seg") === col("b.seg") && col("a.segval") === col("b.segval") &&
          col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        col("a.vec").as("vec_a"), col("b.vec").as("vec_b"))
      .distinct()
      .withColumn("sim", vector.cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Exact maximum-inner-product top-k of `corpus` for each probe row —
    * the retrieval scoring used when embeddings are NOT length-normalized
    * (recommendation scores, learned rerankers). Same shape as
    * [[bruteForceTopK]]: broadcast probes, map-side codegen'd dot, bounded
    * per-probe window; ranking uses the rounded score with id tiebreak.
    */
  def mipsTopK(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String,
      k: Int, roundTo: Int = 6): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec")))
    val candidates = Spread.ensure(corpus).crossJoin(p)
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("ip", round(vector.dot(col(vecCol), col("query_vec")), roundTo))
    rankTopK(candidates, idCol, "ip", k)
  }

  /** The MIPS -> cosine reduction (Bachrach et al., RecSys'14): append
    * `sqrt(M^2 - |x|^2)` to every corpus vector (M = max corpus norm, passed
    * in so the caller controls when the one aggregate runs) and `0` to
    * every probe. All augmented corpus vectors then share norm M, so
    * cosine ORDER against an augmented probe equals inner-product order —
    * which plugs un-normalized retrieval into any cosine ANN index (IVF,
    * sign-LSH) unchanged. Rank equivalence with [[mipsTopK]] is asserted
    * in OpsSpec.
    */
  def augmentCorpusForMips(vecCol: Column, maxNorm: Column): Column =
    concat(vecCol, array(sqrt(
      greatest(maxNorm * maxNorm - vector.dot(vecCol, vecCol), lit(0.0)))
      .cast("float")))

  /** Probe-side augmentation for the MIPS reduction: a zero tail
    * dimension, so the probe's dot with the augmented corpus vector equals
    * the original inner product.
    */
  def augmentProbeForMips(vecCol: Column): Column =
    concat(vecCol, array(lit(0.0f)))

  /** Exact all-pairs cosine join above a threshold — the small-data /
    * oracle-checkable baseline for [[signBucketJoin]].
    */
  def bruteForcePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, roundTo: Int = 6): DataFrame = {
    val spread = Spread.ensure(df)
    val a = spread.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = spread.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", round(vector.cosine(col("vec_a"), col("vec_b")), roundTo))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
