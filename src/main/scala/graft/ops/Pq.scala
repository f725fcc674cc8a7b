package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.functions.{vector, AdcDot, CentroidResidual, PqAdcTable, PqEncode, PqTrainPairs}

/** Product quantization (Jégou, Douze & Schmid, "Product quantization for
  * nearest neighbor search", TPAMI 2011): split each vector into `m`
  * contiguous subspaces, k-means each subspace independently, and store a
  * vector as its `m` centroid indices — `m * log2(ksub)` bits instead of
  * `dims * 32`. With m=8, ksub=16 a 64-dim float32 embedding compresses
  * 64x (256 bits -> 4), the storage step that makes billion-vector ANN
  * serving fit in memory; queries score compressed rows asymmetrically
  * (ADC): one m x ksub dot-product table per query, then m table lookups
  * per corpus row instead of a d-element dot.
  *
  * Scale shape, mirroring [[Ivf]]: training is a few Lloyd passes where
  * the assignment scan is ONE fused [[PqEncode]] map (all m subspaces in
  * one primitive loop) and the update is one partial-aggregated keyed
  * mean; the codebook tensor (m x ksub x dsub floats — KB) is the only
  * driver traffic. Encoding is the same map; search is broadcast probes
  * with per-probe ADC tables computed map-side ([[PqAdcTable]]) and a
  * partial-aggregating top-k, so the shuffle carries <= probes x k rows.
  * Codebooks compose with IVF: encode residuals per cell for IVF-PQ.
  */
object Pq {

  final case class PqModel(m: Int, ksub: Int,
      codebooks: Array[Array[Array[Float]]]) {
    def dsub: Int = codebooks.head.head.length
    def dims: Int = m * dsub
  }

  /** Train per-subspace codebooks with Lloyd iterations. Deterministic:
    * init centroids are the sub-vectors of the `ksub` rows with smallest
    * md5(id) (the [[Ivf.build]] rule), per-element means round to 6
    * decimals so shuffle order cannot drift a codebook, and empty cells
    * keep their previous centroid. Rows whose vectors are null or not of
    * length `dims` are excluded from training (encode still handles them
    * by the zero-fill prefix rule).
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, m: Int, ksub: Int,
      iterations: Int = 2): PqModel = {
    val dims = df.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).head().getInt(0)
    require(dims % m == 0, s"dims $dims not divisible by m subspaces $m")
    val dsub = dims / m
    val clean = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dims)
    // Deterministic init: subspace j of init row k seeds centroid (j, k).
    val initRows = clean
      .select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(ksub)
      .collect()
      .map(_.getSeq[Float](1))
    require(initRows.length == ksub,
      s"need at least ksub=$ksub trainable rows, got ${initRows.length}")
    var codebooks: Array[Array[Array[Float]]] = Array.tabulate(m, ksub) {
      (j, k) => initRows(k).slice(j * dsub, (j + 1) * dsub).toArray
    }
    (0 until iterations).foreach { _ =>
      // One fused-encode scan + one keyed mean for ALL subspaces: explode
      // to (subspace, code, element position, value) and partial-aggregate
      // — the exchange carries m*ksub*dsub keys, never the corpus. The
      // explosion is ONE generator-input expression ([[PqTrainPairs]]):
      // encode runs once per row by construction, where the
      // alias-then-element_at form re-ran it per exploded element (see
      // the expression's scaladoc for the measured 64x).
      // explode_OUTER + null filter: the non-outer generator's inferred
      // size()>0 filter would run the fused encode a SECOND time per row
      // as a pre-filter (t22's inference trap) — doubling every training
      // scan. PqTrainPairs is never empty on `clean` rows, so the outer
      // form is semantically identical.
      val updated = clean
        .select(explode_outer(PqTrainPairs(col(vecCol), codebooks)).as("e"))
        .filter(col("e").isNotNull)
        .groupBy(col("e.j").as("j"), col("e.code").as("code"),
          col("e.i").as("i"))
        .agg(round(avg(col("e.x")), 6).as("mean"))
        .collect()
      val next = codebooks.map(_.map(_.clone()))
      updated.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3).toFloat
      }
      codebooks = next
    }
    PqModel(m, ksub, codebooks)
  }

  /** Map-only corpus compression: (id, codes array<int> of length m). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame =
    df.select(col(idCol), PqEncode(col(vecCol), model.codebooks).as("codes"))

  /** Approximate max-inner-product top-k of an encoded corpus for each
    * probe row via asymmetric distance: per-probe ADC tables map-side,
    * m lookups per corpus row, partial-aggregating top-k. Output:
    * query_id, rnk, vec_id, adc (rounded).
    */
  def adcTopK(encoded: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, model: PqModel,
      k: Int, roundTo: Int = 6): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("query_id"),
      PqAdcTable(col(vecCol), model.codebooks).as("adc_table")))
    val candidates = Spread.ensure(encoded).crossJoin(p)
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("adc", round(AdcDot(col("codes"), col("adc_table")), roundTo))
    Similarity.rankTopK(candidates, idCol, "adc", k)
  }

  /** Memoized [[fit]] + [[encode]]: one trained model and one persisted
    * encoded corpus per (session, corpus plan, parameters), the
    * train-once/serve-many shape (see [[Ivf.buildCached]]). Weak-keyed on
    * the session; [[invalidate]] is wired into [[graft.Caches.reset]].
    */
  def encodeCached(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iterations: Int = 2): (PqModel, DataFrame) = {
    val perSession = cache.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentHashMap[String, (PqModel, DataFrame)]())
    val key = s"${df.queryExecution.logical.semanticHash()}/$idCol/$vecCol/" +
      s"$m/$ksub/$iterations"
    perSession.computeIfAbsent(key, _ => {
      val model = fit(df, idCol, vecCol, m, ksub, iterations)
      val enc = encode(df, idCol, vecCol, model)
      enc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (model, enc)
    })
  }

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, (PqModel, DataFrame)]]())

  /** Drop this session's memoized models (see [[graft.Caches]]). */
  private[graft] def invalidate(spark: org.apache.spark.sql.SparkSession): Unit = {
    Option(cache.get(spark)).foreach(_.clear())
    Option(ivfPqCache.get(spark)).foreach(_.clear())
  }

  // ---- IVF-PQ composition --------------------------------------------------

  /** An IVF-routed, PQ-compressed corpus: the standard billion-vector
    * serving layout (Jégou et al. §IV). The coarse quantizer routes, the
    * PQ codes encode the RESIDUAL `x - c_cell` (residuals concentrate
    * near 0, so a shared residual codebook spends its levels where the
    * data is), and a stored row is (id, cell, m codes).
    */
  final case class IvfPqIndex(ivf: Ivf.IvfIndex, model: PqModel,
      encoded: DataFrame, centroidMatrix: Array[Array[Float]])

  /** Build = IVF coarse index (shared via [[Ivf.buildCached]]), one fused
    * residual map ([[CentroidResidual]]), PQ fit on the residuals, one
    * fused encode scan. Deterministic end to end; only centroids and
    * codebooks (KB) cross the driver.
    */
  def buildIvfPq(df: DataFrame, idCol: String, vecCol: String,
      numCells: Int, m: Int, ksub: Int, iterations: Int = 2): IvfPqIndex = {
    val ivf = Ivf.buildCached(df, idCol, vecCol, numCells)
    val cents = ivf.centroids.orderBy(col("cell")).collect()
      .map(r => r.getSeq[Float](1).toArray)
    val residuals = ivf.cells.select(col(idCol), col("cell"),
      CentroidResidual(col(vecCol), col("cell"), cents).as("res"))
    val model = fit(residuals, idCol, "res", m, ksub, iterations)
    val encoded = residuals.select(col(idCol), col("cell"),
      PqEncode(col("res"), model.codebooks).as("codes"))
    encoded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    IvfPqIndex(ivf, model, encoded, cents)
  }

  /** Memoized [[buildIvfPq]] (see [[encodeCached]]). */
  def buildIvfPqCached(df: DataFrame, idCol: String, vecCol: String,
      numCells: Int, m: Int, ksub: Int, iterations: Int = 2): IvfPqIndex = {
    val perSession = ivfPqCache.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentHashMap[String, IvfPqIndex]())
    val key = s"${df.queryExecution.logical.semanticHash()}/$idCol/$vecCol/" +
      s"$numCells/$m/$ksub/$iterations"
    perSession.computeIfAbsent(key,
      _ => buildIvfPq(df, idCol, vecCol, numCells, m, ksub, iterations))
  }

  private val ivfPqCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, IvfPqIndex]]())

  /** Approximate MIPS top-k through the full IVF-PQ serving path: probes
    * route to their `nprobe` best cells, only those cells' code rows are
    * scanned, and each candidate costs m ADC lookups plus the stored
    * centroid correction — `dot(q, x) = dot(q, c_cell) + dot(q, x - c_cell)`,
    * with the second term approximated by the residual codes. The routed
    * relation (probes x nprobe rows, carrying each probe's ADC table and
    * centroid dot) broadcasts to the cell join, so the only full-size
    * relation in the search is the pruned code scan — same pruning
    * discipline as [[Ivf.search]] (IN-list under `maxInListCells`,
    * broadcast semi join past it).
    */
  def ivfPqTopK(index: IvfPqIndex, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      roundTo: Int = 6, maxInListCells: Int = 256): DataFrame = {
    val p = probes.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val routeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cell"))
    val routed = p.crossJoin(broadcast(index.ivf.centroids))
      .withColumn("csim", vector.cosine(col("query_vec"), col("centroid")))
      .withColumn("crnk", row_number().over(routeW))
      .filter(col("crnk") <= nprobe)
      .select(col("query_id"), col("cell"),
        vector.dot(col("query_vec"), col("centroid")).as("cdot"),
        PqAdcTable(col("query_vec"), index.model.codebooks).as("adc_table"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val routedCells = routed.select(col("cell")).distinct()
    val routedCellIds = routedCells.collect().map(_.getInt(0)).toSeq
    val pruned =
      if (routedCellIds.lengthCompare(maxInListCells) <= 0)
        index.encoded.filter(col("cell").isin(routedCellIds: _*))
      else
        index.encoded.join(broadcast(routedCells), Seq("cell"), "left_semi")
    val candidates = pruned.join(broadcast(routed), "cell")
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("adc",
        round(col("cdot") + AdcDot(col("codes"), col("adc_table")), roundTo))
    Similarity.rankTopK(candidates, idCol, "adc", k)
  }

  /** Two-stage retrieval: the ADC shortlist re-scored exactly. Stage 1 is
    * [[ivfPqTopK]] at `k * rerankFactor` (compressed scan of the routed
    * cells only); stage 2 fetches ONLY the shortlisted rows' raw vectors
    * — the shortlist (queries x k x factor ids) broadcasts into a hash
    * join against the corpus, so the fetch is one corpus scan with a
    * broadcast filter, never a shuffle — and re-ranks by the true inner
    * product. Recovers most of the recall PQ's residual quantization
    * gives up, at compressed-scan candidate-generation cost: the standard
    * billion-vector serving pipeline (Jégou et al. §V, "re-ranking with
    * source coding" — the verbatim-vector variant).
    */
  def ivfPqTopKRerank(index: IvfPqIndex, corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      rerankFactor: Int = 4, roundTo: Int = 6,
      maxInListCells: Int = 256): DataFrame = {
    require(rerankFactor >= 1, "rerankFactor must be >= 1")
    val shortlist = ivfPqTopK(index, probes, idCol, vecCol,
        k * rerankFactor, nprobe, roundTo, maxInListCells)
      .select(col("query_id"), col("vec_id").as("cand_id"))
    val p = broadcast(probes.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec")))
    val candidates = corpus.join(broadcast(shortlist),
        col(idCol) === col("cand_id"))
      .drop("cand_id")
      .join(p, "query_id")
      .withColumn("ip", round(vector.dot(col(vecCol), col("query_vec")), roundTo))
    Similarity.rankTopK(candidates, idCol, "ip", k)
  }
}
