package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * dimensionality-reduction / decorrelation step an embedding pipeline
  * runs before ANN indexing or compression.
  *
  * Scale design: [[fit]] is ONE pass — a [[graft.functions.GramAggregator]]
  * partial-aggregates (count, sums, second-moment triangle) per map task,
  * so the exchange carries one ~d²/2-double buffer per partition and the
  * corpus never shuffles. The d x d eigenproblem is driver-side (d is the
  * embedding width — 64 here, a few thousand at most in practice — so the
  * matrix is KB, not data) via cyclic Jacobi rotations. [[transform]] is a
  * map-only scan through the fused [[graft.functions.MatVecProduct]]
  * expression with the centering folded into the constant offset.
  *
  * Determinism: the covariance entries are rounded (1e-9) before the
  * eigensolve — partial-sum order varies run to run at ~1 ulp and Jacobi
  * would otherwise amplify it into sign/order flips near degenerate
  * eigenvalues; components fix their sign so the largest-|component|
  * coordinate is positive. Same policy as IVF's centroid rounding.
  */
object Pca {

  /** Fitted model: `components(j)` is the j-th principal axis (unit norm,
    * sign-fixed), `eigenvalues(j)` its variance, both sorted descending;
    * `mean` is the per-dimension average and `totalVar` the trace of the
    * covariance (= sum of ALL d eigenvalues, not just the kept k).
    */
  case class Model(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double], totalVar: Double) {
    def k: Int = components.length
  }

  /** Fit a k-component model from one aggregation pass over `vecCol`. */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    val gram = udaf(new graft.functions.GramAggregator)
    val buf = df.select(gram(col(vecCol)).as("g")).head().getSeq[Double](0).toArray
    require(buf.nonEmpty && buf(0) > 0, "PCA needs at least one vector")
    val n = buf(0)
    val d = buf(1).toInt
    require(k >= 1 && k <= d, s"k must be in [1, $d]")
    val mean = Array.tabulate(d)(i => buf(2 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      val rowStart = 2 + d + i * d - (i * (i - 1)) / 2
      var j = i
      while (j < d) {
        val c = buf(rowStart + (j - i)) / n - mean(i) * mean(j)
        val r = math.rint(c * 1e9) / 1e9
        cov(i)(j) = r
        cov(j)(i) = r
        j += 1
      }
      i += 1
    }
    val (eigvals, eigvecs) = jacobiEigen(cov)
    val order = eigvals.indices.sortBy(i => (-eigvals(i), i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(d)(r => eigvecs(r)(c))
      // Sign convention: the largest-|coordinate| entry is positive
      // (first such index on ties), so the component is unique.
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(x => -x) else v
    }.toArray
    Model(mean, comps, order.map(eigvals).toArray,
      (0 until d).map(i => cov(i)(i)).sum)
  }

  /** Append `outCol` = the k projection coordinates of `vecCol` (centered
    * on the fitted mean). Map-only; see [[graft.functions.MatVecProduct]].
    */
  def transform(df: DataFrame, vecCol: String, model: Model,
      outCol: String = "proj"): DataFrame =
    df.withColumn(outCol, project(col(vecCol), model))

  /** The projection as a bare column expression. */
  def project(vec: Column, model: Model): Column = {
    val offsets = model.components.map(c =>
      c.zip(model.mean).map { case (a, b) => a * b }.sum)
    graft.functions.MatVecProduct(vec, model.components, offsets)
  }

  /** PCA-whitening projection: the k projection coordinates each scaled
    * by 1/sqrt(eigenvalue + eps), so the output has (population)
    * identity covariance — the decorrelation+rescale step embedding
    * pipelines run before cosine retrieval or product quantization,
    * where an anisotropic corpus otherwise lets a few dominant
    * directions swamp the metric.
    *
    * Same cost shape as [[project]]: the scaling folds into the
    * component matrix on the driver (k x d doubles — KB), so the scan is
    * the identical map-only fused [[graft.functions.MatVecProduct]] —
    * whitening adds ZERO distributed work over plain projection. `eps`
    * guards near-null directions (eigenvalue ~ 0) from exploding; with
    * the default 1e-9 a truly degenerate coordinate maps to ~0 variance
    * rather than noise amplified by 1/sqrt(~0).
    */
  def whiten(vec: Column, model: Model, eps: Double = 1e-9): Column = {
    val comps = model.components.zip(model.eigenvalues).map { case (c, e) =>
      val s = 1.0 / math.sqrt(math.max(e, 0.0) + eps)
      c.map(_ * s)
    }
    val offsets = comps.map(c =>
      c.zip(model.mean).map { case (a, b) => a * b }.sum)
    graft.functions.MatVecProduct(vec, comps, offsets)
  }

  /** [[whiten]] as a DataFrame transform appending `outCol`. */
  def whitenTransform(df: DataFrame, vecCol: String, model: Model,
      outCol: String = "white"): DataFrame =
    df.withColumn(outCol, whiten(col(vecCol), model))

  /** Cyclic-Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Converges quadratically; 30 sweeps is far past convergence for any
    * conditioning at the d <= a-few-thousand sizes this is meant for.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 30, tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && offDiag() > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 -> 45-degree rotation
                case x   => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
