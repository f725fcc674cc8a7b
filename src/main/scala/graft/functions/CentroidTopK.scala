package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `k` nearest centroid ids of a vector under a fixed centroid set,
  * max-cosine order — the multi-probe generalization of
  * [[CentroidArgmax]] (k = 1 reproduces it exactly, same tiebreaks).
  *
  * Multi-probe assignment is what makes cluster-scoped similarity RECALL
  * structural instead of tuned: a pair is missed by single-assignment
  * SemDeDup whenever a k-means boundary separates it, but with each point
  * probing its top-2 cells a pair is missed only if the two points share
  * NEITHER of their two nearest cells — vanishing for the near-duplicate
  * pairs the operator exists to find (graft.ops.Similarity
  * .clusterScopedPairs, driven by e05's sf1-certified contract).
  *
  * Same design as [[CentroidArgmax]]: the centroid matrix ships once as a
  * reference object, both eval paths run one JIT-friendly primitive
  * sweep, ties and the all-zero vector resolve to FIRST-in-`cellIds`
  * order (selection sweeps k passes with strict `>`, so equal scores keep
  * earlier centroids first — deterministic whatever the partitioning).
  */
case class CentroidTopK(child: Expression, cellIds: Array[Int],
    centroids: Array[Array[Float]], k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_centroid_topk"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorExpressions.isVecType(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got " +
          child.dataType.catalogString)
    } else if (centroids.isEmpty || cellIds.length != centroids.length) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a non-empty centroid set with one id per centroid")
    } else if (k < 1) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs k >= 1")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  @transient private lazy val invNorms: Array[Double] = centroids.map { c =>
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) 0.0 else 1.0 / n
  }

  /** One dot sweep per centroid into a score buffer, then k selection
    * passes (k is 2-4 in practice — selection beats a heap at this size).
    */
  def compute(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        x(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      }
      i += 1
    }
    val m = centroids.length
    val scores = new Array[Double](m)
    var c = 0
    while (c < m) {
      val cent = centroids(c)
      val lim = math.min(n, cent.length)
      var dot = 0.0
      i = 0
      while (i < lim) { dot += x(i) * cent(i); i += 1 }
      scores(c) = dot * invNorms(c)
      c += 1
    }
    val kk = math.min(k, m)
    val out = new Array[Int](kk)
    val taken = new Array[Boolean](m)
    var slot = 0
    while (slot < kk) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      c = 0
      while (c < m) {
        if (!taken(c) && scores(c) > bestScore) { bestScore = scores(c); best = c }
        c += 1
      }
      if (best < 0) { best = 0; while (taken(best)) best += 1 } // all -Inf: first free
      taken(best) = true
      out(slot) = cellIds(best)
      slot += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTopK", this,
      classOf[CentroidTopK].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidTopK {
  /** Column API: the `cellIds` of the `k` max-cosine centroids, in order. */
  def apply(vec: Column, cellIds: Array[Int],
      centroids: Array[Array[Float]], k: Int): Column =
    GraftSqlInternal.column(
      CentroidTopK(GraftSqlInternal.expression(vec), cellIds, centroids, k))
}
