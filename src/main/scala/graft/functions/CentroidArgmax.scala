package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid id of a vector under a fixed centroid set, in one
  * fused pass — the assignment step of [[graft.ops.Ivf]] (index build AND
  * the per-batch scoring scan of new corpus data).
  *
  * Semantics match the compositional form it replaces (a `transform` HOF
  * computing one cosine per centroid, then argmax via
  * `array_position(array_max)`): the winner is the max-cosine centroid,
  * ties and the all-zero case to the FIRST centroid in `cellIds` order.
  * Dividing by the row vector's own magnitude never changes the argmax,
  * so the score loop uses `dot * invNorm(centroid)` — one multiply-add
  * sweep per centroid, no per-row allocation. A zero-magnitude centroid
  * scores 0 (the cosine zero-denominator guard); a null vector returns
  * null (callers coalesce to the first cell — same as the old form).
  *
  * Why an expression and not the HOF: higher-order functions evaluate
  * their lambda on the interpreted path even inside a codegen stage, and
  * the centroid set as a `typedlit` re-materializes per row. Like
  * [[SignBandSignatures]], the centroid matrix ships ONCE as a reference
  * object and both eval paths run the same JIT-friendly primitive loop.
  */
case class CentroidArgmax(child: Expression, cellIds: Array[Int],
    centroids: Array[Array[Float]]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_centroid_argmax"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorExpressions.isVecType(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got " +
          child.dataType.catalogString)
    } else if (centroids.isEmpty || cellIds.length != centroids.length) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a non-empty centroid set with one id per centroid")
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

  /** Shared hot loop for both eval paths: read the vector once into a
    * primitive buffer, then one dot sweep per centroid tracking the
    * running max (strict `>`, so ties keep the first centroid).
    */
  def compute(vec: ArrayData): Int = {
    val n = vec.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        x(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      }
      i += 1
    }
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val m = math.min(n, cent.length)
      var dot = 0.0
      i = 0
      while (i < m) {
        dot += x(i) * cent(i)
        i += 1
      }
      val score = dot * invNorms(c)
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    cellIds(best)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidArgmax", this,
      classOf[CentroidArgmax].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidArgmax {
  /** Column API: the `cellIds(i)` of the max-cosine `centroids(i)`. */
  def apply(vec: Column, cellIds: Array[Int],
      centroids: Array[Array[Float]]): Column =
    GraftSqlInternal.column(
      CentroidArgmax(GraftSqlInternal.expression(vec), cellIds, centroids))
}
