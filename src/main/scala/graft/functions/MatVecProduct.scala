package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Affine projection of a vector through a fixed matrix:
  * `out_j = matrix(j) . vec - offset(j)` — the linear-map scan under PCA
  * transform ([[graft.ops.Pca]]), whitening, or any learned projection,
  * where `offset(j) = matrix(j) . mean` folds the centering into one
  * constant so the row vector is never copied or shifted.
  *
  * Same design as [[SignBandSignatures]]/[[CentroidArgmax]]: the matrix
  * ships once as a reference object, both eval paths share one primitive
  * loop, and the generated code is a single call — a k x d projection of
  * any width stays inside whole-stage codegen. Null vector -> null; null
  * elements contribute 0; shorter vectors use the common prefix.
  */
case class MatVecProduct(child: Expression, matrix: Array[Array[Double]],
    offset: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_matvec"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorExpressions.isVecType(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got " +
          child.dataType.catalogString)
    } else if (matrix.isEmpty || matrix.length != offset.length) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a non-empty matrix with one offset per row")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

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
    val out = new Array[Double](matrix.length)
    var j = 0
    while (j < matrix.length) {
      val row = matrix(j)
      val m = math.min(n, row.length)
      var dot = 0.0
      i = 0
      while (i < m) {
        dot += x(i) * row(i)
        i += 1
      }
      out(j) = dot - offset(j)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matvec", this,
      classOf[MatVecProduct].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVecProduct {
  /** Column API: `matrix . vec - offset` as `array<double>`. */
  def apply(vec: Column, matrix: Array[Array[Double]],
      offset: Array[Double]): Column =
    GraftSqlInternal.column(
      MatVecProduct(GraftSqlInternal.expression(vec), matrix, offset))
}
