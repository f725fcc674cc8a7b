package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-dimension affine (scalar) quantization of a vector to integer
  * levels: `q_i = clamp(floor((x_i - min_i) * scale_i + 0.5), 0, levels-1)`
  * — the int8-style compression that cuts embedding storage 4x at corpus
  * scale ([[graft.ops.Quantize]]).
  *
  * Every step is an exact IEEE double op (subtract, multiply, add, floor
  * — no transcendentals), so any engine replaying the same mins/scales
  * produces the IDENTICAL integer array: the oracle cross-checks a
  * corpus-wide checksum of the quantized values, not a tolerance.
  *
  * Same fused-constant-sweep design as [[SignBandSignatures]] /
  * [[CentroidArgmax]] / [[MatVecProduct]]: mins/scales ride along once as
  * reference objects, one primitive loop, single-call codegen. Null
  * vector -> null; null elements quantize as 0.0; output length is the
  * common prefix of the vector and the parameter arrays.
  */
case class AffineQuantize(child: Expression, mins: Array[Double],
    scales: Array[Double], levels: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_affine_quantize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorExpressions.isVecType(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got " +
          child.dataType.catalogString)
    } else if (mins.isEmpty || mins.length != scales.length || levels < 2) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs matching non-empty mins/scales and levels >= 2")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  def compute(vec: ArrayData): ArrayData = {
    val m = math.min(vec.numElements(), mins.length)
    val out = new Array[Int](m)
    var i = 0
    while (i < m) {
      val x =
        if (vec.isNullAt(i)) 0.0
        else if (isFloat) vec.getFloat(i).toDouble
        else vec.getDouble(i)
      val q = math.floor((x - mins(i)) * scales(i) + 0.5)
      out(i) =
        if (q.isNaN) 0 // explicit: NaN fails both clamps; pin it to level 0
        else if (q < 0.0) 0
        else if (q > (levels - 1).toDouble) levels - 1
        else q.toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("affineQuantize", this,
      classOf[AffineQuantize].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AffineQuantize {
  /** Column API: integer quantization levels of `vec`. */
  def apply(vec: Column, mins: Array[Double], scales: Array[Double],
      levels: Int): Column =
    GraftSqlInternal.column(
      AffineQuantize(GraftSqlInternal.expression(vec), mins, scales, levels))
}

/** Inverse of [[AffineQuantize]]: `x̂_i = q_i * invScale_i + min_i` over an
  * integer level array — same fused template, `array<double>` out.
  */
case class AffineDequantize(child: Expression, invScales: Array[Double],
    mins: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_affine_dequantize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType, _)
        if invScales.nonEmpty && invScales.length == mins.length =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int>/array<long> and matching " +
          s"invScales/mins, got ${other.catalogString}")
  }

  @transient private lazy val isInt: Boolean = child.dataType match {
    case ArrayType(IntegerType, _) => true
    case _                         => false
  }

  def compute(q: ArrayData): ArrayData = {
    val m = math.min(q.numElements(), mins.length)
    val out = new Array[Double](m)
    var i = 0
    while (i < m) {
      val qi =
        if (q.isNullAt(i)) 0.0
        else if (isInt) q.getInt(i).toDouble
        else q.getLong(i).toDouble
      out(i) = qi * invScales(i) + mins(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("affineDequantize", this,
      classOf[AffineDequantize].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AffineDequantize {
  /** Column API: reconstructed `array<double>` from quantized levels. */
  def apply(q: Column, invScales: Array[Double], mins: Array[Double]): Column =
    GraftSqlInternal.column(
      AffineDequantize(GraftSqlInternal.expression(q), invScales, mins))
}
