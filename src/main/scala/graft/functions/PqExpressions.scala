package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization expressions ([[graft.ops.Pq]]): the corpus scan
  * side of IVF-PQ-style ANN. Same fused-constant-sweep design as
  * [[CentroidArgmax]] / [[AffineQuantize]]: the codebook tensor rides to
  * executors ONCE as a reference object, each row costs one primitive
  * loop, and codegen is a single call — never an N-literal subtree (the
  * interpreted-fallback trap measured at ~2000x in round 4).
  */

/** PQ encoding: split the vector into `m` contiguous subspaces and emit,
  * per subspace, the index of the L2-nearest codebook centroid
  * (`array<int>` of length m; ties keep the smallest index). Codebook
  * layout: `codebooks(j)(k)` is centroid k of subspace j, all of equal
  * sub-dimension; vectors shorter than the expected `m * dsub` treat
  * missing tail elements as 0.0 (consistent with the vector expressions'
  * prefix rule). Null vector -> null.
  */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorExpressions.isVecType(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got " +
          child.dataType.catalogString)
    } else if (codebooks.isEmpty || codebooks.exists(_.isEmpty) ||
        codebooks.exists(cb => cb.exists(_.length != cb.head.length))) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs non-empty equal-dimension codebooks per subspace")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  def compute(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    val m = codebooks.length
    val out = new Array[Int](m)
    var offset = 0
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = cb(0).length
      var best = 0
      var bestDist = Double.MaxValue
      var k = 0
      while (k < cb.length) {
        val cent = cb(k)
        var dist = 0.0
        var i = 0
        while (i < dsub) {
          val idx = offset + i
          val x =
            if (idx >= n || vec.isNullAt(idx)) 0.0
            else if (isFloat) vec.getFloat(idx).toDouble
            else vec.getDouble(idx)
          val d = x - cent(i)
          dist += d * d
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = k }
        k += 1
      }
      out(j) = best
      offset += dsub
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftSqlInternal.column(
      PqEncode(GraftSqlInternal.expression(vec), codebooks))
}

/** The Lloyd-update explosion, fused: per vector, encode ONCE and emit
  * one `struct<j, code, i, x>` per element — subspace, assigned centroid,
  * position within the subspace, element value. Exists because the
  * obvious `select(PqEncode(vec).as("codes"), posexplode(vec))` then
  * `element_at(codes, ...)` form re-evaluates the encode per EXPLODED
  * element once CollapseProject inlines the alias into the post-explode
  * projection — measured 374 s vs 5 s for the identical scan at 10^6 x 64
  * with ksub=256 (the alias-inlining sibling of the N-literal-subtree
  * trap above). A single generator-input expression cannot be split, so
  * the encode provably runs once per row. Null vector -> null.
  */
case class PqTrainPairs(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {

  private def elementType: StructType = StructType(Seq(
    StructField("j", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("i", IntegerType, nullable = false),
    StructField("x", DoubleType, nullable = false)))

  override def dataType: DataType =
    ArrayType(elementType, containsNull = false)
  override def prettyName: String = "graft_pq_train_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorExpressions.isVecType(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got " +
          child.dataType.catalogString)
    } else if (codebooks.isEmpty || codebooks.exists(_.isEmpty) ||
        codebooks.exists(cb => cb.exists(_.length != cb.head.length))) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs non-empty equal-dimension codebooks per subspace")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  @transient private lazy val encoder = PqEncode(child, codebooks)

  def compute(vec: ArrayData): ArrayData = {
    val codes = encoder.compute(vec)
    val dsub = codebooks.head.head.length
    val m = codebooks.length
    val n = math.min(vec.numElements(), m * dsub)
    val out = new Array[Any](n)
    var pos = 0
    while (pos < n) {
      val x =
        if (vec.isNullAt(pos)) 0.0
        else if (isFloat) vec.getFloat(pos).toDouble
        else vec.getDouble(pos)
      val j = pos / dsub
      out(pos) = org.apache.spark.sql.catalyst.InternalRow(
        j, codes.getInt(j), pos - j * dsub, x)
      pos += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTrainPairs", this,
      classOf[PqTrainPairs].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqTrainPairs {
  def apply(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftSqlInternal.column(
      PqTrainPairs(GraftSqlInternal.expression(vec), codebooks))
}

/** Per-query ADC lookup table: `table(j)(k) = dot(query_sub_j,
  * codebook(j)(k))` as `array<array<double>>` — computed once per PROBE
  * row (map-side, m x ksub doubles), so scoring a corpus row later is m
  * lookups instead of a d-element dot ([[AdcDot]]). Missing query tail
  * elements read as 0.0; null query -> null.
  */
case class PqAdcTable(child: Expression,
    codebooks: Array[Array[Array[Float]]]) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_pq_adc_table"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorExpressions.isVecType(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got " +
          child.dataType.catalogString)
    } else if (codebooks.isEmpty || codebooks.exists(_.isEmpty)) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs non-empty codebooks")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  def compute(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    val m = codebooks.length
    val rows = new Array[Any](m)
    var offset = 0
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = cb(0).length
      val row = new Array[Double](cb.length)
      var k = 0
      while (k < cb.length) {
        val cent = cb(k)
        var dot = 0.0
        var i = 0
        while (i < dsub) {
          val idx = offset + i
          val x =
            if (idx >= n || vec.isNullAt(idx)) 0.0
            else if (isFloat) vec.getFloat(idx).toDouble
            else vec.getDouble(idx)
          dot += x * cent(i)
          i += 1
        }
        row(k) = dot
        k += 1
      }
      rows(j) = new GenericArrayData(row)
      offset += dsub
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTable", this, classOf[PqAdcTable].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAdcTable {
  def apply(queryVec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftSqlInternal.column(
      PqAdcTable(GraftSqlInternal.expression(queryVec), codebooks))
}

/** Asymmetric-distance score: `sum_j table(j)(codes(j))` — the
  * approximate `dot(query, x̂)` where x̂ is the PQ reconstruction of the
  * corpus row. Pure function of its two column children (no constants),
  * one primitive loop, single-call codegen. Codes out of a table row's
  * range contribute 0.0 (never throws on a corrupt code); either input
  * null -> null.
  */
case class AdcDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_dot"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int> codes, array<array<double>> table), " +
        s"got (${l.catalogString}, ${r.catalogString})")
  }

  def compute(codes: ArrayData, table: ArrayData): Double = {
    val m = math.min(codes.numElements(), table.numElements())
    var score = 0.0
    var j = 0
    while (j < m) {
      if (!codes.isNullAt(j) && !table.isNullAt(j)) {
        val row = table.getArray(j)
        val k = codes.getInt(j)
        if (k >= 0 && k < row.numElements() && !row.isNullAt(k)) {
          score += row.getDouble(k)
        }
      }
      j += 1
    }
    score
  }

  override def nullSafeEval(codes: Any, table: Any): Any =
    compute(codes.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcDot", this, classOf[AdcDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcDot {
  def apply(codes: Column, table: Column): Column =
    GraftSqlInternal.column(AdcDot(
      GraftSqlInternal.expression(codes), GraftSqlInternal.expression(table)))
}

/** Residual against an assigned centroid: `vec - centroids(cell)` as
  * `array<float>` — the IVF-PQ ingest step (PQ codes are trained on and
  * encode the residual; the coarse centroid carries the rest of the
  * signal). Centroid matrix rides once as a reference object, indexed by
  * the cell column; out-of-range cells subtract nothing (vec passes
  * through), missing vector tail reads as 0.0. Null vector or null cell
  * -> null.
  */
case class CentroidResidual(left: Expression, right: Expression,
    centroids: Array[Array[Float]]) extends BinaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_centroid_residual"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorExpressions.isVecType(left.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got " +
          left.dataType.catalogString)
    } else if (right.dataType != IntegerType) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an int cell column, got " +
          right.dataType.catalogString)
    } else if (centroids.isEmpty) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs centroids")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  def compute(vec: ArrayData, cell: Int): ArrayData = {
    val n = vec.numElements()
    val cent: Array[Float] =
      if (cell >= 0 && cell < centroids.length) centroids(cell)
      else Array.emptyFloatArray
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val x =
        if (vec.isNullAt(i)) 0.0f
        else if (isFloat) vec.getFloat(i)
        else vec.getDouble(i).toFloat
      out(i) = if (i < cent.length) x - cent(i) else x
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(vec: Any, cell: Any): Any =
    compute(vec.asInstanceOf[ArrayData], cell.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidResidual", this,
      classOf[CentroidResidual].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CentroidResidual {
  def apply(vec: Column, cell: Column,
      centroids: Array[Array[Float]]): Column =
    GraftSqlInternal.column(CentroidResidual(
      GraftSqlInternal.expression(vec), GraftSqlInternal.expression(cell),
      centroids))
}
