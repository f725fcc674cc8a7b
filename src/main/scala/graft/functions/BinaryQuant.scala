package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** 1-bit (sign) quantization of a vector: bit p of output word w is set
  * iff `vec(w * wordBits + p) > 0`. Words carry at most 32 bits each and
  * are emitted as `array<long>`, so every word is a NON-NEGATIVE long —
  * xor/popcount arithmetic on them stays inside plain BIGINT math in any
  * engine (no sign-bit edge cases), which is what lets the v19 oracle
  * replay the identical packing in DuckDB.
  *
  * This is the extreme point of the storage-compression family
  * ([[AffineQuantize]] is the 8-bit point): a 64-dim float32 embedding
  * (256 B) becomes two longs (16 B), and candidate scoring drops from 64
  * multiply-adds to 2 xor+popcnt — the shape vector stores serve billions
  * of comparisons with. Unlike [[SignBandSignatures]] (random hyperplanes
  * -> bucket EQUALITY for LSH candidate generation), the sign bits here
  * are per-DIMENSION and the payoff is a ranked Hamming DISTANCE that
  * approximates cosine rank for re-ranking ([[graft.ops.Quantize]]).
  *
  * Cost is one comparison per dimension — there is no plane sweep, so a
  * dedicated expression beats reusing the hyperplane signature with an
  * identity basis by a factor of `dims`. Null vector -> null; null
  * elements read as 0.0 (bit clear), like the rest of the vector family.
  */
case class SignPack(child: Expression, wordBits: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_pack"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!VectorExpressions.isVecType(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double>, got " +
          child.dataType.catalogString)
    } else if (wordBits < 1 || wordBits > 32) {
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs 1 <= wordBits <= 32")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  def compute(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    val words = (n + wordBits - 1) / wordBits
    val out = new Array[Long](words)
    var i = 0
    while (i < n) {
      val x =
        if (vec.isNullAt(i)) 0.0
        else if (isFloat) vec.getFloat(i).toDouble
        else vec.getDouble(i)
      if (x > 0) out(i / wordBits) |= 1L << (i % wordBits)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signPack", this, classOf[SignPack].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignPack {
  /** Column API: packed sign bits of `vec`, `wordBits` dims per long. */
  def apply(vec: Column, wordBits: Int = 32): Column =
    GraftSqlInternal.column(
      SignPack(GraftSqlInternal.expression(vec), wordBits))
}

/** Hamming distance between two packed-word signatures ([[SignPack]]
  * outputs): `sum_w popcount(a_w xor b_w)` over the common word prefix.
  * One fused loop per pair — the candidate-scoring hot path of binary
  * quantized search, kept as a single codegen call like the rest of the
  * family. Either side null -> null.
  */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming_words"

  private def isWords(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isWords(left.dataType) && isWords(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<long> signatures, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HammingWords.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HammingWords.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingWords {

  def compute(a: ArrayData, b: ArrayData): Int = {
    val m = math.min(a.numElements(), b.numElements())
    var d = 0
    var w = 0
    while (w < m) {
      val x = (if (a.isNullAt(w)) 0L else a.getLong(w)) ^
        (if (b.isNullAt(w)) 0L else b.getLong(w))
      d += java.lang.Long.bitCount(x)
      w += 1
    }
    d
  }

  /** Column API: Hamming distance between two [[SignPack]] signatures. */
  def apply(a: Column, b: Column): Column =
    GraftSqlInternal.column(HammingWords(
      GraftSqlInternal.expression(a), GraftSqlInternal.expression(b)))
}
