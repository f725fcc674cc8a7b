package graft.functions

import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent word pairs of a token array as struct(w1, w2) rows — the t14
  * bigram-explode front. Element-identical to
  * `transform(sequence(0, size(toks) - 2), i -> struct(toks[i+1] AS w1,
  * toks[i+2] AS w2))` (1-based element_at), which is an interpreted HOF:
  * the lambda never enters whole-stage codegen and evaluates a boxed
  * struct tree per pair. Here one JIT'd walk copies each token once
  * (structs outlive the scan's reused row buffer in the downstream
  * explode/persist, so zero-copy slices would alias overwritten memory —
  * the [[UniBiGramPairs]] rule) and shares the copy between the pair that
  * reads it as w2 and the next that reads it as w1.
  */
case class BigramStructs(child: Expression) extends UnaryExpression {

  private def elementNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = elementNullable),
      StructField("w2", StringType, nullable = elementNullable))),
    containsNull = false)

  override def prettyName: String = "graft_bigram_structs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BigramStructs.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramStructs.compute($c)")

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramStructs {

  /** Column API: array of struct(w1, w2) adjacent pairs of a token array. */
  def apply(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    GraftSqlInternal.column(BigramStructs(GraftSqlInternal.expression(toks)))

  /** One walk, each token copied once and shared by its two pairs.
    * Called from eval and codegen.
    */
  def compute(toks: ArrayData): GenericArrayData = {
    val t = toks.numElements()
    if (t < 2) return new GenericArrayData(new Array[Any](0))
    // Copy tokens out of the (possibly reused) backing buffer once.
    val copies = new Array[UTF8String](t)
    var i = 0
    while (i < t) {
      val s = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      copies(i) = if (s == null) null else UTF8String.fromBytes(s.getBytes)
      i += 1
    }
    val out = new Array[Any](t - 1)
    i = 0
    while (i < t - 1) {
      out(i) = InternalRow(copies(i), copies(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }
}
