package graft.functions

import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

/** All (kind, gram) rows of a document in ONE string pass: every
  * space-separated token as ("uni", token), then every adjacent token
  * pair as ("bi", "w1 w2") — the t32 vocabulary-growth front. Tokens are
  * maximal runs between single-space (0x20) separators with empties
  * dropped, exactly `filter(split(text, " "), t -> t != "")`; unis
  * precede bis in token order, matching the `concat(transform(...),
  * transform(...))` HOF chain element-for-element.
  *
  * The HOF form is interpreted (lambdas never codegen) and evaluates a
  * boxed struct/concat_ws expression tree per element — ~2 evaluations
  * per token per row; this expression is one JIT'd walk over the UTF-8
  * bytes. Token bytes are deliberately COPIED out of the input (the scan
  * reuses its row buffer and the emitted structs outlive the row — a
  * zero-copy slice would alias overwritten memory); the copies and the
  * bigram concats are the only allocations. Bit-parity with the HOF form
  * is pinned in OpsSpec.
  *
  * This sweep is the tokenize cost of the distinct-gram/vocab-growth
  * operators: per-row work, zero shuffle — its throughput IS the
  * t-family's ingest scan rate at 100 TB.
  */
case class UniBiGramPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("gram", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_uni_bi_gram_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    UniBiGramPairs.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UniBiGramPairs.compute($c)")

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UniBiGramPairs {

  private val Uni = UTF8String.fromString("uni")
  private val Bi = UTF8String.fromString("bi")
  private val Space = UTF8String.fromString(" ")

  /** Column API: (kind, gram) pairs — unis in token order, then bis. */
  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    GraftSqlInternal.column(UniBiGramPairs(GraftSqlInternal.expression(text)))

  /** One byte walk: split on 0x20 (a UTF-8 space byte never occurs inside
    * a multibyte sequence), drop empties, emit uni structs then bi
    * structs. Called from eval and codegen.
    */
  def compute(text: UTF8String): GenericArrayData = {
    val n = text.numBytes()
    // Token boundaries as (startByte, lenBytes) pairs — primitive arrays
    // (a text of n bytes holds at most (n+1)/2 tokens), no boxing.
    var starts = new Array[Int](math.min(16, (n >> 1) + 1))
    var lens = new Array[Int](starts.length)
    var t = 0
    var i = 0
    var tokStart = -1
    while (i <= n) {
      val isSep = i == n || text.getByte(i) == 0x20.toByte
      if (isSep) {
        if (tokStart >= 0 && i > tokStart) {
          if (t == starts.length) {
            starts = java.util.Arrays.copyOf(starts, starts.length * 2)
            lens = java.util.Arrays.copyOf(lens, lens.length * 2)
          }
          starts(t) = tokStart; lens(t) = i - tokStart; t += 1
        }
        tokStart = -1
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    // Tokens are COPIED out of the input buffer: the scan reuses its row
    // buffer, while these structs outlive the row (explode/aggregate
    // buffering), so zero-copy slices would alias overwritten memory.
    val toks = new Array[UTF8String](t)
    var j = 0
    while (j < t) {
      toks(j) = slice(text, starts(j), lens(j))
      j += 1
    }
    val out = new Array[Any](t + math.max(0, t - 1))
    j = 0
    while (j < t) { out(j) = InternalRow(Uni, toks(j)); j += 1 }
    j = 0
    while (j < t - 1) {
      out(t + j) = InternalRow(Bi, UTF8String.concat(toks(j), Space, toks(j + 1)))
      j += 1
    }
    new GenericArrayData(out)
  }

  private def slice(text: UTF8String, start: Int, len: Int): UTF8String = {
    val b = new Array[Byte](len)
    org.apache.spark.unsafe.Platform.copyMemory(
      text.getBaseObject, text.getBaseOffset + start,
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len.toLong)
    UTF8String.fromBytes(b)
  }
}
