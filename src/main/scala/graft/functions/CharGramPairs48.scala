package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-gram (h1, h2) hash pairs of a string in ONE pass:
  * the fusion of `charShingles` (per-position substring + array_distinct)
  * and `hashPair48` (one md5 per shingle, split into two 48-bit halves) —
  * the front of the char-gram MinHash path (d04, st09). The HOF chain it
  * replaces materializes every gram as a string element, dedups them with
  * array_distinct, then re-reads each through an interpreted Md5/Conv
  * tree; this expression walks the string once, dedups grams in a hash
  * set, and hashes each distinct gram exactly once with a reused digest.
  *
  * Values are bit-identical to
  * `transform(charShingles(text, n), s -> hashPair48(s))` up to element
  * ORDER (insertion order here vs array_distinct's first-occurrence order
  * — which coincide) — and every consumer (MinHash minima, band keys,
  * set intersections) is order-insensitive set math anyway.
  */
case class CharGramPairs48(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = CharGramPairs48.OutType
  override def prettyName: String = "graft_chargram_pairs48"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure("n must be positive")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharGramPairs48.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharGramPairs48.compute($c, $n)")

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramPairs48 {

  /** Column API: distinct hashed char n-gram pairs of a text column. */
  def apply(text: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column =
    GraftSqlInternal.column(
      CharGramPairs48(GraftSqlInternal.expression(text), n))

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** One-pass distinct-gram hash sweep; called from eval and codegen. */
  def compute(str: UTF8String, n: Int): ArrayData = {
    val chars = str.numChars()
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= chars - n) {
      seen.add(str.substringSQL(i + 1, n))
      i += 1
    }
    val md = md5.get()
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      md.reset()
      md.update(it.next().getBytes)
      val d = md.digest()
      // hex chars [1,12] = bytes 0..5; [13,24] = bytes 6..11 — identical
      // to conv(substring(md5hex, 1|13, 12), 16, 10).
      var h1 = 0L; var b = 0
      while (b < 6) { h1 = (h1 << 8) | (d(b) & 0xffL); b += 1 }
      var h2 = 0L
      while (b < 12) { h2 = (h2 << 8) | (d(b) & 0xffL); b += 1 }
      out(j) = new GenericInternalRow(Array[Any](h1, h2))
      j += 1
    }
    new GenericArrayData(out)
  }
}
