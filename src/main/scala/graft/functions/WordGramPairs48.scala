package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram (h1, h2) hash pairs of a string in ONE pass: the
  * fusion of `Dedup.tokens` (split on single spaces, drop empties),
  * `wordShingles` (n-gram join with single spaces, distinct) and
  * `hashPair48` (one md5 per shingle) — the front of the word-trigram
  * MinHash path (d02/d05/d06/d08 and the d11 verification sets). Same
  * gram STRINGS hashed (single-space joined), so values are bit-identical
  * to the HOF chain and to the oracles' `toks[i+1] || ' ' || ...` replay;
  * element order is first-occurrence like array_distinct, and every
  * consumer is order-insensitive set math regardless.
  *
  * Docs with fewer than n tokens yield an empty array (the wordShingles
  * guard); null text yields null — callers filter or coalesce exactly as
  * they did for the HOF form.
  */
case class WordGramPairs48(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = CharGramPairs48.OutType
  override def prettyName: String = "graft_wordgram_pairs48"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure("n must be positive")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordGramPairs48.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordGramPairs48.compute($c, $n)")

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGramPairs48 {

  /** Column API: distinct hashed word n-gram pairs of a text column. */
  def apply(text: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column =
    GraftSqlInternal.column(
      WordGramPairs48(GraftSqlInternal.expression(text), n))

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** One-pass tokenize + n-gram + dedup + hash; called from eval and
    * codegen. Tokenization matches `split(text, " ")` + drop-empties:
    * split on SINGLE spaces (runs of spaces produce empty tokens, which
    * drop), every other character — tabs included — stays inside its
    * token, exactly like the Column chain and the DuckDB
    * `string_split(text, ' ')` oracles.
    */
  def compute(str: UTF8String, n: Int): ArrayData = {
    val tokens = new java.util.ArrayList[String]()
    val s = str.toString
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) tokens.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = tokens.size()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j <= m - n) {
      val sb = new java.lang.StringBuilder(tokens.get(j))
      var k = 1
      while (k < n) { sb.append(' ').append(tokens.get(j + k)); k += 1 }
      seen.add(sb.toString)
      j += 1
    }
    val md = md5.get()
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) {
      md.reset()
      md.update(it.next().getBytes("UTF-8"))
      val d = md.digest()
      var h1 = 0L; var b = 0
      while (b < 6) { h1 = (h1 << 8) | (d(b) & 0xffL); b += 1 }
      var h2 = 0L
      while (b < 12) { h2 = (h2 << 8) | (d(b) & 0xffL); b += 1 }
      out(p) = new GenericInternalRow(Array[Any](h1, h2))
      p += 1
    }
    new GenericArrayData(out)
  }
}
