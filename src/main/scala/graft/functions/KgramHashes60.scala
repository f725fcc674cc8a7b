package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional k-gram 60-bit hashes of a string in ONE pass: element i is
  * `hash60(0, substring(text, i+1, k))` — the first 15 hex chars of
  * md5("0:" + gram) read as a long — for i in [0, numChars-k]. Replaces
  * the `transform(sequence(...), i -> conv(substring(md5(concat(...)))))`
  * HOF chain, which is interpreted per element (HOFs never codegen) and
  * re-evaluates the Substring/Md5/Conv expression tree with boxing for
  * every position; this expression walks the string once with a reused
  * MessageDigest and writes primitive longs. Same bytes hashed (char-based
  * substring semantics, UTF-8 encoded — multibyte text included), so the
  * values are bit-identical to the HOF form and to the DuckDB oracles'
  * `md5('0:' || substr(text, i+1, k))` replay.
  *
  * This sweep is the ingest-scan cost of the whole winnowing family
  * (fingerprints, postings, decontamination, contamination matrix,
  * containment candidates, CDC chunk boundaries) — per-row work, zero
  * shuffle, so its throughput IS those operators' 100 TB scan rate.
  */
case class KgramHashes60(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kgram_hashes60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure("k must be positive")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    KgramHashes60.compute(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.KgramHashes60.compute($c, $k)")

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KgramHashes60 {

  /** Column API: positional k-gram hash sweep of a string column. */
  def apply(text: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column =
    GraftSqlInternal.column(
      KgramHashes60(GraftSqlInternal.expression(text), k))

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val Prefix = "0:".getBytes("UTF-8")

  /** One-pass positional hash sweep; called from both eval and codegen. */
  def compute(str: UTF8String, k: Int): ArrayData = {
    val n = str.numChars()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val md = md5.get()
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      md.reset()
      md.update(Prefix)
      md.update(str.substringSQL(i + 1, k).getBytes)
      val d = md.digest()
      // First 15 hex chars of the digest = bytes 0..6 plus the high
      // nibble of byte 7, read big-endian — identical to
      // conv(substring(md5hex, 1, 15), 16, 10).
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = (v << 4) | ((d(7) & 0xffL) >>> 4)
      i += 1
    }
    new GenericArrayData(out)
  }
}
