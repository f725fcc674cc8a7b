package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The m05 64-bit difference hash (dhash) of a stub-decoded 9x8 gray image
  * in ONE pass: 72+ gray bytes from FIVE md5 digests of
  * `text || ":g" || j` (j in 0..4, 16 bytes each — the windows-of-a-digest
  * economy the FakeDecoder uses), then bit b of the hash is set when the
  * right neighbor in the 9-wide row is brighter:
  * `g[(b/8)*9 + (b%8) + 1] > g[(b/8)*9 + (b%8)]` — returned as
  * `array(hi, lo)` (bits 0..31 and 32..63).
  *
  * Replaces the `flatten(transform(transform(sequence(0,4), md5...),
  * m -> transform(sequence(0,15), conv(substring(m,...)))))` projection
  * plus two 32-step `aggregate` folds, all interpreted (HOFs never
  * codegen) with per-element boxing and hex-string round-trips: ~150
  * interpreted expression-tree evaluations per row become one JIT'd walk
  * over raw digest bytes. Same bytes hashed, same unsigned comparisons
  * (`conv(hex pair) = unsigned digest byte`), so hi/lo are bit-identical
  * to the HOF form and to the DuckDB oracle's
  * `substr(md5(text || ':g' || j), ...)` replay — pinned in OpsSpec.
  *
  * This sweep is the decode+hash ingest cost of the multimodal dedup
  * family: per-row work, zero shuffle, so its throughput IS the m-family's
  * 100 TB scan rate.
  */
case class DhashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dhash_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    DhashBits.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DhashBits.compute($c)")

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DhashBits {

  /** Column API: array(hi, lo) dhash longs of a text column. */
  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    GraftSqlInternal.column(DhashBits(GraftSqlInternal.expression(text)))

  /** One digest instance per thread, reset per row — getInstance walks
    * the JCA provider registry and allocates, which is measurable at
    * scan rate (the sibling fused hashers CharGramPairs48/KgramHashes60
    * already do this).
    */
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Five digests -> 80 unsigned gray bytes -> 64 neighbor comparisons.
    * Called from eval and codegen.
    */
  def compute(text: UTF8String): GenericArrayData = {
    val md = md5.get()
    val base = text.getBytes
    // g holds the digest bytes as unsigned ints, 16 per suffix j.
    val g = new Array[Int](80)
    var j = 0
    while (j < 5) {
      md.reset()
      md.update(base)
      md.update(':'.toByte); md.update('g'.toByte)
      md.update(('0' + j).toByte)
      val d = md.digest()
      var b = 0
      while (b < 16) { g(j * 16 + b) = d(b) & 0xff; b += 1 }
      j += 1
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 32) {
      val idx = (b >> 3) * 9 + (b & 7)
      if (g(idx + 1) > g(idx)) hi |= 1L << b
      b += 1
    }
    while (b < 64) {
      val idx = (b >> 3) * 9 + (b & 7)
      if (g(idx + 1) > g(idx)) lo |= 1L << (b - 32)
      b += 1
    }
    new GenericArrayData(Array(hi, lo))
  }
}
