package graft.functions

import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass every
  * text-curation pipeline runs before hashing or deduplicating: visually
  * identical strings whose bytes differ only by composed vs decomposed
  * accents (`é` as U+00E9 vs `e`+U+0301) collapse to one canonical byte
  * form, so exact dedup (d01) and fingerprinting (t06) stop treating them
  * as distinct documents.
  *
  * Map-only at any corpus size; the normalizer is the JDK's
  * `java.text.Normalizer` (Unicode-conformant NFC — same algorithm DuckDB's
  * utf8proc `nfc_normalize` implements, so outputs agree byte-for-byte and
  * the oracle can hash the result). The common case — already-NFC ASCII —
  * is short-circuited by `Normalizer.isNormalized`, which scans without
  * allocating; only rows that actually change pay the compose.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.compute($c)")

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Column API: NFC-normalize a string column. */
  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    GraftSqlInternal.column(NfcNormalize(GraftSqlInternal.expression(text)))

  /** Called from eval and codegen. `isNormalized` first: the overwhelmingly
    * common already-canonical row costs one scan and zero allocations
    * (beyond the UTF8String→String decode the Normalizer API forces).
    */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
