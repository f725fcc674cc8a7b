package graft.functions

import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03) over positional hashes in ONE pass: the minimum of each
  * `w`-length sliding window, deduplicated in first-occurrence order —
  * exactly `array_distinct(transform(sequence(0, n-w), j ->
  * array_min(slice(hs, j+1, w))))`, which is interpreted per element
  * (HOFs never codegen) and allocates a w-slice per position. This
  * expression runs a monotonic-deque sliding minimum — O(n) with two
  * primitive scratch arrays — then dedups with one hash set. Arrays
  * shorter than `w` yield an empty result (the HOF's `otherwise`
  * branch).
  *
  * Paired with [[KgramHashes60]] this is the full per-row winnowing
  * sweep: together they are the ingest-scan cost of the fingerprint /
  * postings / decontamination family at 100 TB (SimBench measures the
  * pair at 10^6 docs).
  */
case class WinnowMins(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_mins"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if w > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure("w must be positive")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<long>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowMins.compute(input.asInstanceOf[ArrayData], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowMins.compute($c, $w)")

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMins {

  /** Column API: winnowed (deduplicated sliding-window-min) fingerprints. */
  def apply(hs: org.apache.spark.sql.Column, w: Int)
      : org.apache.spark.sql.Column =
    GraftSqlInternal.column(WinnowMins(GraftSqlInternal.expression(hs), w))

  /** One-pass sliding min + first-occurrence dedup; called from both
    * eval and codegen.
    */
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val xs = arr.toLongArray()
    val m = n - w + 1
    // Monotonic deque of candidate indices: values increase front-to-back,
    // so the front is always the current window's minimum.
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    val mins = new Array[Long](m)
    var i = 0
    while (i < n) {
      while (tail > head && xs(dq(tail - 1)) >= xs(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = xs(dq(head))
      i += 1
    }
    // Dedup preserving first occurrence — array_distinct's order.
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var k = 0
    var t = 0
    while (t < m) {
      val v = mins(t)
      if (seen.add(v)) { out(k) = v; k += 1 }
      t += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}
