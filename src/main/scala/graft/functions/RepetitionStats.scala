package graft.functions

import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The t08 repetition front in ONE string pass: token count, distinct
  * token count, bigram count, and the max frequency of any word bigram —
  * struct(n_tokens, n_distinct, n_bigrams, top_bigram_n).
  *
  * Replaces the HOF chain `array_sort(transform(sequence(...),
  * concat_ws(toks[i], toks[i+1])))` + a 3-field `aggregate` run-length
  * fold + `array_distinct` — the sort is O(t log t) STRING comparisons and
  * the transform/aggregate lambdas are interpreted (HOFs never codegen),
  * ~3 boxed expression-tree evaluations per token per row. Here: one byte
  * walk tokenizes (split on 0x20, empties dropped — exactly
  * `filter(split(text, " "), t -> t != "")`), tokens intern to integer
  * ids in a hash map (distinct count = map size, and the map keys are
  * in-buffer slices that never outlive the call), and bigrams count in a
  * long-keyed map (id1 << 32 | id2) — no bigram string is ever built.
  * Pair equality == joined-string equality because tokens cannot contain
  * the separator, so top_bigram_n is value-identical to the sorted-run
  * fold; pinned against the HOF chain in OpsSpec.
  *
  * Map-only per-row work, zero shuffle: this front is the t08 scan rate
  * at 100 TB.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("top_bigram_n", IntegerType, nullable = false)))

  override def prettyName: String = "graft_repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RepetitionStats.compute($c)")

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  /** Column API: struct(n_tokens, n_distinct, n_bigrams, top_bigram_n). */
  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    GraftSqlInternal.column(RepetitionStats(GraftSqlInternal.expression(text)))

  /** One byte walk + two hash maps. Called from eval and codegen. */
  def compute(text: UTF8String): InternalRow = {
    val n = text.numBytes()
    // Token ids in document order. Keys are zero-copy slices of the input
    // buffer — safe because the map dies inside this call; only ints
    // leave.
    val ids = new java.util.HashMap[UTF8String, Integer]()
    var order = new Array[Int](math.min(16, (n >> 1) + 1))
    var t = 0
    var i = 0
    var tokStart = -1
    while (i <= n) {
      val isSep = i == n || text.getByte(i) == 0x20.toByte
      if (isSep) {
        if (tokStart >= 0 && i > tokStart) {
          val tok = UTF8String.fromAddress(text.getBaseObject,
            text.getBaseOffset + tokStart, i - tokStart)
          var id = ids.get(tok)
          if (id == null) { id = Integer.valueOf(ids.size()); ids.put(tok, id) }
          if (t == order.length)
            order = java.util.Arrays.copyOf(order, order.length * 2)
          order(t) = id.intValue()
          t += 1
        }
        tokStart = -1
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    var top = 0
    if (t >= 2) {
      val pairs = new java.util.HashMap[java.lang.Long, Integer]()
      var j = 0
      while (j < t - 1) {
        val key = java.lang.Long.valueOf(
          (order(j).toLong << 32) | (order(j + 1).toLong & 0xffffffffL))
        val c = pairs.merge(key, Integer.valueOf(1), (a, b) =>
          Integer.valueOf(a.intValue() + b.intValue()))
        if (c.intValue() > top) top = c.intValue()
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](t, ids.size(), math.max(0, t - 1), top))
  }
}
