package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlInternal
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature over pre-hashed shingle pairs, all members in one pass.
  *
  * Input: `array<struct<h1: long, h2: long>>` (one md5-derived 48-bit pair
  * per distinct shingle, [[graft.ops.Dedup.hashPair48]]). Output: `k` longs,
  * member j = min over elements of `(h1 + j*h2) mod (2^31-1)` — the same
  * Carter-Wegman family the DuckDB oracle replays; the Mersenne-prime
  * reduction keeps members independent (unreduced, argmin degenerates to
  * argmin(h2) as j grows and LSH bands collapse).
  *
  * This exists because the HOF formulation (k × `array_min(transform(...))`)
  * is interpreted and allocates k intermediate arrays per row — measured as
  * the dominant cost of char-gram dedup (~64 passes over ~200-element
  * arrays per document). Here the k mins accumulate in one registers-only
  * loop inside whole-stage codegen. Empty input yields null (callers filter
  * empty shingle sets first).
  */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val Prime = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s.forall(_.dataType == LongType) =>
      if (numHashes > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("numHashes must be positive")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<long,long>>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val p = arr.getStruct(i, 2)
        val h1 = p.getLong(0)
        val h2 = p.getLong(1)
        var j = 0
        while (j < numHashes) {
          val v = (h1 + j * h2) % Prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val p = ctx.freshName("p")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      org.apache.spark.sql.catalyst.InternalRow $p = $a.getStruct($i, 2);
         |      final long $h1 = $p.getLong(0);
         |      final long $h2 = $p.getLong(1);
         |      for (int $j = 0; $j < $numHashes; $j++) {
         |        final long $v = ($h1 + $j * $h2) % ${Prime}L;
         |        if ($v < $mins[$j]) $mins[$j] = $v;
         |      }
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSignature {
  /** Column API: signature of a hashed-pairs array column. */
  def apply(pairs: Column, numHashes: Int): Column =
    GraftSqlInternal.column(
      MinhashSignature(GraftSqlInternal.expression(pairs), numHashes))
}
