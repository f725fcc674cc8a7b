package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate heavy hitters via the SpaceSaving algorithm (Metwally et
  * al., "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005) as a TypedImperativeAggregate: each partition
  * keeps at most `capacity` counters, partials merge by counter addition
  * with SpaceSaving eviction, and the final result is the top-k
  * (value -> estimated count) map.
  *
  * This is the one-pass answer to "which tokens/domains/urls dominate a
  * 100 TB corpus": memory is O(capacity) per partition regardless of
  * cardinality, versus a full groupBy whose shuffle carries every distinct
  * key. Estimated counts over-count by at most the smallest evicted
  * counter (the classic SpaceSaving bound); with capacity >= distinct
  * keys the result is exact — which is what the tests assert.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  def this(child: Expression, k: Int) = this(child, k, k * 8)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, Long] =
    mutable.LinkedHashMap.empty

  private def offer(buf: mutable.LinkedHashMap[String, Long], key: String,
      inc: Long): Unit = SpaceSaving.offer(buf, key, inc, capacity)

  override def update(
      buf: mutable.LinkedHashMap[String, Long],
      input: InternalRow): mutable.LinkedHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L)
    buf
  }

  override def merge(
      a: mutable.LinkedHashMap[String, Long],
      b: mutable.LinkedHashMap[String, Long]): mutable.LinkedHashMap[String, Long] = {
    b.foreach { case (key, c) => offer(a, key, c) }
    a
  }

  override def eval(buf: mutable.LinkedHashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(top.map(t => UTF8String.fromString(t._1)).toArray[Any]),
      new GenericArrayData(top.map(_._2).toArray[Any]))
  }

  override def serialize(buf: mutable.LinkedHashMap[String, Long]): Array[Byte] =
    SpaceSaving.serialize(buf)

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, Long] =
    SpaceSaving.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}

/** The SpaceSaving counter core, shared by the batch aggregate
  * ([[SpaceSavingTopK]]) and the streaming keyed-state processor
  * ([[graft.streaming.EventStreams.TopKProcessor]]) — same eviction rule,
  * same wire format, so a counter map round-trips identically through an
  * aggregation buffer or a state-store cell.
  */
object SpaceSaving {

  /** Add `inc` to `key`, evicting the minimum counter (and inheriting its
    * count — over-estimate, never under-estimate) when at `capacity`.
    */
  def offer(buf: mutable.LinkedHashMap[String, Long], key: String,
      inc: Long, capacity: Int): Unit = {
    buf.get(key) match {
      case Some(c) => buf(key) = c + inc
      case None if buf.size < capacity => buf(key) = inc
      case None =>
        val (minK, minC) = buf.minBy(_._2)
        buf.remove(minK)
        buf(key) = minC + inc
    }
  }

  def serialize(buf: mutable.LinkedHashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, Long]
    (0 until n).foreach(_ => buf(in.readUTF()) = in.readLong())
    buf
  }
}

object SpaceSavingTopK {
  import org.apache.spark.sql.{Column, GraftSqlInternal}

  /** Column API: top-k heavy hitters of a string column. */
  def topK(c: Column, k: Int, capacity: Int = 0): Column = {
    val cap = if (capacity > 0) capacity else k * 8
    GraftSqlInternal.column(
      SpaceSavingTopK(GraftSqlInternal.expression(c), k, cap)
        .toAggregateExpression())
  }
}
