package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch distinct-set aggregate (Dasgupta et al., "Theta-Sketch
  * Framework: KMV tuning", and the Apache DataSketches implementation):
  * each partition folds its keys into a theta Union, partials merge by
  * sketch union, and the result is the serialized compact sketch.
  *
  * This closes the set-EXPRESSION gap HLL leaves open: HLL sketches union
  * but cannot intersect or difference, while theta sketches support
  * union/intersection/A-not-B over the same KB-sized summaries — the
  * one-pass answer to "how many users/docs do these two slices SHARE" on
  * a 100 TB corpus where the exact answer is a corpus-sized distinct
  * join. Below `nominalEntries` retained keys the sketch is in exact mode
  * (theta = 1, no sampling), so estimates — and intersections of such
  * sketches — are exactly the true counts; above it the relative standard
  * error is ~1/sqrt(nominalEntries).
  *
  * The aggregation buffer is the Union gadget itself; partials serialize
  * as the compact sketch (stable wire format, order-independent by
  * construction: a theta sketch is a pure function of the input SET).
  */
case class ThetaSketchAgg(
    child: Expression,
    nominalEntries: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long, int, or string column, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_theta_sketch"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buf.update(l)
      case i: Int => buf.update(i.toLong)
      case s: UTF8String => buf.update(s.toString)
      case other => buf.update(other.toString)
    }
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult())
    a
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult().toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

object ThetaSketch {
  import org.apache.spark.sql.{Column, GraftSqlInternal}

  /** Column API: serialized theta sketch of a key column's distinct set. */
  def sketch(c: Column, nominalEntries: Int = 4096): Column =
    GraftSqlInternal.column(
      ThetaSketchAgg(GraftSqlInternal.expression(c), nominalEntries)
        .toAggregateExpression())

  private def read(bytes: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes))

  /** Distinct estimate of a serialized sketch (exact in exact mode). */
  def estimate(bytes: Array[Byte]): Double = read(bytes).getEstimate

  /** |A ∩ B| estimate from two serialized sketches. */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val in = SetOperation.builder().buildIntersection()
    in.intersect(read(a))
    in.intersect(read(b))
    in.getResult().getEstimate
  }

  /** |A \ B| estimate from two serialized sketches. */
  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB()
      .aNotB(read(a), read(b)).getEstimate

  /** |A ∪ B| estimate from two serialized sketches. */
  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val u = SetOperation.builder().buildUnion()
    u.union(read(a))
    u.union(read(b))
    u.getResult().getEstimate
  }
}
