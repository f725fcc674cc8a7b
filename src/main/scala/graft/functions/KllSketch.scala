package graft.functions

import org.apache.datasketches.kll.KllFloatsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KLL quantile-sketch aggregate (Karnin, Lang & Liberty, FOCS'16; the
  * Apache DataSketches floats implementation): each partition folds its
  * values into one sketch, partials merge by sketch merge, and the result
  * is the serialized sketch — KB per group whatever the input size, with
  * a PROVEN normalized-rank-error guarantee (~1.65% two-sided at the
  * default k=200).
  *
  * This is the batch twin of the streaming quantile state (st17 /
  * [[graft.streaming.EventStreams.QuantileProcessor]]) — same sketch,
  * same wire format, so a batch-built sketch can seed streaming state
  * and vice versa. It answers the quantile question Spark's exact
  * `percentile` cannot at 100 TB group cardinalities: exact percentile
  * buffers every value per group; KLL carries a bounded summary through
  * the same partial+final aggregation as any sum.
  *
  * KLL's guarantee is on RANK, and compaction is randomized — estimates
  * are honest only through rank-band contracts (st14's estimator-honesty
  * rule), never value equality. The [[KllSketch]] helpers expose
  * quantile/rank/n reads over the serialized bytes.
  *
  * Precision: this is the FLOATS sketch — `update` narrows Double/Long/
  * Int inputs to Float before folding, so integer values above 2²⁴
  * (~16.7M) and high-precision doubles lose exactness, invisibly to
  * callers (checkInputDataTypes accepts LongType). Rank-band contracts
  * absorb the narrowing, but quantile VALUES read back via
  * [[KllSketch.quantile]] are float-precision; a pipeline needing exact
  * valued quantiles of large longs swaps in [[KllDoublesSketchAgg]]
  * (same DataSketches family, same merge algebra, 2× the summary size) —
  * a10_kll_doubles_exact drives it with a value-membership contract the
  * floats sketch cannot pass above 2²⁴.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllFloatsSketch]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case FloatType | DoubleType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric column, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_kll_sketch"

  override def createAggregationBuffer(): KllFloatsSketch =
    KllFloatsSketch.newHeapInstance(k)

  override def update(buf: KllFloatsSketch, input: InternalRow): KllFloatsSketch = {
    val v = child.eval(input)
    if (v != null) v match {
      case f: Float => buf.update(f)
      case d: Double => buf.update(d.toFloat)
      case l: Long => buf.update(l.toFloat)
      case i: Int => buf.update(i.toFloat)
      case other => buf.update(other.toString.toFloat)
    }
    buf
  }

  override def merge(a: KllFloatsSketch, b: KllFloatsSketch): KllFloatsSketch = {
    a.merge(b)
    a
  }

  override def eval(buf: KllFloatsSketch): Any = buf.toByteArray

  override def serialize(buf: KllFloatsSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllFloatsSketch =
    KllFloatsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** The DOUBLES twin of [[KllSketchAgg]] — same sketch family, same merge
  * algebra, 2x the summary size, NO input narrowing: a Long folds in as
  * an exact double (exact through 2^53), so quantile reads return exact
  * stream members for integer keys of any realistic id range. This is
  * the variant a pipeline quantiling raw ids/timestamps uses; the floats
  * sketch silently loses exactness above 2^24 (scaladoc above).
  */
case class KllDoublesSketchAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.kll.KllDoublesSketch]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  import org.apache.datasketches.kll.KllDoublesSketch

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case FloatType | DoubleType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric column, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_kll_doubles_sketch"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) v match {
      case d: Double => buf.update(d)
      case f: Float  => buf.update(f.toDouble)
      case l: Long   => buf.update(l.toDouble)
      case i: Int    => buf.update(i.toDouble)
      case other     => buf.update(other.toString.toDouble)
    }
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllDoublesSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KllDoublesSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KllDoublesSketchAgg =
    copy(child = newChild)
}

object KllSketch {
  import org.apache.spark.sql.{Column, GraftSqlInternal}
  import org.apache.datasketches.kll.KllDoublesSketch

  /** Column API: serialized KLL floats sketch of a numeric column. */
  def sketch(c: Column, k: Int = 200): Column =
    GraftSqlInternal.column(
      KllSketchAgg(GraftSqlInternal.expression(c), k).toAggregateExpression())

  /** Column API: serialized KLL DOUBLES sketch — exact value identity for
    * integer inputs through 2^53 (no float narrowing).
    */
  def doublesSketch(c: Column, k: Int = 200): Column =
    GraftSqlInternal.column(
      KllDoublesSketchAgg(GraftSqlInternal.expression(c), k)
        .toAggregateExpression())

  private def readDoubles(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Quantile estimate from a serialized DOUBLES sketch: an exact member
    * of the folded stream (KLL retains actual values).
    */
  def doublesQuantile(bytes: Array[Byte], q: Double): Double =
    readDoubles(bytes).getQuantile(q)

  /** Normalized rank of `value` in a serialized doubles sketch. */
  def doublesRank(bytes: Array[Byte], value: Double): Double =
    readDoubles(bytes).getRank(value)

  /** Stream length folded into a serialized doubles sketch (exact). */
  def doublesN(bytes: Array[Byte]): Long = readDoubles(bytes).getN

  /** Merge serialized doubles sketches (driver-side bounded fold). */
  def doublesMergeAll(sketches: Seq[Array[Byte]], k: Int = 200): Array[Byte] = {
    val acc = KllDoublesSketch.newHeapInstance(k)
    sketches.foreach(b => acc.merge(readDoubles(b)))
    acc.toByteArray
  }

  private def read(bytes: Array[Byte]): KllFloatsSketch =
    KllFloatsSketch.heapify(Memory.wrap(bytes))

  /** Quantile estimate at rank q in [0, 1] from a serialized sketch. */
  def quantile(bytes: Array[Byte], q: Double): Double =
    read(bytes).getQuantile(q).toDouble

  /** Normalized rank of `value` in a serialized sketch. */
  def rank(bytes: Array[Byte], value: Double): Double =
    read(bytes).getRank(value.toFloat)

  /** Stream length folded into a serialized sketch (exact). */
  def n(bytes: Array[Byte]): Long = read(bytes).getN

  /** Merge serialized sketches into one (driver-side fold of a bounded
    * per-group relation — the re-aggregation path a sketch store uses).
    */
  def mergeAll(sketches: Seq[Array[Byte]], k: Int = 200): Array[Byte] = {
    val acc = KllFloatsSketch.newHeapInstance(k)
    sketches.foreach(b => acc.merge(read(b)))
    acc.toByteArray
  }
}
