package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlInternal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/** As-of join as a first-class operator: logical node + planner strategy +
  * physical merge-join, registered per-session via
  * `experimental.extraStrategies`.
  *
  * Semantics: for every left ("probe") row, attach within the same `by`
  * group
  *  - `Backward` (default): the right row with the greatest
  *    `rightOn <= leftOn` (DuckDB `ASOF LEFT JOIN` semantics);
  *  - `Forward`: the right row with the smallest `rightOn >= leftOn`;
  *  - `Nearest`: whichever of those two candidates has the smaller
  *    `|rightOn - leftOn|`, ties to the backward side (pandas
  *    `merge_asof(direction='nearest')` semantics). Requires an integral
  *    on-column — distance needs subtraction, unlike the pure
  *    order-comparisons of the directional modes.
  * An optional `tolerance` (in the on-column's own integral units) bounds
  * the match distance: backward requires `leftOn - rightOn <= tolerance`,
  * forward `rightOn - leftOn <= tolerance`, nearest
  * `|rightOn - leftOn| <= tolerance`. Left rows without a match get
  * nulls (left-outer as-of).
  *
  * Physical execution is a single forward merge pass: both sides are
  * hash-clustered on the `by` keys and sorted by (by, on) — distributions
  * and orderings Catalyst's EnsureRequirements inserts for us — then each
  * co-partition pair is merged with one buffered pointer per side. Cost is
  * O(left + right) per partition with zero additional memory beyond one
  * buffered right row; this is the plan shape that survives 100 TB, unlike
  * a windowed union (which shuffles both sides into one sort) or a range
  * join.
  *
  * The window-based composition (`Relational.q15_asof_join`) and the
  * DuckDB ASOF JOIN oracle both serve as correctness references in tests.
  */
sealed trait AsOfDirection
object AsOfDirection {
  case object Backward extends AsOfDirection
  case object Forward extends AsOfDirection
  case object Nearest extends AsOfDirection
}

final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    leftOn: Expression,
    rightOn: Expression,
    direction: AsOfDirection = AsOfDirection.Backward,
    tolerance: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lb, rb, lo, ro, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lb, rb, lo, ro, dir, tol) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    leftOn: Expression,
    rightOn: Expression,
    direction: AsOfDirection,
    tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Co-partition both sides on the by-keys with a fixed partition count so
  // runtime coalescing cannot leave the two shuffles with different
  // partitioning (zipPartitions requires exact alignment).
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    Seq(ClusteredDistribution(leftBy, requiredNumPartitions = n),
      ClusteredDistribution(rightBy, requiredNumPartitions = n))
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ leftOn).map(SortOrder(_, Ascending)),
    (rightBy :+ rightOn).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftBy :+ leftOn).map(SortOrder(_, Ascending))

  /** Integral reader of the on-value for tolerance arithmetic. Tolerance
    * is only supported for types whose distance is well-defined in the
    * type's own units (the planner rejects others up front).
    */
  private def onAsLong(dt: DataType): InternalRow => Long = dt match {
    case LongType | TimestampType | TimestampNTZType => _.getLong(0)
    case IntegerType | DateType => r => r.getInt(0).toLong
    case other =>
      throw new IllegalArgumentException(
        "as-of tolerance and the Nearest direction require an integral " +
          s"on-column; got ${other.catalogString}")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val byTypes = leftBy.map(_.dataType)
    val onType = leftOn.dataType
    val leftOutput = left.output
    val rightOutput = right.output
    val lB = leftBy
    val rB = rightBy
    val lO = leftOn
    val rO = rightOn
    val dir = direction
    val tol = tolerance
    // Nearest needs the on-value as a number (distance = subtraction),
    // tolerance likewise; fail fast on unsupported types before tasks run.
    val needOn = tol.isDefined || dir == AsOfDirection.Nearest
    if (needOn) onAsLong(onType)
    val readOn = if (needOn) onAsLong(onType) else null

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lByProj = UnsafeProjection.create(lB, leftOutput)
      val rByProj = UnsafeProjection.create(rB, rightOutput)
      val lOnProj = UnsafeProjection.create(Seq(lO), leftOutput)
      val rOnProj = UnsafeProjection.create(Seq(rO), rightOutput)
      val byOrd = RowOrdering.createNaturalAscendingOrdering(byTypes)
      val onOrd = RowOrdering.createNaturalAscendingOrdering(Seq(onType))
      val nullRight = new GenericInternalRow(rightOutput.size)
      val joined = new JoinedRow
      // Emit UnsafeRows: parent operators (and direct collect) require the
      // binary format, and JoinedRow is only a view. The INPUT schema's
      // right side must be nullability-widened: BindReferences takes
      // nullability from the input attribute, and binding the original
      // non-nullable right attributes would skip the null check and turn
      // unmatched rows into zeros.
      val resultProj = UnsafeProjection.create(output,
        leftOutput ++ rightOutput.map(_.withNullability(true)))

      def withinTol(lOnKey: InternalRow, rOnKey: InternalRow): Boolean =
        tol.isEmpty || {
          val l = readOn(lOnKey)
          val r = readOn(rOnKey)
          dir match {
            case AsOfDirection.Backward => l - r <= tol.get
            case AsOfDirection.Forward  => r - l <= tol.get
            case AsOfDirection.Nearest => throw new IllegalStateException(
              "Nearest applies tolerance inline via its distance limit")
          }
        }

      val rBuf = rIter.buffered
      dir match {
        case AsOfDirection.Backward =>
          new Iterator[InternalRow] {
            // Copy of the most recent right row with (by, on) <= current left.
            private var matchRow: InternalRow = _
            private var matchBy: UnsafeRow = _
            private var matchOn: UnsafeRow = _

            override def hasNext: Boolean = lIter.hasNext

            override def next(): InternalRow = {
              val l = lIter.next()
              val lByKey = lByProj(l)
              val lOnKey = lOnProj(l)
              var scanning = true
              while (scanning && rBuf.hasNext) {
                val r = rBuf.head
                val cmpBy = byOrd.compare(rByProj(r), lByKey)
                if (cmpBy < 0) {
                  // Right key sorts before every remaining left key: discard.
                  rBuf.next()
                } else if (cmpBy == 0 && onOrd.compare(rOnProj(r), lOnKey) <= 0) {
                  matchRow = r.copy()
                  matchBy = rByProj(r).copy()
                  matchOn = rOnProj(r).copy()
                  rBuf.next()
                } else {
                  scanning = false
                }
              }
              val m =
                if (matchRow != null && byOrd.compare(matchBy, lByKey) == 0 &&
                    withinTol(lOnKey, matchOn)) matchRow
                else nullRight
              resultProj(joined(l, m))
            }
          }

        case AsOfDirection.Forward =>
          new Iterator[InternalRow] {
            override def hasNext: Boolean = lIter.hasNext

            override def next(): InternalRow = {
              val l = lIter.next()
              val lByKey = lByProj(l)
              val lOnKey = lOnProj(l)
              // Discard rights that sort strictly before (by, on): they can
              // never match this left row nor any later one (left is sorted
              // ascending too). The head is then the candidate match and is
              // deliberately NOT consumed — it may also be the first
              // at-or-after row for subsequent left rows.
              var scanning = true
              while (scanning && rBuf.hasNext) {
                val r = rBuf.head
                val cmpBy = byOrd.compare(rByProj(r), lByKey)
                if (cmpBy < 0 ||
                    (cmpBy == 0 && onOrd.compare(rOnProj(r), lOnKey) < 0)) {
                  rBuf.next()
                } else {
                  scanning = false
                }
              }
              val m =
                if (rBuf.hasNext && {
                    val r = rBuf.head
                    byOrd.compare(rByProj(r), lByKey) == 0 &&
                      withinTol(lOnKey, rOnProj(r))
                  }) rBuf.head
                else nullRight
              resultProj(joined(l, m))
            }
          }

        case AsOfDirection.Nearest =>
          // Backward's scan leaves the last at-or-before row copied aside
          // and the first strictly-after row as the (unconsumed) buffer
          // head — exactly the two nearest candidates. Pick the closer by
          // integral distance, ties to backward; the same single forward
          // merge pass, still O(left + right) with one buffered row.
          new Iterator[InternalRow] {
            private var matchRow: InternalRow = _
            private var matchBy: UnsafeRow = _
            private var matchOn: UnsafeRow = _

            override def hasNext: Boolean = lIter.hasNext

            override def next(): InternalRow = {
              val l = lIter.next()
              val lByKey = lByProj(l)
              val lOnKey = lOnProj(l)
              var scanning = true
              while (scanning && rBuf.hasNext) {
                val r = rBuf.head
                val cmpBy = byOrd.compare(rByProj(r), lByKey)
                if (cmpBy < 0) {
                  rBuf.next()
                } else if (cmpBy == 0 && onOrd.compare(rOnProj(r), lOnKey) <= 0) {
                  // A null on-value sorts first and would read as 0 in the
                  // distance math (out-competing real candidates), so it
                  // is consumed but never a candidate — distance to an
                  // unknown time is undefined.
                  if (!rOnProj(r).isNullAt(0)) {
                    matchRow = r.copy()
                    matchBy = rByProj(r).copy()
                    matchOn = rOnProj(r).copy()
                  }
                  rBuf.next()
                } else {
                  scanning = false
                }
              }
              // A left row with a null on-value has no defined distance to
              // either side: left-outer nulls, like the directional modes'
              // tolerance math would effectively produce.
              if (lOnKey.isNullAt(0)) {
                resultProj(joined(l, nullRight))
              } else {
                val lv = readOn(lOnKey)
                val dBack =
                  if (matchRow != null && byOrd.compare(matchBy, lByKey) == 0)
                    lv - readOn(matchOn)
                  else Long.MaxValue
                val dFwd =
                  if (rBuf.hasNext && {
                      val r = rBuf.head
                      byOrd.compare(rByProj(r), lByKey) == 0 &&
                        !rOnProj(r).isNullAt(0)
                    })
                    readOn(rOnProj(rBuf.head)) - lv
                  else Long.MaxValue
                val limit = tol.getOrElse(Long.MaxValue - 1)
                val m =
                  if (dBack <= dFwd && dBack <= limit) matchRow
                  else if (dFwd < dBack && dFwd <= limit) rBuf.head
                  else nullRight
                resultProj(joined(l, m))
              }
            }
          }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOf.join(trades, quotes, by = "user_id", on = "ts")`.
  * Right-side columns should be pre-renamed to avoid duplicate names in
  * the joined output.
  */
object AsOf {
  def join(
      left: DataFrame, right: DataFrame,
      leftBy: String, rightBy: String,
      leftOn: String, rightOn: String,
      direction: AsOfDirection = AsOfDirection.Backward,
      tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    GraftSqlInternal.addStrategy(spark, AsOfJoinStrategy)
    val lPlan = GraftSqlInternal.analyzedPlan(left)
    val rPlan = GraftSqlInternal.analyzedPlan(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    GraftSqlInternal.dataFrame(spark,
      AsOfJoinPlan(lPlan, rPlan,
        Seq(attr(lPlan, leftBy)), Seq(attr(rPlan, rightBy)),
        attr(lPlan, leftOn), attr(rPlan, rightOn), direction, tolerance))
  }

  def join(left: DataFrame, right: DataFrame, by: String, on: String): DataFrame =
    join(left, right, by, by, on, on)
}
