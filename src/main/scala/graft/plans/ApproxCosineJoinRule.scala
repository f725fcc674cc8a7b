package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftSqlInternal, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity

/** Opt-in optimizer rule (SURVEY.md §4's north-star): rewrites an all-pairs
  * cosine-threshold join
  *
  *   SELECT ... FROM a CROSS JOIN b WHERE graft_cosine(a.v, b.v) >= t ...
  *
  * into a sign-LSH bucket join: both sides get a `planes`-bit Rademacher
  * sign signature, cut into `bands`; candidate pairs share at least one
  * (band, value) bucket and are then verified with the ORIGINAL predicate.
  * The n x m cartesian product never materializes — the join becomes a
  * hash join on bucket keys whose cost follows bucket occupancy.
  *
  * This is an approximation (a qualifying pair whose signatures disagree on
  * every band is lost), which is why it only fires when
  * `spark.graft.approxCosineRewrite=true`. Recall is tuned by
  * `spark.graft.approx.planes` / `spark.graft.approx.bands` (default 32/16:
  * 2-bit bands, recall-oriented). Verification keeps precision exact.
  *
  * Register per session via `ApproxCosineJoinRule.install(spark)`
  * (experimental.extraOptimizations).
  */
object ApproxCosineJoinRule extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.approxCosineRewrite"
  val PlanesKey = "spark.graft.approx.planes"
  val BandsKey = "spark.graft.approx.bands"

  /** Marker prefix for rewrite-internal columns; also the re-entry guard:
    * joins whose inputs already expose marker columns are our own output.
    */
  private val Marker = "__graft_"

  def install(spark: SparkSession): Unit = {
    GraftSqlInternal.addOptimization(spark, this)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    plan.transformUp {
      // Shape 1: filter directly above an unconditioned cross/inner join.
      case f @ Filter(cond, Join(l, r, Cross | Inner, None, _))
          if eligible(l, r, cond) =>
        rewrite(l, r, cond, f.output)
      // Shape 2: the optimizer has already folded the filter into the join
      // condition (PushPredicateThroughJoin).
      case j @ Join(l, r, Inner | Cross, Some(cond), _)
          if eligible(l, r, cond) =>
        rewrite(l, r, cond, j.output)
    }
  }

  private def eligible(l: LogicalPlan, r: LogicalPlan, cond: Expression): Boolean =
    !(l.output ++ r.output).exists(_.name.startsWith(Marker)) &&
      findCosineConjunct(l, r, cond).isDefined

  /** The first conjunct of shape `cosine(a, b) >= lit` (or its mirrored
    * forms) with one argument per join side.
    */
  private def findCosineConjunct(
      l: LogicalPlan, r: LogicalPlan,
      cond: Expression): Option[(Expression, Expression)] = {
    def sidesOk(a: Expression, b: Expression): Option[(Expression, Expression)] = {
      val (la, ra) = (l.outputSet, r.outputSet)
      if (a.references.subsetOf(la) && b.references.subsetOf(ra)) Some((a, b))
      else if (a.references.subsetOf(ra) && b.references.subsetOf(la)) Some((b, a))
      else None
    }
    splitConjuncts(cond).iterator.map {
      case GreaterThanOrEqual(CosineSimilarity(a, b), Literal(_, _)) => sidesOk(a, b)
      case GreaterThan(CosineSimilarity(a, b), Literal(_, _))        => sidesOk(a, b)
      case LessThanOrEqual(Literal(_, _), CosineSimilarity(a, b))    => sidesOk(a, b)
      case LessThan(Literal(_, _), CosineSimilarity(a, b))           => sidesOk(a, b)
      case _ => None
    }.collectFirst { case Some(ab) => ab }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  /** `planes`-bit Rademacher sign signature of a vector expression: plane p
    * weights element i by ±1 from xxhash64(p, i) — needs no knowledge of
    * the vector dimensionality at plan time.
    */
  private def signature(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val weighted = transform(
        sequence(lit(0), size(vec) - 1),
        i => element_at(vec, i + 1).cast("double") *
          when(pmod(xxhash64(lit(p), i), lit(2)) === 0, 1.0d).otherwise(-1.0d))
      val s = org.apache.spark.sql.functions.aggregate(
        weighted, lit(0.0d), (acc, x) => acc + x)
      when(s > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  private def rewrite(
      l: LogicalPlan, r: LogicalPlan, cond: Expression,
      originalOutput: Seq[Attribute]): LogicalPlan = {
    val spark = SparkSession.active
    val planes = conf.getConfString(PlanesKey, "32").toInt
    val bands = conf.getConfString(BandsKey, "16").toInt
    val segBits = planes / bands
    val Some((aExpr, bExpr)) = findCosineConjunct(l, r, cond)

    def bucketed(side: LogicalPlan, vecExpr: Expression, tag: String): DataFrame = {
      val df = GraftSqlInternal.dataFrame(spark, side)
      val vec = GraftSqlInternal.column(vecExpr)
      df.withColumn(s"${Marker}id_$tag", monotonically_increasing_id())
        .withColumn(s"${Marker}sig", signature(vec, planes))
        .select(col("*"), posexplode(array((0 until bands).map(s =>
          shiftright(col(s"${Marker}sig"), s * segBits)
            .bitwiseAND((1L << segBits) - 1)): _*))
          .as(Seq(s"${Marker}seg", s"${Marker}segval_$tag")))
        .drop(s"${Marker}sig")
        .withColumnRenamed(s"${Marker}seg", s"${Marker}seg_$tag")
    }

    val lb = bucketed(l, aExpr, "l")
    val rb = bucketed(r, bExpr, "r")
    // Pair-level dedup via row_number, not dropDuplicates: this plan is
    // spliced in AFTER the main optimizer batches, so nodes that rely on
    // main-batch lowering (Deduplicate -> Aggregate) would reach the
    // planner unreplaced. Window nodes plan directly.
    val pairW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"${Marker}id_l"), col(s"${Marker}id_r"))
      .orderBy(col(s"${Marker}seg_l"))
    val candidates = lb.join(rb,
      col(s"${Marker}seg_l") === col(s"${Marker}seg_r") &&
        col(s"${Marker}segval_l") === col(s"${Marker}segval_r"))
      .withColumn(s"${Marker}rn", row_number().over(pairW))
      .filter(col(s"${Marker}rn") === 1)
    val verified = candidates.filter(GraftSqlInternal.column(cond))
    val result = verified.select(
      originalOutput.map(a => GraftSqlInternal.column(a)): _*)
    GraftSqlInternal.analyzedPlan(result)
  }
}
