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
  * Sizing law (the signBucketJoinWide rule, SCALING.md): bits per band
  * (= planes/bands) must track log2(side rows), or buckets saturate and
  * the candidate join degenerates toward the cross join it replaced —
  * with 2-bit bands every band has 4 buckets, so past a few hundred rows
  * per side callers MUST raise planes (e.g. 64/4 = 16-bit bands for
  * 10^4-10^5 rows). Identical vectors collide in every band at any
  * setting, so exact-duplicate recall is always 1; near-pair recall at
  * fixed bits is bought with bands.
  *
  * Register per session via `ApproxCosineJoinRule.install(spark)`
  * (experimental.extraOptimizations).
  */
object ApproxCosineJoinRule extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.approxCosineRewrite"
  val PlanesKey = "spark.graft.approx.planes"
  val BandsKey = "spark.graft.approx.bands"
  val DimsKey = "spark.graft.approx.dims"

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

  /** Per-band sign signatures via the fused [[SignBandSignatures]]
    * expression (one codegen call per row, the plane tensor rides as a
    * single reference object). The first draft composed the signature
    * from `planes` HOF aggregate trees — exactly the codegen-overflow
    * disease SignBandSignatures exists to fix (its scaladoc has the
    * 2000x measurement). Hyperplanes need the vector width at plan time;
    * `spark.graft.approx.dims` supplies it (default 64) and extra plane
    * components are harmlessly ignored on shorter vectors.
    */
  private def signatures(vec: Column, planes: Int, bands: Int, dims: Int): Column = {
    val segBits = planes / bands
    val tensor = Array.tabulate(bands)(b =>
      graft.ops.Similarity.hyperplanes(segBits, dims, 42L + b))
    GraftSqlInternal.column(graft.functions.SignBandSignatures(
      GraftSqlInternal.expression(vec), tensor))
  }

  private def rewrite(
      l: LogicalPlan, r: LogicalPlan, cond: Expression,
      originalOutput: Seq[Attribute]): LogicalPlan = {
    val spark = SparkSession.active
    val planes = conf.getConfString(PlanesKey, "32").toInt
    val bands = conf.getConfString(BandsKey, "16").toInt
    val dims = conf.getConfString(DimsKey, "64").toInt
    val Some((aExpr, bExpr)) = findCosineConjunct(l, r, cond)

    def bucketed(side: LogicalPlan, vecExpr: Expression, tag: String): DataFrame = {
      val df = GraftSqlInternal.dataFrame(spark, side)
      val vec = GraftSqlInternal.column(vecExpr)
      df.withColumn(s"${Marker}id_$tag", monotonically_increasing_id())
        .select(col("*"),
          posexplode(signatures(vec, planes, bands, dims))
            .as(Seq(s"${Marker}seg_$tag", s"${Marker}segval_$tag")))
    }

    val lb = bucketed(l, aExpr, "l")
    val rb = bucketed(r, bExpr, "r")
    // Verify with the ORIGINAL predicate directly on the bucket join's
    // output, BEFORE the pair-level dedup: the exact cosine is map-side
    // arithmetic fused into the join's output, while the dedup is a
    // shuffle whose rows carry both embedding vectors — so false
    // candidates (the bulk, when bands under-select) must die before the
    // exchange, not after. cond is deterministic, so filtering per
    // colliding band and then deduping pairs equals dedup-then-filter.
    val verified = lb.join(rb,
      col(s"${Marker}seg_l") === col(s"${Marker}seg_r") &&
        col(s"${Marker}segval_l") === col(s"${Marker}segval_r"))
      .filter(GraftSqlInternal.column(cond))
    // Pair-level dedup via row_number, not dropDuplicates: this plan is
    // spliced in AFTER the main optimizer batches, so nodes that rely on
    // main-batch lowering (Deduplicate -> Aggregate) would reach the
    // planner unreplaced. Window nodes plan directly.
    val pairW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"${Marker}id_l"), col(s"${Marker}id_r"))
      .orderBy(col(s"${Marker}seg_l"))
    val deduped = verified
      .withColumn(s"${Marker}rn", row_number().over(pairW))
      .filter(col(s"${Marker}rn") === 1)
    val result = deduped.select(
      originalOutput.map(a => GraftSqlInternal.column(a)): _*)
    GraftSqlInternal.analyzedPlan(result)
  }
}
