package graft.oracle

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamedParameter, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan, UnresolvedWith}
import org.json4s._

import graft.model.SumRecord
import graft.store.RecordStore

/** Dynamic, user-submitted oracles as SQL text — the Spark-native
  * counterpart of the reference's compile-at-CreateOracle JavaScript path
  * (node/service/compiler.go:19-75): the text is COMPILED (parsed +
  * analyzed) when the oracle is created and rejected with the compiler's
  * message when it does not compile (node/service/oracles_test.go:14-23
  * submits `lulz i won't compile =)` and expects the create to fail), not
  * when it first runs.
  *
  * Mirrors of the reference's `validate` (compiler.go:20-52):
  *
  *  - The JS path requires a function declaration and reads the call
  *    signature from its parameter list; here the text must be a QUERY
  *    (not a command — the SQL analogue of "expected a function
  *    declaration") and the parameter list is read from the `:name`
  *    parameter markers in the text, in discovery order.
  *  - At [[OracleRegistry.run]] time, JSON args bind positionally to those
  *    parameters (missing args arrive as null), the store's live dataset
  *    is exposed as the `records` view, and the result is the query
  *    output as JSON rows.
  *
  * Compilation analyzes against an EMPTY relation with the store's schema
  * and all parameters bound to null — schema/function/column errors reject
  * at create time, with no catalog mutation and no data touched, exactly
  * the "compile, don't run" split of the reference.
  */
object SqlOracle {

  /** The table name an oracle's SQL sees: the store's records. */
  val ViewName = "records"

  /** Compile `sqlText` into a registrable [[Oracle]], or the compile
    * error. The returned oracle's params are the `:name` markers of the
    * text in discovery order; its body re-binds the `records` view to the
    * store it is run against.
    */
  def compile(spark: SparkSession, name: String, sqlText: String): Either[String, Oracle] = {
    val parsed =
      try Right(spark.sessionState.sqlParser.parsePlan(sqlText))
      catch { case e: Exception => Left(compileMsg(e)) }
    parsed.flatMap { plan =>
      if (plan.isInstanceOf[Command])
        Left("expected a query") // errNoDeclarations analogue (compiler.go:16)
      else {
        val params = paramNames(plan)
        sandboxCheck(plan).flatMap(_ => analyzeCheck(spark, plan)).map { _ =>
          Oracle(
            id = 0,
            name = name,
            params = params,
            body = (ctx, store, args) => runSql(ctx, store, sqlText, params, args),
            merger = None,
            code = Some(sqlText))
        }
      }
    }
  }

  /** Functions an oracle may not call: arbitrary-reflection escapes that
    * would let oracle text reach outside the engine. The reference's JS
    * oracles had the run of otto's sandbox; the SQL surface gets the same
    * spirit with a harder edge — compile-time rejection.
    */
  private val DeniedFunctions = Set("reflect", "java_method")

  /** Defense-in-depth for user-submitted oracle text: the only readable
    * relation is the `records` view (plus names the query itself defines
    * via CTEs) — so `parquet.`/some/path`` style direct-file reads and
    * catalog tables are rejected at create — and reflection functions are
    * denied. Violations report as compile errors, matching the
    * reference's compile-then-store contract.
    */
  private def sandboxCheck(plan: LogicalPlan): Either[String, Unit] = {
    val cteNames = mutable.Set.empty[String]
    plan.transformWithSubqueries {
      case w: UnresolvedWith =>
        w.cteRelations.foreach(r => cteNames += r._1.toLowerCase); w
    }
    var bad: Option[String] = None
    plan.transformWithSubqueries {
      case r: UnresolvedRelation =>
        val ident = r.multipartIdentifier.map(_.toLowerCase)
        if (ident != Seq(ViewName) &&
            !(ident.lengthCompare(1) == 0 && cteNames.contains(ident.head)) &&
            bad.isEmpty)
          bad = Some("compile error: oracle SQL may only read the " +
            s"'$ViewName' view, not ${r.multipartIdentifier.mkString(".")}")
        r
    }
    plan.transformAllExpressionsWithSubqueries {
      case f: UnresolvedFunction
          if DeniedFunctions.contains(f.nameParts.last.toLowerCase) =>
        if (bad.isEmpty)
          bad = Some("compile error: function '" +
            f.nameParts.mkString(".") + "' is not allowed in oracle SQL")
        f
    }
    bad.toLeft(())
  }

  /** `:name` parameter markers in discovery order — the oracle's
    * positional call signature, as the reference reads the JS function's
    * parameter list (compiler.go:41-48).
    */
  private def paramNames(plan: LogicalPlan): Seq[String] = {
    val seen = mutable.LinkedHashSet.empty[String]
    plan.transformAllExpressionsWithSubqueries {
      case p: NamedParameter => seen += p.name; p
    }
    seen.toSeq
  }

  /** Eager analysis of `plan` with `records` bound to an empty relation of
    * the store schema and every parameter bound to null: resolves columns,
    * functions, and types without touching a store or the session catalog.
    */
  private def analyzeCheck(spark: SparkSession, plan: LogicalPlan): Either[String, Unit] = {
    import spark.implicits._
    val empty = spark.emptyDataset[SumRecord].queryExecution.logical
    val bound = plan.transformAllExpressionsWithSubqueries {
      case _: NamedParameter => Literal(null)
    }
    val rewired = bound.transformWithSubqueries {
      case r: UnresolvedRelation
        if r.multipartIdentifier.map(_.toLowerCase) == Seq(ViewName) => empty
    }
    try { spark.sessionState.executePlan(rewired).assertAnalyzed(); Right(()) }
    catch { case e: Exception => Left(compileMsg(e)) }
  }

  private def compileMsg(e: Exception): String = {
    val m = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
    s"compile error: ${m.linesIterator.take(4).mkString(" ").trim}"
  }

  /** The run body: expose the store as the `records` view, bind args by
    * the compiled parameter order, execute, and return rows as JSON
    * objects keyed by column name.
    *
    * Result size is capped ([[maxResultRows]]): the JSON marshal is a
    * driver materialization, so a SELECT-star oracle over a big store
    * would otherwise OOM the driver — the reference shares the flaw
    * (node/service/compiled.go:89-97 marshals the full result), but a
    * loud error beats a dead driver. The cap is conf-tunable and the
    * error tells the caller the fix (LIMIT / aggregate).
    */
  private def runSql(ctx: OracleContext, store: RecordStore, sqlText: String,
      params: Seq[String], args: Seq[JValue]): JValue = {
    val spark = store.spark
    store.records.createOrReplaceTempView(ViewName)
    val argMap = params.zip(
      params.indices.map(i => toArg(args.lift(i).getOrElse(JNull)))).toMap
    val rows = spark.sql(sqlText, argMap)
    val schema = rows.schema
    val cap = maxResultRows(spark)
    val collected = rows.limit(
      math.min(cap + 1L, Int.MaxValue.toLong).toInt).collect()
    if (collected.length > cap)
      throw OracleRunError(s"oracle result exceeds $cap rows; add a LIMIT " +
        "or aggregate, or raise " + MaxResultRowsKey)
    JArray(collected.toList.map { row =>
      JObject(schema.fields.toList.zipWithIndex.map { case (f, i) =>
        f.name -> toJson(row.get(i))
      })
    })
  }

  /** Conf key for the oracle result-row cap (default 100000). */
  val MaxResultRowsKey = "graft.oracle.maxResultRows"

  private def maxResultRows(spark: SparkSession): Int =
    spark.conf.get(MaxResultRowsKey, "100000").toInt

  /** JSON arg -> a literal-able Spark arg value. Objects are rejected the
    * way the reference rejects undecodable args (compiled.go:62-66).
    */
  private def toArg(v: JValue): Any = v match {
    case JNull | JNothing => null
    case JBool(b) => b
    case JInt(i) => i.longValue
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.doubleValue
    case JString(s) => s
    case JArray(xs) => xs.map(toArg)
    case other => throw OracleRunError(
      s"could not unmarshal value '${org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(other))}': unsupported argument type")
  }

  /** Spark row value -> JValue (recursive over arrays/maps/structs). */
  private def toJson(v: Any): JValue = v match {
    case null => JNull
    case b: Boolean => JBool(b)
    case b: Byte => JInt(b.toInt)
    case s: Short => JInt(s.toInt)
    case i: Int => JInt(i)
    case l: Long => JInt(l)
    case f: Float => JDouble(f.toDouble)
    case d: Double => JDouble(d)
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case d: BigDecimal => JDecimal(d)
    case s: String => JString(s)
    case b: Array[Byte] => JString(java.util.Base64.getEncoder.encodeToString(b))
    case seq: scala.collection.Seq[_] => JArray(seq.toList.map(toJson))
    case arr: Array[_] => JArray(arr.toList.map(toJson))
    case m: scala.collection.Map[_, _] =>
      JObject(m.toList.map { case (k, x) => String.valueOf(k) -> toJson(x) })
    case r: org.apache.spark.sql.Row =>
      JObject(r.schema.fields.toList.zipWithIndex.map { case (f, i) =>
        f.name -> toJson(r.get(i))
      })
    case other => JString(String.valueOf(other))
  }
}
