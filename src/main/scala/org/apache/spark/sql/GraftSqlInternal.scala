package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression conversions.
  *
  * Spark 4 unified the public `Column` API around `ColumnNode`s (classic +
  * connect); building a `Column` from a raw Catalyst `Expression` — which any
  * library that ships custom expressions needs — moved behind
  * `org.apache.spark.sql.classic.ExpressionUtils`. This tiny shim lives in the
  * `org.apache.spark.sql` package purely to re-export those two conversions
  * and the temp-function registry to graft code. No Spark behavior is changed.
  */
object GraftSqlInternal {
  /** Wrap a Catalyst expression as a user-facing Column (classic sessions). */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column (classic sessions). */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register `name` as a SQL-callable function in this session. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** The analyzed logical plan behind a DataFrame. */
  def analyzedPlan(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a logical plan as a DataFrame (classic sessions). */
  def dataFrame(
      spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planner strategy to this session. */
  def addStrategy(spark: SparkSession, s: execution.SparkStrategy): Unit = {
    val e = spark.asInstanceOf[classic.SparkSession].experimental
    if (!e.extraStrategies.contains(s)) e.extraStrategies = e.extraStrategies :+ s
  }

  /** Idempotently add an optimizer rule to this session. */
  def addOptimization(
      spark: SparkSession,
      r: catalyst.rules.Rule[catalyst.plans.logical.LogicalPlan]): Unit = {
    val e = spark.asInstanceOf[classic.SparkSession].experimental
    if (!e.extraOptimizations.contains(r)) {
      e.extraOptimizations = e.extraOptimizations :+ r
    }
  }

  /** Apply an extensions installer's FUNCTION injections to a live
    * session's registry — lets tests drive the `spark.sql.extensions`
    * path without booting a second SparkContext.
    */
  def applyFunctionExtensions(
      spark: SparkSession,
      installer: SparkSessionExtensions => Unit): Unit = {
    val e = new SparkSessionExtensions
    installer(e)
    e.registerFunctions(
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry)
  }

  /** Names of session-registered functions (temp + builtin). */
  def functionNames(spark: SparkSession): Seq[String] =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .listFunction().map(_.funcName)
}
