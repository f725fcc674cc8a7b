package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One named query: a Spark implementation plus (when SQL-expressible) the
  * equivalent DuckDB SQL the driver uses as a correctness oracle. Column
  * names and row ordering must match between the two.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Lazy accessors for the driver-generated parquet tables of one scale
  * factor. Plain `spark.read.parquet` — filters/projections in the queries
  * reach the scan via Catalyst pushdown, so no caching is forced here.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // One analyzed DataFrame per (session, path): `spark.read.parquet`
  // re-lists the directory and re-reads footers for schema on every
  // call, which across a 50+-query suite adds up to seconds. The logical
  // plan is immutable, so reusing it across queries is free. The outer
  // map is weak-keyed on the session itself: stopped sessions (and the
  // DataFrames pinning them) become collectable instead of accumulating,
  // and identity keying cannot collide the way a hash-derived string
  // key could.
  private def t(name: String): DataFrame = {
    // synchronizedMap guards computeIfAbsent under its own mutex.
    val perSession = Tables.plans.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    perSession.computeIfAbsent(s"$dir/$name",
      _ => spark.read.parquet(s"$dir/$name.parquet"))
  }

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** The events table carries nanosecond timestamps, which Spark's parquet
    * reader rejects by default; `nanosAsLong` reads `ts` as a LongType of
    * epoch nanos. All event-time arithmetic downstream is exact integer math
    * on nanos (matching DuckDB's `epoch_ns`).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events")
  }
}

object Tables {
  private val plans = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())
}
