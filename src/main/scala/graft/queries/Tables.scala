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

  /** The events table exposes `ts` as a LongType of epoch NANOS whatever
    * the parquet physically stores — all event-time arithmetic downstream
    * is exact integer math on nanos (matching the oracles' DuckDB
    * `epoch_ns`, which likewise normalizes any timestamp unit):
    *
    *  - `timestamp[ns]` data (rounds 1-4): Spark rejects nano precision
    *    by default; `nanosAsLong` reads the raw column as epoch nanos.
    *  - `timestamp[us]`/`[ms]` data (round 5+): read as a session-tz
    *    TIMESTAMP (UTC; NTZ inference is disabled in every session
    *    factory here) and converted via `unix_micros * 1000` — exact, no
    *    precision exists below micros to lose. The conversion is a
    *    map-side projection, so raw-`ts` range filters no longer reach
    *    the parquet scan as native pushdown; the events queries bucket /
    *    window over the full table rather than range-scan it, and a
    *    deployment that needs pushdown would partition the lake by time
    *    (io03's layout) rather than lean on row-group stats.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    }
  }
}

object Tables {
  private val plans = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())
}
