package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{GraphQueries, MixQueries, OracleQueries, QueryDef,
  Relational, SeriesQueries, SourceQueries, StreamingQueries, TextQueries,
  VectorQueries}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 expressed as
  * an idiomatic Spark plan; [[oracleSql]] carries the DuckDB-equivalent SQL
  * the driver uses as a correctness oracle on the same parquet tables.
  */
object SparkEntry {

  /** All registered query definitions, grouped by module. */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ VectorQueries.defs ++ TextQueries.defs ++
      MixQueries.defs ++ SeriesQueries.defs ++ SourceQueries.defs ++
      StreamingQueries.defs ++ GraphQueries.defs ++ OracleQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * findSimilar — the reference's canonical oracle (README.md:139-166).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("v02_find_similar")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
