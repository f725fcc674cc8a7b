package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory: the confs every graft deployment wants,
  * plus SQL registration of the vector functions and (optionally) the
  * approximate-join rule and as-of strategy.
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 0): SparkSession.Builder = {
    val parts =
      if (shufflePartitions > 0) shufflePartitions
      else Runtime.getRuntime.availableProcessors()
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Runtime bloom-filter pushdown: selective join sides prune the
      // probe-side scan at row-group granularity — free at 100 TB.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Parquet `timestamp[us]` columns written without isAdjustedToUTC
      // (pyarrow's default) must read as session-tz TIMESTAMP, not
      // TIMESTAMP_NTZ: with the UTC session timezone above the two carry
      // identical instants, but NTZ forbids the epoch arithmetic
      // (`ts.cast(long)`, `ts div 1h`) the time-series operators are
      // built on — and DuckDB's naive-timestamp epoch math agrees with
      // the UTC reading, so the oracle contract needs it too.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  /** Create (or reuse) a session with graft functions registered and the
    * custom operators installed.
    */
  def create(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    graft.functions.vector.registerSql(spark)
    org.apache.spark.sql.GraftSqlInternal.addStrategy(
      spark, graft.plans.AsOfJoinStrategy)
    graft.plans.ApproxCosineJoinRule.install(spark)
    spark
  }
}
