package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers: schema-explicit readers (no inference jobs at
  * scale) and layout-aware writers.
  *
  * The reference's only storage format is one protobuf file per record
  * (node/storage/saver.go:12-20); here the lake formats are parquet
  * (primary), csv and json (interchange), with partitioned and bucketed
  * layouts as the scale tools: partition columns prune whole directories
  * at the scan, bucketed tables join shuffle-free (see ScaleSpec).
  */
object TableIO {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema-explicit CSV read — header-checked, quoted, no inference pass. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)

  /** Schema-explicit JSON-lines read. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Hive-style partitioned parquet: one directory per distinct value
    * combination; filters on the partition columns prune at the file
    * listing, before any row is read.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed managed table: co-locates join keys so repeated joins on
    * `bucketCol` plan with zero exchanges.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCol: String): Unit = {
    val spark = df.sparkSession
    // Idempotent across sessions: a previous JVM may have left the managed
    // table's directory behind without this session's catalog knowing the
    // table — saveAsTable then fails with LOCATION_ALREADY_EXISTS even in
    // Overwrite mode. Drop the catalog entry AND clear a leftover location.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // Pre-partition on the bucket column into EXACTLY `buckets` tasks:
    // Spark's bucket id is murmur3(col) pmod buckets — the same function
    // HashPartitioning applies — so task i holds exactly bucket i and the
    // table lands as ONE file per bucket. Without this, every upstream
    // task writes a sliver into every bucket (tasks x buckets files): the
    // commit then costs more than the data, and the bucketed read lists
    // and merges the fragments per bucket on every query. The explicit
    // count is exempt from AQE coalescing; at cluster scale `buckets`
    // itself is sized to the fleet, so the write stays wide.
    df.repartition(buckets, df.col(bucketCol))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
  }
}
