package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lake-maintenance operators: the MERGE/upsert shape that keeps slowly
  * changing reference tables current without a transaction log.
  */
object Lake {

  /** Small-file compaction: rewrite a parquet directory into
    * ~`ceil(totalBytes / targetFileBytes)` files. Streaming sinks and
    * frequent small appends fragment a lake table into thousands of tiny
    * files whose per-file open/footer cost dominates scans; periodic
    * compaction is the maintenance job every table format schedules.
    * Out-of-place (reads `inDir`, writes `outDir`) — atomic swap of the
    * live table is transaction-log territory (Delta/Iceberg), not this
    * op's job. Returns the target file count.
    *
    * The rewrite is one `coalesce` (no shuffle): at 100 TB the job is
    * bounded by reading each byte once and writing it once, and
    * partition-level parallelism is preserved up to the target count.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inDir)).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir).coalesce(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** MERGE-style upsert of a change batch into a base table, keyed on
    * `keyCol`: rows only in `changes` are inserts, rows in both take the
    * change row's non-null fields (per-field `coalesce` — the same partial-
    * update semantics as the reference's record Copy driver and
    * `RecordStore.update`), rows only in `base` pass through. The result
    * carries an `action` column (`insert`/`update`/`keep`) for audit.
    *
    * Plan shape: one full-outer hash join keyed on `keyCol` — each side is
    * shuffled once on the merge key, which is exactly the physical shape of
    * a Delta/Iceberg MERGE's join phase. No driver-side state; AQE splits
    * skewed keys. Copy-on-write of unmatched data comes free because the
    * result IS the new table.
    */
  def mergeUpsert(base: DataFrame, changes: DataFrame, keyCol: String): DataFrame = {
    val cols = base.columns.filterNot(_ == keyCol)
    val joined = base.as("b").join(changes.as("c"),
      col(s"b.$keyCol") === col(s"c.$keyCol"), "full_outer")
    joined.select(
      coalesce(col(s"c.$keyCol"), col(s"b.$keyCol")).as(keyCol) +:
        cols.map(n => coalesce(col(s"c.$n"), col(s"b.$n")).as(n)) :+
        when(col(s"b.$keyCol").isNull, lit("insert"))
          .when(col(s"c.$keyCol").isNull, lit("keep"))
          .otherwise(lit("update")).as("action"): _*)
  }

  /** SCD type-2 compaction: turn a change-event log into validity
    * intervals. Per `keyCol` entity, consecutive events with the same
    * `valueCol` collapse into one interval; each retained change is valid
    * from its own timestamp until the NEXT change's timestamp (`valid_to`
    * null = current). Ordering is made total by `tieCol` (a unique event
    * id), so interval boundaries are a pure function of the data.
    *
    * Two window passes over the same (key, ts, tie) ordering — change
    * detection via lag on the raw log, then lead over the surviving
    * change rows — both keyed shuffles on `keyCol`, which Spark plans as
    * ONE exchange reused across the two sorts. This is the dimension-
    * table history builder that runs after a MERGE ([[mergeUpsert]]) at
    * lake scale.
    */
  def scd2Intervals(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // Change detection must be null-safe on BOTH axes: `lag` of a null
    // value is indistinguishable from "no previous row", so first-ness is
    // tracked separately (row_number), and the value comparison uses <=>
    // so a genuine transition to/from NULL is a change while NULL -> NULL
    // is not.
    events
      .withColumn("_prev", lag(col(valueCol), 1).over(w))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 || not(col("_prev") <=> col(valueCol)))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(valueCol), col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }
}
