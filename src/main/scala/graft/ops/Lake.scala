package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // Resolve the filesystem FROM the path: inDir may live on a
    // non-default FS (s3a:// vs local), where FileSystem.get(conf) throws
    // "Wrong FS" despite the read/write path working fine.
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val fs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(inPath).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir).coalesce(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Minimal versioned-table layout — the poor-man's transaction log:
    * each write lands a COMPLETE snapshot under `<table>/v=<n>` with
    * monotonically increasing n, committed by an atomic rename from a
    * scratch directory so readers never observe a partial version. On
    * this layout sit the three maintenance verbs every table format
    * grew: time travel ([[readVersion]]), changefeed ([[snapshotDiff]]
    * over two versions), and retention ([[vacuum]]). Full-snapshot
    * versions trade write amplification for zero log-replay machinery —
    * the right trade for dimension-sized tables; fact tables want a real
    * format (Delta/Iceberg), whose semantics these verbs mirror.
    */
  def versions(spark: SparkSession, tableDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
      .sorted
  }

  /** Write `df` as the next version; returns the version number. The
    * snapshot is written to a scratch sibling and renamed into place —
    * rename is atomic on HDFS-like stores, so a concurrent reader sees
    * either the old latest or the new one, never a torn directory.
    */
  def writeVersion(df: DataFrame, tableDir: String): Long = {
    val spark = df.sparkSession
    val next = versions(spark, tableDir).lastOption.getOrElse(0L) + 1L
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scratch = new org.apache.hadoop.fs.Path(p, s".tmp_v$next")
    df.write.mode("overwrite").parquet(scratch.toString)
    val target = new org.apache.hadoop.fs.Path(p, s"v=$next")
    if (!fs.rename(scratch, target))
      throw new java.io.IOException(s"commit of $target failed")
    next
  }

  /** Read a specific version, or the latest when `version` is None.
    * A vacuumed (or never-written) version fails fast with the version
    * list rather than returning an empty scan.
    */
  def readVersion(spark: SparkSession, tableDir: String,
      version: Option[Long] = None): DataFrame = {
    val have = versions(spark, tableDir)
    val v = version.getOrElse(
      have.lastOption.getOrElse(
        throw new java.util.NoSuchElementException(s"no versions in $tableDir")))
    if (!have.contains(v))
      throw new java.util.NoSuchElementException(
        s"version $v not in $tableDir (have: ${have.mkString(",")})")
    spark.read.parquet(s"$tableDir/v=$v")
  }

  /** Retention: delete all but the newest `keepLast` versions; returns
    * the deleted version numbers. Deletion order is oldest-first so a
    * crash mid-vacuum leaves a contiguous suffix of versions, keeping
    * [[readVersion]]'s "latest" well-defined.
    */
  def vacuum(spark: SparkSession, tableDir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest version")
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val doomed = versions(spark, tableDir).dropRight(keepLast)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(p, s"v=$v"), true)
    }
    doomed
  }

  /** Z-order (Morton) clustering value over two numeric columns: each
    * column is min/max-scaled to `bits` bits and the bits interleaved, so
    * rows close in BOTH dimensions get close z-values. Scaling bounds are
    * caller-provided (from a cheap pre-agg — see [[zorderWrite]]); nulls
    * scale to 0, out-of-range values clamp.
    *
    * 2 x `bits` small bitwise terms — deliberately bounded so the
    * projection stays inside whole-stage codegen (see SignBandSignatures
    * for what happens past the limit); 8 bits/dim = 256 buckets/dim is
    * plenty for FILE-level pruning, which is what z-order is for.
    */
  def zorderValue(a: Column, b: Column, minA: Double, maxA: Double,
      minB: Double, maxB: Double, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 16, "bits per dimension must be 1..16")
    val top = (1L << bits) - 1
    def scaled(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(top), greatest(lit(0L),
        ((coalesce(c.cast("double"), lit(lo)) - lit(lo)) *
          (top / (hi - lo))).cast("long")))
    val (qa, qb) = (scaled(a, minA, maxA), scaled(b, minB, maxB))
    (0 until bits).map { i =>
      shiftleft(shiftright(qa, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(qb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` as `numFiles` parquet files clustered by the z-order of
    * (`colA`, `colB`) — the lake-layout optimization for tables queried by
    * MORE THAN ONE dimension, where `partitionBy`/linear sort can only
    * serve one. Each output file covers a contiguous z-range, i.e. a small
    * rectangle in (A, B) space, so parquet footer min/max stats prune
    * files for predicates on EITHER column (a linear sort's files are
    * narrow in the sort column but span the full range of every other).
    *
    * Cost at 100 TB: one 4-row pre-agg for the scaling bounds, then ONE
    * range exchange (sampled, balanced) + per-partition sort — the same
    * shape as any global sort, no extra passes. IoPayloadSpec measures the
    * pruning: candidate-file count under single-dimension predicates for
    * z-order vs linear layout.
    */
  def zorderWrite(df: DataFrame, outDir: String, colA: String, colB: String,
      numFiles: Int, bits: Int = 8): Unit = {
    val b = df.agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).first()
    val z = zorderValue(col(colA), col(colB),
      b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)
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

  /** Reduce a change relation to the winning row per key: the row with the
    * greatest (`orderCols`) tuple — one partial-aggregated `max_by`, so a
    * batch with many changes per key shuffles one struct per key, not the
    * batch.
    */
  def latestPerKey(df: DataFrame, keyCol: String,
      orderCols: Seq[String]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(col(keyCol))
      .agg(max_by(payload, struct(orderCols.map(col): _*)).as("_r"))
      .select(col("_r.*"))
  }

  /** CDC apply with explicit ordering — last-write-wins upsert of a change
    * feed into a keyed table: per key the surviving row is the one with
    * the greatest (`orderCols`) tuple across base and changes. Unlike
    * [[mergeUpsert]] (field-level patch, batch wins unconditionally), this
    * is the ORDER-INDEPENDENT apply a streaming change feed needs: because
    * per-key max is associative and commutative, applying micro-batches in
    * ANY order converges to the same table — no cross-batch ordering
    * assumption, which a distributed file source cannot provide anyway.
    *
    * One keyed full-outer join per batch (the Delta/Iceberg MERGE shape);
    * changes are pre-reduced per key by [[latestPerKey]].
    */
  def cdcUpsert(base: DataFrame, changes: DataFrame, keyCol: String,
      orderCols: Seq[String]): DataFrame = {
    val c = latestPerKey(changes, keyCol, orderCols)
    def ord(side: String) =
      struct(orderCols.map(n => col(s"$side.$n")): _*)
    val takeChange = col(s"b.$keyCol").isNull ||
      (col(s"c.$keyCol").isNotNull && ord("c") > ord("b"))
    base.as("b").join(c.as("c"),
        col(s"b.$keyCol") === col(s"c.$keyCol"), "full_outer")
      .select(base.columns.toIndexedSeq.map(n =>
        when(takeChange, col(s"c.$n")).otherwise(col(s"b.$n")).as(n)): _*)
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

  /** Changelog between two snapshots of a keyed table: per row,
    * `inserted` (key only in `after`), `deleted` (only in `before`), or
    * `updated` (key in both, any compared column differing — null-safe,
    * so a transition to/from NULL counts and NULL == NULL does not).
    * Unchanged rows are omitted. This is the table-diff an incremental
    * pipeline runs between lake versions to derive a CDC feed when the
    * upstream has none (the inverse of [[cdcUpsert]], which APPLIES one).
    *
    * One key-keyed full-outer join; at lake scale both sides shuffle on
    * the key once (or co-partition for free if both snapshots were
    * bucketed by the key at write, io08's layout).
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    // Presence comes from explicit marker columns, not value nullability:
    // a present row whose compared values are ALL null must still count
    // as present on its side.
    val b = before.select(col(keyCol) +: lit(1).as("_b") +:
      compareCols.map(c => col(c).as(s"b_$c")): _*)
    val a = after.select(col(keyCol) +: lit(1).as("_a") +:
      compareCols.map(c => col(c).as(s"a_$c")): _*)
    val changed = compareCols
      .map(c => !(col(s"b_$c") <=> col(s"a_$c"))).reduce(_ || _)
    b.join(a, Seq(keyCol), "full_outer")
      .withColumn("change_type",
        when(col("_b").isNull, "inserted")
          .when(col("_a").isNull, "deleted")
          .when(changed, "updated"))
      .filter(col("change_type").isNotNull)
      .drop("_b", "_a")
  }
}
