package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global-order primitives WITHOUT a single-partition window.
  *
  * A partition-less `Window.orderBy(...)` (global rank / ntile / running
  * total) executes as ONE task sorting the whole relation — the
  * low-cardinality-partition-key trap (optimization guide §2.5) that q47
  * hit at sf1 and t18/s09 carried toward 100 TB. These helpers compute the
  * identical values with a two-pass exchange instead:
  *
  *  1. range-partition the relation by the sort key (every task then holds
  *     a contiguous, disjoint key range — the same layout a global sort
  *     produces, at |rows|/P per task);
  *  2. count/sum each range once and collect the P-row result to the
  *     driver (P = spark.sql.shuffle.partitions — scale-adaptive, never a
  *     constant), turning it into exclusive prefix offsets;
  *  3. rank/run inside each range with an ordinary partitioned window and
  *     add the range's offset.
  *
  * The range-annotated relation is persisted so the offset pass and the
  * rank pass observe ONE partitioning (range boundaries are re-sampled per
  * job otherwise, which would misalign offsets); the persist happens
  * INSIDE the caller's timed action and its lifetime is bounded by the
  * family-boundary [[graft.Caches.reset]], like every other within-run
  * intermediate. Determinism: ranks depend only on the total order of the
  * key columns, not on which range a key lands in, so boundary sampling
  * cannot change results — callers must pass a key set that is a total
  * order (unique) for per-row ranks.
  */
object GlobalOrder {

  private val Pid = "_go_pid"
  private val Off = "_go_off"

  /** `df` annotated with its deterministic range id and pinned (persisted)
    * so both passes see the same assignment.
    */
  private def ranged(df: DataFrame, order: Seq[Column]): DataFrame = {
    val p = math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    val parted = df.repartitionByRange(p, order: _*)
      .withColumn(Pid, spark_partition_id())
    parted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    parted
  }

  /** Per-range exclusive prefix offsets of `weight` (1 for ranks), plus
    * the grand total. One tiny job: P rows cross the driver, never data.
    */
  private def offsets(parted: DataFrame, weight: Column): (DataFrame, Long) = {
    val per = parted.groupBy(col(Pid)).agg(sum(weight).as("_go_n"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offs = per.map { case (id, n) => val o = (id, acc); acc += n; o }
    val spark = parted.sparkSession
    import spark.implicits._
    (broadcast(offs.toSeq.toDF(Pid, Off)), acc)
  }

  /** Append `rankCol` = the exact 1-based global rank under `order` (which
    * must be a total order), plus return the total row count. Identical to
    * `row_number().over(Window.orderBy(order))` at any scale.
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column],
      rankCol: String): (DataFrame, Long) = {
    val parted = ranged(df, order)
    val (offDf, total) = offsets(parted, lit(1L))
    val w = Window.partitionBy(col(Pid)).orderBy(order: _*)
    val out = parted.join(offDf, Pid)
      .withColumn(rankCol, col(Off) + row_number().over(w))
      .drop(Pid, Off)
    (out, total)
  }

  /** Append `cumCol` = the exact inclusive running total of `value` under
    * `order` (a total order), plus return the grand total. Identical to
    * `sum(value).over(Window.orderBy(order).rowsBetween(unboundedPreceding,
    * currentRow))` at any scale.
    */
  def withRunningTotal(df: DataFrame, order: Seq[Column], value: Column,
      cumCol: String): (DataFrame, Long) = {
    val parted = ranged(df, order)
    val (offDf, total) = offsets(parted, value)
    val w = Window.partitionBy(col(Pid)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = parted.join(offDf, Pid)
      .withColumn(cumCol, col(Off) + sum(value).over(w))
      .drop(Pid, Off)
    (out, total)
  }

  /** The exact `ntile(k)` bucket boundaries for `n` rows: bucket i covers
    * global positions (bounds(i-1), bounds(i)] — the first n%k buckets
    * take ceil(n/k) rows (Spark and DuckDB agree on this split).
    */
  def ntileBounds(n: Long, k: Int): Array[Long] = {
    val q = n / k
    val rem = n % k
    val sizes = Array.tabulate(k)(i => q + (if (i < rem) 1L else 0L))
    sizes.scanLeft(0L)(_ + _)
  }
}
