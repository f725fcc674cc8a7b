package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Range}
import org.apache.spark.sql.execution.{ExternalRDD, LogicalRDD}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Compute-spreading guard for per-row-expensive operators.
  *
  * A parquet scan cannot parallelize below row-group granularity, so a
  * small single-row-group input pins every downstream map stage — per-row
  * hashing, shingling, pairwise cosine — to ONE task regardless of core
  * count. Operators whose cost is dominated by per-row compute (MinHash,
  * SimHash, brute-force similarity) call [[ensure]] on their inputs: if the
  * estimated scan parallelism is below the session's default parallelism,
  * insert an explicit round-robin repartition.
  *
  * On a real cluster this is a no-op — 100 TB inputs arrive as thousands
  * of splits, the estimate is `>= defaultParallelism`, and no shuffle is
  * added. It only fires on inputs small enough that the added shuffle is
  * trivially cheap next to the compute it unlocks. Cheap scan-plus-
  * aggregate queries should NOT use this: for them the extra exchange
  * costs more than the serial scan (measured at sf0.1).
  */
object Spread {

  /** `df`, repartitioned to the session default parallelism iff its
    * estimated scan parallelism provides less than that.
    */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (estimatedScanParallelism(df) < target) df.repartition(target) else df
  }

  /** Estimated partition count of `df`'s scan WITHOUT forcing physical
    * planning (`df.rdd` built the whole physical pipeline — and an
    * execution — just to read one int, on every guarded operator's input).
    * File relations replay Spark's own `FilePartition` split-packing
    * arithmetic from the analyzed plan's file statistics; RDD-backed plans
    * read the already-materialized RDD handle; local relations are
    * driver-side rows and count as 1. Leaves this estimator cannot judge
    * report "plenty" — the guard then adds no shuffle, which is the old
    * behavior for every input the suite actually passes here.
    */
  private def estimatedScanParallelism(df: DataFrame): Int = {
    val spark = df.sparkSession
    val conf = spark.sessionState.conf
    val cores = math.max(1, spark.sparkContext.defaultParallelism)
    val leaves = df.queryExecution.analyzed.collectLeaves()
    if (leaves.isEmpty) return 1
    leaves.map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          // FilePartition.maxSplitBytes: splits are capped at
          // maxPartitionBytes but packed no finer than bytesPerCore or the
          // per-file open cost, so tiny corpora land in a handful of tasks.
          val total = math.max(0L, fs.location.sizeInBytes)
          val maxSplit = math.min(conf.filesMaxPartitionBytes,
            math.max(conf.filesOpenCostInBytes, total / cores))
          math.min(Int.MaxValue.toLong,
            math.max(1L, (total + maxSplit - 1) / math.max(1L, maxSplit))).toInt
        case _ => Int.MaxValue // non-file source (JDBC, ...): don't guess
      }
      case r: Range => r.numSlices.getOrElse(cores)
      case _: LocalRelation => 1
      case rdd: LogicalRDD => rdd.rdd.getNumPartitions
      case rdd: ExternalRDD[_] => rdd.rdd.getNumPartitions
      case _ => Int.MaxValue // cached/streaming/unknown: add no shuffle
    }.max
  }
}
