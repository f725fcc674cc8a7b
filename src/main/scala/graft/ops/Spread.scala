package graft.ops

import org.apache.spark.sql.DataFrame

/** Compute-spreading guard for per-row-expensive operators.
  *
  * A parquet scan cannot parallelize below row-group granularity, so a
  * small single-row-group input pins every downstream map stage — per-row
  * hashing, shingling, pairwise cosine — to ONE task regardless of core
  * count. Operators whose cost is dominated by per-row compute (MinHash,
  * SimHash, brute-force similarity) call [[ensure]] on their inputs: if the
  * current physical partitioning is below the session's default
  * parallelism, insert an explicit round-robin repartition.
  *
  * On a real cluster this is a no-op — 100 TB inputs arrive as thousands
  * of splits, `getNumPartitions >= defaultParallelism`, and no shuffle is
  * added. It only fires on inputs small enough that the added shuffle is
  * trivially cheap next to the compute it unlocks. Cheap scan-plus-
  * aggregate queries should NOT use this: for them the extra exchange
  * costs more than the serial scan (measured at sf0.1).
  */
object Spread {

  /** `df`, repartitioned to the session default parallelism iff its
    * current partitioning provides less than that.
    */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
