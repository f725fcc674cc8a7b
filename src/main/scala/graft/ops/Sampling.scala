package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable dataset splitting and sampling.
  *
  * Splits are a pure function of the row's id (md5-derived bucket in
  * [0, 100)), not of partitioning, row order, or an RNG stream — so the
  * same row lands in the same split on every engine, every run, and every
  * cluster size. This is the property training pipelines actually need:
  * re-running ingestion must not shuffle documents between train and eval.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row id: first 8 hex chars of
    * md5(id) as an integer, mod buckets.
    */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Assign "train" / "val" / "test" by cumulative percentage; e.g.
    * (90, 5) -> buckets [0,90) train, [90,95) val, [95,100) test.
    */
  def splitLabel(id: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    val b = hashBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic fraction sample: keep rows whose bucket (out of 10000)
    * falls below fraction*10000. Unlike df.sample, stable across runs and
    * partitionings.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(idCol), 10000) < (fraction * 10000).toLong)

  /** Per-stratum deterministic sampling: fractions per value of
    * `strataCol`, same stability guarantees.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double]): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), 10000) < (frac * 10000).cast("long"))
  }

  /** Greedy sequence packing for training batches: documents are laid out
    * in deterministic `idCol` order within each `partCol` group and
    * assigned to the bin their running token offset falls into
    * (`bin = prior_cumulative_tokens / binSize`). One window pass; bins
    * are contiguous and reproducible. Documents longer than `binSize`
    * occupy their own bin(s) starting at their offset.
    */
  def packIntoBins(df: DataFrame, idCol: String, tokenCol: String,
      binSize: Long, partCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("prior_tokens",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"prior_tokens div $binSize"))
  }
}
