package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual runtime filtering for selective fact-dim joins: build a Bloom
  * filter over the (small) build side's join keys, broadcast it, and drop
  * probe-side rows that cannot match BEFORE they reach the shuffle. The
  * subsequent exact semi join removes the Bloom false positives, so the
  * result equals the plain semi join exactly — which is what makes a plain
  * SQL join a valid oracle for it.
  *
  * This is the hand-rolled form of what Spark's own runtime bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) and dynamic
  * partition pruning inject automatically: at 100 TB, shuffling only the
  * ~selectivity fraction of the fact table that can possibly join is the
  * difference between a full-fact shuffle and a near-free one. The Bloom
  * sketch itself is tiny (`-n ln fpp / (ln 2)^2` bits) and rides to the
  * executors as a broadcast variable.
  */
object RuntimeFilter {

  /** Semi-join `probe` to `build` on long keys, Bloom-prefiltered.
    *
    * @param expectedItems sizing for the sketch; at scale pass the build
    *                      side's (estimated) distinct-key count
    * @param fpp           false-positive rate: tune the sketch size vs the
    *                      share of unmatchable rows that slip into the join
    */
  def bloomSemiJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    probe
      .filter(col(probeKey).isNotNull && mightContain(col(probeKey)))
      .join(build.select(col(buildKey)).distinct(),
        col(probeKey) === col(buildKey), "left_semi")
  }
}
