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

  /** Domain mixing with fractional epochs: each row is replicated
    * `weights(stratum)` times in expectation — `floor(w)` guaranteed copies
    * plus one more for the deterministic `frac(w)` fraction of rows (same
    * md5 bucket as the samplers, so membership in the extra epoch is a pure
    * function of the id). Rows explode into `(row, epoch)` pairs; a weight
    * below 1 downsamples (some rows get zero copies and drop out). This is
    * the upsample/downsample mix step of a training-data pipeline
    * (e.g. "3 epochs of wiki, 0.25 of crawl") — map-side explode, no
    * shuffle, output size = sum(w_s * |s|) by construction.
    */
  def epochMix(df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    def perStratum(f: Double => Column): Column =
      weights.foldLeft(f(defaultWeight)) { case (acc, (k, w)) =>
        when(col(strataCol) === k, f(w)).otherwise(acc)
      }
    val base = perStratum(w => lit(math.floor(w).toLong))
    val frac10k = perStratum(w => lit(math.round((w - math.floor(w)) * 10000)))
    val reps = base +
      when(hashBucket(col(idCol), 10000) < frac10k, 1L).otherwise(0L)
    // sequence(1, 0) DESCENDS instead of being empty — zero-rep rows must
    // be filtered out before the sequence is built.
    df.withColumn("reps", reps)
      .filter(col("reps") >= 1L)
      .withColumn("epoch", explode(sequence(lit(1L), col("reps"))))
      .drop("reps")
  }

  /** Deterministic global shuffle for training order: every row gets a
    * dense position in [1, n] ordered by `md5(seed + id)` — reproducible on
    * any engine, any partitioning. Computed scalably: rows are grouped into
    * 4096 hash-prefix buckets whose counts (a tiny aggregate) turn into
    * broadcast cumulative offsets, so the rank window only ever sorts
    * WITHIN a bucket — no single-partition global window, which is what
    * makes this survive a 10^9-row corpus. `shards` additionally deals the
    * shuffled order round-robin into training shards.
    */
  def globalShuffle(df: DataFrame, idCol: String, seed: String,
      shards: Int = 8): DataFrame = {
    val keyed = df
      .withColumn("skey", md5(concat(lit(seed + ":"), col(idCol).cast("string"))))
      .withColumn("sbucket", substring(col("skey"), 1, 3))
    // 4096 bucket counts: small enough that the offset window is driver-trivial.
    val offsets = keyed.groupBy(col("sbucket")).count()
      .withColumn("offset", coalesce(
        sum(col("count")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("sbucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("sbucket"), col("offset"))
    val inBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sbucket")).orderBy(col("skey"), col(idCol))
    keyed.join(broadcast(offsets), "sbucket")
      .withColumn("position", col("offset") + row_number().over(inBucket))
      .withColumn("shard", pmod(col("position") - 1L, lit(shards.toLong)))
      .drop("skey", "sbucket", "offset")
  }

  /** Token-budget data selection: keep the priority-order prefix of each
    * `partCol` group whose inclusive running token total fits `budget` —
    * the "take the best documents until the budget is spent" step of
    * curriculum/data-selection pipelines. Priority is (`tokenCol` desc,
    * `idCol` asc): longest-first with a deterministic tiebreak, so the
    * selected set is a pure function of the data. One window pass per
    * group; the output carries `cum_tokens`, the running total that
    * justified each row's selection.
    */
  def selectUnderTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, partCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol))
      .orderBy(col(tokenCol).desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Percentile-band filter: keep rows whose percent_rank of `valueCol`
    * within their `partCol` group falls in [lo, hi] — the quantile-trim
    * step quality pipelines use to drop outlier-length/score documents
    * without hand-picked absolute thresholds. Ranks are made total by the
    * `idCol` tiebreak, so rows with equal values at a band edge are kept
    * or dropped deterministically (by id), never by partitioning.
    * percent_rank = (rank-1)/(n-1) is the same exact integer-ratio double
    * on every engine.
    */
  def percentBandFilter(df: DataFrame, valueCol: String, idCol: String,
      partCol: String, lo: Double, hi: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col(valueCol), col(idCol))
    df.withColumn("pr", percent_rank().over(w))
      .filter(col("pr") >= lo && col("pr") <= hi)
  }

  /** Histogram equalization across bands — resample so every band of a
    * skewed distribution (length, quality score, domain) contributes the
    * SAME number of documents: keep the m = min-band-count docs per band,
    * chosen by deterministic content-hash rank (md5(id:salt), id
    * tiebreak — [[deterministicSample]]'s rule), i.e. the largest subset
    * of the corpus whose band histogram is exactly uniform. The
    * distribution-matching pass a curation pipeline runs when a length
    * or quality skew would otherwise dominate training batches.
    *
    * Scale shape: one band-keyed window rank + a bands-bounded count
    * aggregate broadcast back — no driver scalars, no second corpus
    * scan beyond the cheap count. Membership is a pure function of
    * (id, salt, band sizes): partition- and engine-invariant.
    */
  def flattenBands(df: DataFrame, idCol: String, bandCol: String,
      salt: String): DataFrame = {
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(bandCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(s":$salt"))),
        col(idCol))
    val m = df.groupBy(col(bandCol)).agg(count(lit(1)).as("band_n"))
      .agg(min(col("band_n")).as("m_keep"))
    df.withColumn("rk", row_number().over(rankW))
      .crossJoin(broadcast(m))
      .filter(col("rk") <= col("m_keep"))
      .drop("rk", "m_keep")
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

  /** Weighted sampling without replacement (Efraimidis & Spirakis, IPL
    * 2006, algorithm A-ES): every row draws key u^(1/w) from uniform u and
    * weight w, and the k LARGEST keys form an exact weighted sample
    * without replacement. Here u is md5-derived — v = first 8 hex chars of
    * md5(id ':' salt), u = (v + 0.5) / 2^32 — so u is a pure function of
    * row identity and EXACTLY the same double on every engine (the +0.5 /
    * power-of-two form is lossless), every run, every partitioning; no RNG
    * stream, no partition-id dependence. Keys are compared in log space
    * (ln(u)/w is monotone in u^(1/w); larger is better since ln(u) < 0) to
    * avoid pow's cross-engine rounding: ln is the one non-exact op in the
    * chain, and a selection flip would need two keys within ~1 ulp of each
    * other at the rank-k boundary.
    *
    * Scale shape: a map-only key projection feeding orderBy+limit, which
    * Spark plans as TakeOrderedAndProject — per-partition top-k with only
    * k rows per partition reaching the driver. No global sort, no shuffle
    * of the corpus.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String): DataFrame = {
    val v = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + salt))), 1, 8), 16, 10).cast("long")
    val u = (v.cast("double") + lit(0.5)) / lit(4294967296.0)
    df.withColumn("wkey", log(u) / col(weightCol).cast("double"))
      .orderBy(col("wkey").desc, col(idCol))
      .limit(k)
  }

  /** Soft deduplication (reweight-don't-drop, the SoftDeDup idea of
    * arXiv:2407.04752): instead of deleting duplicate clusters, every row
    * is down-weighted by its cluster's size — weight = 1/|cluster| — so
    * each distinct content contributes exactly one row-equivalent of
    * training signal while the corpus keeps its (diverse) surface forms.
    * The cluster key is any content-derived column: md5(text) for exact
    * dedup, or the keeper id from [[graft.ops.Dedup]]'s canonicalize for
    * near-dup clusters — both compose identically. One keyed window count
    * over the cluster key — a single shuffle, no joins.
    */
  def softDedupWeights(df: DataFrame, clusterKey: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(clusterKey)
    df.withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("soft_weight", lit(1.0) / col("cluster_size"))
  }

  /** Temperature-scaled domain sampling (the multilingual/multi-domain
    * rebalancing of XLM, arXiv:1901.07291 §3.1, and mT5): domain weights
    * w_d = |d|^alpha / sum_j |j|^alpha flatten the size distribution
    * (alpha=1 proportional, alpha=0 uniform; alpha=0.5 here so sqrt —
    * correctly-rounded IEEE on every engine, unlike pow), then each
    * domain is down-sampled toward its share of `budget` rows by the same
    * md5-content-hash rule as [[deterministicSample]]. The per-domain keep
    * threshold is materialized as an INTEGER bucket count
    * (round(rate*10000)), so row membership is a pure integer comparison
    * — engine/run/partition-invariant; floats only decide the (tiny,
    * 1-ulp-insensitive after round) threshold itself.
    *
    * Scale shape: the weight table is |domains| rows (one small agg +
    * 1-row total), broadcast back onto the corpus; the sampling pass is
    * map-only. Returns per-row data tagged with weight/threshold; callers
    * aggregate.
    */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: String,
      budget: Long): DataFrame = {
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("c_docs"))
    val z = counts.agg(sum(sqrt(col("c_docs"))).as("z"))
    val rated = counts.crossJoin(broadcast(z))
      .withColumn("weight", sqrt(col("c_docs")) / col("z"))
      .withColumn("rate",
        least(lit(1.0), col("weight") * lit(budget.toDouble) / col("c_docs")))
      .withColumn("thresh", round(col("rate") * 10000).cast("long"))
      .select(col(domainCol), col("c_docs"), col("weight"), col("thresh"))
    df.join(broadcast(rated), domainCol)
      .filter(hashBucket(col(idCol), 10000) < col("thresh"))
  }
}
