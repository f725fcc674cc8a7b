package graft

import org.apache.spark.sql.SparkSession

/** Suite-boundary cache hygiene.
  *
  * Several operator families memoize an expensive built artifact per
  * (session, corpus, params) — the MinHash pair relation
  * ([[graft.ops.Dedup.nearDuplicatesMinhashCached]]), the IVF index
  * ([[graft.ops.Ivf.buildCached]]), the winnowed-fingerprint postings
  * ([[graft.queries.MixQueries]]) — and some pipelines persist internal
  * relations that outlive a single action (hashed shingle sets, IVF probe
  * routing). That sharing is exactly right WITHIN a family of queries over
  * one corpus; across a 95-query benchmark or verification sweep it
  * accumulates: every persisted plan stays pinned in the block manager,
  * storage squeezes execution memory, and the cache-manager lookup each new
  * query pays grows with the number of live cached plans. Round 3 measured
  * this as a 3.7x whole-suite slowdown with mid-suite queries 10-30x their
  * steady-state cost.
  *
  * [[reset]] is the boundary call: it drops graft's memo registries for the
  * session and unpersists every cached plan. Intended for harness points
  * where one workload family hands over to the next (graft.Bench between
  * query families, graft.Verify likewise); NOT for use mid-family, and not
  * while a live [[graft.store.RecordStore]] is serving — its in-memory
  * state is cache-backed and would be silently dropped to lazy recompute.
  */
object Caches {

  /** Drop all memoized artifacts and unpersist every cached plan of
    * `spark`. Safe to call on an idle session; subsequent queries rebuild
    * (and re-persist) what they need.
    */
  def reset(spark: SparkSession): Unit = {
    graft.ops.Dedup.invalidate(spark)
    graft.ops.Ivf.invalidate(spark)
    graft.ops.Pq.invalidate(spark)
    graft.ops.TextAnalysis.invalidate(spark)
    graft.queries.MixQueries.invalidate(spark)
    // Unpersists everything registered with the session's CacheManager —
    // including the non-memoized internal persists (hashed shingles, IVF
    // probe routing) whose handles the operators do not retain.
    spark.catalog.clearCache()
  }

  /** Unload every state-store provider the JVM has accumulated. Each
    * streaming query run registers its stores in the GLOBAL
    * `StateStore.loadedProviders` registry; stopped queries leave their
    * providers loaded (RocksDB working dirs, maintenance-thread entries)
    * until idle-timeout maintenance gets to them. A suite that runs
    * hundreds of short streams accumulates hundreds of dead providers,
    * and every new stream's store operations contend with the growing
    * maintenance sweep — measured as the st-family inflating 2-5x in
    * full-suite runs vs family-isolated runs on identical code. Calling
    * between families is safe (no stream is active at a boundary);
    * providers and the maintenance task restart lazily on next use.
    */
  def unloadStreamState(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}
