package graft

/** Every registered query runs end-to-end at sf0.001 and the flagship
  * entry returns rows (the driver's t1 smoke).
  */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Almost every query is DuckDB-oracle-checked: a01 and v09 emit their
    * sketch/ANN accuracy contracts as in-query tolerance booleans (plus
    * exact-checkable columns) instead of raw sketch internals. The one
    * deliberate rows-only entry is BPE training: its merge choice is an
    * iterative data-dependent argmax (8 rounds of pair-count -> argmax ->
    * re-segment), not one SQL statement; BpeSpec pins the exact merge
    * sequence on a hand-computed corpus instead.
    */
  private val rowsOnlyExempt = Set("t17_bpe_merges")

  test("every query has matching oracle coverage or is explicitly exempt") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      rowsOnlyExempt
    assert(noOracle.isEmpty,
      s"queries without DuckDB oracle: ${noOracle.mkString(", ")}")
  }

  // Pinned result counts on the deterministic sf0.001 data: regressions in
  // operator semantics show up here even without the DuckDB oracle.
  private val pinnedCounts = Map(
    "v02_find_similar" -> 12L,
    "d02_minhash_pairs" -> 28L,
    "d03_simhash_pairs" -> 4926L,
    "e01_embed_neardup" -> 7L,
    "q09_setops" -> 7L,
    "q14_sessionize" -> 946L,
    "q15_asof_join" -> 192L,
    "q20_asof_custom" -> 192L, // must equal q15: same semantics, custom exec
    "t01_langid" -> 500L,
    "s01_dataset_split" -> 3L,
    // Round-5 second-session additions (deterministic sf0.001 results).
    "d11_containment" -> 27L,
    "d12_span_scrub" -> 500L,
    "d13_cluster_sizes" -> 3L,
    "q43_funnel" -> 1L,
    "q44_anomaly" -> 184L,
    "s09_curriculum" -> 30L,
    "s10_uncertainty_sample" -> 20L,
    "t20_tfidf_terms" -> 100L,
    "t22_cdc_chunks" -> 2830L,
    "t23_bpe_fertility" -> 20L,
    "v22_nprobe_sweep" -> 3L,
    "io10_snapshot_diff" -> 3L,
    "p04_profile" -> 4L,
    "q45_cohorts" -> 5L,
    "t24_langid_eval" -> 5L,
    "v23_ivf_extend" -> 100L,
    "e07_whiten_contract" -> 1L,
    "q46_hierarchy" -> 3L,
    "a05_cms_contract" -> 1L,
    "v24_jl_contract" -> 1L)

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      pinnedCounts.get(name).foreach(expected =>
        assert(n === expected, s"$name row count drifted"))
    }
  }
}
