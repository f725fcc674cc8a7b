package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: dumps `explain("formatted")` for a curated set of
  * flagship queries to PLANS.md, so the physical shapes the scale story
  * depends on (pushed filters, pruned schemas, broadcast vs shuffle joins,
  * partial aggregation, the custom as-of operator) are reviewable as an
  * artifact rather than claims. Regenerate with:
  * `sbt "runMain graft.Explain /root/testdata/sf0.01 PLANS.md"`.
  */
object Explain {

  /** Queries whose plan shape carries the scale argument. */
  private val Flagships = Seq(
    "q01_pricing_summary" -> "partial+final hash aggregation over the fact table",
    "q02_filter_project"  -> "pushed filters + pruned read schema on the scan",
    "q03_revenue_by_nation" -> "fact-fact shuffle join + broadcast dimensions",
    "q05_topk_orders"     -> "TakeOrderedAndProject (per-partition heaps, no global sort)",
    "q16_range_join"      -> "broadcast nested-loop for the interval dimension",
    "q20_asof_custom"     -> "custom AsOfJoinExec (co-partitioned single-pass merge)",
    "d02_minhash_pairs"   -> "map-side signatures, bucket-keyed candidate join",
    "e01_embed_neardup"   -> "codegen'd cosine inside the join condition",
    "q35_lateral"         -> "correlated lateral decorrelated into a ranked join",
    "q37_bloom_join"      -> "Bloom runtime pre-filter before the exact semi join",
    "v02_find_similar"    -> "broadcast reference vector, map-only scan",
    "v08_centroids"       -> "posexplode + keyed scalar aggregation",
    "q42_scd2"            -> "both SCD2 windows over one keyed exchange",
    "a02_sampled_stats"   -> "map-only hash-sample filter feeding a tiny aggregate",
    "s05_token_budget"    -> "one window pass per group, no global sort",
    "e02_lsh_neardup_contract" -> "sign-LSH bucket-keyed candidate join (the certified scale path) + exact verify",
    "t11_chunking"        -> "map-only sequence/slice chunk explosion, no shuffle before the gate orderBy",
    "t12_bm25"            -> "one (doc,term) aggregation + broadcast document-frequency relation",
    "a03_sketch_union"    -> "partial+final HLL sketch aggregation, union of per-group sketches",
    "e03_wide_lsh_contract" -> "fused SignBandSignatures projection (one reference-object expression, stays in codegen) + bucket-keyed join",
    "io06_zorder"         -> "post-zorder scan: range predicates on either clustered column reach the parquet scan as PushedFilters",
    "t13_perplexity"      -> "token-keyed vocab count + vocab join (AQE-broadcastable) + doc-keyed mean, scalars as literals",
    "e04_pca_contract"    -> "per-dimension variance aggregation (the GramAggregator fit pass shares this partial+final shape)",
    "e07_whiten_contract" -> "whitening as the same fused MatVecProduct scan as e04 (rescale folded into the driver-side matrix); ONE one-row moment aggregation checks identity covariance",
    "d09_span_dedup"      -> "map-side gram+md5 explode, ONE gram-keyed count shuffle, per-doc island-merge window",
    "v19_binary_hamming"  -> "fused SignPack signatures + HammingWords scoring, partial top-k aggregation before the exchange",
    "s07_nb_quality"      -> "64-row broadcast NB weight table; train and inference share the same two keyed exchanges",
    "p02_pipeline_pack"   -> "the composed curation pipeline as ONE plan: rule scan + fingerprint window + NB filter + packing window, id-keyed joins between stages",
    "t19_domain_kl"       -> "one corpus scan -> (domain, token) count; every later window runs on the vocab-bounded relation, never the corpus",
    "s08_temperature_mix" -> "|domains|-row weight table broadcast onto a map-only integer-threshold sampling pass",
    "p03_data_card"       -> "datasheet composition: id-keyed joins over memoized per-doc relations + ONE per-source fold, no new corpus scans",
    "t22_cdc_chunks"      -> "staged HOF projections (hs/cuts/chunks each materialized once); posexplode_outer avoids the inferred size()>0 filter that would re-derive the md5 chain below the projections",
    "d12_span_scrub"      -> "d09's gram-count shuffle + per-doc span arrays joined back id-keyed; the cut itself is one map-side HOF",
    "q44_anomaly"         -> "dense-grid window moments as integer sums; z is one float expression over exact integers",
    "t20_tfidf_terms"     -> "one corpus-sized (source, token) count; windows + rank on the vocab-bounded relation",
    "s11_weighted_sample" -> "map-only A-ES key projection into TakeOrderedAndProject (per-partition top-k, no global sort)",
    "m05_image_dhash"     -> "one hash scan -> 4-segment pigeonhole equi-join (exact for hamming<=3), bit_count verify",
    "t25_char_entropy"    -> "fused CharEntropy expression in the scan projection — map-only, zero shuffles",
    "e08_semantic_decon"  -> "broadcast benchmark probes, map-only exact-cosine contamination scan; only hits reach the ranking exchange",
    "g02_triangles"       -> "corpus-aggregated incidence -> vertex-bounded canonical edges; node-iterator triangle joins each keyed on one endpoint",
    "t27_nfc_normalize"   -> "fused NfcNormalize + two codegen regexp_replaces in the scan projection — map-only before the output sort",
    "t28_filter_funnel"   -> "one md5 dedup window + map-only Gopher metrics; (source, stage) aggregate with the pct window on the bounded relation",
    "q47_ordered_set"     -> "mode/median/listagg as windows with explicit tiebreaks — keyed exchanges on cardinality-bounded relations",
    "q48_nearest_asof"    -> "custom AsOfJoinExec in Nearest mode: both candidates from ONE co-partitioned merge pass",
    "t29_ngram_novelty"   -> "persisted distinct-gram relation; ONE gram-keyed count shuffle + join riding the same partitioning",
    "m07_audio_vad"       -> "island scan folded inside the decode mapPartitions — zero shuffles before the output sort",
    "io15_sketch_store"   -> "per-(type, day) HLL sketches through a parquet binary round trip; re-aggregation touches KB-sized sketch rows only",
    "v25_matryoshka"      -> "four broadcast-probe prefix-cosine scans sharing one persisted full-dim ranking",
    "s14_distribution_match" -> "one band-keyed window rank + bands-bounded min-count broadcast back",
    "t30_line_dedup"      -> "persisted line explode; ONE line-hash doc-frequency count whose filtered (boilerplate-only) output broadcasts back, then ONE doc-keyed reassembly",
    "s16_split_leakage"   -> "id-derived split labels on the shared minhash pair relation — zero joins beyond the d02 candidate pipeline itself",
    "a06_join_cardinality" -> "two 256-row key histograms + integer-summed containment estimate — the join never runs on the estimate path",
    "q52_transitions"     -> "one lead() window (ONE user-keyed exchange) into a |types|^2-bounded aggregate",
    "g06_kcore"           -> "per-round degree-within-alive joins on the vertex-bounded alive set; all-integer peel cascade",
    "q53_decay"           -> "one-row max broadcast back in; map-side decay expression into ONE user-keyed partial+final aggregation",
    "e11_embed_audit"     -> "map-side magnitude + finiteness fold into a single global partial+final aggregate",
    "d17_entity_resolution" -> "block-keyed candidate self-join (sum-over-blocks quadratic, never corpus^2) + in-block levenshtein match + canonicalize",
    "a07_theta_overlap"   -> "ONE corpus scan -> |types|-row theta sketch relation; pairwise set expressions on KB summaries",
    "e12_margin_mining"   -> "persisted candidate relation shared by kx/ky/final (three consumers, one pass); integer micro-unit cosines keep the k-NN sums exact",
    "q56_table_checksum"  -> "map-only md5 fold into ONE (count,sum,xor) row per table — the cheapest full-content audit",
    "q57_incremental_agg" -> "delta-only scans + |groups|-sized full-outer merge — never the history scan",
    "d19_bloom_dedup_gate" -> "one broadcast Bloom sketch + map-only membership probe; the join-free cross-shard dedup shape",
    "s17_leakage_safe_split" -> "split-by-keeper over the cached pair relation; cross-split pairs structurally zero",
    "q58_disorder_audit"  -> "ONE user-keyed window exchange; lateness as exact integer micros into a single global aggregate",
    "t32_distinct_ngrams" -> "ONE fused UniBiGramPairs generator input (tokenize + uni + bigram structs in one codegen byte walk); gram-keyed exact distinct")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the flagship queries\n\n")
    sb.append(s"Generated by `graft.Explain` against `$sfDir`. The shapes to\n")
    sb.append("check per query are noted above each plan; SCALING.md explains\n")
    sb.append("why each shape is the one that survives 100 TB.\n")
    Flagships.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name — $why\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote ${Flagships.size} plans to $out")
    spark.stop()
  }
}
