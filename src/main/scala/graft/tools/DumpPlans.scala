package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: formatted physical plans of the flagship
  * queries, as reviewable evidence that filters push down, dimensions
  * broadcast, and aggregations stay in codegen. Run:
  *   sbt "runMain graft.tools.DumpPlans"
  */
object DumpPlans {
  private val picks = Seq(
    "s1_scan_project" -> "projection pruning reaches the scan (ReadSchema)",
    "p2_filter_eq" -> "predicate pushdown (PushedFilters)",
    "j4_revenue_per_nation" -> "flagship 3-way join: dims broadcast, fact never re-shuffled for them",
    "j2_lag_sync_report" -> "signature lag report: two branch scans, full-outer on the group key",
    "w5_topk_orders" -> "ordered top-k → TakeOrderedAndProject (no global sort)",
    "d3_minhash_lsh" -> "MinHash+LSH: in-row shingle hashing, banding equi-join candidates",
    "s2_lsh_ann" -> "LSH ANN: compiled bucket in one scan, pair only within buckets",
    "d12_simhash_lookup" -> "SimHash seed lookup: 697-mask neighbor expansion → broadcast EQUI-join probe",
    "s3_cosine_neardup" -> "exact near-dup: size-guarded broadcast all-pairs, compiled dot",
    "t5_bigram_freq" -> "bigrams composed in-row, one explode, no per-doc window sort",
    "t8_winnow_fp" -> "winnowing fingerprints: compiled deque pass, distinct is the only shuffle",
    "c1_corpus_clean" -> "end-to-end cleaning: dedup agg → quality gate → guarded pair join → broadcast anti-join",
    "d6_simhash64_pairs" -> "64-bit SimHash: 16-bit pigeonhole bands — selective equi-join at corpus scale",
    "sp1_stratified_sample" -> "stratified sample: pure map-side filter, no shuffle, no rand()",
    "q1_group_quantiles" -> "grouped exact percentiles: single hash-aggregate pass",
    "e1_hll_users" -> "HLL blob rollup: day sketches map-side, register-max blob merge, bracket-gated estimate",
    "x10_lateral_topn" -> "LATERAL correlated top-N: decorrelated to a ranked join, no per-row re-execution",
    "p7_profile_documents" -> "per-column profile: one scan, one wide agg row, stack pivot",
    "e2_heavy_tokens" -> "two-pass heavy hitters: MG sketch → broadcast candidates → exact count of candidates only",
    "t10_edit_distance" -> "fuzzy match: half-band equi-join candidates, levenshtein verify only in-band",
    "ts1_gap_fill" -> "calendar gap-fill: tiny spine broadcast against pre-aggregated facts",
    "x11_json_agg" -> "JSON extraction inside the scan projection, partial agg after",
    "cdc_mv_incremental" -> "incremental MV fold: touched-key semi-join + delta union, no base rescan",
    "ts3_sessionize" -> "sessionization: ONE user_id exchange reused by lag, running sum, and rollup",
    "t13_cooccur" -> "co-occurrence: broadcast df-band gate before the pair join (no stopword blowup)",
    "x16_not_in" -> "NOT IN: planned as a null-aware anti join, not a per-row subquery",
    "t14_chunking" -> "token chunking: windows composed in-row, one explode, no per-doc window sort",
    "d7_containment" -> "containment dedup: fingerprint equi-join + df guard, never all-pairs",
    "sp4_weighted_sample" -> "PPS weighted sample: scalar max broadcast, pure map-side integer filter",
    "x17_recursive_cte" -> "recursive CTE: engine-iterated UnionLoop, per-step frontier joins",
    "s7_knn_label" -> "kNN classify: broadcast queries + compiled dots, tiny vote aggregate",
    "ts7_ohlc_bars" -> "OHLC bars: single hash aggregate, min_by/max_by carry open/close (no window)",
    "w3_ntile_thirds" -> "global ntile WITHOUT a single-partition sort: bucketed rank + bounded offset join (r7)",
    "t17_bm25" -> "BM25 top-20: filtered token explode, broadcast df/stats, TakeOrdered — no global sort",
    "d8_cluster_reps" -> "cluster representatives: CC labels → tiny per-cluster agg → join back on rep ids",
    "sp6_corpus_shuffle" -> "deterministic corpus shuffle: bucketed global rank over a hash permutation — no single-partition sort",
    "d9_dup_weights" -> "duplicate down-weighting: broadcast cluster label/size maps, corpus scanned once",
    "c3_leakage_safe_split" -> "leakage-safe split: broadcast cluster labels, pure per-row hash split, tiny rollup",
    "t18_bpe_pretokens" -> "BPE pre-token counts: per-row regex in codegen, partial-agg rollup over ≤|langs| keys",
    "s9_ann_recall" -> "ANN recall harness: query sample broadcast to brute + probed-bucket sides, one-row aggregate",
    "c4_contamination_clusters" -> "cluster-expanded decontamination: every enrichment join broadcasts, corpus never content-joined",
    "d10_repeated_spans" -> "repeated spans: hash-grouped rollup + top-50 cut BEFORE text recovery (span text never shuffles)",
    "t19_bpe_merge_candidates" -> "BPE merges: corpus → vocab hash-agg first, pair explode over distinct words only, TakeOrdered",
    "c6_source_health" -> "source health: one corpus scan, broadcast enrichments, basis-point rollup per source",
    "s10_pq_codes" -> "PQ codes: in-row subspace explode, broadcast codebook, compiled dots, two partial aggs",
    "s11_pq_adc_topk" -> "PQ ADC search: broadcast distance table, code equi-join, WindowGroupLimit top-5 — raw vectors untouched",
    "t21_lm_novelty" -> "bigram-LM scoring: vocabulary-sized df aggs, equi-joins back onto the bigram stream, sorted per-doc fold",
    "s12_sq_codes" -> "scalar quantization: 64-row bounds agg broadcast as ONE row, in-row integer transforms, no explode in output",
    "j7_nearest_click" -> "nearest-event join: backward+forward frames over ONE per-user sort, no range-join explosion",
    "a14_higher_moments" -> "higher moments: exact BIGINT power sums in one map-side-combined agg, scalar math after",
    "g1_pagerank" -> "PageRank: checkpointed edge/degree sets, per-iteration join+agg (BSP as dataflow), integer ranks",
    "cdc_scd2_history" -> "SCD2 history: lead + row_number share one user_id exchange, intervals in pure integers",
    "dq1_constraint_report" -> "constraint report: FK checks as LEFT-join null probes (dim side broadcasts), one agg row per check",
    "dq4_schema_drift" -> "schema drift: midpoint + totals as broadcast scalars, ONE conditional-agg pass per scan, no join on event rows",
    "a15_equidepth_hist" -> "equi-depth histogram: bucketed two-pass exact octiles (no value buffer), broadcast row, codegen'd bucket comparisons",
    "a16_weighted_median" -> "weighted median via groupQuantilesDisc: histogram ranks + bucket-local selection, every window bucket-bounded",
    "a19_feature_bins" -> "multi-column feature binning: stack unpivot, ONE grouped two-pass selection for all columns' quartiles",
    "e6_lbhist_quantiles" -> "log-bucket quantile sketch: mergeable bucket-count state, bracket-checked against the two-pass exact side",
    "q2_approx_quantiles" -> "GK sketch + rank-error verification: two codegen scans, no ordered-set aggregate anywhere",
    "g3_copurchase_recs" -> "co-purchase recs: focus 2-hop semi-join edge build, broadcast deg/focus sides, per-seed window top-5",
    "d11_prefix_filter" -> "prefix-filter join: per-doc window on doc_id (group-local), candidates only where rarest-token prefixes collide",
    "s13_kmeans_assign" -> "k-means step: broadcast seeds, three compiled dots per row (|v-c|2 identity), k-row shuffle only",
    "ts8_ewma" -> "truncated EWMA: eight lags in ONE compiled window frame, single user_id exchange",
    "a16_weighted_median" -> "weighted median: distinct-value cells first, group-partitioned running sum, integer crossing",
    "cdc_compact" -> "log compaction: per-key row_number below the watermark, verbatim tail, one union",
    "a17_pareto_abc" -> "Pareto/ABC: global revenue cumsum via bucketed two-pass (globalCumSum) — no unpartitioned window",
    "j10_market_share" -> "Q8-style 7-table snowflake: every dim chain broadcast, lineitem⨝orders the ONLY shuffle, integer basis-point share",
    "t25_phrase_search" -> "phrase search: postings pruned to query vocab at explode time, positional equi-joins, zero-hit restore via broadcast left join",
    "s14_pca_power" -> "power-iteration PCA: gram-free AᵀAv rounds — in-row compiled dots vs broadcast direction, 64-key shuffles only",
    "c8_curriculum" -> "curriculum stages: t23 scoring reused, bucketed global rank (no single-partition sort), 4-row manifest",
    "ts10_cusum_drift" -> "CUSUM control chart: window over the REDUCED hourly agg (partitioned by type), scaled integer deviations",
    "m7_imageio_decode" -> "ImageIO decode: partition-local byte decode (mapPartitions is the codec boundary), features-only shuffle",
    "j12_advised_join" -> "sketch-advised join: measured salted_shuffle — probe side salted, small build side exploded xsaltFactor",
    "cdc_asof_read" -> "cross-table AS-OF read: one global LSN cut broadcast, per-table last-image apply semantics",
    "s16_ivfpq_topk" -> "IVF+PQ serving stack: cell gate BEFORE the xM code explode, broadcast distance table, raw vectors untouched",
    "j13_ordered_join" -> "sketch-ordered join chain: CMS-estimated most-selective dimension joins first",
    "d13_simhash64_lookup" -> "64-bit SimHash serving lookup: band multiprobe equi-join + in-band Hamming verify, codegen conditional-min argmin",
    "m8_perceptual_dedup" -> "perceptual media dedup: partition-local dHash (pixels reduced map-side), 16-bit pigeonhole band join",
    "m9_audio_dedup" -> "perceptual audio dedup: gain-invariant delta-sign fingerprint, same band-join serving shape",
    "s17_semdedup" -> "SemDeDup keep list: IVF-cell-gated cosine pairs -> CC reps -> broadcast label join (singletons kept)",
    "s18_filtered_ann" -> "filtered vector search: label predicate PUSHED to the candidate scan (pre-filter), engine-sized cell count + probe widening, broadcast cell equi-join",
    "s19_ivf_lloyd" -> "learned-IVF index card: 2-round Lloyd centroids, two-level routed assignment (coarse cross join is sqrt(k)-row broadcast; fine stage an equi-join on the coarse key)",
    "s20_hybrid_rrf" -> "hybrid retrieval: BM25 + cosine arms each TakeOrdered top-50, RRF fusion joins two 50-row lists (no global sort, no sort-merge)",
    "c9_dsir_weights" -> "DSIR importance weights: one-pass 4096-bucket dual histogram, broadcast model join, map-combined per-doc log-ratio sum",
    "s21_coreset" -> "greedy k-center coreset: k linear passes with literal-center compiled dots + TakeOrdered(1) reductions; assignment one LEAST-struct argmin pass, k-group hash agg",
    "dq6_dist_shift" -> "distribution-shift TV report: one tokenize+explode pass to (lang,term) counts, 200-row vocab broadcast, constant |slices|x201 comparison grid",
    "s22_mmr_rerank" -> "MMR diversity rerank: pool via one TakeOrdered top-20 (anchor broadcast, compiled dots); greedy steps over <=20 rows with selected vectors as plan literals",
    "g4_reach" -> "bounded BFS reachability: per-round frontier equi-join + anti-join dedup over checkpointed adjacency (Pregel-as-dataflow), O(depth) output",
    "cdc_pk_change" -> "PK-changing UPDATE apply: normalizeKeyChanges explode (delete(old)+upsert(new), no shuffle added) feeding the shared last-per-key window dedup",
    "t28_ngram_novelty" -> "n-gram novelty: shared shingle derivation, shuffled LEFT-ANTI join on the shingle hash (reference side corpus-sized, nothing broadcast), per-doc hash agg",
    "c10_pack_sequences" -> "sequence packing: two-pass bucket prefix sum (per-bucket windows in parallel + <=64-row offset fold, no single-partition window), bin_id hash agg",
    "cdc_toast" -> "unchanged-TOAST apply: ONE key-shuffle aggregate (max-LSN winner + last-unmarked carry, partial_max BEFORE the exchange) replaces the window dedup on the marked path",
    "cdc_soft_delete" -> "soft-delete convergence: same single key-shuffle aggregate — winner op becomes the _deleted flag, carried non-delete image the data; no delete ever leaves the plan",
    "g5_kcore" -> "k-core peel: 6 rounds of degree hash-agg + two semi-joins over the pinned edge set, all shuffles on the node key, frontier monotonically shrinking",
    "q3_quartiles_cont" -> "continuous quartiles: bracket statistics off the shared histogram passes, integer x4 interpolation — no ordered-set aggregate, no per-group value buffer",
    "t29_html_extract" -> "HTML/boilerplate extraction: compiled regex chain in ONE scan projection (strip/decode/link-density all in codegen), no shuffle before the output sort",
    "t30_url_canonical" -> "URL canonicalization: regex part extraction + filter/sort HOF over query params, all in one scan projection — crawl stage 0 rides the ingest scan",
    "d14_url_dedup" -> "URL-exact dedup: ONE hash-groupBy on the canonical form (map-side partial agg), nothing pairwise — the cheap dedup that runs before any content op",
    "d15_domain_gate" -> "per-domain rollup + blocklist gate: two-level hash agg (countDistinct planned as two exchanges on |urls| then |domains|), gate logic in-row",
    "t31_gopher_repetition" -> "Gopher top-n-gram char share: ONE compiled per-doc reducer (top_grams) riding the scan projection, 3-element inline for the (doc,n) grain - no gram explode, no aggregate, zero exchanges before the output sort",
    "t32_gopher_dup_fractions" -> "Gopher duplicate-fraction suite: three compiled per-doc reducers (dup_gram_chars n=5..10, dup_elem_stats over lines and paragraphs) in one scan projection over the synthetic page - no Generate, no aggregate, zero exchanges before the sort",
    "c11_line_dedup" -> "cross-doc line dedup: one hash agg whose exchange carries DISTINCT line hashes (in-row array_distinct + partial agg), 1-row broadcast of the common set back into the scan, rebuild in the projection",
    "t33_gopher_quality" -> "Gopher quality rules: two compiled per-doc reducers (alpha_token_count, line_shape_stats) + array_intersect stop-word floor + length-difference symbol counts in one scan projection - no Generate, no aggregate, zero exchanges before the sort",
    "t34_c4_filters" -> "C4 filter suite: one compiled line-retention reducer (c4_keep_lines) + rebuild via array_join + contains/count_in page flags in one scan projection - no Generate, no aggregate, zero exchanges before the sort",
    "c12_span_dedup" -> "C4 three-sentence-span dedup: in-row span hashes (shingle over line folds), one hash agg whose exchange carries (shash, doc, pos), dup set + keepers return via a 1-row broadcast of sorted arrays, occurrence-grain removal and rebuild in the projection",
    "c13_temperature_mix" -> "temperature mixing: per-stratum mass agg (|strata| partial rows), isqrt weights + integer ppm rates in a 1-row-joined frame, rates broadcast back by stratum equi-join, keep decision in-row - the corpus shuffles zero content bytes",
    "t35_ccnet_buckets" -> "CCNet LM bucketing: reference-slice bigram/unigram/vocab counts broadcast (the reference is tiny by definition), corpus bigram stream map-side-joins the model, one per-doc agg, buckets in-row at pinned thresholds - no corpus self-join, no percentile pass",
    "c14_c4_funnel" -> "C4 recipe end-to-end: compiled gate projection (checkpointed once), span-dedup stage (c12's hash-only exchange + 1-row broadcast), one partial-agg count+token reduction per stage, nothing collected",
    "d16_substr_dedup" -> "ExactSubstr dedup: c12's window machinery at token grain - in-row rolling K-token hashes, one hash-only exchange, 1-row broadcast dup set, compiled occurrence-grain removal + rebuild in the projection")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of flagship queries (auto-generated)\n\n")
    sb.append("Regenerate: `sbt \"runMain graft.tools.DumpPlans\"` (sf0.001; plans are\n")
    sb.append("shape-identical at every SF — only statistics change).\n")
    picks.foreach { case (name, why) =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.collect() // finalize AQE so the printed plan is the executed one
      sb.append(s"\n## $name — $why\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(6000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println(s"[plans] wrote PLANS.md (${picks.size} queries)")
    spark.stop()
  }
}
