"""Results must not depend on the shuffle layout: the same query under a
different spark.sql.shuffle.partitions must produce identical rows. This is
the local stand-in for 'would a 1000-executor layout change the answer' —
order-dependent double accumulation, partition-sensitive collect_list use,
or salt-dependent logic would all surface here."""

from __future__ import annotations

import pytest

from metas_judiciarias_etl_spark import registry

registry.load_all()

# slowparity: each of ~190 queries runs under TWO shuffle layouts — the
# second-largest block of the suite. The flagship three-layout class below
# stays in the fast gate (cold-driver-sample insurance must always run).


QUERIES = [
    "q6_forecast_revenue",      # decimal money sum
    "skew_salted_agg",          # two-phase salted aggregation
    "funnel_conversion",        # per-user window sequencing
    "dedup_minhash_lsh",        # bucketed candidate generation
    "text_repetition",          # double ratios from grouped counts
    "graph_triangle_count",     # multi-join graph shape
    "entropy_fold",             # ordered float fold (sorted, seeded)
    "corr_exact",               # moments from exact DECIMAL sums
    "time_weighted_avg",        # DECIMAL cents x interval accumulation
    "weighted_sample_topk",     # hash-priority ranking
    "skyline_dominance",        # local-then-global dominance passes
    "ohlc_bars",                # struct min/max open/close selection
    "pq_code_histogram",        # struct-min argmin vs broadcast codebook
    "sim_l2_topk_pq",           # ordered ADC fold + top-k ranking
    "spatial_grid_join",        # 3x3 cell candidate generation
    "skew_salted_join",         # salt spread + re-merge
    # round 3 additions
    "emb_centroids",            # fixed-point integer-sum means
    "sim_l2_topk_ivfpq",        # cell argmin + ADC fold + top-k ranking
    "bpe_merge_steps",          # iterative top-pair selection per step
    "mad_robust_outliers",      # interpolated medians + boundary compares
    "knn_classify",             # majority vote with struct-min tie-break
    "text_perplexity_bigram",   # sorted ln-term folds per doc
    "nearest_centroid_confusion",  # dim-sorted distance folds + argmin
    "prep_pipeline_v2",         # gates + keeper window + split composition
    "asof_join_tolerance",      # running last(ignorenulls) + staleness cap
    "rolling_active_users",     # explode-to-window distinct counting
    "funnel_three_step",        # chained qualified-predecessor windows
    "scd2_as_of",               # data-derived T + interval containment
    "dedup_incremental_ingest", # batch-vs-history hash probes
    "dedup_cluster_sizes",      # CC loop + size rollup
    "mm_frame_dedup",           # digest-keyed frame dedup
    "approx_percentile_by_key", # sketch-vs-exact rank-band contract
    "graph_degree_distribution",  # edge build + degree rollup
    "text_lang_confusion",      # composed classifier rollup
    # round 4 additions
    "ewma_halflife",            # windowed tail + power-of-two weighted sum
    "bitmap_distinct_users",    # bit_or word accumulation across layouts
    "compaction_bins",          # per-source prefix-sum packing
    "cms_heavy_hitters",        # sketch bucket sums + top-k tie-break
    "chisq_independence",       # sorted-order float fold of cell terms
    "graph_kcore_peel",         # iterative degree peeling rounds
    "text_inverted_index",      # sorted posting-list serialization
    "text_phrase_search",       # positional join
    "mm_scene_cuts",            # Arrow frame sums + lag window
    "stream_static_enrich",     # broadcast dim join + windowed agg
    "winsorized_stats",         # rank-based bounds + broadcast clamp
    "key_skew_hhi",             # DECIMAL sum of squares
    "ri_orphan_audit",          # triple anti-join counts
    "period_over_period",       # monthly rollup + lag ratio
    "window_cume_dist_nth",     # distribution windows with tie-breaks
    "array_set_ops",            # map-only collection expressions
    # profiling & affinity batch
    "dq_column_profile",        # Expand-based multi-column exact distinct
    "basket_pair_counts",       # co-keyed self-join pairs + top-k tie-break
    "interval_coverage",        # island-id prefix sum over tied timestamps
    "path_trigrams",            # two leads sharing one partition sort
    "attribution_last_touch",   # running last(ignorenulls) touch carry
    "vocab_coverage",           # global rank boundary + conditional sums
    "token_df_spectrum",        # two-level distinct + integer banding
    "graph_label_propagation",  # iterative majority vote, min-label ties
    "histogram_equi_depth",     # interpolated quantile boundary compares
    "emb_outlier_zscore",       # fixed-point integer moments + 3-sigma gate
    "sim_rank_fusion_rrf",      # two-list RRF sum + fused-rank tie-break
    "dedup_source_matrix",      # composed LSH pairs + canonicalized cells
    "sim_label_margin",         # composed top-k + conditional max margins
    "source_vocab_overlap",     # vocab-scale pair join + exact-int jaccard
    "customer_rfm_segments",    # interpolated quartile scores, 3 metrics
    "cycle_time_percentiles",   # integer-day interpolated percentiles
    "text_novelty_ratio",       # min-doc first-appearance + ratio
    "events_dow_hour_profile",  # integer epoch dow/hour + distinct users
    "rolling_median_smooth",    # centered exact median frames
    "basket_association_rules", # support filter + broadcast df/lift math
    "purchase_gap_survival",    # ccdf running sums over day histogram
    "graph_link_prediction",    # wedge candidates + anti-join + jaccard
    "mm_audio_quiet_segments",  # Arrow RMS + integer-run islands
    "markov_stationary",        # unrolled power iteration, sorted folds
    "emb_pca_top_component",    # covariance folds + normalized iteration
    # round 4: sketch scale-mode twins + state accounting
    "percentile_agg_approx",        # GK sketch vs exact rank bands
    "histogram_equi_depth_approx",  # sketch boundaries + mass tolerance
    "customer_rfm_segments_approx", # sketch quartiles + conservation
    "cycle_time_percentiles_approx",  # sketch p50/p90 rank bands
    "mad_robust_outliers_approx",   # sketch median/MAD rank bands
    "stream_state_keys_profile",    # state-key cardinality rollup
    "bloom_semi_join_prune",        # integer bit algebra, layout-free
    "data_skipping_zonemap",        # zone metadata + soundness witness
    "dedup_prefix_filter_jaccard",  # rare-first prefix candidates, exact
    "graph_hits_scores",            # quantized integer HITS iteration
    "split_leakage_check",          # composed LSH pairs x hash splits
    "quality_token_histogram",      # composed quality/token bins + window
    "source_mixture_weights",       # integer token shares + broadcast tot
    "event_pattern_match",          # shared-frame carried windows
    "dq_benford_first_digit",       # string digit extraction + 9-key agg
    "seasonal_decompose_monthly",   # integer-deferred STL-lite components
    "ivf_cell_balance",             # deterministic cell argmax + counts
    "join_cardinality_estimate",    # per-key counts + closed-form est
    "hll_partitioned_merge",        # sketch union-merge, bounded error
    "dedup_cluster_keeper_quality", # CC labels x quality struct-min
    "variant_typed_extract",        # parse-once VARIANT typed rollup
    "dedup_simhash_hamming1",       # multi-index probe keys, exact radius
    "null_safe_join_semantics",     # 3VL join contract, integer counts
    "zorder_skipping_effectiveness",  # integer zone maps, two layouts
    "mor_positional_delete_apply",  # per-file positions + anti-join
    "emb_drift_by_split",           # fixed-point half-centroids + fold
    # round-4 continuation
    "gini_concentration",           # per-nation rank sums, integer cents
    "ks_two_sample",                # integer ECDF supremum
    "jackknife_bucket_ci",          # bucket-sorted pseudo-value folds
    "graph_bfs_distance",           # unrolled frontier expansion
    "text_collocation_pmi",         # exact-rational lift + top-k ties
    "dedup_lsh_recall",             # composed pair pipelines + semi join
    "cow_write_amplification",      # file-keyed integer accounting
    "graph_modularity",             # composed LPA labels + integer terms
    "emb_int8_quantize",            # map-only floor quantization
    "events_user_burstiness",       # integer moment rational
    "quality_dup_pointbiserial",    # composed quality x CC flag moments
    "text_zipf_slope",              # rank-ordered ln folds over top-V
    "sim_cosine_topk_prefix",       # prefix-dim fold + tie-broken top-k
    "sim_prefix_rerank",            # shortlist window + full-dim rerank
    "events_burst_collapse",        # per-key lag gaps, integer nanos
    "neyman_allocation",            # stratum moments + sorted fold
    "sim_cosine_topk_int8",         # dequantized fold + tie-broken top-k
    "dq_freshness_lag",             # integer max-lag accounting
    "boilerplate_chunks",           # chunk hash census + top-k ties
    "seasonal_residual_anomaly",    # calendar-sorted residual folds
    "sim_ivf_nprobe_curve",         # shared index + exact hit counting
    "dedup_lsh_band_sweep",         # re-banded buckets + hashed verify
    "ab_test_proportions",          # four-integer-cell z statistic
    "dedup_clusters_incremental",   # contraction merge == full recompute
    "bpe_compression_curve",        # per-state symbol counts, cached states
    "quality_gate_sweep",           # conditional integer sums, one pass
    "theil_sen_trend",              # bounded pairwise-slope median selection
    "dedup_minhash_estimate_error", # signature-agreement integer counts
    "decontam_ngram_size_curve",    # per-K broadcast probes, distinct counts
    "survival_kaplan_meier",        # duration-ordered cumulative ln window
    "survival_logrank_test",        # per-time rational terms, sorted folds
    "text_token_drift_chi2",        # top-V cells, sorted term fold
    "contrastive_negative_audit",   # hash-positional draws, exact counts
    "item_cooccurrence_cosine",     # degree-normalized pair score + top-k
    "kmeans_lloyd_iteration",       # argmin assignment + fxp update + obj
    "cohort_ltv_curve",             # cohort-partitioned integer cumsums
    "graph_degree_assortativity",   # DECIMAL edge-endpoint moments
    "monthly_return_rate_wilson",   # closed-form bounds on integer cells
    "mann_whitney_u",               # integer 2R1 rank sums over support
    "daily_count_control_chart",    # integer day moments + pinned limits
    "text_readability",             # map-only regex counts, pinned score
    "emb_covariance_offdiag_mass",  # integer covariance numerators, DECIMAL mass
    "dq_order_lineitem_reconcile",  # co-keyed money reconciliation, int diffs
    "spearman_rank_corr",           # integer 2-rank moments in DECIMAL
    "attribution_position_weighted",  # grid-quantized credit integer sums
    "emb_fisher_ratio",             # per-class integer scatter identities
    "prep_pipeline_v3",             # six composed gates, one plan
    "roc_auc_exact",                # integer 2R1 over score support
    "pr_auc_average_precision",     # pinned total order + sorted fold
    "score_calibration_bins",       # integer bin moments, DECIMAL squares
    "anova_oneway_f",               # sorted-source fold of group terms
    "kruskal_wallis",               # integer 2R_g sums + sorted fold
    "poisson_bootstrap_ci",         # hash-derived weights, 65-long agg state
    "sim_ndcg_ivf",                 # dyadic-exact graded ranking sums
    "emb_hubness",                  # bucketed kNN in-degrees + moments
    "ols_two_feature",              # DECIMAL moments + pinned Cramer tree
    "bh_fdr_token_drift",           # grid-quantized p-values + step-up
    "kendall_tau_b",                # cell-pair concordance integer sums
    "score_quantile_normalize",     # integer rank map, selection only
    "graph_weighted_sssp",          # integer relaxation rounds
    "knn_label_noise",              # bucketed kNN votes + struct-min
    "seasonal_fourier_fit",         # literal trig tables + DECIMAL moments
    "markov_transition_gini",       # integer transition squares
    "er_match_weights",             # loose-band candidates + exact tallies
    "bm25_topk",                    # ratio idf + fixed-order 3-term sum
    "er_pattern_precision",         # 8-pattern rollup + broadcast tally
    "dataset_card_by_source",       # exact tallies + single divisions
    "k_anonymity_audit",            # QI-class tallies, integer
    "vocab_growth_curve",           # first-source shingle attribution
    "sim_mmr_diverse_topk",         # rounded cosines + greedy argmax
    "emb_silhouette_by_label",      # quantized distance means
    "brier_decomposition",          # grid-quantized bin terms
    "crosssource_backoff_score",    # LOO integer counts, grid mean
    "attribution_markov_removal",   # integer-grid value iteration
    "cuped_adjustment",             # DECIMAL moments, pinned closed form
    "conformal_interval_calibration", # integer residual selection
    "graph_conductance",            # integer cut/volume counts
    "source_temperature_mix",       # sorted sqrt fold over sources
    "fd_candidate_audit",           # integer fan-out tallies
    "dedup_simhash_recall",         # exact pair-set intersection
    "mm_image_histogram",           # per-row codec, integer bins
    "global_rank_two_phase",        # bucket offsets + local windows
    "f1_optimal_threshold",         # integer cumulative sweep
    "diff_in_diff",                 # 4-cell integer means
    "ab_test_power_mde",            # DECIMAL moments + literal z
    "sampled_sum_estimate",         # hash-Bernoulli HT + DECIMAL moments
    "lang_agreement_ari",           # integer pair combinatorics, 1 division
    "lang_agreement_nmi",           # sorted entropy folds over <=20 cells
    "l_diversity_audit",            # exact distinct-count class tallies
    "sim_mrr_ivf",                  # integer ranks on the 2520 grid
    "score_psi_drift",              # sorted 10-bin smoothed-share folds
    "dist_js_divergence",           # sorted type-fold, integer cohort counts
    "dedup_repeated_substrings",    # exact window counts, 1 division
    "sim_rbo_overlap",              # integer suffix weights, 1 division
    "attribution_shapley",          # 1/12-grid integer credit sums
    "delta_method_ratio_ci",        # DECIMAL moments, pinned chains
    "sprt_sequential_test",         # 2^32-grid integer log-LR
    "empirical_bayes_rates",        # sorted source-rate folds
    "feature_mi_ranking",           # sorted entropy folds per feature
    "tokenizer_fertility_by_lang",  # exact integer tallies, 2 divisions
    "decontam_embedding_cosine",    # integer counts, 4-dp rounded cosines
    "group_sequential_looks",       # exact cells, pinned z chain
    "stratified_standardization",   # exact cells, pinned quotient products
    "ab_srm_check",                 # exact counts, gridded erfc p-value
    "forecast_backtest_naive",      # exact integer errors, 2 divisions
    "uplift_qini_deciles",          # integer cells, pinned quotient chains
    "yuen_trimmed_ttest",           # rank trims, DECIMAL winsorized moments
    "stream_join_state_peak",       # integer sweep-line running sums
    "median_order_ci",              # rank selections, z literal + IEEE sqrt
    "tail_index_hill",              # sorted ln-ratio folds over top-k
    "covariate_balance_smd",        # DECIMAL moments, pinned SMD chains
    "bm25_prf_terms",               # integer tallies, total-order ranking
    "partial_correlation",          # nine DECIMAL moments, pinned chains
    "decision_stump_split",         # exact-rational Gini argmin
    "cohens_kappa_langid",          # integer chance numerator, 1 division
    "ab_tost_equivalence",          # exact cells, pinned band booleans
    "dynamic_gap_sessions",         # integer-microsecond interval merges
    "source_shingle_overlap_hll",   # exact pair cells + own-sketch flags
    "dedup_detector_ensemble",      # pure integer set algebra
    "loso_source_influence",        # closed-form group-total algebra
    "pinball_loss_eval",            # x10-grid integer loss sums
    "ips_policy_replay",            # exact match/reward cells
    "heavy_hitter_drift",           # total-order leaderboards, int gains
    "holm_fwer_token_drift",        # composed gridded p, integer cum-min
    "sim_norm_effect_rbo",          # integer suffix weights, 1 division
    "calibration_ece",              # sorted bin-gap fold, order-free max
    "lorenz_curve_deciles",         # integer cumulative decile cells
    "popularity_baseline_hitrate",  # exact split/frontier/flag integers
    "atkinson_index",               # gridded-ln integer sums (fxp log-mean)
    # round 5: distribution-shift completion pack
    "dist_wasserstein1",            # integer ECDF-gap area, 1 division
    "cvm_two_sample",               # integer squared-gap sum, 1 division
    "mann_kendall_trend",           # day-bounded sgn pairs, exact var18
    "cramers_v_assoc",              # sorted chi2 fold + sqrt normalization
    "dedup_containment_asymmetric", # asymmetric prefix candidates, exact
    "er_blocking_quality",          # integer pair counts, pinned divisions
    "calibration_isotonic_pav",     # bounded minimax over exact prefix rates
    "privacy_t_closeness",          # integer TV numerators over class grid
    "packing_waste_curve",          # shared window + integer ceil-div packs
    "incremental_join_delta",       # exact counts/cents across 4 key joins
    "heaps_law_fit",                # sorted ln-ln OLS folds over the curve
    "deletion_cascade_audit",       # FK-cascade semi-join integer counts
    "krippendorff_alpha_nominal",   # pooled-marginal integer coincidences
    "source_budget_allocation",     # exact-int ranking + prefix-sum clamp
    "dedup_containment_minhash_error",  # integer signature-agree divisions
    "hierarchy_rollup_recursive",   # native WITH RECURSIVE, integer chain
    "hodges_lehmann_location",      # integer Walsh sums, median selection
    "emb_effective_rank",           # integer covariance trace / square sums
    # round 6: DP accounting, eval metrics, scrub budgeting, CDC dedup
    "privacy_dp_sensitivity_audit", # two-level integer user tallies
    "eval_pass_at_k",               # factor-chain estimator, sorted task fold
    "pii_scrub_loss_stats",         # exact char accounting per source
    "dedup_cdc_chunks",             # content-anchored boundaries, hash census
    "text_dedup_onion",             # layered keeper flags + cluster join
    "sim_pq_distortion",            # argmin distances on the 1e-6 grid
    "dedup_truth_sample_estimate",  # hash-keyed sample, exact counts
]


def _rows(spark, name, sf, n_parts):
    from metas_judiciarias_etl_spark import memo

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        # drop shared-intermediate memos: a hit would replay the FIRST
        # layout's cached rows and make this comparison vacuous for every
        # query composing a memoized root
        memo.clear(spark)
        return sorted(map(tuple, registry.QUERIES[name](spark, sf).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        memo.clear(spark)


@pytest.mark.slowparity
@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_shuffle_layout(name, spark, sf_small):
    assert _rows(spark, name, sf_small, 5) == _rows(spark, name, sf_small, 32)


# The queries a cold driver sample must never flake on: the reference's
# flagship pipeline, its chart/consolidado companions, the deepest composed
# prep pipeline, and the batch twins of the streaming windows (the one
# place first()-style tie-breaks could still differ across layouts, e.g.
# session merges at equal timestamps). Three layouts, including the
# degenerate single-partition one — on a 1000-executor cluster the planner
# may pick any of these shapes (VERDICT r4 item 6).
FLAGSHIP = [
    "metas_resumo_pipeline",
    "metas_consolidado",
    "metas_chart_ranking",
    "prep_pipeline_v3",
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup_earliest",
    "dynamic_gap_sessions",
]


@pytest.mark.parametrize("name", FLAGSHIP)
def test_flagship_invariant_under_three_layouts(name, spark, sf_small):
    a = _rows(spark, name, sf_small, 1)
    b = _rows(spark, name, sf_small, 7)
    c = _rows(spark, name, sf_small, 32)
    assert a == b == c
