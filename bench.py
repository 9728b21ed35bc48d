#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Headline set: the standardize_title pipeline (the reference's whole
surface) + representative relational / dedup / similarity queries.  Each
query is fully materialized via a count-collect so the measured time is
end-to-end execution, not lazy-plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The full declared surface is benchmarked; this subset is just the
# "headline" grouping reported first.
HEADLINE = [
    "std_titles",
    "std_category_counts",
    "std_documents_throughput",
    "std_documents_scale_form",
    # streaming early: state-store commit latency is sensitive to session
    # memory pressure, so measure on a clean session
    "stream_tumbling_counts",
    "stream_sessionize_stateful",
    "stream_join_click_purchase",
    "rel_agg_pricing_summary",
    "rel_join_3way",
    "rel_join_q5_shape",
    "rel_window_rank",
    "rel_tumbling_window",
    "rel_asof_join",
    "rel_range_join",
    "rel_percentiles",
    "x_hash_split",
    "x_dedup_exact",
    "x_minhash_signature",
    "x_near_dup_clusters",
    "x_simhash_clusters",
    "x_fingerprint_rolling",
    "x_lang_id",
    "x_knn_bruteforce",
    "x_ann_lsh_topk",
    "x_embed_near_dup",
    "x_token_stats",
    "x_bpe_token_count",
    "x_multimodal_meta",
    "x_fuzzy_match_tfidf",
    "x_connected_components",
    "x_udtf_sentences",
    "x_udaf_sumsq",
    "x_ann_ivf_topk",
]

# Round-3 flagships, timed identically but reported OUTSIDE the headline
# total so `value` stays comparable across rounds (BASELINE.md round-2
# note: the headline set is frozen at the same 33 queries).
EXTRA = [
    "x_decontaminate_ngrams",
    "x_pii_redact",
    "x_domain_mix_weights",
    "x_gram_census_dual",
    "x_substring_dup_rolling",
    "x_substring_dup_dual",
    "x_incremental_dedup",
    "src_python_datasource",
    # round-4 flagships
    "x_semantic_dedup_scaled",
    "x_bm25_topk",
    "x_winnow_fingerprints",
    "x_gopher_rules",
    "x_tokenizer_fertility",
    "x_hybrid_rrf",
    "x_lm_perplexity_filter",
    "x_lsh_blocking_eval",
    "x_skew_diagnosis",
    "x_zorder_layout",
    "x_anomaly_windows",
    "stream_anomaly_baseline",
    "x_join_size_forecast",
    "src_python_stream_source",
    "src_python_stream_partitioned",
    "x_kmv_sketch",
    "x_funnel_steps",
    "x_retention_cohorts",
    "x_markov_transitions",
    "x_scd2_intervals",
    "rel_pivot_status_priority",
    "rel_cube_agg",
    "x_stratified_topn",
    "x_mixture_planner",
    "x_clustering_coefficient",
    "stream_left_outer_join",
    "stream_foreachbatch_upsert",
    "x_sorted_neighborhood",
    "x_ks_drift",
    "rel_recursive_cte",
    "x_copurchase_pairs",
    "rel_variant_shred",
    "rel_sql_udf",
    "x_quantile_bins",
    "x_keyness_by_source",
    "x_ab_test_proportions",
    "x_seasonal_naive_eval",
    "x_containment_dup_reduced",
    "x_vocab_coverage",
    "x_table_profile",
    "rel_correlated_scalar",
    "x_k_anonymity",
    "x_lineage_manifest",
    "x_snapshot_diff",
    "x_l_diversity",
    # round-5 flagships
    "x_winnow_coarse_rolling",
    "rel_recursive_cycle_walk",
    "x_boilerplate_ngrams",
    "x_bpe_merge_step",
    "x_t_closeness",
    "x_countmin_sketch",
    "x_linear_quality_scorer",
    "stream_full_outer_join",
    "stream_dedup_within_watermark",
    "x_matryoshka_recall",
    "rel_window_suite",
    "x_bpe_train",
    "x_hll_sketch",
    "stream_countmin_cells",
    "x_source_quality_report",
    "x_bpe_apply",
    "x_k_anonymity_repair",
    "stream_hll_cells",
    "x_negative_sampling",
    "x_training_shards",
    "x_watermark_greenlist",
    "x_preference_pairs",
    "x_inbatch_collision_audit",
    "x_ablation_manifest",
    "x_multimodal_real_decode",
    "x_multimodal_real_resize",
    "x_ewma_volume_dense",
    "x_multimodal_jpeg_decode",
    "x_ann_lsh_scaled",
    "x_ann_recall_scaled",
    "x_ann_ivf_scaled",
    "x_ann_ivf_certified",
    "x_ann_ivf_scaled_certified",
    "x_multimodal_png_decode",
    "x_sequence_packing_sharded",
    "x_grpo_advantages",
    "x_zorder_skipping",
    "x_mmr_rerank",
    "x_ann_multiprobe_scaled",
    "x_multimodal_gif_decode",
    "src_webdataset_shards",
    "src_tfrecord_roundtrip",
    # round-7 flagships
    "x_multimodal_mp4_meta",
    "x_multimodal_mp3_meta",
    "x_media_curation_report",
    "x_bloom_semijoin_prune",
    "stream_bloom_words",
    "x_skyline_pareto",
    "x_copurchase_census",
    "x_kcore_peel",
    "x_hll_rollup",
    "x_ivm_agg_merge",
    "x_record_linkage_fs",
    "x_kmv_set_ops",
    "x_layout_skipping_faceoff",
    "x_phrase_search",
    "x_cdc_replay",
    "x_setsim_ppjoin",
    "x_quantile_hist_sketch",
    "stream_kmv_minset",
    "x_dpp_star_join",
    "x_bigram_greedy_decode",
    "x_phonetic_blocking",
    "x_encoding_advisor",
    "x_compaction_planner",
    "x_interval_concurrency",
    "x_bitmap_index",
    "x_merkle_manifest",
    "x_label_propagation",
    "x_cdc_chunking",
    "x_wordpiece_segment",
    "x_postinglist_bytes",
    "x_kcenter_coreset",
    "x_referential_audit",
    "x_textrank_sentences",
    "x_cusum_changepoint",
    "x_gini_split",
    "x_attribution_touch",
    "x_view_selection_greedy",
    "x_colbert_maxsim",
    "x_dbscan_grid",
    "x_join_order_dp",
    "x_symspell_correct",
    "x_graph_feature_prop",
    "x_auc_exact",
    "x_score_calibration",
    "x_stump_confusion",
    "x_bfs_levels",
    "x_cms_topk_precision",
    "x_twap",
    "x_mad_outliers",
    "x_benford_audit",
    "x_fk_discovery",
    "x_selectivity_hist_eval",
    "src_xml_roundtrip",
    "x_rfm_segments",
    "x_abc_classes",
    # round-8 flagships
    "x_multimodal_h264_nals",
    "x_multimodal_aac_adts",
    "x_hits_scores",
    "x_viterbi_decode",
    "x_parquet_footer_stats",
    "x_event_trigram_mining",
    "x_kneser_ney_bigram",
    "x_consistent_hash_ring",
    "x_kendall_tau_metrics",
    "x_perceptron_epochs",
    "x_spec_decode_acceptance",
    "x_haar_event_wavelet",
    # round 9
    "x_ndcg_topk",
    "x_av_curation_report",
    "x_dpo_pairs",
    "x_hard_negative_mining",
    "x_skipgram_cooc",
    "x_dataset_card",
    "x_span_corruption",
    "x_prefix_cache_hits",
    "x_int8_quant_eval",
    "x_ab_srm_check",
    "x_tfexample_parse",
    "x_mrr_eval",
    "x_bleu_ngram_precision",
    "x_audio_qa_gate",
    "x_paged_kv_blocks",
    "x_lang_modularity",
    "x_erasure_manifest",
    # round-10 flagships
    "x_image_dhash_near_dup",
    "x_moe_routing_stats",
    "x_fim_splits",
    "x_preference_cycles",
    "x_zipf_octaves",
    "x_length_curriculum",
    "x_event_lateness_histogram",
    "x_hnsw_layers",
    "x_join_qerror",
    "x_vocab_drift",
    "x_embedding_qa_gate",
    "x_ams_f2_sketch",
    "src_fixedwidth_roundtrip",
    "x_pps_systematic_sample",
    "x_multimodal_curation_manifest",
    "x_rouge_l",
    "x_temperature_mix_weights",
    "x_dedup_agreement_census",
    "x_adaboost_rounds",
    "x_isotonic_calibration",
    "x_seasonal_decompose",
    "x_theil_sen_trend",
    "x_permutation_test_exact",
    # round-11 flagships
    "src_warc_roundtrip",
    "x_hnsw_search",
    "x_inference_queue_wait",
    "x_annotator_kappa",
    "x_generation_loop_detect",
    "x_epoch_shuffle_audit",
    "src_safetensors_manifest",
    "x_needle_depth_manifest",
    "stream_queue_wait",
    "src_avro_roundtrip",
    "x_pass_at_k",
    "x_brier_score",
    "x_heaps_law_checkpoints",
    "x_gini_concentration",
    "x_rake_keywords",
    "x_knn_classifier",
    "x_silhouette_simplified",
    "stream_vocab_arrival",
    "x_spearman_corr",
    # round-12 flagships
    "x_suffix_dup_spans",
    "x_unigram_lm_estep",
    "stream_ann_assign",
    "src_arrow_ipc_roundtrip",
    "x_bradley_terry_mm",
    "x_suffix_dup_extract",
    "x_unigram_segment",
    "x_acf_exact",
    "src_orc_walk",
    "x_binary_embedding_recall",
    "x_doremi_step",
    "x_wilcoxon_signed_rank",
    "x_suffix_dedup_apply",
    "stream_topk_leaderboard",
    "x_loo_source_influence",
    "src_zip_npy_walk",
    "x_unigram_lm_estep2",
    "x_average_precision",
    "x_rbo_rank_overlap",
    "x_tokenizer_faceoff",
    "x_suffix_dup_flow",
    "x_wilson_interval",
    # round 13
    "x_unigram_prune_step",
    "x_unigram_apply_pruned",
    "src_table_log_replay",
    "src_table_log_time_travel",
    "stream_table_log_commits",
    "x_zorder_pruning",
    "x_matryoshka_curve",
    "x_pca_power_iteration",
    "x_ols_trend_fit",
    "src_table_log_checkpoint",
    # round-13 session-2 flagships
    "x_assoc_rules",
    "x_sssp_bellman",
    "x_deepwalk_corpus",
    "src_msgpack_roundtrip",
    "x_node2vec_walks",
    "x_als_user_step",
    "x_vopt_histogram",
    "x_gsp_sequences",
    "x_holt_linear",
    "x_matrix_profile",
    "x_chi2_independence",
    "stream_assoc_pairs",
    "x_shapley_attribution",
    "x_fd_discovery",
    "x_diff_in_diff",
    "x_bootstrap_ci",
    "x_mann_kendall",
    "stream_holt",
    "x_cuped_adjustment",
    "x_conformal_interval",
    "x_graph_diameter_sweep",
    "x_offpolicy_ips",
    "x_psm_att",
    # round 14
    "src_table_log_vacuum",
    "x_priority_sample",
    "x_knn_shapley_value",
    "x_betweenness_seeded",
    "x_markov_removal_effect",
    "x_mutual_best_matching",
    "x_psi_drift",
    "x_regression_discontinuity",
    "x_kaplan_meier",
    "x_cumulative_gains",
    "stream_priority_sample",
    "x_wasserstein_drift",
    "x_ngram_novelty_curve",
    "x_source_entropy",
    "x_calibration_ece",
    "x_ab_power_planning",
    "x_multiclass_f1",
    "x_slo_burn_alerts",
    "x_sprt_sequential",
    "x_rolling_origin_backtest",
    "x_temporal_reachability",
    "x_max_coverage_sources",
    "x_quantile_normalize",
    "x_fairness_audit",
    "x_sequential_halving",
    # round 15
    "x_mutual_best_blocked",
    "stream_psi_drift",
    "x_assortativity",
    "x_louvain_rounds",
    "x_harmonic_centrality",
    "x_team_draft_interleave",
    "x_dsir_weights",
    "x_query_likelihood_lm",
    "x_mann_whitney_u",
    "x_anova_oneway",
    "x_mcnemar_paired",
    "x_naive_bayes_model",
    "x_allen_interval_census",
    "x_good_turing_smoothing",
    "x_katz_centrality",
    "x_link_prediction_topk",
    "x_boruvka_msf",
    "x_seq_pattern_support",
    "x_stable_matching_gs",
    "x_ktruss_peel",
    "x_markov_entropy_rate",
    "x_luby_mis",
    "x_dft_period_power",
    "x_ccf_leadlag",
]


def _burn(_):
    x = 0
    for i in range(20_000_000):
        x += i * i
    return x


def _host_effective_cores() -> float:
    """Measured parallel throughput of the host in 'effective cores':
    n_procs * t(1 proc) / t(n procs) for a fixed CPU-bound burn.  The
    sandbox's advertised CPU count is not a throughput guarantee — the
    same bench run has measured 19.8 s and 40.1 s totals on an
    'idle' 32-vCPU host whose probe swung between ~13 and ~19
    effective cores, with UNIFORM per-query inflation on unchanged
    pure-JVM queries.  Recording the probe with every run lets the
    cross-round comparison divide out host state instead of
    misreading contention as a regression."""
    import multiprocessing as mp

    n = mp.cpu_count()
    t0 = time.time()
    _burn(0)
    t1 = time.time() - t0
    t0 = time.time()
    with mp.Pool(n) as p:
        p.map(_burn, range(n))
    tn = time.time() - t0
    return round(n * t1 / tn, 1)


def main():
    from pyspark.sql import SparkSession

    from duckdb_title_mapper_spark.workload import all_queries

    eff_cores = _host_effective_cores()
    print(f"# host effective cores: {eff_cores}", file=sys.stderr)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("duckdb_title_mapper_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()
    timings: dict[str, float] = {}

    # warm the session + broadcast index once (the reference amortizes its
    # index build across calls via its temp-file cache; same idea).
    import duckdb_title_mapper_spark as engine

    engine.register(spark)
    spark.sql("SELECT standardize_title('warmup query')").collect()
    # warm the Python-datasource worker chain too: the FIRST datasource
    # action in a session pays a one-time planner+worker spawn (measured
    # 3-8 s cold vs ~0.7 s warm) — that cold cost is session startup,
    # not per-query cost, and it was the whole src_python_datasource
    # bench spread in r3 (ADVICE/VERDICT r3 #4).
    from duckdb_title_mapper_spark.sources.pydatasource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    (spark.read.format("synthetic_events").option("n", "32")
     .option("parts", "1").load().count())
    # warm the STREAMING python-datasource chain separately: its first
    # action pays its own one-time spawn (~9 s cold measured r5), on top
    # of which every streaming run keeps a ~3 s micro-batch start/stop
    # constant — the warm-up removes the former so the recorded numbers
    # measure only the latter (a per-run constant, not a data cost)
    _wq = (spark.readStream.format("synthetic_events").option("n", "32")
           .option("batch", "32").load()
           .writeStream.format("memory").queryName("__bench_stream_warm")
           .outputMode("append").start())
    try:
        _wq.processAllAvailable()
    finally:
        _wq.stop()

    # best-of-3, round-robin: machine-load noise on shared hosts swings
    # single runs 3-10x and Catalyst compile cost dominates the cold run;
    # the min is the reproducible cost of the plan itself.  The three
    # repeats run as three full PASSES over the query list (not
    # back-to-back) so one transient load/GC burst cannot poison every
    # repeat of the same query.  The spread (max-min over repeats) is
    # reported per query so the 2x-of-baseline gate can be read against
    # measurement noise instead of flapping on it.
    bench_set = [*HEADLINE, *EXTRA]
    runs: dict[str, list[float]] = {name: [] for name in bench_set}
    rows: dict[str, int] = {}
    for _pass in range(3):
        for name in bench_set:
            q = registry[name]
            t0 = time.time()
            df = q.spark_fn(spark, sf_dir)
            rows[name] = df.count()
            runs[name].append(time.time() - t0)
            # release query-local state (localCheckpoint blocks, SQL
            # cache) so one query's residue doesn't tax the next one
            for r in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                r.unpersist(True)
            spark.catalog.clearCache()
    spreads: dict[str, float] = {}
    extra: dict[str, float] = {}
    for name in bench_set:
        best = round(min(runs[name]), 3)
        (timings if name in HEADLINE else extra)[name] = best
        spreads[name] = round(max(runs[name]) - min(runs[name]), 3)
        print(
            f"# {name}: {rows[name]} rows in {best}s"
            f" (spread {spreads[name]}s)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full detail (per-query rows, spread, extras) goes to a sidecar file
    # + stderr; the driver's tail capture is ~2000 chars, and r3's single
    # fat line (queries + extras + spread) outgrew it (BENCH_r03.json
    # parsed: null — ADVICE r3 #1).  The LAST stdout line stays compact.
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extra_queries": extra,
        "spread": spreads,
        "rows": rows,
        "sf": sf_val,
        "eff_cores": eff_cores,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(json.dumps(detail), file=sys.stderr)

    headline = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "eff_cores": eff_cores,
        # host-throughput-corrected total: identical code measured 19.8 s
        # and 40.1 s across contended windows (SCALING.md), so the raw
        # total alone can flunk a passing engine — value_norm30 rescales
        # to a 30-effective-core host for round-over-round comparison
        "value_norm30": round(total * eff_cores / 30.0, 3),
    }
    line = json.dumps(headline)
    if len(line) > 1800:  # belt-and-braces: never outgrow the tail again
        line = json.dumps({k: headline[k] for k in
                           ("metric", "value", "unit", "sf", "eff_cores",
                            "value_norm30")})
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
