"""Regenerate EXPLAIN.md: the formatted physical plan of every headline
query (plus a few scale-critical extension queries) at sf0.01, so plan
properties (pushdown, broadcast, exchange count, codegen spans) are
reviewable without running Spark.

Usage::

    python tools/explain_dump.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"

#: headline set + scale-representative extensions
QUERIES = [
    "log_rank_test",
    "qini_uplift_deciles",
    "quantile_regression_grid",
    "conformal_coverage_audit",
    "hits_authorities_top10",
    "shard_rebalance_audit",
    "brier_reliability_bins",
    "diff_in_diff_value",
    "cuped_adjusted_lift",
    "nelson_aalen_hazard",
    "time_decay_attribution",
    "markov_removal_attribution",
    "zonemap_pruning_audit",
    "ndcg_at10",
    "bigram_perplexity_docs",
    "ingest_featurize",
    "cluster_assign_k3",
    "kmedoids_k3",
    "pricing_summary",
    "top_customers",
    "regional_revenue",
    "forecast_revenue",
    "nation_pair_revenue",
    "dedup_exact",
    "dedup_minhash_lsh",
    "embedding_topk",
    "ann_ivf_topk",
    "asof_last_signup",
    "asof_nearest_signup",
    "tumbling_window",
    "interp_linear_minute",
    "dq_audit",
    "mad_outlier_prices",
    "qsketch_value_quantiles",
    "contaminated_ngram",
    "rolling_median_7",
    "full_outer_recon",
    "order_rank_profile",
    "shipping_priority",
    "min_cost_supplier",
    "important_parts",
    "semantic_dedup",
    "ann_recall_at10",
    "dedup_paragraphs",
    "user_value_trend",
    "impute_props_k",
    "incremental_merge_agg",
    "length_band_docs",
    "stable_doc_ids",
    "bfs_hops_simgraph",
    "vocab_oov_rate",
    "scd2_user_state",
    "boilerplate_chunks",
    "rerank_top_docs",
    "contrastive_negatives",
    "null_safe_prop_pairs",
    "event_props_map",
    "event_anomalies",
    "pareto_customers",
    "funnel_strict_3step",
    "typo_pairs",
    "dup_component_sizes",
    "dup_best_survivors",
    "hll_mergeable_rollup",
    "feature_hashing",
    "target_encode_loo",
    "skyline_parts",
    "copurchase_pairs",
    "allocate_order_total",
    "chi2_segment_status",
    "event_type_entropy",
    "grouping_sets_revenue",
    "table_checksum_orders",
    "weighted_median_price",
    "last_touch_attribution",
    "exact_split_strata",
    "nucleus_docs_90",
    "cusum_max_deviation",
    "acf1_daily_value",
    "doc_size_pct_rank",
    "bigram_pmi_top20",
    "twap_user_value",
    "ohlc_hourly_value",
    "benford_totalprice",
    "xml_roundtrip",
    "hll_set_algebra",
    "adamic_adar_topk",
    "random_walks_k3",
    "vocab_encode_docs",
    "mlm_mask_plan",
    "frequent_triples",
    "weighted_sample_orders_es",
    "inverted_index_top100",
    "token_budget_docs",
    "embedding_covariance",
    "vocab_coverage_100",
    "qsketch_grain_rollup",
    "skipgram_pairs_top",
    "bigram_coverage_score",
    "trigram_novelty",
    "phrase_match_docs",
    "knn_graph_top3",
    "bigram_lm_order",
    "lang_id_trigram_acc",
    "ppr_seeded",
    "assoc_rules_top",
    "source_overlap_matrix",
    "compaction_plan",
    "ivf_recall_curve",
    "qsketch_error_audit",
    "trending_event_types",
    "label_scatter_ratio",
    "tokenizer_fertility",
    "graph_diameter_sweep",
    "streaming_tws_peaks",
    "dataset_card",
    "value_moving_avg_30m",
    "containment_pairs",
    "props_variant_deciles",
    "session_path_top10",
    "kfold5_assign",
    "lang_confusion_matrix",
    "events_throttle_1h",
    "minhash_recall_audit",
    "rank_footrule_sparse_dense",
    "int8_recall_audit",
    "join_strategy_advisor",
    "permutation_test_value",
    "cdc_latest_state",
    "byte_char_density",
    "hard_negatives_cells",
    "span_corruption_plan",
    "daily_top3_types",
    "label_maxsim_rank",
    "segment_trend_slope",
    "quantile_normalize_doclen",
    "fd_violation_audit",
    "embedding_drift_l1",
    "k_anonymity_audit",
    "randomized_response_segments",
    "ivf_cell_balance",
    "retrieval_mrr_at10",
    "incremental_dedup_new",
    "doc_survivor_remap",
    "ingest_quarantine_report",
    "streaming_qsketch",
    "orderkey_gap_audit",
    "bot_regularity_audit",
    "burst_users_10min",
    "degree_assortativity",
    "supplier_order_reach",
    "part_return_rate_shrunk",
    "repurchase_cycle_days",
    "markov_stationary_events",
    "corpus_merkle_roots",
    "gdpr_delete_impact",
    "schema_evolution_roundtrip",
    "dedup_method_agreement",
    "selectivity_estimate_audit",
    "changepoint_day",
    "top_revenue_days_ties",
    "dup_payment_pairs",
    "dau_wau_stickiness",
    "abc_parts_classification",
    "new_vs_returning_monthly",
    "part_substitutes",
    "fill_days_quantiles",
    "embedding_isotropy_audit",
    "session_bounce_rate",
    "zipf_slope_tokens",
    "token_entropy",
    "dedup_bag_fingerprint",
    "supplier_peer_percentile",
    "ks_value_drift",
    "score_auc_audit",
    "rfm_segments",
    "gini_customer_revenue",
    "hhi_supplier_nation",
    "dedup_prefix_fp",
    "curriculum_buckets",
    "rolling_7d_distinct_users",
    "cross_doc_repetition",
    "welch_t_value",
    "orders_backlog_daily",
    "weekday_value_index",
    "corpus_dedup_inflation",
    "fixed_width_roundtrip",
    "orders_except_all",
    "interleave_schedule",
    "user_active_streaks",
    "fk_orphan_audit",
    "hapax_ratio_source",
    "value_quintile_migration",
    "nation_share_of_region",
    "winsorized_mean_value",
    "mann_kendall_daily",
    "value_bin_purchase_rate",
    "mi_type_valuebin",
    "bootstrap_mean_value",
    "sentence_stats_source",
    "lorenz_deciles",
    "dynamic_partition_overwrite",
    "event_type_corr_matrix",
    "value_overdispersion",
    "psi_value_drift",
    "signup_to_purchase_latency",
    "linear_attribution",
    "group_kfold_sources",
    "out_of_order_lag",
    "km_repurchase_survival",
    "kmv_distinct_users",
    "theil_sen_daily",
    "churn_rate_weekly",
    "calendar_fill_daily",
    "label_centroid_affinity",
    "cohort_ltv_curve",
    "mom_revenue_growth",
    "open_order_aging",
    "obt_export_checksum",
    "lang_id_kappa",
    "revenue_waterfall_monthly",
    "embedding_standardize",
    "hill_tail_index",
    "join_key_skew_profile",
    "topk_stability_bootstrap",
    "active_learning_margin",
    "lang_label_conflicts",
    "value_quartiles_by_type",
    "dedup_survivor_length_bias",
    "month_of_year_index",
    "first_order_vs_ltv",
    "heaps_law_curve",
    "discount_qty_response",
    "balanced_downsample_labels",
]


def main() -> int:
    from pyspark.sql import SparkSession

    from mapreduce6240project_spark.plans import REGISTRY

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("explain-dump")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# EXPLAIN — formatted physical plans (auto-generated)\n",
        "Regenerate with `python tools/explain_dump.py`. Plans are built",
        f"against `{SF}` with AQE initial plans (before runtime",
        "re-optimization); Exchange/Broadcast/PushedFilters lines are the",
        "review surface. Plan-shape regressions are separately asserted in",
        "`tests/test_plans.py`.\n",
    ]
    for name in QUERIES:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        df = spec.fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"\n## {name}\n")
        out.append(f"_{spec.ref}_\n")
        out.append("```\n" + plan.rstrip() + "\n```\n")
        print(f"dumped {name}")
    with open("/root/repo/EXPLAIN.md", "w") as f:
        f.write("\n".join(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
