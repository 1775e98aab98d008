"""Query registry: every implemented operator exposed as a named query
with (where SQL-expressible) a DuckDB oracle.

Wave modules are imported defensively so a single bad import cannot zero
out the whole driver contract surface: each module registers its queries
on import, and a failure in one leaves every other module's entries
intact (with a loud warning, so the regression is visible in logs).

After registration the registry is reordered so the external driver's
fixed verification budget (it checks queries in dict order) is spent
where it buys the most signal: the flagship/parity surface first, then
operator families that have never had a driver verdict, and
already-verified queries last.
"""

from __future__ import annotations

import warnings

from mapreduce6240project_spark.plans.registry import REGISTRY, QuerySpec

for _mod in (
    "extensions",
    "parity",
    "relational",
    "text_corpus",
    "retrieval",
    "vectors_ext",
    "graph_ext",
    "dedup_ext",
    "sketch_ext",
    "tpch_analytics",
    "stats_drift",
    "curation_ext",
    "engineering",
    "streaming_ext",
    "behavior",
):
    try:
        __import__(f"mapreduce6240project_spark.plans.{_mod}")
    except Exception as exc:  # pragma: no cover - regression guard
        warnings.warn(
            f"plans.{_mod} failed to import; its queries are unregistered: {exc!r}",
            RuntimeWarning,
            stacklevel=1,
        )

#: The driver verifies queries in dict order with a bounded budget
#: (50 per round).  Round-5 rotation (r4 verdict item 3): rounds 2-4
#: hard-verified 127 distinct queries (CORRECTNESS_r02/r03/r04); this
#: round front-loads 50 never-driver-checked, oracle-backed queries
#: from the families with the LEAST external signal -- vectors_ext,
#: curation_ext, text_corpus deep cuts, relational edge cases, plus
#: proportional draws from tpch_analytics / engineering / stats /
#: retrieval / dedup / behavior.  Previously-verified queries and
#: everything else keep their registration order at the tail -- the
#: reorder can never lose an entry (guarded by
#: tests/test_registry_guard.py); cumulative external coverage is
#: tracked in COVERAGE.md (tools/coverage_ledger.py).
DRIVER_ORDER: tuple[str, ...] = (
    # -- round-5 additions: brand-new code has the least signal of
    #    all, so it heads the window; the 14 entries push the tail 14
    #    of the original 50 to the front of the round-6 queue --
    "er_match_clusters",
    "er_golden_records",
    "er_block_skew_audit",
    "k_anonymity_risk_summary",
    "l_diversity_audit",
    "dp_contribution_bound",
    "oof_target_encode",
    "encoding_advisor",
    "feature_hash_collision_audit",
    "pk_uniqueness_audit",
    "value_set_conformance",
    "cross_field_consistency",
    "streaming_dedup_bounded_state",
    "cogroup_ks_by_type",
    # -- vectors_ext --
    "promo_revenue_ratio",
    "small_qty_revenue",
    "large_orders",
    "disjunctive_parts_revenue",
    "idle_rich_customers",
    "source_cap_50",
    "training_shards",
    "token_frequency_score",
    # -- curation_ext --
    "split_counts",
    "bigram_top20",
    "customers_no_orders",
    "discount_suppliers_semi",
    "customer_order_profile",
    "corr_by_returnflag",
    "acctbal_deciles",
    "value_histogram",
    # -- text_corpus deep cuts --
    "doc_size_pct_rank",
    "bigram_pmi_top20",
    "vocab_encode_docs",
    "mlm_mask_plan",
    "bpe_merges_10",
    "embedding_covariance",
    "vocab_coverage_100",
    "skipgram_pairs_top",
    # -- relational edge cases --
    "distinct_users",
    "kmedoids_elbow",
    "embedding_pairs_exact",
    "brand_revenue",
    "supplier_nation_stats",
    "user_running_value",
    # -- tpch_analytics --
    "forecast_revenue",
    "nation_pair_revenue",
    "market_share",
    "returned_item_customers",
    "customer_distribution",
    "sole_supplier_orders",
    # -- engineering --
    "weighted_sample_by_status",
    "temperature_resample_langs",
    "mmr_select_diverse",
    "unpivot_part_metrics",
    # -- stats_drift --
    "permutation_test_value",
    "quantile_normalize_doclen",
    "changepoint_day",
    # -- retrieval --
    "bm25_top_docs",
    "rrf_fuse_topk",
    "jaccard_prefix_pairs",
    # -- dedup_ext --
    "typo_pairs",
    "dup_component_sizes",
    # -- behavior --
    "retention_cohorts",
    "session_transitions",
)

_ordered: dict[str, QuerySpec] = {}
for _name in DRIVER_ORDER:
    if _name in REGISTRY:
        _ordered[_name] = REGISTRY[_name]
for _name, _spec in REGISTRY.items():
    _ordered.setdefault(_name, _spec)
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "DRIVER_ORDER"]
