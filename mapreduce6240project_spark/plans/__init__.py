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
    # -- round-6 rotation: rounds 2-5 externally verified 177 distinct
    #    queries (CORRECTNESS_r02..r05).  The window leads with the 14
    #    round-5 DRIVER_ORDER entries the 50-query budget displaced,
    #    then 36 never-checked oracle-backed queries drawn across every
    #    family -- weighted toward the similarity surface whose
    #    NULL-cosine contract changed this round (external signal on
    #    changed code first).  COVERAGE.md tracks the cumulative
    #    ledger; tools/coverage_ledger.py regenerates it per round. --
    # -- round-5 window overflow (never externally checked) --
    "weighted_sample_by_status",
    "temperature_resample_langs",
    "mmr_select_diverse",
    "unpivot_part_metrics",
    "permutation_test_value",
    "quantile_normalize_doclen",
    "changepoint_day",
    "bm25_top_docs",
    "rrf_fuse_topk",
    "jaccard_prefix_pairs",
    "typo_pairs",
    "dup_component_sizes",
    "retention_cohorts",
    "session_transitions",
    # -- similarity family touched by the round-6 NULL-cosine sweep --
    "semantic_dedup",
    "ann_recall_at10",
    "label_centroid_affinity",
    "kcenter_select_8",
    "matryoshka_recall16",
    "knn_graph_top3",
    "label_maxsim_rank",
    "retrieval_mrr_at10",
    # -- text_corpus deep cuts --
    "lorenz_deciles",
    "zipf_slope_tokens",
    "bigram_lm_order",
    # -- retrieval --
    "rerank_top_docs",
    "inverted_index_top100",
    # -- tpch_analytics --
    "shipping_priority",
    "product_type_profit",
    "min_cost_supplier",
    "pareto_customers",
    "grouping_sets_revenue",
    "rfm_segments",
    "mom_revenue_growth",
    # -- engineering --
    "dq_audit",
    "rolling_median_7",
    "weighted_median_price",
    "gdpr_delete_impact",
    "schema_evolution_roundtrip",
    # -- stats_drift --
    "psi_value_drift",
    "score_auc_audit",
    "hill_tail_index",
    # -- behavior --
    "hourly_heatmap",
    "funnel_strict_3step",
    "dau_wau_stickiness",
    # -- dedup_ext --
    "incremental_dedup_new",
    "dedup_method_agreement",
    # -- curation_ext --
    "k_anonymity_audit",
    "target_encode_loo",
    # -- graph_ext --
    "assoc_rules_top",
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
