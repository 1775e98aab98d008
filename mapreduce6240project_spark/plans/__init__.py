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
    # -- round-9 rotation: rounds 2-8 externally verified 327 distinct
    #    queries (CORRECTNESS_r02..r08), all hash-exact.  This window
    #    leads with the eight round-8 additions the r8 verdict and
    #    ADVICE named as committed-after-the-r8-rotation (the txlog
    #    family first -- the flagship whose only evidence is the
    #    mirror), then proportional never-checked draws across every
    #    family that still has mirror-only members.  COVERAGE.md
    #    tracks the cumulative ledger; tools/coverage_ledger.py
    #    regenerates it.  The wave-105/106/107/108 queries added THIS round
    #    enter this window directly (r9 ADVICE item 4: new code gets
    #    external verdicts the same round it lands). --
    # -- added in round 8 after the r8 rotation (ADVICE item 4) --
    "txlog_gdpr_delete",
    "txlog_skipping_audit",
    "streaming_txlog_cdc",
    "spearman_discount_qty",
    "ljung_box_daily",
    "brown_forsythe_types",
    "wl_refinement_colors",
    "token_budget_waterfill",
    # -- behavior --
    "fk_orphan_audit",
    "dup_payment_pairs",
    "user_active_streaks",
    # -- curation_ext --
    "lang_confusion_matrix",
    "exact_split_strata",
    "nucleus_docs_90",
    "out_of_order_lag",
    # -- dedup_ext --
    "compaction_plan",
    "doc_survivor_remap",
    "rare_term_cosine_pairs",
    "dedup_shard_consistency",
    # -- engineering --
    "table_checksum_orders",
    "full_outer_recon",
    "dynamic_partition_overwrite",
    "event_type_corr_matrix",
    "txlog_changes_cdf",
    # -- extensions / parity / registry --
    "multimodal_frames",
    "wav_silence_spans",
    "lang_id_accuracy",
    "salted_value_sums",
    "elbow_knee_k",
    # -- graph_ext --
    "vocab_oov_rate",
    # -- retrieval --
    "charlm_quality",
    "join_strategy_advisor",
    "rm3_expansion_top10",
    # -- sketch_ext --
    "ams_f2_user_stream",
    "churn_rate_weekly",
    # -- stats_drift --
    "seasonal_decompose_daily",
    "kruskal_wallis_types",
    # -- streaming_ext --
    "dataset_card",
    "orderkey_gap_audit",
    # -- text_corpus --
    "lang_id_trigram_acc",
    "cross_doc_repetition",
    "span_corruption_plan",
    "prefix_cache_savings",
    # -- tpch_analytics --
    "asof_next_purchase",
    "blocking_quality_audit",
    "txlog_zorder_2d_audit",
    "cluster_bootstrap_ratio_ci",
    "txlog_restore_roundtrip",
    # -- vectors_ext --
    "dedup_paragraphs",
    "qsketch_grain_rollup",
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
