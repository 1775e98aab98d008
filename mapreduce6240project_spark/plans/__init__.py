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
    # -- round-8 rotation: rounds 2-7 externally verified 277 distinct
    #    queries (CORRECTNESS_r02..r07), all hash-exact.  This window
    #    leads with the queries round 8 ADDED or whose plans/oracles
    #    round 8 CHANGED (the two new external verdicts, the
    #    Bradley-Terry linear-plan rewrite, the three r7-ADVICE
    #    determinism fixes), then the gnarliest never-checked plans the
    #    r7 verdict named, then proportional never-checked draws across
    #    every family that still has mirror-only members.  COVERAGE.md
    #    tracks the cumulative ledger; tools/coverage_ledger.py
    #    regenerates it. --
    # -- new in round 8 / plan or oracle changed in round 8 --
    "approx_distinct_ci",
    "kmeans_quality_ci",
    "bradley_terry_brands",
    "mixture_ess_audit",
    "source_vocab_overlap",
    "wasserstein_value_gap",
    "epoch_shuffle_quality",
    "txlog_merge_roundtrip",
    # -- tpch_analytics never-checked depth --
    "stump_split_gain",
    "winsorized_mean_value",
    "ohlc_hourly_value",
    "twap_user_value",
    "revenue_waterfall_monthly",
    "value_quintile_migration",
    "asof_nearest_signup",
    "hhi_supplier_nation",
    # -- engineering --
    "udtf_chunk_docs",
    "python_datasource_range",
    "incremental_merge_agg",
    "fd_violation_audit",
    "interp_linear_minute",
    # -- curation_ext --
    "neyman_allocation",
    "split_leakage_audit",
    "group_kfold_sources",
    "feature_hashing",
    # -- text_corpus --
    "padding_waste_audit",
    "js_divergence_sources",
    "tokenizer_fertility",
    "token_entropy",
    # -- dedup_ext --
    "bbit_minhash_audit",
    "dedup_survivor_length_bias",
    "selectivity_estimate_audit",
    "source_overlap_matrix",
    # -- retrieval --
    "map_at10",
    "minhash_recall_audit",
    "int8_recall_audit",
    # -- stats_drift --
    "bh_fdr_type_gaps",
    "mann_whitney_effect",
    "qte_deciles",
    # -- behavior --
    "ece_calibration",
    "f1_threshold_sweep",
    "bot_regularity_audit",
    # -- vectors_ext / sketch_ext / streaming_ext / extensions /
    #    parity / graph_ext breadth --
    "label_scatter_ratio",
    "impute_props_k",
    "markov_stationary_events",
    "corpus_merkle_roots",
    "ingest_quarantine_report",
    "gapfill_locf",
    "bpe_token_count",
    "edge_triangle_support",
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
