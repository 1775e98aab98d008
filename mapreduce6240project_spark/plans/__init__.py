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
    # -- round-7 rotation: rounds 2-6 externally verified 227 distinct
    #    queries (CORRECTNESS_r02..r06), all hash-exact.  This window
    #    leads with the queries round 7 ADDED or whose oracles round 7
    #    CHANGED (external signal on changed code first), then the
    #    never-checked numerically delicate extension families the
    #    round-6 verdict item 8 named (survival, attribution, privacy,
    #    experimentation/stats), then the graph family whose dirty-edge
    #    hygiene changed this round, then proportional never-checked
    #    draws across the remaining families.  COVERAGE.md tracks the
    #    cumulative ledger; tools/coverage_ledger.py regenerates it. --
    # -- new in round 7 / oracle changed in round 7 --
    "bernoulli_sample_ci",
    "multimodal_decode_real",
    "props_json_stats",
    "props_variant_deciles",
    "null_safe_prop_pairs",
    "wav_audio_features",
    "binary_hamming_topk",
    "gopher_quality_flags",
    "distinct_ngram_diversity",
    "dsir_select_top100",
    "t_closeness_audit",
    "query_likelihood_topk",
    "sprt_boundary_day",
    "srm_audit",
    "dedup_threshold_sweep",
    "kn_bigram_nll",
    "dup_span_extents",
    "acf_top_period",
    "mase_seasonal_naive",
    "modularity_brand_partition",
    "dp_laplace_counts",
    "simpson_reversal_audit",
    # -- numerically delicate, never externally checked --
    "km_repurchase_survival",
    "linear_attribution",
    "last_touch_attribution",
    "randomized_response_segments",
    "power_mde_audit",
    "mann_kendall_daily",
    "theil_sen_daily",
    "welch_t_value",
    "bootstrap_mean_value",
    "topk_stability_bootstrap",
    "chi2_segment_status",
    "mi_type_valuebin",
    "benford_totalprice",
    "acf1_daily_value",
    "cusum_max_deviation",
    "value_overdispersion",
    "embedding_drift_l1",
    "discount_qty_response",
    "lang_id_kappa",
    "gini_customer_revenue",
    # -- graph family (dirty-edge hygiene touched this round) --
    "degree_assortativity",
    "random_walks_k3",
    "supplier_order_reach",
    "kcore3_copurchase",
    "degree_histogram_simgraph",
    # -- family breadth (the 17 displaced by the late-round-7
    #    additions -- dedup_ext/behavior/tpch/text draws -- head the
    #    round-8 rotation next) --
    "skyline_parts",
    "zscore_by_cluster",
    "excess_qty_suppliers",
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
