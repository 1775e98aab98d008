"""Partition-layout invariance regression guard.

Pinned sample of registry queries re-planned under a hostile layout
(5 shuffle partitions coprime with the default, 64 kB input splits, no
AQE coalescing) must return byte-identical results.  The full-registry
sweep lives in ``tools/invariance_sweep.py``; this keeps the property
from regressing between sweeps.  Layout-dependence is the failure mode
a single-layout oracle check cannot see -- float aggregation order at
a quantization boundary, ``first()``/``limit`` without an ordering,
partition-keyed RNG -- and it is exactly what changes between
``local[32]`` and a 1000-executor cluster.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

# one query per failure-prone family: float aggregation (avg/corr),
# window functions over ties, explode+agg text paths, banded-join
# dedup, sketch merges, iterative loops, top-k with ties, streaming
# batch replays, sampling (hash-keyed), pivot/rollup grouping
SAMPLE = [
    "pricing_summary",          # decimal aggs
    "lang_avg_likes",           # float avg after recode
    "kmedoids_k3",              # iterative loop, argmin ties
    "top3_orders_per_segment",  # rank over ties
    "dedup_minhash_lsh",        # banded self-join + adaptive probe
    "dedup_simhash",            # pigeonhole chunk join
    "hll_distinct_users",       # sketch merge order
    "value_quantiles",          # quantile sketch merge
    "corr_by_returnflag",       # Pearson corr (sum-of-products order)
    "embedding_topk",           # cosine top-k ties
    "heaps_law_curve",          # sequence grid + left join
    "rollup_revenue",           # grouping sets
    "hash_sample_customers",    # hash-keyed sampling (must be stable)
    "scd_upsert",               # merge ordering
    "token_entropy",            # log-sum over explode
    "trending_event_types",     # time-decay weighted sums
]

LAYOUT_B = {
    "spark.sql.shuffle.partitions": "5",
    "spark.sql.files.maxPartitionBytes": str(64 * 1024),
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def _normalize(df):
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _clear_all_caches(spark):
    from mapreduce6240project_spark.operators.dedup import release_dedup_caches
    from mapreduce6240project_spark.sources.tweets import release_feature_store

    spark.catalog.clearCache()
    release_dedup_caches()
    release_feature_store(spark)


@pytest.fixture(scope="module")
def registry():
    import __spark_entry__ as entry

    return entry.queries()


@pytest.mark.parametrize("name", SAMPLE)
def test_layout_invariant(spark, registry, name):
    saved = {k: spark.conf.get(k) for k in LAYOUT_B}
    try:
        _clear_all_caches(spark)
        base = _normalize(registry[name](spark, SF_SMALL))
        _clear_all_caches(spark)
        for k, v in LAYOUT_B.items():
            spark.conf.set(k, v)
        hostile = _normalize(registry[name](spark, SF_SMALL))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        _clear_all_caches(spark)
    assert base.shape == hostile.shape
    assert base.equals(hostile), f"{name} result depends on partition layout"
