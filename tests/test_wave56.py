"""Semantic invariants for wave 56 (IVF balance, retrieval MRR)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_ivf_balance_gauge(spark):
    r = REGISTRY["ivf_cell_balance"].fn(spark, SF).collect()[0]
    n_vecs = load_table(spark, SF, "embeddings").count()
    assert r.n_vecs == n_vecs
    assert 1 <= r.min_cell <= r.max_cell
    # k-means cells stay within an order of magnitude of the mean
    assert r.imbalance_permyriad < 10 * 10000, r.imbalance_permyriad


def test_retrieval_mrr_consistent(spark):
    r = REGISTRY["retrieval_mrr_at10"].fn(spark, SF).collect()[0]
    assert r.first_rel_rank >= 1
    assert r.mrr_permyriad == 10000 // r.first_rel_rank
    assert 0 <= r.rel_in_top10 <= 10
    if r.first_rel_rank <= 10:
        assert r.rel_in_top10 >= 1
