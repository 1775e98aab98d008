"""Semantic invariants for wave 47 (minhash recall audit, footrule)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_minhash_recall_complete_on_testdata(spark):
    r = REGISTRY["minhash_recall_audit"].fn(spark, SF).collect()[0]
    assert r.n_exact > 0  # planted duplicates exist
    assert r.n_lsh == r.n_common <= r.n_exact
    assert r.recall_permyriad == 10000  # complete band recall


def test_footrule_bounds(spark):
    r = REGISTRY["rank_footrule_sparse_dense"].fn(spark, SF).collect()[0]
    assert 0 <= r.n_shared <= 50
    # max possible footrule for n shared docs with ranks in 1..50
    assert 0 <= r.footrule <= r.n_shared * 49 if r.n_shared else r.footrule == 0
