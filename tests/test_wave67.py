"""Semantic invariants for wave 67 (dup payments, stickiness)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_dup_payment_pairs_ordered_and_banded(spark):
    rows = REGISTRY["dup_payment_pairs"].fn(spark, SF).collect()
    for r in rows:
        assert r.order_a < r.order_b
        assert r.cents > 0


def test_stickiness_bounds(spark):
    rows = REGISTRY["dau_wau_stickiness"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # DAU is a subset of the trailing-week actives
        assert 0 < r.dau <= r.wau
        assert r.stickiness_permyriad == r.dau * 10000 // r.wau
        assert r.stickiness_permyriad <= 10000
