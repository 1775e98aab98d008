"""Semantic invariants for wave 69 (substitutes, fill-time quantiles)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_substitutes_within_band(spark):
    rows = REGISTRY["part_substitutes"].fn(spark, SF).collect()
    for r in rows:
        assert r.part_a < r.part_b
        assert 0 <= r.diff_permyriad <= 500


def test_fill_quantiles_ordered(spark):
    rows = REGISTRY["fill_days_quantiles"].fn(spark, SF).collect()
    assert len(rows) >= 3  # several priorities
    for r in rows:
        assert r.p50_days is not None and r.p90_days is not None
        assert r.p50_days <= r.p90_days
