"""Semantic invariants for wave 52 (MaxSim ranking, trend slope)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_maxsim_rank_is_total_order(spark):
    rows = sorted(
        REGISTRY["label_maxsim_rank"].fn(spark, SF).collect(),
        key=lambda r: r.rk,
    )
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    assert all(a.max_sim >= b.max_sim for a, b in zip(rows, rows[1:]))
    # the query vector's own label contains vec 0 -> max_sim == 1.0
    assert rows[0].max_sim == 1.0


def test_trend_slope_closed_form(spark):
    rows = REGISTRY["segment_trend_slope"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.den > 0
        # truncating division toward zero
        q = abs(r.num) // r.den
        assert r.slope_cents_per_day == (q if r.num >= 0 else -q)
