"""Semantic invariants for wave 51 (span corruption, daily top-3)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_span_plan_invariants(spark):
    rows = REGISTRY["span_corruption_plan"].fn(spark, SF).collect()
    assert rows
    total_tokens = sum(r.n_tokens for r in rows)
    total_spans = sum(r.n_spans for r in rows)
    total_masked = sum(r.n_masked for r in rows)
    for r in rows:
        # each span masks at most SPAN_LEN tokens; spans can overlap,
        # so coverage is bounded by both span budget and doc length
        assert r.n_spans <= r.n_masked <= min(r.n_spans * 3, r.n_tokens)
    # ~5% start rate -> span starts land near 5% of tokens (loose band)
    assert 0.02 * total_tokens < total_spans < 0.09 * total_tokens
    # spans of length 3 push coverage well above the start rate
    assert total_masked > 2 * total_spans


def test_daily_top3_shape(spark):
    rows = REGISTRY["daily_top3_types"].fn(spark, SF).collect()
    by_day = {}
    for r in rows:
        by_day.setdefault(r.day, []).append(r)
    for day, rs in by_day.items():
        ranks = sorted(x.rk for x in rs)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 3
        # counts are non-increasing with rank
        srt = sorted(rs, key=lambda x: x.rk)
        assert all(a.n >= b.n for a, b in zip(srt, srt[1:]))
