"""Semantic invariants for wave 62 (shrunk rates, repurchase cycle)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_shrinkage_pulls_toward_global(spark):
    rows = REGISTRY["part_return_rate_shrunk"].fn(spark, SF).collect()
    assert rows
    total_k = sum(r.k for r in rows)
    total_n = sum(r.n for r in rows)
    global_micro = total_k * 1_000_000 // total_n
    for r in rows:
        lo, hi = sorted((r.raw_micro, global_micro))
        # the shrunk rate lies between the raw rate and the global rate
        # (integer truncation can nudge it 1 ulp outside)
        assert lo - 1 <= r.shrunk_micro <= hi + 1, (r.l_partkey, r)
        # sparse parts shrink harder than dense ones toward global
    sparse = [r for r in rows if r.n <= 3]
    for r in sparse:
        assert abs(r.shrunk_micro - global_micro) <= abs(
            r.raw_micro - global_micro
        ) + 1


def test_repurchase_cycle_positive(spark):
    rows = REGISTRY["repurchase_cycle_days"].fn(spark, SF).collect()
    assert len(rows) == 5  # one per segment
    for r in rows:
        assert r.n_intervals > 0
        # orders span multi-year TPC-H-style dates: cycle is positive
        # and bounded by the date range (< 10 years)
        assert 0 < r.avg_days_milli < 3653 * 1000
