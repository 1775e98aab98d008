"""Semantic invariants for wave 90 (Hill tail index, join skew,
leaderboard stability)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_hill_real_data(spark):
    r = REGISTRY["hill_tail_index"].fn(spark, SF).collect()[0]
    assert r.k_used == 199
    assert r.sum_ln_micro > 0
    assert r.alpha_micro > 0


def test_hill_pareto_planted(spark):
    import mapreduce6240project_spark.plans.stats_drift as w90

    # exact Pareto(alpha=2) order statistics: x_r = C * r^(-1/2)
    # (quantile construction) -> Hill estimate near alpha = 2
    rows = [
        (i, 10000.0 * (i + 1) ** -0.5) for i in range(1000)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, value double"
    )
    with mock.patch.object(w90, "load_table", lambda s, d, n: ev):
        r = w90.q_hill_tail_index(spark, SF).collect()[0]
    assert 1_700_000 <= r.alpha_micro <= 2_300_000


def test_join_skew_profile_totals(spark):
    from mapreduce6240project_spark.sources.tables import load_table

    rows = REGISTRY["join_key_skew_profile"].fn(spark, SF).collect()
    li_n = load_table(spark, SF, "lineitem").count()
    assert sum(r.join_rows for r in rows) == li_n
    assert sum(r.multiplicity * 0 + r.n_keys for r in rows) > 0
    pm = sum(r.join_rows_pm for r in rows)
    assert 10000 - len(rows) <= pm <= 10000
    for r in rows:
        assert r.join_rows == r.multiplicity * r.n_keys


def test_topk_stability_bounds(spark):
    rows = REGISTRY["topk_stability_bootstrap"].fn(spark, SF).collect()
    # exactly 10 seats per replicate, 20 replicates
    assert sum(r.n_top10 for r in rows) == 200
    assert all(1 <= r.n_top10 <= 20 for r in rows)
    # the leaderboard is not pure noise: someone holds most replicates
    assert max(r.n_top10 for r in rows) >= 15
