"""Semantic invariants for wave 80 (quintile migration, percent-of-
parent, winsorized mean)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_quintile_migration_real_data(spark):
    rows = REGISTRY["value_quintile_migration"].fn(spark, SF).collect()
    assert rows  # events span 5 ISO weeks -> at least one transition
    for r in rows:
        assert 1 <= r.q_from <= 5 and 1 <= r.q_to <= 5
        assert r.n_users >= 1
    # a user appears at most once per (wk_from, q_from) pair, so each
    # source week's matrix counts <= distinct users that week
    by_week = {}
    for r in rows:
        by_week[r.wk_from] = by_week.get(r.wk_from, 0) + r.n_users
    ev = REGISTRY["user_active_streaks"].fn(spark, SF)
    n_users = ev.count()
    assert all(v <= n_users for v in by_week.values())


def test_quintile_migration_planted(spark):
    import mapreduce6240project_spark.plans.tpch_analytics as w80

    # two Mondays one week apart; 5 users, values reverse order in wk2
    rows = []
    for i in range(5):
        rows.append((i, "2024-01-01 10:00:00", float(i + 1)))
        rows.append((i, "2024-01-08 10:00:00", float(5 - i)))
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    with mock.patch.object(w80, "load_table", lambda s, d, n: ev):
        out = {
            (r.q_from, r.q_to): r.n_users
            for r in w80.q_value_quintile_migration(spark, SF).collect()
        }
    # perfect reversal: quintile q -> 6 - q, one user each
    assert out == {(q, 6 - q): 1 for q in range(1, 6)}


def test_nation_share_sums_to_parent(spark):
    rows = REGISTRY["nation_share_of_region"].fn(spark, SF).collect()
    assert rows
    by_region = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r.share_pm)
        assert 0 <= r.share_pm <= 10000
    for shares in by_region.values():
        # floor division loses < 1 permyriad per nation
        assert 10000 - len(shares) <= sum(shares) <= 10000


def test_winsorized_mean_bounds(spark):
    r = REGISTRY["winsorized_mean_value"].fn(spark, SF).collect()[0]
    assert r.p01_c <= r.p99_c
    assert r.p01_c <= r.winsorized_mean_c <= r.p99_c
    assert r.n_events > 0


def test_winsorized_clips_outlier(spark):
    import mapreduce6240project_spark.plans.tpch_analytics as w80

    # 99 values of 1.00 and one huge outlier: plain mean follows the
    # outlier, winsorized mean stays at 100 cents
    vals = [(i, "2024-01-01 00:00:00", 1.0) for i in range(99)]
    vals.append((99, "2024-01-01 00:00:00", 100000.0))
    ev = spark.createDataFrame(
        vals, "user_id long, ts string, value double"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    with mock.patch.object(w80, "load_table", lambda s, d, n: ev):
        r = w80.q_winsorized_mean_value(spark, SF).collect()[0]
    assert r.plain_mean_c > 10000
    assert r.winsorized_mean_c == 100
    assert r.p01_c == 100 and r.p99_c == 100
