"""Semantic invariants for wave 86 (KMV sketch, Theil-Sen, churn)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_kmv_estimates_in_range(spark):
    rows = REGISTRY["kmv_distinct_users"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_exact >= 1
        if r.n_exact < 8:
            assert r.kmv_est == r.n_exact
        else:
            # KMV with k=8 has ~1/sqrt(k-1) relative error; allow 3x
            assert r.n_exact / 4 <= r.kmv_est <= r.n_exact * 4


def test_kmv_exact_below_k(spark):
    import mapreduce6240project_spark.plans.sketch_ext as w86

    ev = spark.createDataFrame(
        [(i, "a", i % 3) for i in range(30)],
        "event_id long, event_type string, user_id long",
    )
    with mock.patch.object(w86, "load_table", lambda s, d, n: ev):
        r = w86.q_kmv_distinct_users(spark, SF).collect()
    assert len(r) == 1
    assert r[0].n_exact == 3 and r[0].kmv_est == 3


def test_theil_sen_linear_series(spark):
    import mapreduce6240project_spark.plans.sketch_ext as w86

    # perfectly linear daily series: every pairwise slope is the same
    rows = [
        (d, f"2024-01-{d:02d} 12:00:00", 10.0 * d) for d in range(1, 11)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    with mock.patch.object(w86, "load_table", lambda s, d, n: ev):
        r = w86.q_theil_sen_daily(spark, SF).collect()[0]
    assert r.n_pairs == 45
    assert r.slope_micro_median == 1000 * 1000000  # 1000 cents/day


def test_theil_sen_outlier_immune(spark):
    import mapreduce6240project_spark.plans.sketch_ext as w86

    # linear slope 1000c/day with two wild outlier days: the median
    # slope stays near the true trend while OLS would not
    rows = [
        (d, f"2024-01-{d:02d} 12:00:00", 10.0 * d) for d in range(1, 11)
    ]
    rows[4] = (5, "2024-01-05 12:00:00", 5000.0)
    rows[8] = (9, "2024-01-09 12:00:00", 0.03)
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    with mock.patch.object(w86, "load_table", lambda s, d, n: ev):
        r = w86.q_theil_sen_daily(spark, SF).collect()[0]
    assert 500 * 1000000 <= r.slope_micro_median <= 1500 * 1000000


def test_churn_planted(spark):
    import mapreduce6240project_spark.plans.sketch_ext as w86

    # two Mondays; user 1 active both weeks, user 2 only week 1,
    # user 3 only week 2 (week 2 is the last week -> unlabeled)
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1),
            (2, "2024-01-08 10:00:00", 1),
            (3, "2024-01-01 11:00:00", 2),
            (4, "2024-01-08 11:00:00", 3),
        ],
        "event_id long, ts string, user_id long",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id")
    with mock.patch.object(w86, "load_table", lambda s, d, n: ev):
        rows = w86.q_churn_rate_weekly(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_active == 2 and r.n_churned == 1 and r.churn_pm == 5000


def test_churn_real_data(spark):
    rows = REGISTRY["churn_rate_weekly"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_churned <= r.n_active
        assert 0 <= r.churn_pm <= 10000
