"""Semantic invariants for wave 84 (PSI drift, conversion latency,
linear attribution)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_psi_identical_cohorts_near_zero(spark):
    import mapreduce6240project_spark.plans.stats_drift as w84

    # mirrored cohorts (same values for even/odd users) -> PSI ~ 0
    rows = []
    eid = 0
    for v in (1.0, 15.0, 25.0, 120.0):
        for uid in (0, 1):  # one even, one odd user per value
            for _ in range(25):
                rows.append((eid, "2024-01-01 00:00:00", uid, v))
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "value"
    )
    with mock.patch.object(w84, "load_table", lambda s, d, n: ev):
        r = w84.q_psi_value_drift(spark, SF).collect()[0]
    assert r.psi_micro == 0
    assert r.n_bins == 4  # bins 0, 1, 2, 12


def test_psi_disjoint_cohorts_large(spark):
    import mapreduce6240project_spark.plans.stats_drift as w84

    # even users only in low bin, odd users only in high bin -> big PSI
    rows = []
    for i in range(100):
        rows.append((i, "2024-01-01 00:00:00", 0, 1.0))
        rows.append((1000 + i, "2024-01-01 00:00:00", 1, 120.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "value"
    )
    with mock.patch.object(w84, "load_table", lambda s, d, n: ev):
        r = w84.q_psi_value_drift(spark, SF).collect()[0]
    # textbook threshold: > 0.25 means act; here it's ~ 2 * ln(101)
    assert r.psi_micro > 250000


def test_psi_real_data_small(spark):
    r = REGISTRY["psi_value_drift"].fn(spark, SF).collect()[0]
    # parity cohorts draw from the same distribution -> stable
    assert 0 <= r.psi_micro < 250000


def test_latency_planted(spark):
    import mapreduce6240project_spark.plans.stats_drift as w84

    ev = spark.createDataFrame(
        [
            # user 1: signup 10:00, purchase before (ignored) and after
            (1, "2024-01-01 09:00:00", 1, "purchase"),
            (2, "2024-01-01 10:00:00", 1, "signup"),
            (3, "2024-01-01 10:05:30", 1, "purchase"),
            (4, "2024-01-01 11:00:00", 1, "purchase"),
            # user 2: signup, never purchases -> dropped
            (5, "2024-01-01 10:00:00", 2, "signup"),
            # user 3: purchase only, no signup -> dropped
            (6, "2024-01-01 10:00:00", 3, "purchase"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type"
    )
    with mock.patch.object(w84, "load_table", lambda s, d, n: ev):
        out = {
            r.user_id: r.latency_s
            for r in w84.q_signup_to_purchase_latency(spark, SF).collect()
        }
    assert out == {1: 330}


def test_latency_real_data(spark):
    rows = REGISTRY["signup_to_purchase_latency"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.latency_s >= 0
        assert r.purchase_us >= r.signup_us


def test_linear_attribution_planted(spark):
    import mapreduce6240project_spark.plans.stats_drift as w84

    ev = spark.createDataFrame(
        [
            # purchase at 10:00 with 2 views + 1 click in the prior hour
            (1, "2024-01-01 09:10:00", 1, "view"),
            (2, "2024-01-01 09:20:00", 1, "view"),
            (3, "2024-01-01 09:30:00", 1, "click"),
            (4, "2024-01-01 10:00:00", 1, "purchase"),
            # view 2h before the next purchase -> outside lookback
            (5, "2024-01-01 08:00:00", 2, "view"),
            (6, "2024-01-01 10:30:00", 2, "purchase"),
            # touch with no purchase after -> no credit
            (7, "2024-01-01 23:00:00", 3, "click"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type"
    )
    with mock.patch.object(w84, "load_table", lambda s, d, n: ev):
        out = {
            r.event_type: (r.n_touches, r.credit_micro)
            for r in w84.q_linear_attribution(spark, SF).collect()
        }
    # purchase 1: view 2/3 of 1e6 = 666666, click 1/3 = 333333
    assert out["view"] == (2, 666666)
    assert out["click"] == (1, 333333)


def test_linear_attribution_real_data(spark):
    rows = REGISTRY["linear_attribution"].fn(spark, SF).collect()
    got = {r.event_type for r in rows}
    assert got <= {"view", "click"}
    for r in rows:
        # each purchase hands out at most 1e6 micro total
        assert 0 < r.credit_micro
