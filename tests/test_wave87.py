"""Semantic invariants for wave 87 (calendar fill, label affinity,
cohort LTV)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_calendar_fill_planted_gap(spark):
    import mapreduce6240project_spark.plans.vectors_ext as w87

    # days 1, 2, 5 active -> days 3 and 4 must appear as zeros
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (2, "2024-01-02 10:00:00", 2.0),
            (3, "2024-01-05 10:00:00", 4.0),
        ],
        "event_id long, ts string, value double",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    with mock.patch.object(w87, "load_table", lambda s, d, n: ev):
        rows = sorted(
            w87.q_calendar_fill_daily(spark, SF).collect(),
            key=lambda r: r.day_idx,
        )
    assert len(rows) == 5  # continuous range, no holes
    assert [r.n_events for r in rows] == [1, 1, 0, 0, 1]
    assert [r.value_c for r in rows] == [100, 200, 0, 0, 400]


def test_calendar_fill_real_data_continuous(spark):
    rows = sorted(
        REGISTRY["calendar_fill_daily"].fn(spark, SF).collect(),
        key=lambda r: r.day_idx,
    )
    idxs = [r.day_idx for r in rows]
    assert idxs == list(range(idxs[0], idxs[-1] + 1))
    assert sum(r.n_events for r in rows) == 1000


def test_label_affinity_bounds_and_shape(spark):
    rows = REGISTRY["label_centroid_affinity"].fn(spark, SF).collect()
    labels = set()
    for r in rows:
        assert r.label_a < r.label_b
        labels.add(r.label_a)
        labels.add(r.label_b)
        assert -1000001 <= r.cos_micro <= 1000001
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2


def test_label_affinity_identical_vs_orthogonal(spark):
    import mapreduce6240project_spark.plans.vectors_ext as w87

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 1),  # label 1 centroid == label 0 -> cos 1
            (3, [0.0, 1.0], 2),  # orthogonal -> cos 0
        ],
        "vec_id long, embedding array<float>, label int",
    )
    with mock.patch.object(w87, "load_table", lambda s, d, n: emb):
        out = {
            (r.label_a, r.label_b): r.cos_micro
            for r in w87.q_label_centroid_affinity(spark, SF).collect()
        }
    assert out[(0, 1)] == 1000000
    assert out[(0, 2)] == 0
    assert out[(1, 2)] == 0


def test_cohort_ltv_monotone(spark):
    rows = REGISTRY["cohort_ltv_curve"].fn(spark, SF).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_wk, []).append((r.age_wk, r.cum_value_c))
    for curve in by_cohort.values():
        curve.sort()
        cums = [c for _, c in curve]
        assert cums == sorted(cums)  # cumulative never decreases
        assert all(a >= 0 for a, _ in curve)


def test_cohort_ltv_planted(spark):
    import mapreduce6240project_spark.plans.vectors_ext as w87

    # one user first active week 0, spends 1.00 then 2.00 a week later
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, 1.0),
            (2, "2024-01-08 10:00:00", 7, 2.0),
        ],
        "event_id long, ts string, user_id long, value double",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "value"
    )
    with mock.patch.object(w87, "load_table", lambda s, d, n: ev):
        out = {
            r.age_wk: (r.n_active_users, r.cum_value_c)
            for r in w87.q_cohort_ltv_curve(spark, SF).collect()
        }
    assert out == {0: (1, 100), 1: (1, 300)}
