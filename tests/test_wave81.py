"""Semantic invariants for wave 81 (Mann-Kendall, calibration bins,
mutual information)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_mann_kendall_monotone_series(spark):
    import mapreduce6240project_spark.plans.stats_drift as w81

    # strictly increasing daily totals -> S = n_pairs
    rows = [
        (i, f"2024-01-{d:02d} 12:00:00", float(d))
        for i, d in enumerate(range(1, 11))
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    with mock.patch.object(w81, "load_table", lambda s, d, n: ev):
        r = w81.q_mann_kendall_daily(spark, SF).collect()[0]
    assert r.n_days == 10
    assert r.n_pairs == 45
    assert r.s_stat == 45


def test_mann_kendall_real_data_bounds(spark):
    r = REGISTRY["mann_kendall_daily"].fn(spark, SF).collect()[0]
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    assert -r.n_pairs <= r.s_stat <= r.n_pairs


def test_calibration_bins_real_data(spark):
    rows = REGISTRY["value_bin_purchase_rate"].fn(spark, SF).collect()
    assert rows
    total = sum(r.n_events for r in rows)
    assert total == 1000  # sf0.001 events
    for r in rows:
        assert 0 <= r.n_purchases <= r.n_events
        assert 0 <= r.purchase_pm <= 10000
        assert r.bin_lo_c == r.bin * 1000


def test_mi_independent_is_zero(spark):
    import mapreduce6240project_spark.plans.stats_drift as w81

    # perfectly independent 2x2 table: MI terms are ln(1) = 0
    rows = []
    for t in ("a", "b"):
        for v in (1.0, 11.0):
            for _ in range(10):
                rows.append((0, "2024-01-01 00:00:00", t, v))
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    ).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    with mock.patch.object(w81, "load_table", lambda s, d, n: ev):
        r = w81.q_mi_type_valuebin(spark, SF).collect()[0]
    assert r.n_events == 40 and r.n_cells == 4
    assert r.mi_micro_sum == 0


def test_mi_dependent_is_positive(spark):
    import mapreduce6240project_spark.plans.stats_drift as w81

    # perfectly dependent: type determines the bin -> MI = ln(2) per row
    rows = [(0, "2024-01-01 00:00:00", "a", 1.0)] * 10 + [
        (0, "2024-01-01 00:00:00", "b", 11.0)
    ] * 10
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    ).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    with mock.patch.object(w81, "load_table", lambda s, d, n: ev):
        r = w81.q_mi_type_valuebin(spark, SF).collect()[0]
    assert r.n_cells == 2
    # 20 rows x round(ln(2)*1e6) = 20 * 693147
    assert r.mi_micro_sum == 20 * 693147


def test_mi_real_data_nonnegative_ish(spark):
    r = REGISTRY["mi_type_valuebin"].fn(spark, SF).collect()[0]
    # per-cell quantization can dip a hair below zero; true MI >= 0
    assert r.mi_micro_sum >= -r.n_cells
    assert r.n_events == 1000
