"""Semantic invariants for wave 85 (group k-fold, disorder lag,
Kaplan-Meier)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_group_kfold_sources_partition(spark):
    rows = REGISTRY["group_kfold_sources"].fn(spark, SF).collect()
    assert sum(r.n_docs for r in rows) == 500
    # every source is in exactly one fold
    from mapreduce6240project_spark.sources.tables import load_table

    n_sources = (
        load_table(spark, SF, "documents").select("source").distinct().count()
    )
    assert sum(r.n_sources for r in rows) == n_sources
    assert all(0 <= r.fold <= 4 for r in rows)


def test_out_of_order_lag_planted(spark):
    import mapreduce6240project_spark.plans.curation_ext as w85

    # arrival order (event_id) vs event time: event 2 arrives 5 min
    # late relative to event 1's time
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:10:00", 1),
            (2, "2024-01-01 10:05:00", 1),  # 5 min behind running max
            (3, "2024-01-01 10:20:00", 1),
            (4, "2024-01-01 09:00:00", 2),  # different user: in order
        ],
        "event_id long, ts string, user_id long",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id")
    with mock.patch.object(w85, "load_table", lambda s, d, n: ev):
        out = {
            r.lag_min: r.n_events
            for r in w85.q_out_of_order_lag(spark, SF).collect()
        }
    assert out == {0: 3, 5: 1}


def test_out_of_order_lag_real_data(spark):
    rows = REGISTRY["out_of_order_lag"].fn(spark, SF).collect()
    total = sum(r.n_events for r in rows)
    assert total == 1000
    assert all(r.lag_min >= 0 for r in rows)


def test_km_planted_censoring(spark):
    import mapreduce6240project_spark.plans.curation_ext as w85

    # user 1: purchases day 1 and day 3 (event spell, dur 2) then
    # censored to corpus end day 11 (dur 8)
    # user 2: one purchase day 1, censored dur 10
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "purchase"),
            (2, "2024-01-03 00:00:00", 1, "purchase"),
            (3, "2024-01-01 00:00:00", 2, "purchase"),
            (4, "2024-01-11 00:00:00", 9, "view"),  # sets corpus end
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type"
    )
    with mock.patch.object(w85, "load_table", lambda s, d, n: ev):
        rows = w85.q_km_repurchase_survival(spark, SF).collect()
    # only duration 2 is an event; risk set there = all 3 spells
    assert len(rows) == 1
    r = rows[0]
    assert r.dur_d == 2 and r.n_events == 1 and r.n_risk == 3
    # ln(2/3) * 1e6 rounded
    assert r.log_surv_micro == -405465


def test_km_real_data_monotone(spark):
    rows = sorted(
        REGISTRY["km_repurchase_survival"].fn(spark, SF).collect(),
        key=lambda r: r.dur_d,
    )
    assert rows
    # survival is non-increasing and risk set shrinks with duration
    logs = [r.log_surv_micro for r in rows]
    assert logs == sorted(logs, reverse=True)
    risks = [r.n_risk for r in rows]
    assert risks == sorted(risks, reverse=True)
    assert all(r.n_events <= r.n_risk for r in rows)
