"""Semantic invariants for wave 77 (backlog, weekday index, dedup
inflation)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_backlog_event_sourcing(spark):
    import mapreduce6240project_spark.plans.tpch_analytics as w77

    orders = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-02")],
        "o_orderkey long, o_orderdate string",
    ).selectExpr("o_orderkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate")
    li = spark.createDataFrame(
        [(1, "2024-01-03"), (2, "2024-01-05"), (2, "2024-01-04")],
        "l_orderkey long, l_shipdate string",
    ).selectExpr("l_orderkey", "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate")
    tables = {"orders": orders, "lineitem": li}
    with mock.patch.object(w77, "load_table", lambda s, d, n: tables[n]):
        out = {
            r.day: r.backlog
            for r in w77.q_orders_backlog_daily(spark, SF).collect()
        }
    # order 3 never ships -> stays open forever
    assert out == {
        "2024-01-01": 1,
        "2024-01-02": 3,
        "2024-01-03": 2,
        "2024-01-05": 1,
    }


def test_backlog_real_data_nonnegative(spark):
    rows = REGISTRY["orders_backlog_daily"].fn(spark, SF).collect()
    assert rows
    assert all(r.backlog >= 0 for r in rows)


def test_weekday_index_covers_week(spark):
    rows = REGISTRY["weekday_value_index"].fn(spark, SF).collect()
    dows = {r.dow for r in rows}
    assert dows <= set(range(1, 8)) and len(dows) >= 5
    # permyriad indices should average near 10000 (weighted exactly)
    total_n = sum(r.n_events for r in rows)
    weighted = sum(r.index_pm * r.n_events for r in rows)
    assert abs(weighted / total_n - 10000) < 50


def test_dedup_inflation_planted(spark):
    import mapreduce6240project_spark.plans.tpch_analytics as w77

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y")],
        "doc_id long, text string",
    )
    with mock.patch.object(w77, "load_table", lambda s, d, n: docs):
        r = w77.q_corpus_dedup_inflation(spark, SF).collect()[0]
    assert r.n_docs == 3 and r.n_unique_docs == 2
    assert r.tokens_total == 10 and r.tokens_unique == 6
    assert r.inflation_pm == 10 * 10000 // 6


def test_dedup_inflation_real_data(spark):
    r = REGISTRY["corpus_dedup_inflation"].fn(spark, SF).collect()[0]
    assert r.n_unique_docs <= r.n_docs == 500
    assert r.inflation_pm >= 10000  # total >= unique always
