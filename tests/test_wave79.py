"""Semantic invariants for wave 79 (streaks, FK audit, hapax ratio)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_streaks_gaps_and_islands(spark):
    import mapreduce6240project_spark.plans.behavior as w79

    # user 1: days 1,2,3, 5,6, 9  -> streaks 3,2,1; user 2: single day
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-03"),
            (1, "2024-01-05"), (1, "2024-01-06"), (1, "2024-01-09"),
            (1, "2024-01-09"),  # same-day duplicate must not split runs
            (2, "2024-03-01"),
        ],
        "user_id long, ts string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    with mock.patch.object(w79, "load_table", lambda s, d, n: ev):
        out = {
            r.user_id: (r.n_active_days, r.longest_streak, r.n_streaks)
            for r in w79.q_user_active_streaks(spark, SF).collect()
        }
    assert out == {1: (6, 3, 3), 2: (1, 1, 1)}


def test_streaks_real_data_consistent(spark):
    rows = REGISTRY["user_active_streaks"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.longest_streak <= r.n_active_days
        assert r.n_streaks <= r.n_active_days


def test_fk_audit_planted_orphans(spark):
    import mapreduce6240project_spark.plans.behavior as w79

    tables = {
        "orders": spark.createDataFrame(
            [(1, 10), (2, 10), (3, 99)], "o_orderkey long, o_custkey long"
        ),
        "customer": spark.createDataFrame(
            [(10, 1)], "c_custkey long, c_nationkey long"
        ),
        "lineitem": spark.createDataFrame(
            [(1, 100, 200), (7, 100, 200)],
            "l_orderkey long, l_partkey long, l_suppkey long",
        ),
        "part": spark.createDataFrame([(100,)], "p_partkey long"),
        "supplier": spark.createDataFrame(
            [(200, 1)], "s_suppkey long, s_nationkey long"
        ),
        "nation": spark.createDataFrame(
            [(1, 5)], "n_nationkey long, n_regionkey long"
        ),
        "region": spark.createDataFrame([(5,)], "r_regionkey long"),
    }
    with mock.patch.object(w79, "load_table", lambda s, d, n: tables[n]):
        out = {
            r.fk_edge: (r.n_child_rows, r.n_orphans)
            for r in w79.q_fk_orphan_audit(spark, SF).collect()
        }
    assert out["lineitem.l_orderkey->orders"] == (2, 1)  # orderkey 7
    assert out["orders.o_custkey->customer"] == (3, 1)  # custkey 99
    assert out["lineitem.l_partkey->part"] == (2, 0)
    assert out["nation.n_regionkey->region"] == (1, 0)
    assert len(out) == 7


def test_fk_audit_real_data_clean(spark):
    rows = REGISTRY["fk_orphan_audit"].fn(spark, SF).collect()
    assert len(rows) == 7
    # the driver's synthetic star schema is referentially intact
    assert all(r.n_orphans == 0 for r in rows)
    assert all(r.n_child_rows > 0 for r in rows)


def test_hapax_planted(spark):
    import mapreduce6240project_spark.plans.behavior as w79

    docs = spark.createDataFrame(
        [(1, "a b b c", "s1"), (2, "c c", "s1"), (3, "x x", "s2")],
        "doc_id long, text string, source string",
    )
    with mock.patch.object(w79, "load_table", lambda s, d, n: docs):
        out = {
            r.source: (r.n_tokens, r.n_types, r.n_hapax, r.hapax_pm)
            for r in w79.q_hapax_ratio_source(spark, SF).collect()
        }
    # s1 tokens: a b b c c c -> types {a:1, b:2, c:3}, hapax {a}
    assert out["s1"] == (6, 3, 1, 3333)
    assert out["s2"] == (2, 1, 0, 0)


def test_hapax_real_data_bounds(spark):
    rows = REGISTRY["hapax_ratio_source"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.n_types <= r.n_tokens
        assert 0 <= r.hapax_pm <= 10000
