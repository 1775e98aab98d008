"""Semantic invariants for wave 75 (prefix dedup, curriculum, rolling
reach)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_prefix_fp_collapses_extended_copies(spark):
    import mapreduce6240project_spark.plans.dedup_ext as w75

    lead = " ".join(f"tok{i}" for i in range(32))
    docs = spark.createDataFrame(
        [
            (1, lead),
            (2, lead + " extra tail words here"),
            (3, "completely different text"),
        ],
        "doc_id long, text string",
    )
    with mock.patch.object(w75, "load_table", lambda s, d, n: docs):
        rows = w75.q_dedup_prefix_fp(spark, SF).collect()
    by_id = {r.doc_id: r.n_copies for r in rows}
    assert by_id == {1: 2, 3: 1}  # 1 and 2 share the 32-token lead


def test_prefix_fp_short_docs_unaffected(spark):
    import mapreduce6240project_spark.plans.dedup_ext as w75

    docs = spark.createDataFrame(
        [(1, "short doc"), (2, "short doc"), (3, "short dog")],
        "doc_id long, text string",
    )
    with mock.patch.object(w75, "load_table", lambda s, d, n: docs):
        rows = w75.q_dedup_prefix_fp(spark, SF).collect()
    by_id = {r.doc_id: r.n_copies for r in rows}
    assert by_id == {1: 2, 3: 1}


def test_curriculum_stages_partition_docs(spark):
    rows = REGISTRY["curriculum_buckets"].fn(spark, SF).collect()
    stages = {r.stage: r for r in rows}
    assert set(stages) == {1, 2, 3, 4}
    assert sum(r.n_docs for r in rows) == 500  # sf0.001 documents
    # quality is non-decreasing across stages (stage 1 = lowest)
    for s in (1, 2, 3):
        assert stages[s].max_q_pm <= stages[s + 1].min_q_pm + 0
    for r in rows:
        assert 0 <= r.min_q_pm <= r.max_q_pm <= 10000
        assert r.token_budget > 0


def test_rolling_reach_superset_of_daily(spark):
    import mapreduce6240project_spark.plans.dedup_ext as w75

    rows = [
        ("2024-01-01 10:00:00", 1),
        ("2024-01-02 10:00:00", 2),
        ("2024-01-08 10:00:00", 1),
        ("2024-01-20 10:00:00", 3),
    ]
    ev = spark.createDataFrame(
        rows, "ts string, user_id long"
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "user_id")
    with mock.patch.object(w75, "load_table", lambda s, d, n: ev):
        out = {
            r.day: r.n_users_7d
            for r in w75.q_rolling_7d_users(spark, SF).collect()
        }
    # Jan 2 window covers Jan 1-2 (users 1,2); Jan 8 covers Jan 2-8
    # (users 2,1); Jan 20 is isolated.
    assert out == {
        "2024-01-01": 1,
        "2024-01-02": 2,
        "2024-01-08": 2,
        "2024-01-20": 1,
    }


def test_rolling_reach_real_data_bounds(spark):
    rows = REGISTRY["rolling_7d_distinct_users"].fn(spark, SF).collect()
    assert rows
    assert all(1 <= r.n_users_7d <= 150 for r in rows)
