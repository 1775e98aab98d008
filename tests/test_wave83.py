"""Semantic invariants for wave 83 (dynamic partition overwrite,
correlation matrix, overdispersion)."""

from __future__ import annotations

from unittest import mock

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_dpo_only_touched_partition_changes(spark):
    """The doubled day doubles; every other day is byte-identical to
    the direct aggregate."""
    from mapreduce6240project_spark.sources.tables import load_table

    got = {
        r.day: (r.n_events, r.sum_c)
        for r in REGISTRY["dynamic_partition_overwrite"].fn(spark, SF)
        .collect()
    }
    direct = {
        r.day: (r.n, r.s)
        for r in load_table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
            ).alias("s"),
        )
        .collect()
    }
    assert set(got) == set(direct)
    for day, (n, s) in direct.items():
        if day == "2024-01-01":
            assert got[day] == (n, 2 * s)
        else:
            assert got[day] == (n, s)


def test_corr_matrix_shape_and_bounds(spark):
    rows = REGISTRY["event_type_corr_matrix"].fn(spark, SF).collect()
    assert len(rows) == 10  # C(5,2) pairs
    for r in rows:
        assert r.type_a < r.type_b
        assert -1.0001 <= r.r <= 1.0001
        assert r.n_days >= 2


def test_corr_matrix_perfect_correlation(spark):
    import mapreduce6240project_spark.plans.engineering as w83

    # type b count = 2x type a count each day -> r = 1 exactly
    rows = []
    eid = 0
    for d, na in ((1, 2), (2, 5), (3, 3)):
        for t, k in (("a", na), ("b", 2 * na)):
            for _ in range(k):
                rows.append((eid, f"2024-01-0{d} 10:00:00", t, 1.0))
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    with mock.patch.object(w83, "load_table", lambda s, d, n: ev):
        out = w83.q_event_type_corr_matrix(spark, SF).collect()
    assert len(out) == 1
    assert out[0].r == 1.0 and out[0].n_days == 3


def test_overdispersion_constant_is_zero(spark):
    import mapreduce6240project_spark.plans.engineering as w83

    # constant values -> variance 0 -> VMR 0
    ev = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", "a", 5.0) for i in range(50)],
        "event_id long, ts string, event_type string, value double",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    with mock.patch.object(w83, "load_table", lambda s, d, n: ev):
        r = w83.q_value_overdispersion(spark, SF).collect()[0]
    assert r.n_events == 50 and r.mean_c == 500 and r.vmr_pm == 0


def test_overdispersion_real_data(spark):
    rows = REGISTRY["value_overdispersion"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.mean_c > 0
        assert r.vmr_pm >= 0
