"""Semantic invariants for wave 89 (Cohen's kappa, revenue waterfall,
embedding standardization)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_kappa_below_accuracy(spark):
    r = REGISTRY["lang_id_kappa"].fn(spark, SF).collect()[0]
    assert r.n_docs == 500
    # kappa is chance-corrected: always <= raw accuracy; on the
    # synthetic corpus the marker LID sits near chance so kappa ~ 0
    # (can be slightly negative), while accuracy alone looks non-zero
    # -- exactly the skew kappa exists to expose
    assert r.kappa_micro <= r.accuracy_pm * 100
    assert -1000000 <= r.kappa_micro <= 1000000
    assert 0 < r.accuracy_pm <= 10000


def test_waterfall_identity(spark):
    rows = REGISTRY["revenue_waterfall_monthly"].fn(spark, SF).collect()
    assert len(rows) >= 12
    for r in rows:
        assert r.net_c == r.gross_c - r.discount_c + r.tax_c
        assert 0 <= r.discount_c <= r.gross_c
        assert r.tax_c >= 0


def test_standardize_moments(spark):
    """z-scored columns should have ~zero mean and ~unit variance."""
    from pyspark.sql import functions as F

    df = REGISTRY["embedding_standardize"].fn(spark, SF)
    stats = (
        df.groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("z_milli")).alias("mu"),
            F.avg(F.col("z_milli") * F.col("z_milli")).alias("m2"),
        )
        .collect()
    )
    assert len(stats) == 64
    for s in stats:
        assert s.n == 500
        assert abs(s.mu) < 50  # milli units: |mean| < 0.05 sd
        assert 0.8e6 < s.m2 < 1.2e6  # variance ~ 1 in milli^2


def test_standardize_constant_dim_zero(spark):
    from unittest import mock

    import mapreduce6240project_spark.plans.tpch_analytics as w89

    emb = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 4.0]), (3, [1.0, 6.0])],
        "vec_id long, embedding array<float>",
    )
    with mock.patch.object(w89, "load_table", lambda s, d, n: emb):
        rows = w89.q_embedding_standardize(spark, SF).collect()
    z = {(r.vec_id, r.pos): r.z_milli for r in rows}
    # constant dim 0 -> all zeros
    assert z[(1, 0)] == z[(2, 0)] == z[(3, 0)] == 0
    # dim 1: values 2,4,6 -> z = -sqrt(3/2), 0, +sqrt(3/2) ~ +-1224
    assert z[(2, 1)] == 0
    assert -1230 <= z[(1, 1)] <= -1220
    assert 1220 <= z[(3, 1)] <= 1230
