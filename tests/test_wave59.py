"""Semantic invariants for wave 59 (streaming qsketch, gap audit)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_streaming_qsketch_equals_batch(spark):
    got = {
        r.label: (r.est_micros, r.n_total)
        for r in REGISTRY["streaming_qsketch"].fn(spark, SF).collect()
    }
    want = {
        r.label: (r.est_micros, r.n_total)
        for r in REGISTRY["qsketch_value_quantiles"].fn(spark, SF).collect()
    }
    assert got == want  # count-sum merge is batch-identical


def test_gap_audit_planted_gaps(spark):
    # keys 1..10 and 15..20 with 12 missing inside, plus a bucket-edge
    # gap when buckets are 100k wide (all in one bucket here) -- use the
    # same logic inline with a tiny bucket to exercise the edge path
    keys = list(range(1, 11)) + [12] + list(range(15, 21)) + [200_015]
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    k = df.select("key", F.expr("key div 100000").alias("b"))
    intra = k.select(
        "key", F.expr("lag(key) OVER (PARTITION BY b ORDER BY key)").alias("prev")
    )
    intra_gaps = intra.filter(
        F.col("prev").isNotNull() & (F.col("key") - F.col("prev") > 1)
    ).select((F.col("prev") + 1).alias("s"), (F.col("key") - 1).alias("e"))
    bs = k.groupBy("b").agg(F.min("key").alias("mn"), F.max("key").alias("mx"))
    edge = bs.select("mx", F.expr("lead(mn) OVER (ORDER BY b)").alias("nm"))
    edge_gaps = edge.filter(
        F.col("nm").isNotNull() & (F.col("nm") - F.col("mx") > 1)
    ).select((F.col("mx") + 1).alias("s"), (F.col("nm") - 1).alias("e"))
    gaps = sorted(
        [(r.s, r.e) for r in intra_gaps.unionByName(edge_gaps).collect()]
    )
    assert gaps == [(11, 11), (13, 14), (21, 200_014)]


def test_gap_audit_registered_runs(spark):
    r = REGISTRY["orderkey_gap_audit"].fn(spark, SF).collect()[0]
    assert r.n_gaps >= 0 and r.n_missing_keys >= 0
    if r.n_gaps == 0:
        assert r.first_gap_start == -1
