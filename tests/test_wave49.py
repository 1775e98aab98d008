"""Semantic invariants for wave 49 (permutation test, CDC apply)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_permutation_test_shape(spark):
    r = REGISTRY["permutation_test_value"].fn(spark, SF).collect()[0]
    assert r.n_perms == 20
    assert 0 <= r.n_extreme <= 20
    assert r.obs_gap_cents >= 0


def test_cdc_tombstone_deletes_key(spark):
    t0 = datetime.datetime(2024, 1, 1)

    def at(m):
        return t0 + datetime.timedelta(minutes=m)

    ev = spark.createDataFrame(
        [
            (1, 5, "click", at(0), 10.0),
            (2, 5, "purchase", at(1), 20.0),   # user 5 final: 2000 cents
            (3, 6, "click", at(0), 30.0),
            (4, 6, "error", at(9), 0.0),       # user 6: tombstoned
        ],
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    )
    ranked = ev.select(
        "user_id", "event_type", "event_id", "ts",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    ).withColumn(
        "rn",
        F.expr("row_number() OVER (PARTITION BY user_id"
               " ORDER BY ts DESC, event_id DESC)"),
    )
    out = {
        r.user_id: r.cents
        for r in ranked.filter(
            (F.col("rn") == 1) & (F.col("event_type") != "error")
        ).collect()
    }
    assert out == {5: 2000}
