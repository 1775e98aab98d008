"""Semantic invariants for wave 60 (bot regularity, burst rule)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )


def test_bot_regularity_flags_clockwork(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: perfect 60-second clock (variance 0) -> regular
    for i in range(10):
        rows.append((i, 1, t0 + datetime.timedelta(seconds=60 * i)))
    # user 2: wildly varying gaps -> not regular
    gaps = [1, 500, 3, 900, 10, 1400, 2, 2000, 7]
    t = t0
    rows.append((100, 2, t))
    for j, gsec in enumerate(gaps):
        t = t + datetime.timedelta(seconds=gsec)
        rows.append((101 + j, 2, t))
    ev = _events(spark, rows)
    g = ev.select(
        "user_id",
        (
            F.expr("unix_micros(ts) div 1000000")
            - F.expr(
                "lag(unix_micros(ts)) OVER (PARTITION BY user_id"
                " ORDER BY unix_micros(ts), event_id) div 1000000"
            )
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    s = (
        g.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("gap_s").alias("sg"),
             F.sum(F.expr("gap_s * gap_s")).alias("sgg"))
        .filter((F.col("n") >= 5) & (F.col("sg") > 0))
    )
    rv = {
        r.user_id: r.rel
        for r in s.selectExpr(
            "user_id", "(n * sgg - sg * sg) * 10000 div (sg * sg) AS rel"
        ).collect()
    }
    assert rv[1] == 0          # clockwork: zero relative variance
    assert rv[2] >= 2000       # human-ish: overdispersed


def test_burst_rule_threshold(spark):
    t0 = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [(i, 1, t0 + datetime.timedelta(seconds=30 * i)) for i in range(6)]
    rows += [(10 + i, 2, t0 + datetime.timedelta(hours=i)) for i in range(6)]
    ev = _events(spark, rows)
    w = ev.groupBy(
        "user_id", F.expr("unix_micros(ts) div 600000000").alias("win")
    ).agg(F.count(F.lit(1)).alias("n"))
    peaks = {
        r.user_id: r.peak
        for r in w.groupBy("user_id").agg(F.max("n").alias("peak")).collect()
    }
    # user 1 packs 6 events into <10 min (possibly split 5/1 across a
    # window boundary); user 2 never exceeds 1 per window
    assert peaks[1] >= 5 and peaks[2] == 1


def test_registered_audits_run(spark):
    r = REGISTRY["bot_regularity_audit"].fn(spark, SF).collect()[0]
    assert 0 <= r.n_regular <= r.n_users_scored
    b = REGISTRY["burst_users_10min"].fn(spark, SF)
    assert b.count() >= 0
