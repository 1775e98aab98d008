"""Semantic invariants for wave 66 (change point, tie leaderboard)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_changepoint_finds_planted_shift(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 10 days at level 10.00, then 10 days at level 50.00: the split
    # should land at the last low day (2024-01-10)
    for d in range(20):
        for _ in range(5):
            v = 10.0 if d < 10 else 50.0
            rows.append((eid, t0 + datetime.timedelta(days=d, hours=1), v))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).alias("y")
    )
    pre = daily.select(
        "day",
        F.expr("sum(y) OVER (ORDER BY day)").alias("s1"),
        F.expr("count(*) OVER (ORDER BY day)").alias("n1"),
        F.expr("sum(y) OVER ()").alias("st"),
        F.expr("count(*) OVER ()").alias("nt"),
    ).filter("n1 < nt")
    best = (
        pre.selectExpr(
            "day",
            "CAST(CAST(s1 AS DECIMAL(38,0)) * (nt - n1)"
            " - CAST(st - s1 AS DECIMAL(38,0)) * n1 AS DOUBLE) AS num",
            "n1 * (nt - n1) * nt AS den",
        )
        .selectExpr("day", "num * num / den AS gain")
        .orderBy(F.desc("gain"), "day")
        .first()
    )
    assert str(best.day) == "2024-01-10"


def test_tie_leaderboard_keeps_ties(spark):
    rows = REGISTRY["top_revenue_days_ties"].fn(spark, SF).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for seg, rs in by_seg.items():
        ranks = {x.rk for x in rs}
        assert ranks <= {1, 2, 3}
        # equal revenues share a rank
        by_rev = {}
        for x in rs:
            by_rev.setdefault(x.rev_c, set()).add(x.rk)
        assert all(len(v) == 1 for v in by_rev.values()), seg
