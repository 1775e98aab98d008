"""Edge tests for the as-of and interval join operators."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.joins import as_of_join, interval_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_null_before_first(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100),
         (1, _ts("2024-01-01 12:00:00"), 101),
         (2, _ts("2024-01-01 09:00:00"), 200)],
        "k long, ts timestamp, lv long")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 7),   # equal ts -> inclusive match
         (1, _ts("2024-01-01 11:00:00"), 8),
         (2, _ts("2024-01-01 11:00:00"), 9)],  # after left row -> no match
        "k long, ts timestamp, rv long")
    out = {r.lv: r.rv_asof for r in
           as_of_join(left, right, "k", "ts", "ts", ["rv"]).collect()}
    assert out == {100: 7, 101: 8, 200: None}


def test_interval_join_crosses_bucket_boundary(spark):
    # two events 30s apart straddling a 60s bucket edge must still pair
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:00:59")),
         (1, 11, _ts("2024-01-01 00:01:14")),
         (1, 12, _ts("2024-01-01 00:10:00")),
         (2, 20, _ts("2024-01-01 00:00:59"))],
        "k long, id long, ts timestamp")
    pairs = interval_join(
        left, left, key="k", left_ts="ts", right_ts="ts",
        tolerance_s=60, right_cols=["id"],
    ).filter(F.col("id") < F.col("id_r"))
    got = {(r.id, r.id_r) for r in pairs.collect()}
    assert got == {(10, 11)}  # 59s->74s pair; 12 too far; 20 other key


def test_interval_join_no_duplicate_pairs(spark):
    left = spark.createDataFrame(
        [(1, i, _ts(f"2024-01-01 00:00:{i:02d}")) for i in range(10)],
        "k long, id long, ts timestamp")
    pairs = interval_join(
        left, left, key="k", left_ts="ts", right_ts="ts",
        tolerance_s=60, right_cols=["id"],
    ).filter(F.col("id") < F.col("id_r"))
    rows = [(r.id, r.id_r) for r in pairs.collect()]
    assert len(rows) == len(set(rows)) == 45  # C(10,2), each exactly once
