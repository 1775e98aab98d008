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


def test_asof_forward_and_nearest(spark):
    from mapreduce6240project_spark.operators.joins import as_of_join
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:10"), (2, 1, "2024-01-01 00:01:00"),
         (3, 1, "2024-01-01 00:05:00"), (4, 2, "2024-01-01 00:00:00")],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30", 100.0), (1, "2024-01-01 00:04:00", 200.0)],
        "user_id long, ts_s string, px double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "px")

    fwd = {
        r.event_id: r.px_asof
        for r in as_of_join(
            left, right, "user_id", "ts", "ts", ["px"], direction="forward"
        ).collect()
    }
    # e1 @00:10 -> 00:30 (100); e2 @01:00 -> 04:00 (200); e3 @05:00 -> none
    assert fwd == {1: 100.0, 2: 200.0, 3: None, 4: None}

    near = {
        r.event_id: r.px_asof
        for r in as_of_join(
            left, right, "user_id", "ts", "ts", ["px"], direction="nearest"
        ).collect()
    }
    # e1: 20s back? no prev; next 00:30 -> 100. e2: prev 30s, next 180s -> 100.
    # e3: prev 60s (200), no next -> 200. e4 (user 2): no rights -> None
    assert near == {1: 100.0, 2: 100.0, 3: 200.0, 4: None}


def test_asof_backward_unchanged_matches_inclusive_tie(spark):
    from mapreduce6240project_spark.operators.joins import as_of_join
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:01:00")], "event_id long, user_id long, ts_s string"
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", 7.0)], "user_id long, ts_s string, px double"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "px")
    got = as_of_join(left, right, "user_id", "ts", "ts", ["px"]).first()
    assert got.px_asof == 7.0  # inclusive: equal-timestamp right matches


def test_asof_directions_match_pandas_merge_asof(spark):
    """All three directions against pandas.merge_asof, an independent
    reference implementation, on a deterministic pseudo-random input
    with timestamp collisions across keys."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mapreduce6240project_spark.operators.joins import as_of_join

    rng = [(i * 2654435761) % 97 for i in range(60)]
    left_rows = [
        (i, rng[i] % 3, 1_700_000_000_000_000 + (rng[i] % 13) * 7_000_000)
        for i in range(30)
    ]
    right_rows = [
        (rng[i + 30] % 3, 1_700_000_000_000_000 + (rng[i + 30] % 11) * 9_000_000,
         float(i))
        for i in range(30)
    ]
    left = spark.createDataFrame(
        left_rows, "event_id long, k long, us long"
    ).select("event_id", "k", F.timestamp_micros("us").alias("ts"))
    right = (
        spark.createDataFrame(right_rows, "k long, us long, px double")
        .select("k", F.timestamp_micros("us").alias("ts"), "px")
        # merge_asof picks the LAST right row among equal timestamps
        # (and the first for forward); collapse ties so both engines
        # resolve them identically
        .groupBy("k", "ts")
        .agg(F.max("px").alias("px"))
    )
    lpd = (
        pd.DataFrame(
            [(e, k, pd.Timestamp(us, unit="us")) for e, k, us in left_rows],
            columns=["event_id", "k", "ts"],
        )
        .astype({"ts": "datetime64[us]"})
        .sort_values("ts", kind="stable")
    )
    rpd = (
        right.toPandas()
        .astype({"ts": "datetime64[us]"})
        .sort_values("ts", kind="stable")
    )
    for direction in ("backward", "forward", "nearest"):
        got = {
            r.event_id: r.px_asof
            for r in as_of_join(
                left, right, "k", "ts", "ts", ["px"], direction=direction
            ).collect()
        }
        want_df = pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction=direction,
            allow_exact_matches=True,
        )
        want = {
            int(r.event_id): (None if pd.isna(r.px) else float(r.px))
            for r in want_df.itertuples()
        }
        assert got == want, f"direction={direction}"
