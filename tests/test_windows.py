"""Window/sessionization tests incl. batch-vs-streaming agreement."""

from __future__ import annotations

import pytest

from mapreduce6240project_spark.operators.windows import (
    sessionize,
    sliding_window,
    tumbling_window,
)
from mapreduce6240project_spark.sources.tables import load_table
from mapreduce6240project_spark.streaming import (
    streaming_sessions,
    streaming_tumbling,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").cache()


def test_tumbling_counts_sum_to_total(events):
    out = tumbling_window(events)
    assert out.groupBy().sum("n").first()[0] == events.count()


def test_sliding_double_counts(events):
    out = sliding_window(events)  # width 10m, slide 5m -> each event in 2 windows
    assert out.groupBy().sum("n").first()[0] == 2 * events.count()


def test_sessionize_invariants(events):
    sess = sessionize(events).collect()
    assert sum(r.n_events for r in sess) == events.count()
    assert all(r.duration_s >= 0 for r in sess)
    # sessions of one user don't overlap within the gap: starts are
    # separated by > gap when sorted
    by_user: dict[int, list] = {}
    for r in sess:
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r.session_start)
        for a, b in zip(rows, rows[1:]):
            assert b.session_start >= a.session_start + a.duration_s + 1800


def test_streaming_tumbling_equals_batch(spark, events):
    batch = {(r.window_start, r.event_type): (r.n, r.sum_value)
             for r in tumbling_window(events).collect()}
    stream = {(r.window_start, r.event_type): (r.n, r.sum_value)
              for r in streaming_tumbling(spark, SF).collect()}
    assert batch == stream


def test_streaming_sessions_agree_with_batch_sessionize(spark, events):
    batch = {(r.user_id, r.session_start): r.n_events
             for r in sessionize(events).collect()}
    stream = {(r.user_id, r.session_start): r.n_events
              for r in streaming_sessions(spark, SF).collect()}
    assert batch == stream


def test_gapfill_locf_dense_grid(spark):
    from pyspark.sql import functions as F

    from mapreduce6240project_spark.operators.windows import gapfill_locf

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    filled = gapfill_locf(ev, width_s=600).persist()
    # dense grid: every key has one row per bucket between global min/max
    span = filled.agg(
        F.min("window_start"), F.max("window_start"), F.countDistinct("event_type")
    ).first()
    n_buckets = (span[1] - span[0]) // 600 + 1
    assert filled.count() == n_buckets * span[2]
    # empty buckets exist (n=0) and still carry a non-null LOCF value
    empties = filled.filter(F.col("n") == 0)
    if empties.count() > 0:
        carried = empties.filter(F.col("sum_value_locf").isNotNull())
        assert carried.count() > 0
    filled.unpersist()


def test_rolling_median_odd_even_frames(spark):
    from pyspark.sql import functions as F

    from mapreduce6240project_spark.operators.windows import rolling_median

    # one user, values 10, 30, 20: medians 10, (10+30)/2=20, 20
    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:01", 10.0),
         (2, 1, "2024-01-01 00:00:02", 30.0),
         (3, 1, "2024-01-01 00:00:03", 20.0)],
        "event_id long, user_id long, ts_s string, value double",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "value")
    got = {r.event_id: r.median_micros for r in rolling_median(df, width=7).collect()}
    assert got == {1: 10_000_000, 2: 20_000_000, 3: 20_000_000}


def test_streaming_checkpoint_recovery_is_exactly_once(spark, tmp_path):
    """Restarting a checkpointed stream over an unchanged source must
    not reprocess: the file-source offsets live in the checkpoint, so
    the second run emits zero rows (exactly-once across restarts)."""
    from mapreduce6240project_spark.streaming.jobs import _stream_events

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")
    seen: list[tuple[int, int]] = []

    def run_once():
        counts = (
            _stream_events(spark, "/root/testdata/sf0.001")
            .groupBy("event_type")
            .count()
        )

        def write_batch(df, epoch_id):
            seen.append((epoch_id, df.count()))
            df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

        q = (
            counts.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(write_batch)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    assert sum(n for _, n in seen) > 0  # first run processed the source
    first_epochs = [e for e, _ in seen]
    seen.clear()
    run_once()
    # restart: offsets are committed, so either no batch fires or only
    # empty batches with epoch ids strictly after the first run's
    assert all(n == 0 for _, n in seen)
    assert all(e > max(first_epochs) for e, _ in seen)


def test_transform_with_state_gated_or_working(spark):
    """transformWithStateInPandas needs protobuf (a PySpark lazy import);
    without it the wrapper must fail fast with NotImplementedError, and
    with it the bounded-stream result must equal the batch sum."""
    import pytest
    from pyspark.sql import functions as F

    from mapreduce6240project_spark.sources.tables import load_table
    from mapreduce6240project_spark.streaming import streaming_tws_running_sum

    try:
        import google.protobuf  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False

    if not has_protobuf:
        with pytest.raises(NotImplementedError, match="protobuf"):
            streaming_tws_running_sum(spark, "/root/testdata/sf0.001")
        return

    got = {
        r.user_id: r.total_micros
        for r in streaming_tws_running_sum(spark, "/root/testdata/sf0.001").collect()
    }
    want = {
        r.user_id: r.total
        for r in load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
            ).alias("total")
        )
        .collect()
    }
    assert got == want
