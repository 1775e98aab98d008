"""Dirty-stream replay (round-6 verdict item 6, streaming half):
out-of-order and duplicated event arrival driven through REAL
multi-micro-batch file streams, checked against the batch twin on the
same rows.

The streaming twins in ``streaming/jobs.py`` replay a single
micro-batch, which can never be out-of-order relative to itself.  Here
each test writes events across several parquet files consumed
one-file-per-trigger, with arrival order deliberately scrambled
(later-timestamped events arrive first) and exact duplicates planted,
and asserts the FINAL streaming answer equals the batch computation --
the equivalence Structured Streaming promises for data inside the
watermark, and the property a 100 TB ingest actually relies on (real
event logs arrive late, shuffled, and double-delivered).

Append-mode protocol: a window/session emits exactly once, when the
watermark passes its end.  Each test ships a trailing FLUSH batch (a
lone far-future sentinel event) that advances the watermark past every
real window; the sentinel's own window stays unemitted (the watermark
never passes it), so both sides compare on the real-event horizon.
"""

from __future__ import annotations

import time
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

SCHEMA = "user_id bigint, ts timestamp, value double"

#: flush sentinel: advances the watermark, never compared
_FLUSH = (99, datetime(2024, 1, 2, 23, 0), 0.0)
_HORIZON = datetime(2024, 1, 1, 20, 0)


def _write_batch(path, rows):
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, path)


def _d(h, m):
    return datetime(2024, 1, 1, h, m)


def _drive_append(spark, src, agg_builder):
    """One-file-per-trigger append-mode stream to completion; every row
    is emitted exactly once (finalized), so the union of emissions IS
    the final answer."""
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = agg_builder(stream)
    rows: list[tuple] = []

    def sink(batch_df, epoch_id):
        rows.extend(tuple(r) for r in batch_df.collect())

    q = agg.writeStream.outputMode("append").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sorted(rows)


def _scrambled_source(tmp_path, rows3):
    src = tmp_path / "events_src"
    src.mkdir()
    for i, batch in enumerate(rows3 + [[_FLUSH]]):
        _write_batch(src / f"b{i}.parquet", batch)
        time.sleep(1.1)  # file order follows modification time
    return src


def test_out_of_order_duplicates_tumbling_equals_batch(spark, tmp_path):
    # arrival order scrambled across batches: the 12:00 event lands
    # FIRST, the 10:0x events trickle in later but inside the generous
    # watermark; one event is delivered twice (at-least-once source)
    batches = [
        [(1, _d(12, 0), 5.0), (2, _d(10, 40), 1.0)],
        [(1, _d(10, 10), 2.0), (1, _d(10, 10), 2.0), (2, _d(11, 55), 3.0)],  # dup
        [(2, _d(10, 5), 7.0), (1, _d(11, 59), 4.0)],
    ]
    src = _scrambled_source(tmp_path, batches)

    def agg(stream):
        return (
            stream.withWatermark("ts", "6 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 4).alias("v"),
            )
            .select(F.col("w.start").alias("ws"), "n", "v")
            .filter(F.col("ws") < F.lit(_HORIZON))
        )

    got = _drive_append(spark, src, agg)
    batch_df = spark.createDataFrame(
        [r for b in batches for r in b] + [_FLUSH], SCHEMA
    )
    want = sorted(
        tuple(r)
        for r in (
            batch_df.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 4).alias("v"),
            )
            .select(F.col("w.start").alias("ws"), "n", "v")
            .filter(F.col("ws") < F.lit(_HORIZON))
        ).collect()
    )
    assert got == want
    # the duplicate was counted twice on both sides (at-least-once
    # semantics surface in the counts; dedup is a separate operator):
    # the 10:00 window holds 4 events -- 10:05, 10:40, and 10:10 TWICE
    assert (_d(10, 0), 4, 12.0) in got


def test_duplicate_replay_streaming_dedup_equals_batch_distinct(spark, tmp_path):
    # exact duplicates delivered across DIFFERENT micro-batches, out of
    # order, all inside the watermark: dropDuplicates state must
    # suppress every re-delivery, matching batch dropDuplicates
    batches = [
        [(1, _d(12, 0), 5.0)],
        [(1, _d(10, 10), 2.0), (1, _d(12, 0), 5.0)],   # cross-batch dup
        [(1, _d(10, 10), 2.0), (2, _d(11, 0), 3.0)],   # cross-batch dup
    ]
    src = _scrambled_source(tmp_path, batches)

    def agg(stream):
        # emits each first-seen row once: append-compatible
        return (
            stream.withWatermark("ts", "6 hours")
            .dropDuplicates(["user_id", "ts"])
            .filter(F.col("user_id") != _FLUSH[0])
            .select("user_id", "ts")
        )

    got = _drive_append(spark, src, agg)
    batch_df = spark.createDataFrame(
        [r for b in batches for r in b], SCHEMA
    )
    want = sorted(
        tuple(r)
        for r in batch_df.dropDuplicates(["user_id", "ts"])
        .select("user_id", "ts")
        .collect()
    )
    assert got == want and len(got) == 3


def test_out_of_order_session_windows_merge_across_batches(spark, tmp_path):
    # one user's session arrives SPLIT across micro-batches in reverse
    # time order; session-window state must merge the fragments into
    # the same sessions the batch twin computes
    batches = [
        [(1, _d(10, 40), 1.0)],                       # middle fragment first
        [(1, _d(10, 55), 1.0), (1, _d(14, 0), 9.0)],  # tail + far event
        [(1, _d(10, 30), 1.0), (2, _d(10, 0), 4.0)],  # head arrives LAST
    ]
    src = _scrambled_source(tmp_path, batches)

    def agg(stream):
        return (
            stream.withWatermark("ts", "8 hours")
            .groupBy(
                "user_id", F.session_window("ts", "30 minutes").alias("w")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user_id",
                F.col("w.start").alias("ws"),
                F.col("w.end").alias("we"),
                "n",
            )
            .filter(F.col("ws") < F.lit(_HORIZON))
        )

    got = _drive_append(spark, src, agg)
    batch_df = spark.createDataFrame([r for b in batches for r in b], SCHEMA)
    want = sorted(
        tuple(r)
        for r in batch_df.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "n",
        )
        .collect()
    )
    assert got == want
    # the three 10:30-10:55 fragments merged into ONE 3-event session
    assert any(r[3] == 3 for r in got)
