"""Watermark late-data semantics: prove that an event arriving behind
the watermark *after its window's state was evicted* is dropped from a
streaming aggregation, and that the same event is kept when the
watermark is generous.

The batch-replay streaming jobs in ``streaming/jobs.py`` never exercise
this path (a single micro-batch cannot be late relative to itself), so
this test drives a real three-micro-batch file stream:

- batch 1 advances max event time to 12:00 (watermark 11:50 under the
  10-minute delay), so the 10:00-11:00 window's state is evicted at the
  end of the *next* batch-1 commit;
- batch 2 is a plain fresh event -- by its end the 10:00 window is gone;
- batch 3 delivers an event at 10:05, now strictly behind the
  watermark with no surviving state: Spark drops it (and reports it in
  ``numRowsDroppedByWatermark``).

Spark's documented contract is one-directional: data inside the
watermark is *never* dropped; data behind it is dropped only once the
corresponding state is evicted (a late row landing in the same batch
that evicts its window can still be merged).  The batch layout above
tests the guaranteed-drop side; the generous-watermark twin tests the
guaranteed-keep side.
"""

from __future__ import annotations

import time
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

SCHEMA = "user_id bigint, ts timestamp"


def _write_batch(path, rows):
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, path)


def _run_windowed_count(spark, src_dir, watermark: str):
    """One-file-per-trigger windowed count in update mode; returns
    (emitted rows across all micro-batches, total watermark-dropped)."""
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    emitted: list[tuple] = []

    def sink(batch_df, epoch_id):
        emitted.extend((r.window_start, r.n) for r in batch_df.collect())

    q = agg.writeStream.outputMode("update").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        dropped = sum(
            op["numRowsDroppedByWatermark"]
            for p in q.recentProgress
            for op in p["stateOperators"]
        )
    finally:
        q.stop()
    return emitted, dropped


@pytest.fixture()
def three_batch_source(tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    d = lambda h, m: datetime(2024, 1, 1, h, m)  # noqa: E731
    _write_batch(src / "b1.parquet", [(1, d(10, 0)), (1, d(10, 30)), (1, d(12, 0))])
    time.sleep(1.1)  # file-source trigger order follows modification time
    _write_batch(src / "b2.parquet", [(1, d(12, 10))])
    time.sleep(1.1)
    _write_batch(src / "b3.parquet", [(1, d(10, 5)), (1, d(12, 30))])
    return src


def test_tight_watermark_drops_late_event(spark, three_batch_source):
    emitted, dropped = _run_windowed_count(spark, three_batch_source, "10 minutes")
    win10 = [n for (ws, n) in emitted if ws == datetime(2024, 1, 1, 10, 0)]
    assert win10, "10:00 window was never emitted"
    assert max(win10) == 2, f"late event leaked into a closed window: {emitted}"
    assert dropped == 1


def test_generous_watermark_keeps_late_event(spark, three_batch_source):
    # watermark never passes 10:00, so the 10:05 event is NOT late:
    # the 10:00 window must reach 3 (the guaranteed-keep direction)
    emitted, dropped = _run_windowed_count(spark, three_batch_source, "6 hours")
    win10 = [n for (ws, n) in emitted if ws == datetime(2024, 1, 1, 10, 0)]
    assert max(win10) == 3, f"in-watermark event was wrongly dropped: {emitted}"
    assert dropped == 0


# -- dropDuplicatesWithinWatermark eviction semantics (round 5) -------------


def _run_dedup_within_watermark(spark, src_dir, watermark: str):
    """One-file-per-trigger dropDuplicatesWithinWatermark on user_id;
    returns every (user_id, ts) emitted across micro-batches."""
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    dedup = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id"]
    )
    emitted: list[tuple] = []

    def sink(batch_df, epoch_id):
        emitted.extend((r.user_id, r.ts) for r in batch_df.collect())

    q = dedup.writeStream.outputMode("append").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return emitted


@pytest.fixture()
def dedup_two_batch_source(tmp_path):
    src = tmp_path / "dedup_src"
    src.mkdir()
    d = lambda h, m: datetime(2024, 1, 1, h, m)  # noqa: E731
    # batch 1: user 1 first-seen at 10:00 (duplicate at 10:05 suppressed
    # in-batch); user 2 advances max event time to 12:00
    _write_batch(
        src / "b1.parquet", [(1, d(10, 0)), (1, d(10, 5)), (2, d(12, 0))]
    )
    time.sleep(1.1)
    # batch 2: user 1 again at 12:30.  State eviction runs at batch END
    # (after dedup), so even under a 10-minute watermark the batch-1
    # state (expiry 10:10) is still live while batch 2 processes and
    # this row is suppressed -- but processing it advances the
    # watermark to 12:20, which evicts user 1's state at batch-2 end.
    _write_batch(src / "b2.parquet", [(1, d(12, 30))])
    time.sleep(1.1)
    # batch 3: user 1 at 13:00 -- state is gone, so under the tight
    # watermark this RE-EMITS; under a 6-hour watermark the original
    # state survives and it stays suppressed.
    _write_batch(src / "b3.parquet", [(1, d(13, 0))])
    return src


def test_dedup_within_watermark_reemits_after_eviction(
    spark, dedup_two_batch_source
):
    emitted = _run_dedup_within_watermark(
        spark, dedup_two_batch_source, "10 minutes"
    )
    user1 = sorted(ts for (u, ts) in emitted if u == 1)
    assert user1 == [
        datetime(2024, 1, 1, 10, 0),
        datetime(2024, 1, 1, 13, 0),
    ], f"expected re-emission after state eviction, got {emitted}"
    # the 12:30 duplicate arrived while the state was still live
    # (eviction runs at batch end), so it must NOT have been emitted
    assert datetime(2024, 1, 1, 12, 30) not in user1


def test_dedup_within_watermark_suppresses_inside_state(
    spark, dedup_two_batch_source
):
    emitted = _run_dedup_within_watermark(
        spark, dedup_two_batch_source, "6 hours"
    )
    user1 = [ts for (u, ts) in emitted if u == 1]
    assert user1 == [datetime(2024, 1, 1, 10, 0)], (
        f"duplicate inside the watermark must stay suppressed: {emitted}"
    )
