"""Checkpoint recovery: a streaming query stopped mid-stream and
restarted from its checkpoint must produce exactly the batch answer --
no lost batches, no double counting (exactly-once state recovery).

This is the operational property the streaming family's per-query
oracles cannot see (they run each job once, end to end): the WAL +
state-store round-trip across process generations.
"""

from __future__ import annotations

import glob
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_restart_from_checkpoint_is_exactly_once(spark):
    # stage the events table as 4 separate files so the file source has
    # multiple batches to process (maxFilesPerTrigger=1)
    src = tempfile.mkdtemp(prefix="sparkgraft_ckpt_src_")
    ckpt = tempfile.mkdtemp(prefix="sparkgraft_ckpt_wal_")
    sink = tempfile.mkdtemp(prefix="sparkgraft_ckpt_out_")
    events = load_table(spark, SF, "events").select("event_id", "event_type")
    events.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def build_query():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))

        def write_batch(batch_df, epoch_id):
            batch_df.write.mode("overwrite").parquet(f"{sink}/epoch={epoch_id}")

        return (
            agg.writeStream.outputMode("complete")
            .option("checkpointLocation", ckpt)
            .foreachBatch(write_batch)
        )

    # generation 1: process at least one batch, then stop mid-stream
    q1 = build_query().start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q1.lastProgress
            if p is not None and p["batchId"] >= 1:
                break
            time.sleep(0.2)
        else:  # pragma: no cover - diagnostic guard
            raise AssertionError("first generation never processed a batch")
    finally:
        q1.stop()
    epochs_gen1 = len(glob.glob(f"{sink}/epoch=*"))
    assert epochs_gen1 >= 1

    # generation 2: SAME checkpoint, fresh query object -- must resume,
    # not reprocess from scratch
    q2 = build_query().start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    last = max(
        glob.glob(f"{sink}/epoch=*"), key=lambda p: int(p.rsplit("=", 1)[1])
    )
    got = {
        r.event_type: r.n for r in spark.read.parquet(last).collect()
    }
    want = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
    # recovery resumed past the already-committed batches: total epochs
    # across both generations is bounded by the file count (4), so
    # generation 2 cannot have replayed everything from epoch 0
    final_epoch = int(last.rsplit("=", 1)[1])
    assert final_epoch <= 4
    for d in (src, ckpt, sink):
        shutil.rmtree(d, ignore_errors=True)
