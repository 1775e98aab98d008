"""Connector gating: optional formats must fail with a clear message in
this jar-less environment, not an obscure classpath stack."""

from __future__ import annotations

import pytest

from mapreduce6240project_spark.sources.connectors import (
    lakehouse_available,
    read_lakehouse,
    write_lakehouse,
)
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_lakehouse_probe_and_gate(spark):
    for fmt in ("delta", "iceberg", "hudi"):
        assert lakehouse_available(spark, fmt) is False  # jars not shipped
        with pytest.raises(NotImplementedError, match=fmt):
            write_lakehouse(load_table(spark, SF, "region"), "/tmp/x", fmt=fmt)
        with pytest.raises(NotImplementedError, match=fmt):
            read_lakehouse(spark, "/tmp/x", fmt=fmt)


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown lakehouse format"):
        lakehouse_available(spark, "orcish")


def test_compact_parquet_collapses_small_files(spark, tmp_path):
    import os

    from mapreduce6240project_spark.sources.layout import compact_parquet

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    spark.range(10_000).selectExpr("id", "id * 2 AS v").repartition(
        50
    ).write.parquet(src)
    n_in = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_in == 50
    n_out = compact_parquet(spark, src, dst, target_file_mb=128)
    assert n_out == 1
    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) == 1
    # content survives byte-for-byte (same rows, same schema)
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_dynamic_partition_overwrite_touches_only_written_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from mapreduce6240project_spark.sources.layout import (
        overwrite_partitions,
        write_partitioned,
    )

    path = str(tmp_path / "events_by_type")
    ev = load_table(spark, SF, "events").select("event_id", "value", "event_type")
    write_partitioned(ev, path, "event_type")
    before = {
        r.event_type: r.n
        for r in spark.read.parquet(path).groupBy("event_type").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert len(before) >= 2

    # backfill exactly one partition with a modified copy (half the rows)
    some_type = sorted(before)[0]
    patch = (
        ev.filter(F.col("event_type") == some_type)
        .filter(F.col("event_id") % 2 == 0)
    )
    overwrite_partitions(patch, path, "event_type")

    after = {
        r.event_type: r.n
        for r in spark.read.parquet(path).groupBy("event_type").count()
        .withColumnRenamed("count", "n").collect()
    }
    # the written partition changed; every other partition is intact
    assert after[some_type] < before[some_type]
    for t, n in before.items():
        if t != some_type:
            assert after[t] == n
