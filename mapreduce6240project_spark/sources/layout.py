"""Physical data-layout operators: bucketed tables and partitioned
directories.

The reference's HBase table gives it two physical properties for free:
key-ordered storage (range scans, kmeans.java:70-75) and key-sharded
regions (point lookups land on one region server).  The Spark-native
equivalents are *bucketing* (pre-shuffled, hash-sharded files that let
equi-joins and aggregations on the bucket key skip the exchange
entirely) and *partitioned directories* (coarse categorical sharding
that lets Catalyst prune whole directories at planning time).

At 100 TB these are the difference between a join that moves 100 TB
over the network and one that moves nothing: a fact table bucketed by
its join key pays the shuffle ONCE at write time and amortizes it over
every subsequent join/groupBy on that key.  Partitioned layout turns
``WHERE event_type = 'click'`` into a directory listing instead of a
full scan.

Both are exercised end-to-end by registry queries (wave4) whose plans
are asserted exchange-free / partition-pruned in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet
    table registered in the session catalog.

    Rows are hash-partitioned into ``buckets`` files by ``key`` at write
    time -- the one-time shuffle that later joins on ``key`` against any
    table bucketed the same way get to skip.  ``sortBy`` additionally
    orders rows within each bucket so a sort-merge join needs no sort
    either.  ``path`` pins the files outside the session warehouse
    (external table) so callers control the location.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def bucketed_merge_join(
    spark: SparkSession, left_name: str, right_name: str, key: str
) -> DataFrame:
    """Sort-merge equi-join of two same-bucketed catalog tables.

    With matching bucket counts on the join key, Spark plans this with
    ZERO Exchange operators -- each task reads bucket i of both sides
    and merges locally.  The ``merge`` hint stops the small-table
    broadcast path from hiding the demonstration (at 100 TB neither
    side broadcasts anyway).
    """
    left = spark.table(left_name)
    right = spark.table(right_name)
    return left.hint("merge").join(right, key)


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Write ``df`` as a parquet directory tree partitioned by the
    (low-cardinality) ``partition_col`` -- one subdirectory per value.

    A later read with an equality/IN filter on ``partition_col`` prunes
    at the directory level: the scan's ``PartitionFilters`` handle it
    before any file is opened.  This is the right layout for categorical
    columns a pipeline always filters on (event type, language, split).
    """
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def read_partition(
    spark: SparkSession, path: str, partition_col: str, value: str
) -> DataFrame:
    """Scan exactly one partition of a partitioned parquet tree.

    The equality predicate reaches the file index as a PartitionFilter
    (asserted in tests/test_plans.py), so only ``partition_col=value``
    directories are listed and read.
    """
    from pyspark.sql import functions as F

    return spark.read.parquet(path).filter(F.col(partition_col) == value)


def zorder_key(x, y, bits: int = 16):
    """Morton/Z-order interleave of two non-negative int columns
    (each masked to ``bits`` low bits): bit i of x lands at position
    2i, bit i of y at 2i+1.

    Z-ordering is the multi-dimensional clustering layout (Delta
    OPTIMIZE ZORDER BY, Hudi/Iceberg sort orders): writing files
    sorted by the interleaved key makes *both* dimensions' per-file
    min/max ranges narrow, so a rectangle predicate prunes files on
    either column -- a single-column sort only prunes its leading
    column.  The key is a pure codegen expression (32 shift/mask
    terms, no UDF); at 100 TB it feeds ``repartitionByRange(zkey)`` +
    ``sortWithinPartitions(zkey)`` ahead of the parquet write.
    """
    from pyspark.sql import functions as F

    xc = (x if not isinstance(x, str) else F.col(x)).cast("bigint")
    yc = (y if not isinstance(y, str) else F.col(y)).cast("bigint")
    mask = (1 << bits) - 1
    xm, ym = xc.bitwiseAND(F.lit(mask)), yc.bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = key + F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        key = key + F.shiftleft(
            F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return key


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The same interleave as :func:`zorder_key`, rendered as portable
    integer-arithmetic SQL (DuckDB oracle replay)."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(
            f"((({x_expr}) & {mask}) // {1 << i}) % 2 * {1 << (2 * i)}"
        )
        terms.append(
            f"((({y_expr}) & {mask}) // {1 << i}) % 2 * {1 << (2 * i + 1)}"
        )
    return "(" + " + ".join(terms) + ")"


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_mb: int = 128,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_mb)`` files and return that count.

    Streaming sinks and fine-grained partitioned writes accumulate
    thousands of KB-scale files; at 100 TB the *listing* alone then
    dominates query planning, and row-group-per-file kills scan
    throughput.  Compaction is the periodic maintenance job every
    production lake runs (Delta OPTIMIZE / Iceberg rewrite_data_files
    do exactly this under the hood -- see sources/connectors.py for the
    gated lakehouse path).

    ``repartition(n)`` (round-robin) rather than ``coalesce(n)``:
    coalesce merges without a shuffle but inherits input skew, so one
    output file can end up holding most of the bytes; the compaction
    shuffle IS the point.  Sizing reads the source footprint from the
    filesystem; on a real cluster the same number comes from the
    FileSystem API / table statistics, and the write adds
    ``maxRecordsPerFile`` as a safety bound."""
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_dir):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(src_dir).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(dst_dir)
    return n_files


def overwrite_partitions(df: DataFrame, path: str, partition_col: str) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df``, leaving every other partition of the tree untouched.

    With static overwrite (the default) an ``overwrite`` write drops the
    whole table first -- re-running one day's backfill would erase the
    other 364 days.  Dynamic mode scopes the delete to the partitions
    the incoming frame actually contains, which is the idempotent-daily-
    backfill contract every partitioned fact table at scale relies on.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
