"""Compute fan-out for hash-heavy narrow projections.

A small parquet file arrives as ONE input partition, so a compute-bound
projection chained onto it (MinHash signatures, SimHash bit-sums,
winnowing rolling hashes: thousands of integer ops per row) runs as a
single task while the other 31 cores idle.  At 100 TB the scan already
yields thousands of partitions and no help is needed -- so the fan-out
must be *conditional*: repartition only when the scan's parallelism is
below the cluster's, and otherwise add nothing to the plan.  An
unconditional ``repartition`` here would shuffle the full corpus text at
scale, which is exactly the kind of hidden cost this engine avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism iff its current partition count is below
    ``min_factor * defaultParallelism``.  Metadata-only check (physical
    planning, no job).  No-op -- zero plan change -- when the input is
    already wide enough, so it is safe in 100 TB paths."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < int(min_factor * target):
        return df.repartition(target)
    return df
