"""Round-3 coverage wave 20: mergeable-sketch rollup.

``hll_mergeable_rollup``: per-day approximate distinct users AND the
month total, where the total is derived by MERGING the per-day HLL
registers (max per bucket) -- the raw events are scanned exactly once.
This is the re-aggregatable-cube property that makes sketches the
right distinct-count representation at 100 TB: day registers persist
in a summary table, and any coarser rollup (week, month, all-time) is
an m-row-per-group register merge, never a rescan.  Every step is the
portable integer HLL (``operators.sketch``), so the DuckDB oracle
replays both grains bit-for-bit.

Reference parity note: sketch rollups are engine extensions alongside
SURVEY.md section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY, _register
from mapreduce6240project_spark.sources.tables import load_table

_B = 8
_M = 1 << _B
_WIDTH = 60 - _B
_SCALE = _WIDTH + 1
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)
_MASK = (1 << _WIDTH) - 1

_EST_SQL = f"""
  CAST(round(
    CASE WHEN (CAST({_ALPHA!r} AS DOUBLE) * {_M} * {_M} * CAST({float(1 << _SCALE)!r} AS DOUBLE)
               / (sp + ({_M} - used) * ({1 << _SCALE})::BIGINT)) <= {2.5 * _M}
              AND ({_M} - used) > 0
         THEN CAST({float(_M)!r} AS DOUBLE) * ln(CAST({float(_M)!r} AS DOUBLE) / ({_M} - used))
         ELSE CAST({_ALPHA!r} AS DOUBLE) * {_M} * {_M} * CAST({float(1 << _SCALE)!r} AS DOUBLE)
              / (sp + ({_M} - used) * ({1 << _SCALE})::BIGINT)
    END) AS BIGINT)"""


@_register(
    "hll_mergeable_rollup",
    f"""
WITH h AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
),
r AS (
  SELECT day, h >> {_WIDTH} AS j,
         CASE WHEN (h & {_MASK}) = 0 THEN {_SCALE}
              ELSE {_SCALE} - length(bin(h & {_MASK})) END AS rho
  FROM h
),
day_regs AS (SELECT day, j, max(rho) AS M FROM r GROUP BY day, j),
day_s AS (
  SELECT day, count(*) AS used,
         COALESCE(sum((1::BIGINT << ({_SCALE} - M))::BIGINT), 0) AS sp
  FROM day_regs GROUP BY day
),
total_regs AS (SELECT j, max(M) AS M FROM day_regs GROUP BY j),
total_s AS (
  SELECT count(*) AS used,
         COALESCE(sum((1::BIGINT << ({_SCALE} - M))::BIGINT), 0) AS sp
  FROM total_regs
)
SELECT 'day' AS grain, day AS grain_key, {_EST_SQL} AS n_approx FROM day_s
UNION ALL
SELECT 'total' AS grain, 'all' AS grain_key, {_EST_SQL} AS n_approx FROM total_s""",
    ref="extension: mergeable-HLL rollup (per-day registers merged by "
    "max-per-bucket into the total estimate; one raw scan, any coarser "
    "grain is an m-row register merge)",
)
def q_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    # localCheckpoint (not persist): materialized once for both grains,
    # released when the plan is garbage-collected -- a bare persist here
    # would pin another copy of the registers per invocation for the
    # whole session
    day_regs = hll_registers(ev, "user_id", b=_B, group_cols=("day",)).localCheckpoint()
    per_day = hll_estimate(day_regs, b=_B, group_cols=("day",)).select(
        F.lit("day").alias("grain"),
        F.col("day").alias("grain_key"),
        "n_approx",
    )
    merged = day_regs.groupBy("j").agg(F.max("M").alias("M"))
    total = hll_estimate(merged, b=_B).select(
        F.lit("total").alias("grain"),
        F.lit("all").alias("grain_key"),
        "n_approx",
    )
    return per_day.unionByName(total)


@_register(
    "streaming_hll_rollup",
    # the stream's answer is bit-identical to the batch rollup by
    # max-merge algebra, so it shares the batch query's full oracle --
    # a streaming job with a value-hash correctness gate, not rows-only
    REGISTRY["hll_mergeable_rollup"].oracle,
    ref="extension: streaming distinct-count via mergeable HLL register "
    "state in foreachBatch; batch-split- and replay-independent by "
    "max-merge algebra (oracle = the batch rollup's SQL)",
)
def q_streaming_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.streaming.jobs import streaming_hll_rollup

    return streaming_hll_rollup(spark, sf_dir)
