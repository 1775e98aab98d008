"""Round-3 coverage wave 59: streaming quantiles and sequence-gap
integrity.

- ``streaming_qsketch``: quantiles over a stream via the mergeable
  log-bucket sketch -- per-micro-batch sketches land in an epoch store
  and merge by bucket-count addition (associative + commutative, so the
  result is batch-identical however the stream is split).  Completes
  the mergeable-sketch streaming pair with ``streaming_hll_rollup``.
- ``orderkey_gap_audit``: ingestion-completeness check -- missing
  ranges in the order-key sequence.  Partition-honest: keys hash into
  fixed-width buckets, gaps WITHIN a bucket come from a bucket-local
  lag window, and gaps ACROSS bucket boundaries from the bucket-stats
  table (bucket-count rows, broadcastable); no global-sort window ever
  sees the full key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.plans.wave6 import _qsketch_sql
from mapreduce6240project_spark.sources.tables import load_table

_BUCKET = 100_000


@_register(
    "streaming_qsketch",
    # identical estimate arithmetic to qsketch_value_quantiles: the
    # merged stream sketch IS the batch sketch, so they share the oracle
    _qsketch_sql(),
    ref="extension: streaming mergeable quantile sketch (per-batch "
    "sketches, epoch store, count-sum merge) -- batch-identical by "
    "associativity; shares the batch oracle",
)
def q_streaming_qsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.streaming.jobs import (
        streaming_qsketch_quantiles,
    )

    return streaming_qsketch_quantiles(spark, sf_dir)


@_register(
    "orderkey_gap_audit",
    f"""
WITH k AS (SELECT o_orderkey AS key, o_orderkey // {_BUCKET} AS b FROM orders),
intra AS (
  SELECT key, lag(key) OVER (PARTITION BY b ORDER BY key) AS prev
  FROM k
),
intra_gaps AS (
  SELECT prev + 1 AS gap_start, key - 1 AS gap_end
  FROM intra WHERE prev IS NOT NULL AND key - prev > 1
),
bs AS (SELECT b, min(key) AS mn, max(key) AS mx FROM k GROUP BY b),
edge AS (
  SELECT mx, lead(mn) OVER (ORDER BY b) AS next_mn
  FROM bs
),
edge_gaps AS (
  SELECT mx + 1 AS gap_start, next_mn - 1 AS gap_end
  FROM edge WHERE next_mn IS NOT NULL AND next_mn - mx > 1
),
gaps AS (SELECT * FROM intra_gaps UNION ALL SELECT * FROM edge_gaps)
SELECT CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(coalesce(sum(gap_end - gap_start + 1), 0) AS BIGINT)
         AS n_missing_keys,
       CAST(coalesce(min(gap_start), -1) AS BIGINT) AS first_gap_start
FROM gaps""",
    ref="extension: sequence-gap integrity audit -- bucket-local lag "
    "windows + bucket-stats edge pass; no global-sort window over the "
    "full key set",
)
def q_orderkey_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.expr(f"o_orderkey div {_BUCKET}").alias("b"),
    )
    intra = k.select(
        "key", F.expr("lag(key) OVER (PARTITION BY b ORDER BY key)").alias("prev")
    )
    intra_gaps = intra.filter(
        F.col("prev").isNotNull() & (F.col("key") - F.col("prev") > 1)
    ).select(
        (F.col("prev") + 1).alias("gap_start"), (F.col("key") - 1).alias("gap_end")
    )
    bs = k.groupBy("b").agg(F.min("key").alias("mn"), F.max("key").alias("mx"))
    edge = bs.select(
        "mx", F.expr("lead(mn) OVER (ORDER BY b)").alias("next_mn")
    )
    edge_gaps = edge.filter(
        F.col("next_mn").isNotNull() & (F.col("next_mn") - F.col("mx") > 1)
    ).select(
        (F.col("mx") + 1).alias("gap_start"), (F.col("next_mn") - 1).alias("gap_end")
    )
    gaps = intra_gaps.unionByName(edge_gaps)
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.coalesce(F.sum(F.col("gap_end") - F.col("gap_start") + 1), F.lit(0))
        .cast("bigint")
        .alias("n_missing_keys"),
        F.coalesce(F.min("gap_start"), F.lit(-1))
        .cast("bigint")
        .alias("first_gap_start"),
    )
