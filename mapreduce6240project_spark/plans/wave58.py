"""Round-3 coverage wave 58: ingest-loss accounting and streaming CDC.

- ``ingest_quarantine_report``: data-loss accounting for the CSV ingest
  path -- the reference's ETL drops malformed rows SILENTLY
  (kmeans.java:26-37,71-75); production pipelines must count what they
  drop and why.  The query runs the real parse filters over the
  rendered tweet CSV plus three planted malformed lines (empty,
  under-arity, non-numeric key) and reports per-reason counts.  The
  oracle is the spec: every rendered event parses cleanly, each planted
  line trips exactly one filter.
- ``streaming_cdc`` -- the streaming twin of ``cdc_latest_state``:
  per-user last-event state (max (ts, event_id)) in
  ``applyInPandasWithState``, tombstones applied at emission; final
  state equals the batch window query, which is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tweets import SPLIT_REGEX


@_register(
    "ingest_quarantine_report",
    """
SELECT CAST((SELECT count(*) FROM events) + 3 AS BIGINT) AS n_input,
       CAST(1 AS BIGINT) AS n_empty,
       CAST(1 AS BIGINT) AS n_arity,
       CAST(1 AS BIGINT) AS n_badid,
       CAST((SELECT count(*) FROM events) AS BIGINT) AS n_kept""",
    ref="P1/P2/P4 accounting: per-reason quarantine counts for the CSV "
    "ingest filters (kmeans.java:26-37,71-75 drops these silently); "
    "planted malformed lines prove each filter fires exactly once",
)
def q_quarantine_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.plans.parity import _render_tweet_csv

    planted = spark.createDataFrame(
        [
            ("",),  # P1 empty line
            ("a,b,c",),  # P2 arity <= 23
            ("xx," + ",".join(f"f{i}" for i in range(1, 24)),),  # P4 bad key
        ],
        "value string",
    )
    lines = _render_tweet_csv(spark, sf_dir).unionByName(planted)
    parts = F.split(F.col("value"), SPLIT_REGEX)
    flagged = lines.select(
        (F.col("value") == "").alias("is_empty"),
        ((F.col("value") != "") & (F.size(parts) <= 23)).alias("is_arity"),
        (
            (F.col("value") != "")
            & (F.size(parts) > 23)
            & parts.getItem(0).try_cast("long").isNull()
        ).alias("is_badid"),
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.col("is_empty").cast("bigint")).alias("n_empty"),
        F.sum(F.col("is_arity").cast("bigint")).alias("n_arity"),
        F.sum(F.col("is_badid").cast("bigint")).alias("n_badid"),
        F.sum(
            (
                ~F.col("is_empty") & ~F.col("is_arity") & ~F.col("is_badid")
            ).cast("bigint")
        ).alias("n_kept"),
    )


@_register(
    "streaming_cdc",
    """
WITH ranked AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, cents AS last_value_cents
FROM ranked WHERE rn = 1 AND event_type <> 'error'""",
    ref="extension: streaming CDC compaction -- applyInPandasWithState "
    "last-event-wins with tombstones at emission; bounded-stream result "
    "equals the batch window oracle (same SQL as cdc_latest_state)",
)
def q_streaming_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.streaming.jobs import streaming_cdc_state

    return streaming_cdc_state(spark, sf_dir)
