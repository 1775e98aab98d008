"""Round-3 coverage wave 11: incremental-maintenance and scalable
bookkeeping patterns a 100 TB pipeline leans on daily.

- ``incremental_merge_agg``: incremental view maintenance.  History
  (ts < cutoff) is aggregated once into mergeable partials (count +
  integer-micros sum -- associative, so re-merging cannot drift), the
  new delta (ts >= cutoff) is aggregated separately, and the two
  partial tables are merged and finalized.  At 100 TB this is the
  difference between re-scanning a year of history per day and scanning
  only the new day; the oracle proves merge(history, delta) equals the
  full recompute bit-for-bit.
- ``length_band_docs``: percentile-band filtering (drop the length
  tails, a standard corpus-quality gate).  The two global cutoffs are a
  1-row aggregate broadcast into the scan filter -- no sort, no window.
- ``stable_doc_ids``: global contiguous row numbering WITHOUT the
  single-partition global window (``row_number() OVER (ORDER BY ...)``
  funnels all data through one task -- the classic scale trap).  Range
  repartition by key, sort within partitions, number within each
  partition in parallel, then add per-partition offsets computed from a
  partition-count table whose size is the partition count, not the data.

Reference parity note: the reference has no incremental or bookkeeping
surface; this wave belongs to the LLM-data-pipeline extension mandated
alongside SURVEY.md section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.numeric import stable_sum_micros_sql
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

#: High-water mark separating "already summarized" history from the new
#: delta.  Mid-range of the generator's one-month event span.
CUTOFF = "2024-01-16 00:00:00"


@_register(
    "incremental_merge_agg",
    f"""
SELECT event_type,
       count(*) AS n_events,
       {stable_sum_micros_sql('value')} AS sum_value
FROM events
GROUP BY event_type""",
    ref="extension: incremental view maintenance -- mergeable partial "
    "aggregates (count + integer-micros sum) over history ts < cutoff "
    "merged with the fresh delta; oracle is the full recompute, proving "
    "merge == recompute exactly",
)
def q_incremental_merge_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(CUTOFF).cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        # Mergeable state: BIGINT count + BIGINT micros sum.  Integer
        # addition is associative, so merging partials in any order (or
        # any number of increments) reproduces the full recompute.
        micros = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum(micros).alias("micros")
        )

    history = partials(ev.filter(F.col("ts") < cutoff))  # stored summary
    delta = partials(ev.filter(F.col("ts") >= cutoff))  # today's increment
    return (
        history.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n_events"), F.sum("micros").alias("micros"))
        .select(
            "event_type",
            "n_events",
            F.round(F.col("micros") / 1000000.0, 4).alias("sum_value"),
        )
    )


@_register(
    "length_band_docs",
    """
WITH cuts AS (
  SELECT quantile_cont(n_chars, 0.05) AS lo, quantile_cont(n_chars, 0.95) AS hi
  FROM documents
)
SELECT d.lang,
       count(*) AS n_docs,
       round(sum(d.n_chars) / count(*), 4) AS avg_chars
FROM documents d, cuts c
WHERE d.n_chars >= c.lo AND d.n_chars <= c.hi
GROUP BY d.lang""",
    ref="extension: percentile-band length gate (corpus-quality tail "
    "trim); cutoffs are a 1-row exact-percentile aggregate broadcast "
    "into the scan filter -- no global sort",
)
def q_length_band_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cuts = docs.agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    # 1-row broadcast nested-loop join: each scan task gets the cutoffs
    # as in-memory literals; the documents scan stays narrow.
    return (
        docs.crossJoin(F.broadcast(cuts))
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("n_chars") / F.count("*"), 4).alias("avg_chars"),
        )
    )


@_register(
    "stable_doc_ids",
    """
SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS stable_id
FROM documents""",
    ref="extension: scalable global row numbering -- range repartition + "
    "within-partition window + partition-count offsets; equals "
    "row_number() OVER (ORDER BY doc_id) without the single-partition "
    "global-window funnel",
)
def q_stable_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Degenerate (no-strata) case of the shared range-exchange +
    # pid-offsets helper; see operators.ranking.stratum_order_stats for
    # the boundary-sample pinning rationale.
    from mapreduce6240project_spark.operators.ranking import (
        stratum_order_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return stratum_order_stats(docs, strata=[], order=["doc_id"]).select(
        "doc_id", F.col("rn").alias("stable_id")
    )
