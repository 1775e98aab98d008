"""Round-3 coverage wave 39: provenance-level dedup audit and a file
compaction planner.

- ``source_overlap_matrix``: which sources copy from each other -- for
  every source pair, how many exact content fingerprints they share.
  The provenance view of dedup that decides which feeds to drop or
  down-weight before training.  Distinct (fingerprint, source) pairs
  self-joined on the fingerprint key; the matrix is
  (n_sources x n_sources)-bounded.
- ``compaction_plan``: OPTIMIZE-style small-file bin packing -- per
  source, documents (standing in for data files, sized by n_chars) are
  assigned to output groups by a running-size cursor
  (floor(cumulative_before / target)), and the plan reports each output
  group's file count and byte total.  The assignment is one window
  cumsum per source partition -- the same shape a real table-maintenance
  planner runs over the file manifest, which is always many orders of
  magnitude smaller than the data it describes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.dedup import normalize_text
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_TARGET_CHARS = 4000


@_register(
    "source_overlap_matrix",
    f"""
WITH fp AS (
  SELECT DISTINCT md5({_NORM}) AS fingerprint, source FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fp a JOIN fp b
  ON a.fingerprint = b.fingerprint AND a.source < b.source
GROUP BY 1, 2""",
    ref="extension: cross-source duplicate-overlap matrix -- distinct "
    "(fingerprint, source) self-join on the digest key; output bounded "
    "by n_sources^2",
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5(normalize_text("text")).alias("fingerprint"), "source")
        .distinct()
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@_register(
    "compaction_plan",
    f"""
WITH files AS (
  SELECT source, doc_id, n_chars,
         coalesce(sum(n_chars) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM documents
)
SELECT source, CAST(before // {_TARGET_CHARS} AS BIGINT) AS out_group,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM files
GROUP BY 1, 2""",
    ref="extension: OPTIMIZE-style compaction planner -- running-size "
    "cursor (window cumsum per source) assigns files to target-sized "
    "output groups; manifest-sized work",
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    files = docs.withColumn(
        "before", F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    )
    return (
        files.select(
            "source",
            F.expr(f"before div {_TARGET_CHARS}").cast("long").alias("out_group"),
            "n_chars",
        )
        .groupBy("source", "out_group")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
