"""Round-3 coverage wave 76: cross-document repetition and classical
two-sample inference.

- ``cross_doc_repetition``: per-document fraction of word-3-gram
  shingles that also occur in at least one OTHER document -- the
  cross-doc boilerplate gauge (``doc_repetition`` measures repetition
  *inside* a document; this measures how much of a document is shared
  corpus-wide, the signal used to strip templated headers/footers
  before training).  Shape: distinct (doc, shingle-hash60) explode ->
  hash document-frequency (one shuffle, partial-agg friendly) -> join
  back on the 8-byte hash -> per-doc shared fraction in permyriad
  integers.  Shingles are reduced to the cross-engine 60-bit md5-prefix
  hash BEFORE the shuffle, so the exchanged key is an int, not a
  ~25-byte string (measured ~25% wall-clock win at sf0.1; collision
  odds at 2^60 are negligible for an audit metric and the oracle
  replays the identical hash).  Work is linear in total shingle
  occurrences; no doc-pair join anywhere.
- ``welch_t_value``: Welch's two-sample t statistic for the mean
  ``value`` difference between the parity user cohorts (the classical
  closed-form counterpart of ``permutation_test_value``).  Each
  cohort reduces to exact integer sufficient statistics (n, sum of
  cents, sum of squared cents -- DECIMAL(38,0), one aggregation); the
  t value is then a single identical IEEE-double expression over those
  integers in both engines, reported in truncating milli units.

Scale: both are aggregation-only -- no windows, no pair joins; the
t statistic's reduce is 6 numbers regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@_register(
    "cross_doc_repetition",
    f"""
WITH sh AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
  FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(w) >= 3 THEN list_transform(
                    generate_series(1, len(w) - 2),
                    i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                  ELSE [concat_ws(' ', w)] END) AS s
    FROM (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents)
  )
),
df AS (SELECT h, count(*) AS n_docs FROM sh GROUP BY h)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(*) FILTER (WHERE df.n_docs >= 2) AS BIGINT) AS n_shared,
       count(*) FILTER (WHERE df.n_docs >= 2) * 10000 // count(*)
         AS shared_pm
FROM sh JOIN df ON sh.h = df.h
GROUP BY sh.doc_id""",
    ref="extension: cross-document shingle repetition -- fraction of a "
    "doc's 3-gram shingles shared with any other doc; linear "
    "document-frequency join, no pair explosion",
)
def q_cross_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.functions.hashing import hash60
    from mapreduce6240project_spark.operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", F.explode(shingles("text", 3)).alias("s"))
        .select("doc_id", hash60(F.col("s")).alias("h"))
        .distinct()
    )
    df_counts = sh.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        sh.join(df_counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("n_docs") >= 2, 1)).alias("n_shared"),
            F.expr(
                "count(CASE WHEN n_docs >= 2 THEN 1 END) * 10000"
                " div count(*)"
            ).alias("shared_pm"),
        )
    )


#: identical final expression in both engines: Welch t from the six
#: integer sufficient statistics, all-double IEEE arithmetic
_T_EXPR = (
    "floor(((CAST(sum_a AS DOUBLE) / n_a - CAST(sum_b AS DOUBLE) / n_b)"
    " / sqrt("
    "   ((CAST(ssq_a AS DOUBLE) - CAST(sum_a AS DOUBLE) * CAST(sum_a AS DOUBLE) / n_a) / (n_a - 1)) / n_a"
    " + ((CAST(ssq_b AS DOUBLE) - CAST(sum_b AS DOUBLE) * CAST(sum_b AS DOUBLE) / n_b) / (n_b - 1)) / n_b"
    " )) * 1000)"
)


@_register(
    "welch_t_value",
    f"""
WITH stats AS (
  SELECT CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_a,
         CAST(count(*) FILTER (WHERE user_id % 2 = 1) AS BIGINT) AS n_b,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
              FILTER (WHERE user_id % 2 = 0) AS DECIMAL(38,0)) AS sum_a,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
              FILTER (WHERE user_id % 2 = 1) AS DECIMAL(38,0)) AS sum_b,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                  * CAST(floor(value * 100 + 0.5) AS BIGINT))
              FILTER (WHERE user_id % 2 = 0) AS DECIMAL(38,0)) AS ssq_a,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                  * CAST(floor(value * 100 + 0.5) AS BIGINT))
              FILTER (WHERE user_id % 2 = 1) AS DECIMAL(38,0)) AS ssq_b
  FROM events
)
SELECT n_a, n_b,
       CAST(sum_a AS BIGINT) AS sum_a_c, CAST(sum_b AS BIGINT) AS sum_b_c,
       CAST({_T_EXPR} AS BIGINT) AS t_milli
FROM stats""",
    ref="extension: Welch two-sample t over parity cohorts from exact "
    "integer sufficient statistics; single identical IEEE expression "
    "in both engines, milli-quantized",
)
def q_welch_t_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c")
    )
    stats = ev.agg(
        F.count(F.when(F.col("user_id") % 2 == 0, 1))
        .cast("bigint")
        .alias("n_a"),
        F.count(F.when(F.col("user_id") % 2 == 1, 1))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("user_id") % 2 == 0, F.col("v_c")))
        .cast("decimal(38,0)")
        .alias("sum_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, F.col("v_c")))
        .cast("decimal(38,0)")
        .alias("sum_b"),
        F.sum(F.when(F.col("user_id") % 2 == 0, F.col("v_c") * F.col("v_c")))
        .cast("decimal(38,0)")
        .alias("ssq_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, F.col("v_c") * F.col("v_c")))
        .cast("decimal(38,0)")
        .alias("ssq_b"),
    )
    return stats.select(
        "n_a",
        "n_b",
        F.col("sum_a").cast("bigint").alias("sum_a_c"),
        F.col("sum_b").cast("bigint").alias("sum_b_c"),
        F.expr(f"CAST({_T_EXPR} AS BIGINT)").alias("t_milli"),
    )
