"""Round-3 coverage wave 75: prefix dedup, curriculum staging, rolling
reach.

- ``dedup_prefix_fp``: prefix-fingerprint dedup -- md5 of the first 32
  normalized tokens, the standard corpus trick for collapsing
  truncated/extended variants of the same page (same lead, different
  tail) that exact and bag dedup both miss.  One digest group-by
  shuffle, same keep-lowest shape as ``dedup_exact``.
- ``curriculum_buckets``: curriculum-learning staging -- documents
  ordered by the shared quality score (``text_quality``'s oracle CTE
  reused verbatim) and cut into 4 stages with ``ntile(4)`` on a
  deterministic (quality, doc_id) order; per stage: doc count, token
  budget, and the permyriad quality range.  This is the table a
  staged-training data loader consumes.
- ``rolling_7d_distinct_users``: trailing-7-day distinct users per
  active day.  Sliding-window COUNT DISTINCT does not decompose into a
  plain window frame, so the scalable shape is: distinct (day, user)
  pairs (one shuffle, cardinality-bounded), then a range join against
  the tiny distinct-day dimension (broadcast; day count is bounded by
  the calendar, not the data) and a per-day distinct count.

Scale: prefix dedup and the curation stages are single-shuffle
aggregations (the ntile is a global window over documents -- at 100 TB
the cut-points come from approx_percentile instead, as recorded for
``rfm_segments``).  The rolling reach join fans each (day, user) pair
out 7x against a broadcast calendar -- linear, no self-join on the
event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY, _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

#: the standalone quality query's oracle, reused verbatim (extensions
#: registers before this module, enforced by plans/__init__ order)
_QUALITY_SQL = REGISTRY["text_quality"].oracle


@_register(
    "dedup_prefix_fp",
    f"""
WITH prefixed AS (
  SELECT doc_id,
         md5(array_to_string(string_split({_NORM}, ' ')[1:32], ' '))
           AS prefix_fp
  FROM documents
)
SELECT prefix_fp, CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM prefixed GROUP BY 1""",
    ref="extension: first-32-token prefix fingerprint dedup -- "
    "collapses truncated/extended variants sharing a lead; one digest "
    "shuffle",
)
def q_dedup_prefix_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(
            F.slice(F.split(normalize_text("text"), " "), 1, 32), " "
        )
    )
    return (
        docs.select("doc_id", fp.alias("prefix_fp"))
        .groupBy("prefix_fp")
        .agg(
            F.min("doc_id").cast("bigint").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@_register(
    "curriculum_buckets",
    f"""
WITH q AS (
  {_QUALITY_SQL}
), staged AS (
  SELECT ntile(4) OVER (ORDER BY quality, doc_id) AS stage,
         n_tokens,
         CAST(floor(quality * 10000 + 0.5) AS BIGINT) AS q_pm
  FROM q
)
SELECT CAST(stage AS BIGINT) AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS token_budget,
       CAST(min(q_pm) AS BIGINT) AS min_q_pm,
       CAST(max(q_pm) AS BIGINT) AS max_q_pm
FROM staged GROUP BY 1""",
    ref="extension: curriculum-learning stages -- quality-ordered "
    "ntile(4) over the shared scorer, per-stage doc/token budgets",
)
def q_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.textstats import quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "n_tokens", "quality")
    staged = q.select(
        F.ntile(4).over(Window.orderBy("quality", "doc_id")).alias("stage"),
        "n_tokens",
        F.floor(F.col("quality") * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("q_pm"),
    )
    return staged.groupBy(F.col("stage").cast("bigint").alias("stage")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("token_budget"),
        F.min("q_pm").alias("min_q_pm"),
        F.max("q_pm").alias("max_q_pm"),
    )


@_register(
    "rolling_7d_distinct_users",
    """
WITH pairs AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), days AS (
  SELECT DISTINCT day FROM pairs
)
SELECT CAST(d.day AS VARCHAR) AS day,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users_7d
FROM days d
JOIN pairs p
  ON p.day <= d.day AND p.day >= d.day - INTERVAL 6 DAY
GROUP BY d.day""",
    ref="extension: trailing-7-day distinct-user reach per day -- "
    "distinct (day,user) pairs range-joined to a broadcast calendar; "
    "sliding COUNT DISTINCT without an event-stream self-join",
)
def q_rolling_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    pairs = ev.distinct()
    days = pairs.select("day").distinct()
    d = days.withColumnRenamed("day", "d_day")
    joined = pairs.join(
        F.broadcast(d),
        (F.col("day") <= F.col("d_day"))
        & (F.col("day") >= F.date_sub(F.col("d_day"), 6)),
    )
    return joined.groupBy(
        F.col("d_day").cast("string").alias("day")
    ).agg(F.count_distinct("user_id").alias("n_users_7d"))
