"""Round-3 coverage wave 86: KMV distinct sketch, Theil-Sen slope,
churn labeling.

- ``kmv_distinct_users``: the K-Minimum-Values distinct-count sketch
  (Bar-Yossef et al.) per event type -- the OTHER classic mergeable
  cardinality sketch next to HLL (``hll_distinct_users``): keep the k
  smallest hash values; the k-th smallest estimates density, so
  distinct ~ (k-1) * 2^60 / h_k.  Deterministic by construction here
  (the 60-bit md5-prefix hash), so the oracle replays it exactly --
  unlike HLL there is no register approximation to re-implement, which
  is what makes KMV the auditable sketch.  Types with fewer than k
  distinct users fall back to the exact count (the sketch IS exact
  below k).  One distinct + one per-type rank over k rows.
- ``theil_sen_daily``: Theil-Sen robust trend -- the MEDIAN of all
  pairwise day-slopes of daily revenue, the estimator that tolerates
  up to ~29% outlier days where OLS (``segment_trend_slope``) follows
  them; the point-estimate companion to ``mann_kendall_daily`` (which
  only tests direction).  Pairwise slopes run over the calendar-
  bounded daily table (~30 rows -> ~435 pairs); each slope is rounded
  to integer micro-cents/day in DOUBLE (exact for these magnitudes,
  identical both engines, avoiding the div-vs-floor negative-number
  divergence), and the lower median is picked by rank -- fully
  deterministic.
- ``churn_rate_weekly``: week-over-week churn labels -- users active
  in ISO week w who are absent in w+1, aggregated to the per-week
  churn rate in permyriad.  The label-builder behind every retention
  model; the final observed week is excluded (it cannot be labeled).
  Distinct (user, week) -> one self left-anti-style join on the
  integer week index -> tiny per-week rollup.

Scale: KMV is one distinct shuffle + top-k per type; Theil-Sen shrinks
to days before the quadratic step; churn joins distinct user-weeks
only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_K = 8
_TWO60 = 1 << 60


@_register(
    "kmv_distinct_users",
    f"""
WITH hs AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5('u:' || CAST(user_id AS VARCHAR)), 1, 15))
           ::BIGINT AS h
  FROM events
), rk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS r,
         count(*) OVER (PARTITION BY event_type) AS n_exact
  FROM hs
)
SELECT event_type,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(CASE WHEN n_exact < {_K} THEN n_exact
                 ELSE CAST(({_K} - 1) * CAST({_TWO60} AS HUGEINT) // h
                      AS BIGINT) END AS BIGINT) AS kmv_est
FROM rk WHERE r = least(n_exact, {_K}) AND r = {_K}
UNION ALL
SELECT event_type, CAST(n_exact AS BIGINT), CAST(n_exact AS BIGINT)
FROM rk WHERE n_exact < {_K} AND r = 1""",
    ref="extension: K-Minimum-Values cardinality sketch per event type "
    "(k=8, 60-bit hash) with exact fallback below k -- the auditable "
    "mergeable distinct sketch next to hll_distinct_users",
)
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.functions.hashing import hash60

    ev = load_table(spark, sf_dir, "events")
    hs = ev.select(
        "event_type",
        hash60(
            F.concat(F.lit("u:"), F.col("user_id").cast("string"))
        ).alias("h"),
    ).distinct()
    wr = Window.partitionBy("event_type").orderBy("h")
    wc = Window.partitionBy("event_type")
    rk = hs.select(
        "event_type",
        "h",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wc).alias("n_exact"),
    )
    at_k = rk.filter((F.col("r") == _K) & (F.col("n_exact") >= _K)).select(
        "event_type",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.expr(
            f"CAST(CAST(({_K} - 1) AS DECIMAL(38,0)) * {_TWO60} div h"
            " AS BIGINT)"
        ).alias("kmv_est"),
    )
    small = rk.filter((F.col("n_exact") < _K) & (F.col("r") == 1)).select(
        "event_type",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.col("n_exact").cast("bigint").alias("kmv_est"),
    )
    return at_k.unionByName(small)


@_register(
    "theil_sen_daily",
    """
WITH d AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v_c
  FROM events GROUP BY 1
), slopes AS (
  SELECT CAST(floor(CAST(b.v_c - a.v_c AS DOUBLE)
                    / (b.day_idx - a.day_idx) * 1000000 + 0.5)
              AS BIGINT) AS s
  FROM d a JOIN d b ON b.day_idx > a.day_idx
), rk AS (
  SELECT s, row_number() OVER (ORDER BY s) AS r, count(*) OVER () AS n
  FROM slopes
)
SELECT CAST(max(n) AS BIGINT) AS n_pairs,
       CAST(max(CASE WHEN r = (n + 1) // 2 THEN s END) AS BIGINT)
         AS slope_micro_median
FROM rk""",
    ref="extension: Theil-Sen robust trend -- lower median of pairwise "
    "daily-revenue slopes over the calendar-bounded day table; "
    "outlier-immune companion to mann_kendall_daily",
)
def q_theil_sen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("day_idx"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
        )
        .groupBy("day_idx")
        .agg(F.sum("v_c").alias("v_c"))
    )
    a, b = d.alias("a"), d.alias("b")
    slopes = a.join(
        F.broadcast(b), F.col("b.day_idx") > F.col("a.day_idx")
    ).select(
        F.expr(
            "CAST(floor(CAST(b.v_c - a.v_c AS DOUBLE)"
            " / (b.day_idx - a.day_idx) * 1000000 + 0.5) AS BIGINT)"
        ).alias("s")
    )
    rk = slopes.select(
        "s",
        F.row_number().over(Window.orderBy("s")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return rk.agg(
        F.max("n").cast("bigint").alias("n_pairs"),
        F.max(F.when(F.expr("r = (n + 1) div 2"), F.col("s")))
        .cast("bigint")
        .alias("slope_micro_median"),
    )


@_register(
    "churn_rate_weekly",
    """
WITH uw AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01',
                   CAST(date_trunc('week', ts) AS DATE)) AS wk
  FROM events
), labeled AS (
  SELECT a.wk, a.user_id,
         CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END AS churned
  FROM uw a LEFT JOIN uw b
    ON a.user_id = b.user_id AND b.wk = a.wk + 7
  WHERE a.wk < (SELECT max(wk) FROM uw)
)
SELECT CAST(wk AS BIGINT) AS wk,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(churned) AS BIGINT) AS n_churned,
       CAST(sum(churned) * 10000 // count(*) AS BIGINT) AS churn_pm
FROM labeled GROUP BY wk""",
    ref="extension: week-over-week churn labels (active in w, absent "
    "in w+1) aggregated to per-week churn rate; retention-model label "
    "builder, the complement of value_quintile_migration's survivors",
)
def q_churn_rate_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.datediff(
            F.date_trunc("week", F.col("ts")).cast("date"),
            F.lit("1970-01-01").cast("date"),
        )
        .cast("bigint")
        .alias("wk"),
    ).distinct()
    max_wk = uw.agg(F.max("wk").alias("mx"))
    a, b = uw.alias("a"), uw.alias("b")
    labeled = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.wk") == F.col("a.wk") + 7),
            "left",
        )
        .crossJoin(F.broadcast(max_wk))
        .filter(F.col("a.wk") < F.col("mx"))
        .select(
            F.col("a.wk").alias("wk"),
            F.when(F.col("b.user_id").isNull(), 1).otherwise(0).alias(
                "churned"
            ),
        )
    )
    return labeled.groupBy("wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum("churned").cast("bigint").alias("n_churned"),
        F.expr("sum(churned) * 10000 div count(*)")
        .cast("bigint")
        .alias("churn_pm"),
    )
