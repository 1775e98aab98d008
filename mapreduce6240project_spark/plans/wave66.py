"""Round-3 coverage wave 66: change-point localization and tie-aware
leaderboards.

- ``changepoint_day``: WHERE the daily event-value level shifted -- the
  two-segment scan statistic argmax ((S1*n2 - S2*n1)^2 / (n1*n2*n),
  the between-segment variance-reduction numerator) over the day-grain
  series.  CUSUM (``cusum_max_deviation``) says THAT a shift happened;
  this localizes it.  All candidate gains are exact integer/decimal
  arithmetic over day-grain prefix sums (the series is days-bounded, so
  the single-partition window is a ~30-row frame at any data volume).
- ``top_revenue_days_ties``: top-3 revenue days per market segment with
  DENSE_RANK -- ties share a rank and all tied days surface, the
  leaderboard semantics row_number silently breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "changepoint_day",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS y
  FROM events GROUP BY 1
),
pre AS (
  SELECT day, y,
         sum(y) OVER (ORDER BY day) AS s1,
         count(*) OVER (ORDER BY day) AS n1,
         sum(y) OVER () AS st,
         count(*) OVER () AS nt
  FROM daily
),
gains AS (
  SELECT day,
         CAST(CAST(s1 * (nt - n1) - (st - s1) * n1 AS HUGEINT)
              * CAST(s1 * (nt - n1) - (st - s1) * n1 AS HUGEINT) AS DOUBLE)
           / (n1 * (nt - n1) * nt) AS gain
  FROM pre WHERE n1 < nt
)
SELECT CAST(strftime(day, '%Y-%m-%d') AS VARCHAR) AS split_day,
       round(gain, 4) AS gain
FROM gains ORDER BY gain DESC, day LIMIT 1""",
    ref="extension: change-point localization -- two-segment scan "
    "statistic over day-grain prefix sums (exact wide-integer "
    "numerator, days-bounded frame); localizes what CUSUM only flags",
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).alias("y")
    )
    pre = daily.select(
        "day",
        F.expr("sum(y) OVER (ORDER BY day)").alias("s1"),
        F.expr("count(*) OVER (ORDER BY day)").alias("n1"),
        F.expr("sum(y) OVER ()").alias("st"),
        F.expr("count(*) OVER ()").alias("nt"),
    )
    gains = pre.filter(F.col("n1") < F.col("nt")).select(
        "day",
        (
            F.expr(
                "CAST(CAST(s1 AS DECIMAL(38,0)) * (nt - n1)"
                " - CAST(st - s1 AS DECIMAL(38,0)) * n1 AS DECIMAL(38,0))"
            ).cast("double")
            * F.expr(
                "CAST(CAST(s1 AS DECIMAL(38,0)) * (nt - n1)"
                " - CAST(st - s1 AS DECIMAL(38,0)) * n1 AS DECIMAL(38,0))"
            ).cast("double")
            / F.expr("n1 * (nt - n1) * nt")
        ).alias("gain"),
    )
    return (
        gains.select(
            F.date_format("day", "yyyy-MM-dd").alias("split_day"),
            F.round("gain", 4).alias("gain"),
        )
        .orderBy(F.desc("gain"), "split_day")
        .limit(1)
    )


@_register(
    "top_revenue_days_ties",
    """
WITH daily AS (
  SELECT c.c_mktsegment, CAST(o.o_orderdate AS DATE) AS day,
         sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment, CAST(strftime(day, '%Y-%m-%d') AS VARCHAR) AS day,
       CAST(rev_c AS BIGINT) AS rev_c, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, dense_rank() OVER (PARTITION BY c_mktsegment
                               ORDER BY rev_c DESC) AS rk
  FROM daily
) WHERE rk <= 3""",
    ref="extension: tie-aware leaderboard -- dense_rank keeps every day "
    "sharing a top-3 revenue level (row_number would break ties "
    "arbitrarily)",
)
def q_top_revenue_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    daily = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", F.col("o_orderdate").cast("date").alias("day0"))
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).alias(
                "rev_c"
            )
        )
    )
    return (
        daily.withColumn(
            "rk",
            F.expr(
                "dense_rank() OVER (PARTITION BY c_mktsegment"
                " ORDER BY rev_c DESC)"
            ),
        )
        .filter(F.col("rk") <= 3)
        .select(
            "c_mktsegment",
            F.date_format("day0", "yyyy-MM-dd").alias("day"),
            F.col("rev_c").cast("bigint").alias("rev_c"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )
