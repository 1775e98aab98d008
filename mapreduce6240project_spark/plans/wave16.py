"""Round-3 coverage wave 16: time-range window frames and Pareto
concentration analytics.

- ``event_anomalies``: trailing-1-hour anomaly detection with a RANGE
  frame over event time (``RANGE BETWEEN 3600e6 PRECEDING AND CURRENT
  ROW`` on microseconds) -- the frame is defined by *time distance*,
  not row count, so sparse and dense users get the same semantics.
  The deviation test is pure integer arithmetic
  (``|v*n - sum| > 2e6*n`` == "more than 2.0 off the window mean"),
  so partial-sum order cannot flip a verdict.
- ``pareto_customers``: revenue concentration per region -- how many
  top customers cover 80% of revenue (the 80/20 audit).  Cents-exact
  cumulative window ordered by revenue; a customer counts while the
  cumulative revenue *before* it is under the threshold.  The
  per-region ordered window funnels one region's customers into one
  task; at extreme per-region cardinality the two-phase variant
  (range-bucket histogram, then only the boundary bucket sorted)
  bounds the task -- shape documented here, not needed at any tested
  scale.

Reference parity note: the reference has neither window frames nor
concentration analytics; engine-semantics extension surface alongside
SURVEY.md section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

HOUR_US = 3_600_000_000
ANOMALY_MICROS = 2_000_000  # |value - window mean| > 2.0
PARETO_SHARE_NUM, PARETO_SHARE_DEN = 4, 5  # 80% as an exact ratio


@_register(
    "event_anomalies",
    f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vmic
  FROM events
),
win AS (
  SELECT event_id, user_id, us, vmic,
         sum(vmic) OVER w AS wsum,
         count(*) OVER w AS wcnt
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN {HOUR_US} PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, wcnt AS n_window
FROM win
WHERE wcnt >= 3 AND abs(vmic * wcnt - wsum) > {ANOMALY_MICROS} * wcnt""",
    ref="extension: trailing-time-range window frame (RANGE BETWEEN "
    "interval PRECEDING) anomaly flag; integer deviation test, "
    "order-independent",
)
def q_event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint").alias("vmic"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-HOUR_US, Window.currentRow)
    )
    win = ev.select(
        "event_id",
        "user_id",
        "vmic",
        F.sum("vmic").over(w).alias("wsum"),
        F.count(F.lit(1)).over(w).alias("wcnt"),
    )
    return win.filter(
        (F.col("wcnt") >= 3)
        & (
            F.abs(F.col("vmic") * F.col("wcnt") - F.col("wsum"))
            > F.lit(ANOMALY_MICROS) * F.col("wcnt")
        )
    ).select("event_id", "user_id", F.col("wcnt").alias("n_window"))


@_register(
    "pareto_customers",
    f"""
WITH rev AS (
  SELECT r.r_name AS region, c.c_custkey,
         sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, c.c_custkey
),
ranked AS (
  SELECT region, cents,
         sum(cents) OVER (PARTITION BY region ORDER BY cents DESC, c_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS cum_before,
         sum(cents) OVER (PARTITION BY region) AS total
  FROM rev
)
SELECT region,
       count(*) AS n_top_customers,
       CAST(max(total) AS BIGINT) AS total_cents
FROM ranked
WHERE coalesce(cum_before, 0) * {PARETO_SHARE_DEN} < total * {PARETO_SHARE_NUM}
GROUP BY region""",
    ref="extension: Pareto 80/20 concentration per region (cents-exact "
    "cumulative window; customer counts while cumulative-before is "
    "under the threshold ratio)",
)
def q_pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), "c_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
        )
    )
    w_cum = (
        Window.partitionBy("region")
        .orderBy(F.desc("cents"), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("region")
    ranked = rev.select(
        "region",
        "cents",
        F.coalesce(F.sum("cents").over(w_cum), F.lit(0)).alias("cum_before"),
        F.sum("cents").over(w_tot).alias("total"),
    )
    return (
        ranked.filter(
            F.col("cum_before") * PARETO_SHARE_DEN
            < F.col("total") * PARETO_SHARE_NUM
        )
        .groupBy("region")
        .agg(
            F.count("*").alias("n_top_customers"),
            F.max("total").cast("bigint").alias("total_cents"),
        )
    )
