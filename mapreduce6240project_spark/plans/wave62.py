"""Round-3 coverage wave 62: empirical-Bayes smoothing and repurchase
cycles.

- ``part_return_rate_shrunk``: per-part return rate shrunk toward the
  global rate with pseudo-count alpha=20 -- empirical-Bayes smoothing,
  the cold-start fix every ranking/recsys pipeline applies to sparse
  per-item rates (a part with 1 return in 2 rows must not outrank one
  with 30 in 100).  All integer fixed point: shrunk_micro =
  (k * 1e6 + alpha * global_micro) div (n + alpha).
- ``repurchase_cycle_days``: mean days between a customer's consecutive
  orders, rolled up per market segment in truncating milli-days -- the
  repurchase-cycle input to retention and inventory planning.  Lag
  window per customer, exact integer day sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_ALPHA = 20


@_register(
    "part_return_rate_shrunk",
    f"""
WITH pr AS (
  SELECT l_partkey, count(*) AS n,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS k
  FROM lineitem GROUP BY 1
),
g AS (SELECT sum(k) * 1000000 // sum(n) AS global_micro FROM pr)
SELECT l_partkey, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       CAST(k * 1000000 // n AS BIGINT) AS raw_micro,
       CAST((k * 1000000 + {_ALPHA} * g.global_micro) // (n + {_ALPHA})
            AS BIGINT) AS shrunk_micro
FROM pr, g""",
    ref="extension: empirical-Bayes shrunk per-part return rate "
    "(pseudo-count toward the global rate) -- integer fixed point, one "
    "part-keyed aggregate + 1-row global broadcast",
)
def q_return_rate_shrunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("k"),
    )
    g = pr.agg(F.expr("sum(k) * 1000000 div sum(n)").alias("global_micro"))
    return pr.crossJoin(F.broadcast(g)).select(
        "l_partkey",
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k"),
        F.expr("k * 1000000 div n").cast("bigint").alias("raw_micro"),
        F.expr(
            f"(k * 1000000 + {_ALPHA} * global_micro) div (n + {_ALPHA})"
        )
        .cast("bigint")
        .alias("shrunk_micro"),
    )


@_register(
    "repurchase_cycle_days",
    """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
  FROM orders
),
gaps AS (
  SELECT o_custkey,
         d - lag(d) OVER (PARTITION BY o_custkey
                          ORDER BY d, o_orderkey) AS gap_days
  FROM o
),
cust AS (
  SELECT o_custkey, count(*) AS n_intervals, sum(gap_days) AS total_days
  FROM gaps WHERE gap_days IS NOT NULL GROUP BY 1
)
SELECT c.c_mktsegment,
       CAST(sum(n_intervals) AS BIGINT) AS n_intervals,
       CAST(sum(total_days) * 1000 // sum(n_intervals) AS BIGINT)
         AS avg_days_milli
FROM cust JOIN customer c ON cust.o_custkey = c.c_custkey
GROUP BY 1""",
    ref="extension: repurchase cycle -- lag window per customer, "
    "segment rollup of exact integer day gaps in truncating milli-days",
)
def q_repurchase_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d"), "o_orderkey"
    )
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("d"),
            F.expr(
                "lag(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)"
            ),
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    cust = gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("gap_days").alias("total_days"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        cust.join(F.broadcast(c), cust.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_intervals").cast("bigint").alias("n_intervals"),
            F.expr("sum(total_days) * 1000 div sum(n_intervals)")
            .cast("bigint")
            .alias("avg_days_milli"),
        )
    )
