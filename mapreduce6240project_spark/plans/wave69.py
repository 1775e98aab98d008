"""Round-3 coverage wave 69: structured record linkage and fulfillment
quantiles.

- ``part_substitutes``: substitute-part candidates -- same type and
  size, retail price within 5% (integer permyriad band on cents).
  Record linkage over structured attributes: the equi-join key
  (type, size) does the blocking, the price band is a residual filter,
  so candidate work is bounded by the largest attribute block, never
  all-pairs.
- ``fill_days_quantiles``: exact p50/p90 of order-to-ship days per
  order priority -- per-group exact quantiles via (group, value)
  counts + a cumulative window over the values, which are day-grain
  bounded (a few thousand distinct) at any fact volume.  (The synthetic
  ship/order dates are independent, so the distribution is wide and
  includes negatives; the exact-quantile machinery is the point.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_BAND = 500  # permyriad: 5%


@_register(
    "part_substitutes",
    f"""
WITH p AS (
  SELECT p_partkey, p_type, p_size,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM part
)
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b, a.p_type, a.p_size,
       CAST(abs(a.price_c - b.price_c) * 10000
            // greatest(a.price_c, b.price_c) AS BIGINT) AS diff_permyriad
FROM p a JOIN p b
  ON a.p_type = b.p_type AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE abs(a.price_c - b.price_c) * 10000
      <= {_BAND} * greatest(a.price_c, b.price_c)""",
    ref="extension: substitute-part record linkage -- (type, size) "
    "blocking join + integer price band; candidate work bounded by the "
    "attribute block, never all-pairs",
)
def q_part_substitutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_type",
        "p_size",
        F.expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").alias(
            "price_c"
        ),
    )
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_type") == F.col("b.p_type"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(
            F.expr(
                f"abs(a.price_c - b.price_c) * 10000"
                f" <= {_BAND} * greatest(a.price_c, b.price_c)"
            )
        )
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            F.col("a.p_type").alias("p_type"),
            F.col("a.p_size").alias("p_size"),
            F.expr(
                "abs(a.price_c - b.price_c) * 10000"
                " div greatest(a.price_c, b.price_c)"
            )
            .cast("bigint")
            .alias("diff_permyriad"),
        )
    )


@_register(
    "fill_days_quantiles",
    """
WITH fd AS (
  SELECT o.o_orderpriority AS prio,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
c AS (SELECT prio, days, count(*) AS n FROM fd GROUP BY 1, 2),
cum AS (
  SELECT prio, days, n,
         sum(n) OVER (PARTITION BY prio ORDER BY days) AS cum,
         sum(n) OVER (PARTITION BY prio) AS total
  FROM c
)
SELECT prio AS o_orderpriority,
       CAST(min(CASE WHEN cum >= (5000 * total + 9999) // 10000
                     THEN days END) AS BIGINT) AS p50_days,
       CAST(min(CASE WHEN cum >= (9000 * total + 9999) // 10000
                     THEN days END) AS BIGINT) AS p90_days
FROM cum GROUP BY 1""",
    ref="extension: exact per-group quantiles of order-to-ship days -- "
    "(group, value) counts + day-grain cumulative window; integer "
    "ceil-div ranks",
)
def q_fill_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    fd = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days"),
    )
    c = fd.groupBy("prio", "days").agg(F.count(F.lit(1)).alias("n"))
    cum = c.select(
        "prio",
        "days",
        F.expr("sum(n) OVER (PARTITION BY prio ORDER BY days)").alias("cum"),
        F.expr("sum(n) OVER (PARTITION BY prio)").alias("total"),
    )
    return cum.groupBy(F.col("prio").alias("o_orderpriority")).agg(
        F.min(
            F.when(
                F.expr("cum >= (5000 * total + 9999) div 10000"), F.col("days")
            )
        )
        .cast("bigint")
        .alias("p50_days"),
        F.min(
            F.when(
                F.expr("cum >= (9000 * total + 9999) div 10000"), F.col("days")
            )
        )
        .cast("bigint")
        .alias("p90_days"),
    )
