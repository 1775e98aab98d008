"""Round-3 coverage wave 67: duplicate payments and engagement
stickiness.

- ``dup_payment_pairs``: double-charge detection -- order pairs from
  the same customer with the identical cent amount placed within one
  day.  The join key is (customer, exact cents), so candidates are
  equi-join-generated and the date band is a residual filter; the
  classic fraud/ops reconciliation query.
- ``dau_wau_stickiness``: DAU/WAU engagement ratio per day -- distinct
  daily actives over distinct actives in the trailing 7 days, in
  truncating permyriad.  The trailing-week distinct is computed by
  fanning each (user, day) fact to the 7 window days it supports
  (bounded x7 explode at day grain), then one distinct count per
  window day -- no quadratic self-join, no sketch needed at day grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "dup_payment_pairs",
    """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS d
  FROM orders
)
SELECT a.o_custkey, a.o_orderkey AS order_a, b.o_orderkey AS order_b,
       CAST(a.cents AS BIGINT) AS cents
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.cents = b.cents
 AND a.o_orderkey < b.o_orderkey
 AND abs(a.d - b.d) <= 1""",
    ref="extension: double-charge detection -- (customer, exact cents) "
    "equi-join with a 1-day band filter; fraud/ops reconciliation",
)
def q_dup_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a, b = o.alias("a"), o.alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.cents") == F.col("b.cents"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.abs(F.datediff(F.col("a.d"), F.col("b.d"))) <= 1),
    ).select(
        F.col("a.o_custkey").alias("o_custkey"),
        F.col("a.o_orderkey").alias("order_a"),
        F.col("b.o_orderkey").alias("order_b"),
        F.col("a.cents").alias("cents"),
    )


@_register(
    "dau_wau_stickiness",
    """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
fan AS (
  SELECT user_id, day + CAST(o.off AS INT) AS wday
  FROM ud, unnest(generate_series(0, 6)) AS o(off)
),
wau AS (SELECT wday AS day, count(DISTINCT user_id) AS wau FROM fan GROUP BY 1)
SELECT CAST(strftime(d.day, '%Y-%m-%d') AS VARCHAR) AS day,
       CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
       CAST(d.dau * 10000 // w.wau AS BIGINT) AS stickiness_permyriad
FROM dau d JOIN wau w ON d.day = w.day""",
    ref="extension: DAU/WAU stickiness -- trailing-week distinct via a "
    "bounded x7 day-grain fan-out + distinct count; no self-join, no "
    "sketch needed at day grain",
)
def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    fan = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
    ).select("user_id", F.expr("date_add(day, off)").alias("wday"))
    wau = fan.groupBy(F.col("wday").alias("day")).agg(
        F.count_distinct("user_id").alias("wau")
    )
    return dau.join(wau, "day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("dau").cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
        F.expr("dau * 10000 div wau").cast("bigint").alias(
            "stickiness_permyriad"
        ),
    )
