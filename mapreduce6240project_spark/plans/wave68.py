"""Round-3 coverage wave 68: inventory classification and growth
accounting.

- ``abc_parts_classification``: ABC inventory analysis -- parts banded
  by cumulative revenue share (A <= 80%, B <= 95%, C rest), reported as
  per-class part counts and revenue.  The cumulative window runs over
  the part-grain aggregate, which is catalog-bounded (orders of
  magnitude smaller than the fact table) at any data volume.
- ``new_vs_returning_monthly``: growth accounting -- each month's
  revenue split into customers whose FIRST order falls in that month
  (new) vs earlier (returning).  One min-date window per customer, one
  month rollup; the new/retained split every growth dashboard leads
  with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "abc_parts_classification",
    """
WITH pr AS (
  SELECT l_partkey,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev_c
  FROM lineitem GROUP BY 1
),
cum AS (
  SELECT l_partkey, rev_c,
         sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey) AS running,
         sum(rev_c) OVER () AS total
  FROM pr
),
cls AS (
  SELECT CASE WHEN running * 100 <= total * 80 THEN 'A'
              WHEN running * 100 <= total * 95 THEN 'B'
              ELSE 'C' END AS abc_class,
         rev_c
  FROM cum
)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev_c) AS BIGINT) AS revenue_cents
FROM cls GROUP BY 1""",
    ref="extension: ABC inventory classification -- cumulative revenue "
    "share bands over the catalog-bounded part aggregate; integer "
    "cross-multiplied thresholds",
)
def q_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")).alias(
            "rev_c"
        )
    )
    cum = pr.select(
        "rev_c",
        F.expr("sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey)").alias(
            "running"
        ),
        F.expr("sum(rev_c) OVER ()").alias("total"),
    )
    cls = cum.select(
        F.when(F.expr("running * 100 <= total * 80"), "A")
        .when(F.expr("running * 100 <= total * 95"), "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_c",
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev_c").cast("bigint").alias("revenue_cents"),
    )


@_register(
    "new_vs_returning_monthly",
    """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         min(CAST(o_orderdate AS DATE))
           OVER (PARTITION BY o_custkey) AS first_d
  FROM orders
)
SELECT CAST(strftime(d, '%Y-%m') AS VARCHAR) AS month,
       CAST(sum(CASE WHEN strftime(d, '%Y-%m') = strftime(first_d, '%Y-%m')
                     THEN cents ELSE 0 END) AS BIGINT) AS new_rev_cents,
       CAST(sum(CASE WHEN strftime(d, '%Y-%m') <> strftime(first_d, '%Y-%m')
                     THEN cents ELSE 0 END) AS BIGINT) AS returning_rev_cents
FROM o GROUP BY 1""",
    ref="extension: new-vs-returning revenue split -- per-customer "
    "first-order window, month rollup; growth accounting",
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    o = o.withColumn(
        "first_d", F.expr("min(d) OVER (PARTITION BY o_custkey)")
    )
    is_new = F.date_format("d", "yyyy-MM") == F.date_format("first_d", "yyyy-MM")
    return o.groupBy(F.date_format("d", "yyyy-MM").alias("month")).agg(
        F.sum(F.when(is_new, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("new_rev_cents"),
        F.sum(F.when(~is_new, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("returning_rev_cents"),
    )
