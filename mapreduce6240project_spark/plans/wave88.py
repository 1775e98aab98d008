"""Round-3 coverage wave 88: growth series, open-order aging, wide-
table export.

- ``mom_revenue_growth``: month-over-month revenue growth -- monthly
  cent totals on the integer month index (year*12+month), previous
  month via ``lag`` over the bounded ~80-row month dimension, growth
  in permyriad of the prior month.  The first month (no prior) is
  excluded.  The growth-series complement to ``segment_trend_slope``
  (level trend) and ``new_vs_returning_monthly`` (mix).
- ``open_order_aging``: aging report of orders that have NO lineitem
  at all (never fulfilled -- the anti-join complement of
  ``orders_backlog_daily``'s event-sourced balance): age from order
  date to the corpus's last ship date, bucketed into whole years, with
  order counts and exposure revenue.  Anti-join + map-only bucketing;
  the 1-row corpus-end aggregate is broadcast.
- ``obt_export_checksum``: the One-Big-Table export every training /
  BI pipeline ships -- orders denormalized through customer -> nation
  -> region (broadcast dimension chain), written to parquet
  PARTITIONED BY region, read back through the partition layout, and
  content-verified per region with the order-independent modular
  checksum (``table_checksum_orders`` convention: canonical row
  rendering -> 60-bit md5 -> DECIMAL(38) sum mod 2^61-1).  The oracle
  computes the same checksum from the source tables directly -- a
  lossless export must reproduce it per partition.

Scale: month/age grids are calendar-bounded; the OBT join broadcasts
dimensions and the partitioned write is the layout a real cluster
export produces.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_MERSENNE61 = (1 << 61) - 1


@_register(
    "mom_revenue_growth",
    """
WITH m AS (
  SELECT year(CAST(o_orderdate AS DATE)) * 12
           + month(CAST(o_orderdate AS DATE)) AS mon,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1
), g AS (
  SELECT mon, rev_c, lag(rev_c) OVER (ORDER BY mon) AS prev_c
  FROM m
)
SELECT CAST(mon AS BIGINT) AS mon,
       CAST(rev_c AS BIGINT) AS revenue_c,
       CAST((rev_c - prev_c) * 10000 // prev_c AS BIGINT) AS growth_pm
FROM g WHERE prev_c IS NOT NULL""",
    ref="extension: month-over-month revenue growth in permyriad -- "
    "integer month index, lag over the bounded month dimension",
)
def q_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.select(
            (
                F.year(F.col("o_orderdate").cast("date")) * 12
                + F.month(F.col("o_orderdate").cast("date"))
            ).alias("mon"),
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "v"
            ),
        )
        .groupBy("mon")
        .agg(F.sum("v").alias("rev_c"))
    )
    g = m.withColumn("prev_c", F.lag("rev_c").over(Window.orderBy("mon")))
    return g.filter(F.col("prev_c").isNotNull()).select(
        F.col("mon").cast("bigint").alias("mon"),
        F.col("rev_c").cast("bigint").alias("revenue_c"),
        F.expr("(rev_c - prev_c) * 10000 div prev_c")
        .cast("bigint")
        .alias("growth_pm"),
    )


@_register(
    "open_order_aging",
    """
WITH endt AS (
  SELECT max(CAST(l_shipdate AS DATE)) AS t_end FROM lineitem
), open_o AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey)
)
SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE),
                      (SELECT t_end FROM endt)) // 365 AS BIGINT)
         AS age_years,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS exposure_c
FROM open_o GROUP BY 1""",
    ref="extension: aging buckets of never-fulfilled orders (no "
    "lineitem) at corpus end -- anti-join + whole-year bucketing; "
    "exposure complement of orders_backlog_daily",
)
def q_open_order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    endt = li.agg(
        F.max(F.col("l_shipdate").cast("date")).alias("t_end")
    )
    open_o = o.join(
        li.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
        "o_orderkey",
        "left_anti",
    )
    return (
        open_o.crossJoin(F.broadcast(endt))
        .select(
            F.expr(
                "CAST(datediff(t_end, CAST(o_orderdate AS DATE))"
                " div 365 AS BIGINT)"
            ).alias("age_years"),
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "v"
            ),
        )
        .groupBy("age_years")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("v").cast("bigint").alias("exposure_c"),
        )
    )


@_register(
    "obt_export_checksum",
    f"""
WITH obt AS (
  SELECT r.r_name AS region, o.o_orderkey, o.o_custkey, c.c_name,
         n.n_name AS nation,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total_c
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
), h AS (
  SELECT region,
         ('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey,
                                       c_name, nation, total_c)),
                         1, 15))::BIGINT AS hv
  FROM obt
)
SELECT region, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(hv) % {_MERSENNE61} AS BIGINT) AS checksum
FROM h GROUP BY region""",
    ref="extension: One-Big-Table export -- orders denormalized "
    "through the dimension chain, parquet sink PARTITIONED BY region, "
    "read back and content-verified per partition with the "
    "table_checksum_orders modular checksum",
)
def q_obt_export_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.functions.hashing import hash60

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "total_c"
        ),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    obt = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            "o_orderkey",
            "o_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            "total_c",
        )
    )
    path = tempfile.mkdtemp(prefix="sparkgraft_obt_")
    obt.write.mode("overwrite").partitionBy("region").parquet(path)
    back = spark.read.parquet(path)
    hv = hash60(
        F.concat_ws(
            "|",
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("c_name"),
            F.col("nation"),
            F.col("total_c"),
        )
    )
    return (
        back.select(F.col("region").cast("string").alias("region"), hv.alias("hv"))
        .groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.sum(F.col("hv").cast("decimal(38,0)")) % _MERSENNE61)
            .cast("bigint")
            .alias("checksum"),
        )
    )
