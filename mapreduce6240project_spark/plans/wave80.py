"""Round-3 coverage wave 80: cohort quintile migration, percent-of-
parent rollup, robust (winsorized) mean.

- ``value_quintile_migration``: week-over-week customer-value quintile
  transition matrix -- the churn/upsell dashboard behind every
  lifecycle team.  Per (user, ISO week) value totals in exact cents ->
  ``ntile(5)`` partitioned BY WEEK (each week sorts independently --
  no global sort) with a deterministic ``(v_c, user_id)`` order ->
  self-join user rows to the following week (integer day-index + 7,
  engine-neutral) -> count per (week, from-quintile, to-quintile).
  Users absent the next week leave the matrix (churn is the complement
  of the row sums, derivable).
- ``nation_share_of_region``: percent-of-parent rollup -- each
  nation's order revenue as a permyriad share of its region's total.
  Orders aggregate once per custkey, join the small customer->nation->
  region dimension chain (broadcast), and the window share runs over
  the 25-row nation table.  The hierarchical complement to
  ``rollup_revenue`` (which totals levels; this expresses each level
  as a fraction of its parent).
- ``winsorized_mean_value``: 1%/99% winsorized mean of event value --
  the robust mean that survives fat tails where the plain mean follows
  outliers.  Exact and scale-safe via the repo's quantized-histogram
  pattern (``changepoint_day``, ``ks_value_drift``): cents histogram
  (bounded distinct values) -> cumulative counts on the tiny histogram
  -> discrete p1/p99 cut points -> clamp-weighted sum.  Both engines
  run the identical cumulative-count definition, so no percentile-
  implementation divergence; everything is BIGINT until the final
  floor division.

Scale: week-partitioned ntile sorts, broadcast dimension joins, and a
histogram whose size is bounded by the value domain (not row count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "value_quintile_migration",
    """
WITH uw AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01',
                   CAST(date_trunc('week', ts) AS DATE)) AS wk,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v_c
  FROM events GROUP BY 1, 2
), q AS (
  SELECT user_id, wk,
         ntile(5) OVER (PARTITION BY wk ORDER BY v_c, user_id) AS quintile
  FROM uw
)
SELECT CAST(a.wk AS BIGINT) AS wk_from,
       CAST(a.quintile AS BIGINT) AS q_from,
       CAST(b.quintile AS BIGINT) AS q_to,
       CAST(count(*) AS BIGINT) AS n_users
FROM q a JOIN q b ON a.user_id = b.user_id AND b.wk = a.wk + 7
GROUP BY 1, 2, 3""",
    ref="extension: week-over-week value-quintile transition matrix -- "
    "week-partitioned ntile (no global sort), integer week index join",
)
def q_value_quintile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uw = (
        ev.select(
            "user_id",
            F.datediff(
                F.date_trunc("week", F.col("ts")).cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("wk"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
        )
        .groupBy("user_id", "wk")
        .agg(F.sum("v_c").alias("v_c"))
    )
    q = uw.select(
        "user_id",
        "wk",
        F.ntile(5)
        .over(Window.partitionBy("wk").orderBy("v_c", "user_id"))
        .alias("quintile"),
    )
    a, b = q.alias("a"), q.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.wk") == F.col("a.wk") + 7),
        )
        .groupBy(
            F.col("a.wk").cast("bigint").alias("wk_from"),
            F.col("a.quintile").cast("bigint").alias("q_from"),
            F.col("b.quintile").cast("bigint").alias("q_to"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


@_register(
    "nation_share_of_region",
    """
WITH nat_rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation, CAST(rev_c AS BIGINT) AS revenue_c,
       CAST(rev_c * 10000 // sum(rev_c) OVER (PARTITION BY region)
            AS BIGINT) AS share_pm
FROM nat_rev""",
    ref="extension: percent-of-parent hierarchy share -- nation revenue "
    "as permyriad of its region; broadcast dim chain, window over the "
    "25-row nation rollup",
)
def q_nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "rev_c"
        ),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat_rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("rev_c").alias("rev_c"))
    )
    w = Window.partitionBy("region")
    return nat_rev.select(
        "region",
        "nation",
        F.col("rev_c").cast("bigint").alias("revenue_c"),
        F.expr("rev_c * 10000").cast("bigint")
        .alias("_num"),
        F.sum("rev_c").over(w).alias("_den"),
    ).select(
        "region",
        "nation",
        "revenue_c",
        F.expr("_num div _den").cast("bigint").alias("share_pm"),
    )


@_register(
    "winsorized_mean_value",
    """
WITH h AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c, count(*) AS n
  FROM events GROUP BY 1
), cum AS (
  SELECT v_c, n, sum(n) OVER (ORDER BY v_c) AS cn,
         sum(n) OVER () AS total
  FROM h
), cuts AS (
  SELECT min(CASE WHEN cn * 100 >= total THEN v_c END) AS lo,
         min(CASE WHEN cn * 100 >= total * 99 THEN v_c END) AS hi,
         max(total) AS total
  FROM cum
)
SELECT CAST(c.total AS BIGINT) AS n_events,
       CAST(c.lo AS BIGINT) AS p01_c,
       CAST(c.hi AS BIGINT) AS p99_c,
       CAST(sum(GREATEST(c.lo, LEAST(c.hi, h.v_c)) * h.n) // c.total
            AS BIGINT) AS winsorized_mean_c,
       CAST(sum(h.v_c * h.n) // c.total AS BIGINT) AS plain_mean_c
FROM h CROSS JOIN cuts c
GROUP BY c.total, c.lo, c.hi""",
    ref="extension: 1%/99% winsorized mean via exact integer cents "
    "histogram -- cumulative cut points on the bounded histogram, "
    "clamp-weighted sum; robust-mean companion to mad_outlier_prices",
)
def q_winsorized_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select(
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c")
        )
        .groupBy("v_c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # cumulative scan over the histogram only (bounded by the cents
    # domain, not by row count)
    wc = Window.orderBy("v_c").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        "v_c",
        "n",
        F.sum("n").over(wc).alias("cn"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    cuts = cum.agg(
        F.min(F.when(F.col("cn") * 100 >= F.col("total"), F.col("v_c"))).alias(
            "lo"
        ),
        F.min(
            F.when(F.col("cn") * 100 >= F.col("total") * 99, F.col("v_c"))
        ).alias("hi"),
        F.max("total").alias("total"),
    )
    # 1-row cuts broadcast against the small histogram
    joined = h.crossJoin(F.broadcast(cuts))
    return joined.groupBy("total", "lo", "hi").agg(
        F.sum(
            F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("v_c")))
            * F.col("n")
        ).alias("_wsum"),
        F.sum(F.col("v_c") * F.col("n")).alias("_psum"),
    ).select(
        F.col("total").cast("bigint").alias("n_events"),
        F.col("lo").cast("bigint").alias("p01_c"),
        F.col("hi").cast("bigint").alias("p99_c"),
        F.expr("_wsum div total").cast("bigint").alias("winsorized_mean_c"),
        F.expr("_psum div total").cast("bigint").alias("plain_mean_c"),
    )
