"""Round-3 coverage wave 7: the remaining TPC-H query shapes
expressible over the driver's star schema (no partsupp table, no
l_commitdate/l_shipmode columns -- shapes adapted accordingly).

Each query demonstrates a distinct optimizer pattern: pure
filter-aggregate (Q6), dual-dimension multi-join with year bucketing
(Q7), conditional market-share ratio (Q8), top-k revenue ranking with
deterministic tie-breaks (Q10), outer-join histogram (Q13), and a
per-group cardinality funnel (Q21 shape).  Money follows the
fixed-point convention: per-row cents quantization before any
reorderable sum, so Spark partial aggregation and DuckDB serial sums
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

#: per-row revenue in exact cents: the double product is one IEEE
#: multiply (identical everywhere); quantize before summation.
_REV_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"


def _rev_cents() -> F.Column:
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("bigint")


# -- Q6 shape: pure filter + global aggregate ------------------------------


@_register(
    "forecast_revenue",
    """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24""",
    ref="TPC-H Q6 shape: filter->agg with every predicate pushed to the "
    "parquet scan (min/max row-group pruning on l_shipdate)",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_cents = F.floor(
        F.col("l_extendedprice") * F.col("l_discount") * 100 + F.lit(0.5)
    ).cast("bigint")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(disc_cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# -- Q7 shape: nation-pair shipping volume ---------------------------------


@_register(
    "nation_pair_revenue",
    f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       CAST(sum({_REV_CENTS}) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE ns.n_name IN ('NATION_1', 'NATION_2')
  AND nc.n_name IN ('NATION_1', 'NATION_2')
  AND ns.n_name <> nc.n_name
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3""",
    ref="TPC-H Q7 shape: dual-dimension multi-join (supplier AND customer "
    "nations); both nation joins + supplier broadcast, one fact shuffle",
)
def q_nation_pair_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == nc.c_nk)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == ns.s_nk)
        .filter(
            F.col("supp_nation").isin("NATION_1", "NATION_2")
            & F.col("cust_nation").isin("NATION_1", "NATION_2")
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
    )


# -- Q8 shape: market share -------------------------------------------------


@_register(
    "market_share",
    f"""
WITH base AS (
  SELECT year(o.o_orderdate) AS o_year, {_REV_CENTS} AS cents,
         CASE WHEN ns.n_name = 'NATION_1' THEN {_REV_CENTS} ELSE 0 END AS nat_cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r ON nc.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  WHERE r.r_name = 'AMERICA'
)
SELECT o_year,
       CAST(sum(nat_cents) AS BIGINT) AS nation_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       round(CAST(sum(nat_cents) AS DOUBLE) / sum(cents), 6) AS mkt_share
FROM base GROUP BY o_year""",
    ref="TPC-H Q8 shape: conditional-aggregate market share; the ratio "
    "divides two exact bigint sums, so the double division is the only "
    "float op and is identical on any engine",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nc = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cents = _rev_cents()
    nat_cents = F.when(F.col("supp_nation") == "NATION_1", cents).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == nc.c_nk)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
            F.col("c_rk") == F.col("r_regionkey"),
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == ns.s_nk)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(nat_cents).alias("nation_cents"),
            F.sum(cents).alias("total_cents"),
        )
        .select(
            "o_year",
            "nation_cents",
            "total_cents",
            F.round(
                F.col("nation_cents").cast("double") / F.col("total_cents"), 6
            ).alias("mkt_share"),
        )
    )


# -- Q10 shape: returned-item customer ranking -----------------------------


@_register(
    "returned_item_customers",
    f"""
SELECT c.c_custkey, c.c_name,
       CAST(sum({_REV_CENTS}) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue_cents DESC, c_custkey LIMIT 20""",
    ref="TPC-H Q10 shape: revenue ranking of lossy customers; "
    "TakeOrderedAndProject top-k with a deterministic (cents, key) "
    "tie-break, never a global sort",
)
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        c.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            c.c_custkey == F.col("o_custkey"),
        )
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), "c_custkey")
        .limit(20)
    )


# -- Q13 shape: customer order-count distribution --------------------------


@_register(
    "customer_distribution",
    """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count""",
    ref="TPC-H Q13 shape: outer-join histogram -- two aggregations, the "
    "second over customer-count cardinality (tiny)",
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# -- Q21 shape: sole-supplier orders ---------------------------------------


@_register(
    "sole_supplier_orders",
    """
WITH per_order AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supps,
         min(l_suppkey) AS the_supp
  FROM lineitem GROUP BY l_orderkey
)
SELECT s.s_name, count(*) AS n_orders
FROM per_order p JOIN supplier s ON p.the_supp = s.s_suppkey
WHERE p.n_supps = 1
GROUP BY s.s_name
ORDER BY n_orders DESC, s_name LIMIT 10""",
    ref="TPC-H Q21 shape (adapted: no l_commitdate): per-order supplier "
    "cardinality funnel; one fact shuffle on l_orderkey, supplier join "
    "broadcast",
)
def q_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.min("l_suppkey").alias("the_supp"),
    )
    return (
        per_order.filter(F.col("n_supps") == 1)
        .join(F.broadcast(s), F.col("the_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "s_name")
        .limit(10)
    )


# -- as-of join variants (forward / nearest) --------------------------------


@_register(
    "asof_next_purchase",
    """
SELECT event_id,
       min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         AS purchase_us
FROM events""",
    ref="extension: forward as-of join (earliest right row at-or-after "
    "each left row; union + one window pass, no range join)",
)
def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.joins import as_of_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").withColumn(
        "purchase_us", F.unix_micros("ts")
    )
    joined = as_of_join(
        ev,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_us"],
        suffix="",
        direction="forward",
    )
    return joined.select("event_id", "purchase_us")


@_register(
    "asof_nearest_signup",
    """
WITH w AS (
  SELECT event_id, epoch_us(ts) AS eus,
         max(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS prev_us,
         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_us
  FROM events
)
SELECT event_id,
       CASE WHEN next_us IS NULL THEN prev_us
            WHEN prev_us IS NULL THEN next_us
            WHEN eus - prev_us <= next_us - eus THEN prev_us
            ELSE next_us END AS signup_us
FROM w""",
    ref="extension: nearest as-of join (closer of the bracketing right "
    "rows, ties backward); same single-window-pass shape",
)
def q_asof_nearest_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.joins import as_of_join

    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").withColumn(
        "signup_us", F.unix_micros("ts")
    )
    joined = as_of_join(
        ev,
        signups,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["signup_us"],
        suffix="",
        direction="nearest",
    )
    return joined.select("event_id", "signup_us")


# -- ranked-window function surface ----------------------------------------


@_register(
    "order_rank_profile",
    """
WITH c AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
w AS (
  SELECT o_orderkey, o_orderpriority, cents,
         percent_rank() OVER win AS pr,
         cume_dist() OVER win AS cd,
         nth_value(cents, 3) OVER (PARTITION BY o_orderpriority
                                   ORDER BY cents DESC, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS third_cents
  FROM c
  WINDOW win AS (PARTITION BY o_orderpriority ORDER BY cents DESC, o_orderkey)
)
SELECT o_orderpriority,
       count(*) AS n,
       CAST(sum(CAST(floor(pr * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_pr_micros,
       CAST(sum(CAST(floor(cd * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cd_micros,
       max(third_cents) AS third_cents
FROM w GROUP BY o_orderpriority""",
    ref="extension: percent_rank / cume_dist / nth_value window surface "
    "(deterministic under the unique (cents, key) sort; rank ratios are "
    "integer-over-integer doubles, identical on any engine)",
)
def q_order_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice").cast("double") * 100 + F.lit(0.5)).cast(
        "bigint"
    )
    base = o.select("o_orderkey", "o_orderpriority", cents.alias("cents"))
    win = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("cents"), "o_orderkey"
    )
    full = win.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = base.select(
        "o_orderpriority",
        F.percent_rank().over(win).alias("pr"),
        F.cume_dist().over(win).alias("cd"),
        F.nth_value("cents", 3).over(full).alias("third_cents"),
    )
    micros = lambda c: F.floor(F.col(c) * 1000000 + F.lit(0.5)).cast("bigint")  # noqa: E731
    return ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(micros("pr")).alias("sum_pr_micros"),
        F.sum(micros("cd")).alias("sum_cd_micros"),
        F.max("third_cents").alias("third_cents"),
    )
