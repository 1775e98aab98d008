"""Round-3 coverage wave 9: the last TPC-H query shapes (Q2, Q3, Q9,
Q11, Q12, Q15, Q16, Q20) adapted to the driver's star schema.

The schema has no ``partsupp`` table, so the part-supplier relationship
is derived where needed as the distinct ``(l_partkey, l_suppkey)``
pairs observed in ``lineitem`` (a "pseudo-partsupp"), with supply cost
approximated by the minimum observed unit price.  What each query
demonstrates is the *optimizer shape*, which survives the adaptation:

- Q2: groupwise-min subquery joined back (min-cost supplier per part)
- Q3: segment-filtered 3-way join with top-k on an aggregate
- Q9: profit rollup by nation and year across a 4-way join
- Q11: group aggregate filtered against a global-total scalar subquery
- Q12: conditional two-way counts keyed on a date-arithmetic predicate
- Q15: argmax-on-aggregate via a max scalar subquery over a view
- Q16: count-distinct with an anti-join (NOT IN) exclusion
- Q20: semi-join against a HAVING-filtered aggregate subquery

Money follows the repo-wide fixed-point convention: quantize each
double product to integer cents *per row*, sum the bigints (associative
-> bit-identical under any partitioning), so Spark and DuckDB hashes
match exactly.  Every join below either broadcasts a dimension or
shuffles the fact table once on its join key -- the shapes hold at
100 TB (see SCALE.md).

Reference parity note: the reference engine has no relational surface
beyond key-value scans (SURVEY.md section 2.1); this wave is part of
the extension surface, mirroring TPC-H's public query set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_REV_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"
_UNIT_CENTS = "CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT)"


def _rev_cents() -> F.Column:
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("bigint")


def _unit_cents() -> F.Column:
    return F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 100 + F.lit(0.5)
    ).cast("bigint")


# -- Q2 shape: min-cost supplier per part (groupwise-min join-back) ---------


@_register(
    "min_cost_supplier",
    f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, min({_UNIT_CENTS}) AS cost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eligible AS (
  SELECT ps.l_partkey, ps.l_suppkey, ps.cost_cents
  FROM ps
  JOIN supplier s ON ps.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
best AS (
  SELECT l_partkey, min(cost_cents) AS min_cost
  FROM eligible GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_brand,
       min(e.l_suppkey) AS s_suppkey, b.min_cost AS cost_cents
FROM eligible e
JOIN best b ON e.l_partkey = b.l_partkey AND e.cost_cents = b.min_cost
JOIN part p ON e.l_partkey = p.p_partkey
WHERE p.p_size >= 40
GROUP BY p.p_partkey, p.p_brand, b.min_cost""",
    ref="TPC-H Q2 shape (adapted: pseudo-partsupp from lineitem pairs, "
    "cost = min observed unit price): groupwise-min subquery joined back; "
    "region/nation/supplier broadcast, one fact shuffle on (part, supp)",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")

    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_unit_cents()).alias("cost_cents")
    )
    euro_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    eligible = ps.join(F.broadcast(euro_supp), ps.l_suppkey == F.col("s_suppkey")).drop(
        "s_suppkey"
    )
    best = eligible.groupBy("l_partkey").agg(F.min("cost_cents").alias("min_cost"))
    return (
        eligible.join(
            best,
            (eligible.l_partkey == best.l_partkey)
            & (eligible.cost_cents == best.min_cost),
        )
        .drop(best.l_partkey)
        .join(
            F.broadcast(p.filter(F.col("p_size") >= 40)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_partkey", "p_brand", "min_cost")
        .agg(F.min("l_suppkey").alias("s_suppkey"))
        .select(
            "p_partkey", "p_brand", "s_suppkey", F.col("min_cost").alias("cost_cents")
        )
    )


# -- Q3 shape: shipping priority (segment filter + top-k on aggregate) ------


@_register(
    "shipping_priority",
    f"""
SELECT l.l_orderkey,
       CAST(sum({_REV_CENTS}) AS BIGINT) AS revenue_cents,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""",
    ref="TPC-H Q3 shape: market-segment revenue priority; customer "
    "broadcast, one orders<->lineitem shuffle, TakeOrderedAndProject "
    "top-10 with deterministic (cents, key) tie-break",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-06-01").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            o.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_cents"), "l_orderkey")
        .limit(10)
    )


# -- Q9 shape: product-type profit by nation and year -----------------------


@_register(
    "product_type_profit",
    f"""
SELECT n.n_name AS nation, year(l.l_shipdate) AS o_year,
       CAST(sum({_REV_CENTS}) AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(l.l_shipdate)""",
    ref="TPC-H Q9 shape (adapted: profit = revenue, no ps_supplycost): "
    "4-way join rolled up by supplier nation and ship year; part and "
    "supplier/nation sides broadcast so the fact table never shuffles "
    "before the final (nation, year) aggregation",
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(
            F.broadcast(p.filter(F.col("p_name").like("%red%")).select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year")
        )
        .agg(F.sum(_rev_cents()).alias("profit_cents"))
    )


# -- Q11 shape: important parts vs a global-total scalar subquery -----------


@_register(
    "important_parts",
    f"""
WITH filtered AS (
  SELECT l.l_partkey, {_REV_CENTS} AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
),
per_part AS (
  SELECT l_partkey, CAST(sum(cents) AS BIGINT) AS value_cents
  FROM filtered GROUP BY l_partkey
)
SELECT l_partkey, value_cents
FROM per_part
WHERE value_cents * 500 > (SELECT CAST(sum(cents) AS BIGINT) FROM filtered)""",
    ref="TPC-H Q11 shape (adapted: pseudo-partsupp value = revenue): "
    "per-part totals filtered against a scalar global sum; the global "
    "total is a 1-row broadcast, the threshold compare is pure integer "
    "math (value*500 > total) so no float division enters the hash",
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    nation_supp = (
        s.join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_3")),
            s.s_nationkey == n.n_nationkey,
        )
        .select("s_suppkey")
    )
    filtered = li.join(
        F.broadcast(nation_supp), li.l_suppkey == F.col("s_suppkey")
    ).select("l_partkey", _rev_cents().alias("cents"))
    # persist the SMALL side: the per-part aggregate (|parts| rows), not
    # the filtered fact projection -- the global total is then the sum of
    # the per-part sums (identical bigints, associativity), so one fact
    # scan feeds both and the cache footprint is dimension-sized
    per_part = (
        filtered.groupBy("l_partkey")
        .agg(F.sum("cents").alias("value_cents"))
        .persist()
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") * 500 > F.col("total_cents"))
        .select("l_partkey", "value_cents")
    )


# -- Q12 shape: late-shipping priority counts -------------------------------


@_register(
    "late_ship_modes",
    """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
GROUP BY l.l_linestatus""",
    ref="TPC-H Q12 shape (adapted: lateness = shipped 60+ days after "
    "order, no l_shipmode/commitdate): conditional two-way counts over a "
    "date-arithmetic join predicate; one fact shuffle on l_orderkey",
)
def q_late_ship_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# -- Q15 shape: top supplier via max scalar subquery ------------------------


@_register(
    "top_supplier",
    f"""
WITH rev AS (
  SELECT l_suppkey, CAST(sum({_REV_CENTS}) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_cents
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_cents = (SELECT max(total_cents) FROM rev)""",
    ref="TPC-H Q15 shape: revenue view + max scalar subquery (argmax on "
    "an aggregate); the max is a 1-row broadcast joined back against the "
    "same cached view, no second scan of the fact table",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_cents()).alias("total_cents"))
        .persist()
    )
    best = rev.agg(F.max("total_cents").alias("max_cents"))
    return (
        rev.join(F.broadcast(best), F.col("total_cents") == F.col("max_cents"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_cents")
    )


# -- Q16 shape: supplier counts with NOT-IN exclusion -----------------------


@_register(
    "supplier_part_counts",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_size,
       count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM ps
JOIN part p ON ps.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (5, 10, 15, 20, 25, 30)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size""",
    ref="TPC-H Q16 shape (adapted: pseudo-partsupp, exclusion = "
    "negative-balance suppliers): count-distinct per (brand, size) with "
    "a broadcast anti-join exclusion list",
)
def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    part_f = p.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
    ).select("p_partkey", "p_brand", "p_size")
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part_f), ps.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# -- Q20 shape: semi-join against a HAVING-filtered aggregate ---------------


@_register(
    "excess_qty_suppliers",
    """
WITH heavy AS (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey
  HAVING CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) > 100
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND s.s_suppkey IN (SELECT l_suppkey FROM heavy)""",
    ref="TPC-H Q20 shape (adapted: excess = 100+ units of small parts "
    "shipped in the year): semi-join against a HAVING-filtered aggregate "
    "subquery; the aggregate output is supplier-cardinality (tiny) and "
    "broadcasts into the supplier-side semi-join",
)
def q_excess_qty_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(
                p.filter(F.col("p_name").like("small%")).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(
            F.broadcast(n.filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))),
            s.s_nationkey == n.n_nationkey,
        )
        .join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
