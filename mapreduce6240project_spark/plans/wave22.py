"""Round-3 coverage wave 22: analytics + allocation operators.

- ``skyline_parts``: 2-D Pareto frontier (skyline) -- parts not
  dominated on (min retail price, max size).  Distributed shape: the
  classic two-phase skyline -- per-partition local skyline over the
  distinct (price, size) pairs via a vectorized ``mapInPandas``
  (sort + cummax scan), then one more pass over the tiny union of
  local skylines, then a broadcast semi-join back to the full table.
  No global sort, no all-pairs join; the frontier itself is the only
  thing that ever leaves a partition.
- ``copurchase_pairs``: frequent co-purchased part pairs (market
  basket) -- distinct (order, part), self-equi-join on the order key
  with ``part_a < part_b``, count per pair, deterministic top-20 via
  TakeOrderedAndProject (no global sort materialization).
- ``allocate_order_total``: exact largest-remainder proration -- each
  order's total (integer cents) is allocated across its distinct
  (order, part) lines proportionally to extended price such that the
  allocated cents sum EXACTLY to the order total.  All-integer
  arithmetic (floor-div + mod), one shuffle on the order key reused by
  the pre-aggregate, the per-order sum window and the remainder-rank
  window.  The unique part grain makes the remainder tie-break
  deterministic cross-engine.
- ``chi2_segment_status``: chi-square independence statistic between
  customer market segment and order status.  Contingency cells from
  one join + aggregate (customer scales with the data, so the join
  strategy is left to AQE); margins are dimension-sized re-aggregates;
  per-cell contributions micro-quantized to integers before the final
  sum so double addition order cannot flip the hash.
- ``event_type_entropy``: per-user Shannon entropy (micro-nats) of the
  event-type distribution -- behavioral-diversity scoring for
  training-data curation.  One count shuffle on (user, type); the
  per-user total comes from a window over the same partitioning.
- ``grouping_sets_revenue``: GROUPING SETS ((region), (status), ())
  revenue -- completes the rollup/cube family with the arbitrary-sets
  form; exact integer-micro revenue.

Reference parity note: these extend ``Analysis.java``-style analytics
(SURVEY.md section 2.6) with OLAP shapes the reference lacks; the
skyline and entropy ops are LLM-pipeline curation primitives.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# skyline
# ---------------------------------------------------------------------------

_SKY_SCHEMA = "price_c bigint, p_size int"


def _make_local_skyline():
    """Partition-local 2-D skyline: minimize price_c, maximize p_size.

    Sort by (price asc, size desc); a pair survives iff its size
    strictly exceeds the running max of every pair sorted before it
    (any earlier pair has price <= this one, so a >= size would
    dominate).  Vectorized: shifted cummax, no Python row loop.

    Returned as a closure so cloudpickle ships it BY VALUE to the
    workers -- a module-level function would be pickled by reference
    and require this package on the executor Python path (breaks
    consumers that only ``sys.path.insert`` in the driver).
    """

    def local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            pdf = pdf.sort_values(
                ["price_c", "p_size"], ascending=[True, False], kind="mergesort"
            )
            prev_max = pdf["p_size"].cummax().shift(1)
            yield pdf[prev_max.isna() | (pdf["p_size"] > prev_max)]

    return local_skyline


@_register(
    "skyline_parts",
    """
WITH p AS (
  SELECT p_partkey,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
         p_size
  FROM part
)
SELECT p.p_partkey, p.price_c, p.p_size FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM p q
  WHERE q.price_c <= p.price_c AND q.p_size >= p.p_size
    AND (q.price_c < p.price_c OR q.p_size > p.p_size))""",
    ref="extension: two-phase distributed Pareto skyline (local skyline "
    "per partition -> skyline of the tiny union -> broadcast semi-join "
    "back); the NOT EXISTS oracle is the quadratic spec, not the plan",
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_c"),
        "p_size",
    )
    pairs = part.select("price_c", "p_size").distinct()
    # phase 1: local skyline per partition; phase 2: the union of local
    # skylines is at most (partitions x frontier) rows -- one more local
    # pass on a single partition finishes it exactly.
    sky = _make_local_skyline()
    # repartition(1), NOT coalesce(1): coalesce folds back into the
    # previous stage and would run phase 1 in a single task; the
    # explicit exchange keeps phase 1 partition-parallel and carries
    # only the local frontiers
    frontier = (
        pairs.mapInPandas(sky, schema=_SKY_SCHEMA)
        .repartition(1)
        .mapInPandas(sky, schema=_SKY_SCHEMA)
    )
    return part.join(F.broadcast(frontier), ["price_c", "p_size"], "left_semi").select(
        "p_partkey", "price_c", "p_size"
    )


# ---------------------------------------------------------------------------
# market basket
# ---------------------------------------------------------------------------


@_register(
    "copurchase_pairs",
    """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS n_orders
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_orders FROM pairs
ORDER BY n_orders DESC, part_a, part_b LIMIT 20""",
    ref="extension: market-basket frequent pairs (distinct (order,part) "
    "self-equi-join on the order key, pair count, deterministic top-20 "
    "via TakeOrderedAndProject)",
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one shuffle on the order key with map-side partial collect_set
    # (vs. distinct + shuffle self-join + pair shuffle = 3 exchanges);
    # within-order pair expansion is O(k^2) on the basket size k, which
    # is bounded by the schema (orders have a handful of parts) -- the
    # expansion is safe at any row scale, unlike an unbounded-key skew
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .select(F.array_sort("parts").alias("parts"))
    )
    pairs = (
        baskets.select(
            F.explode("parts").alias("part_a"), F.col("parts")
        )
        .select("part_a", F.explode("parts").alias("part_b"))
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
    )
    return pairs.orderBy(
        F.col("n_orders").desc(), "part_a", "part_b"
    ).limit(20)


# ---------------------------------------------------------------------------
# exact proration
# ---------------------------------------------------------------------------


@_register(
    "allocate_order_total",
    """
WITH li AS (
  SELECT l_orderkey, l_partkey,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS w_c
  FROM lineitem GROUP BY l_orderkey, l_partkey
),
o AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_c
  FROM orders
),
j AS (
  SELECT li.l_orderkey, li.l_partkey, li.w_c, o.total_c,
         sum(li.w_c) OVER (PARTITION BY li.l_orderkey) AS sw
  FROM li JOIN o ON li.l_orderkey = o.o_orderkey
),
base AS (
  SELECT l_orderkey, l_partkey,
         (total_c * w_c) // sw AS base_c,
         (total_c * w_c) % sw AS frac,
         total_c
  FROM j
),
ranked AS (
  SELECT l_orderkey, l_partkey, base_c,
         total_c - sum(base_c) OVER (PARTITION BY l_orderkey) AS leftover,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY frac DESC, l_partkey) AS rk
  FROM base
)
SELECT l_orderkey, l_partkey,
       CAST(base_c + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_c
FROM ranked""",
    ref="extension: exact largest-remainder proration -- per-order total "
    "cents allocated proportionally to lineitem price, all-integer "
    "floor-div/mod arithmetic, allocations sum EXACTLY to the total; "
    "one order-key shuffle shared by the sum window and the rank window",
)
def q_allocate_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pre-aggregate to the unique (order, part) grain: (orderkey,
    # linenumber) is NOT unique in this data, and a non-unique rank
    # tie-break would hand the remainder cents to engine-dependent rows
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_partkey",
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("c"),
        )
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.sum("c").alias("w_c"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("total_c"),
    )
    w_ord = Window.partitionBy("l_orderkey")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_partkey",
        "w_c",
        "total_c",
        F.sum("w_c").over(w_ord).alias("sw"),
    )
    # all-integer: product <= ~6e7 cents * 1e7 cents = 6e14 << 2^63
    base = j.select(
        "l_orderkey",
        "l_partkey",
        F.expr("(total_c * w_c) div sw").alias("base_c"),
        F.expr("(total_c * w_c) % sw").alias("frac"),
        "total_c",
    )
    ranked = base.select(
        "l_orderkey",
        "l_partkey",
        "base_c",
        (F.col("total_c") - F.sum("base_c").over(w_ord)).alias("leftover"),
        F.row_number()
        .over(w_ord.orderBy(F.col("frac").desc(), "l_partkey"))
        .alias("rk"),
    )
    return ranked.select(
        "l_orderkey",
        "l_partkey",
        (
            F.col("base_c")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc_c"),
    )


# ---------------------------------------------------------------------------
# chi-square independence
# ---------------------------------------------------------------------------


@_register(
    "chi2_segment_status",
    """
WITH cells AS (
  SELECT c.c_mktsegment AS seg, o.o_orderstatus AS status,
         count(*) AS n
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
rowt AS (SELECT seg, CAST(sum(n) AS BIGINT) AS rt FROM cells GROUP BY seg),
colt AS (SELECT status, CAST(sum(n) AS BIGINT) AS ct FROM cells GROUP BY status),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
contrib AS (
  SELECT CAST(floor(
           (n - CAST(rt * ct AS DOUBLE) / nn)
           * (n - CAST(rt * ct AS DOUBLE) / nn)
           / (CAST(rt * ct AS DOUBLE) / nn) * 1000000 + 0.5) AS BIGINT)
         AS chi_mic
  FROM cells JOIN rowt USING (seg) JOIN colt USING (status), tot
)
SELECT CAST(sum(chi_mic) AS BIGINT) AS chi2_micros,
       (SELECT CAST((count(DISTINCT seg) - 1)
               * (count(DISTINCT status) - 1) AS BIGINT) FROM cells) AS dof
FROM contrib""",
    ref="extension: chi-square independence test over two categoricals "
    "(contingency cells from one join + aggregate; per-cell terms "
    "micro-quantized so the cross-engine sum is order-free)",
)
def q_chi2_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    # customer scales with the data -- no broadcast hint; AQE picks the
    # join strategy by measured size.  cells is dimension-sized
    # (segments x statuses), so the re-aggregations below are cheap
    # without pinning executor cache for the session lifetime.
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count("*").alias("n"))
    )
    rowt = cells.groupBy("seg").agg(F.sum("n").alias("rt"))
    colt = cells.groupBy("status").agg(F.sum("n").alias("ct"))
    tot = cells.agg(F.sum("n").alias("nn"))
    e = (F.col("rt") * F.col("ct")).cast("double") / F.col("nn")
    contrib = (
        cells.join(F.broadcast(rowt), "seg")
        .join(F.broadcast(colt), "status")
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor((F.col("n") - e) * (F.col("n") - e) / e * 1000000 + F.lit(0.5))
            .cast("bigint")
            .alias("chi_mic")
        )
    )
    dof = cells.agg(
        (
            (F.countDistinct("seg") - 1) * (F.countDistinct("status") - 1)
        ).alias("dof")
    )
    return (
        contrib.agg(F.sum("chi_mic").alias("chi2_micros"))
        .crossJoin(F.broadcast(dof))
        .select("chi2_micros", "dof")
    )


# ---------------------------------------------------------------------------
# per-user entropy
# ---------------------------------------------------------------------------


@_register(
    "event_type_entropy",
    """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT user_id, n,
         sum(n) OVER (PARTITION BY user_id) AS n_u
  FROM c
)
SELECT user_id,
       CAST(sum(CAST(floor(
         -(CAST(n AS DOUBLE) / n_u) * ln(CAST(n AS DOUBLE) / n_u)
         * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS entropy_unat,
       CAST(sum(n) AS BIGINT) AS n_events
FROM t GROUP BY user_id""",
    ref="extension: per-user Shannon entropy of the event-type "
    "distribution (behavioral-diversity curation signal); one shuffle "
    "on (user, type), per-user totals via a window over the same keys, "
    "micro-nat-quantized terms so cross-engine sums are order-free",
)
def q_event_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    t = c.select(
        "user_id",
        "n",
        F.sum("n").over(Window.partitionBy("user_id")).alias("n_u"),
    )
    p = F.col("n").cast("double") / F.col("n_u")
    term = F.floor(-p * F.log(p) * 1000000 + F.lit(0.5)).cast("bigint")
    return t.groupBy("user_id").agg(
        F.sum(term).alias("entropy_unat"),
        F.sum("n").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# grouping sets
# ---------------------------------------------------------------------------


@_register(
    "grouping_sets_revenue",
    """
WITH f AS (
  SELECT r.r_name, o.o_orderstatus,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1000000 + 0.5)
              AS BIGINT) AS rev_mic
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT coalesce(r_name, 'ALL') AS region_name,
       coalesce(o_orderstatus, 'ALL') AS status,
       round(sum(rev_mic) / 1000000.0, 4) AS revenue,
       count(*) AS n
FROM f GROUP BY GROUPING SETS ((r_name), (o_orderstatus), ())""",
    ref="extension: GROUPING SETS aggregation (completes the "
    "rollup/cube family with arbitrary set lists; single-scan "
    "multi-grain aggregate via Expand, exact integer-micro revenue)",
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("rev_mic"),
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    # nation/region are true dims (broadcast); customer scales with the
    # data, so its join strategy is left to AQE
    f = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "o_orderstatus", "rev_mic")
    )
    grouped = f.groupingSets(
        [["r_name"], ["o_orderstatus"], []], "r_name", "o_orderstatus"
    ).agg(
        F.round(F.sum("rev_mic") / 1000000.0, 4).alias("revenue"),
        F.count("*").alias("n"),
    )
    return grouped.select(
        F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        "revenue",
        "n",
    )
