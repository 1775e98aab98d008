"""Semantic invariants for the wave-22 operators (skyline, market
basket, exact proration, chi-square, entropy, grouping sets).  The
registry oracle test covers value parity against DuckDB; these pin the
claims the oracles can't express (dominance, exact-sum allocation,
entropy bounds, grain consistency)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_skyline_is_exactly_the_nondominated_set(spark):
    got = {
        (r.price_c, r.p_size)
        for r in REGISTRY["skyline_parts"].fn(spark, SF).collect()
    }
    part = load_table(spark, SF, "part").select(
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_c"),
        "p_size",
    )
    pairs = {(r.price_c, r.p_size) for r in part.distinct().collect()}

    def dominated(p):
        return any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in pairs
        )

    want = {p for p in pairs if not dominated(p)}
    assert got == want
    assert got, "frontier should be non-empty"


def test_skyline_frontier_is_a_chain(spark):
    """On a 2-D frontier, strictly cheaper implies strictly smaller."""
    rows = sorted(
        {
            (r.price_c, r.p_size)
            for r in REGISTRY["skyline_parts"].fn(spark, SF).collect()
        }
    )
    for (p1, s1), (p2, s2) in zip(rows, rows[1:]):
        assert p1 < p2 and s1 < s2


def test_allocation_sums_exactly_to_order_total(spark):
    alloc = REGISTRY["allocate_order_total"].fn(spark, SF)
    per_order = alloc.groupBy("l_orderkey").agg(
        F.sum("alloc_c").alias("allocated")
    )
    o = load_table(spark, SF, "orders").select(
        F.col("o_orderkey"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("total_c"),
    )
    j = per_order.join(o, per_order.l_orderkey == o.o_orderkey)
    assert j.filter(F.col("allocated") != F.col("total_c")).count() == 0
    assert alloc.filter(F.col("alloc_c") < 0).count() == 0


def test_allocation_within_one_cent_of_ideal(spark):
    """Largest-remainder never moves a share more than 1 cent from the
    exact proportional ideal."""
    rows = REGISTRY["allocate_order_total"].fn(spark, SF).collect()
    li = (
        load_table(spark, SF, "lineitem")
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
    w = {(r.l_orderkey, r.l_partkey): r.w_c for r in li.collect()}
    sw: dict = {}
    for (ok, _), wc in w.items():
        sw[ok] = sw.get(ok, 0) + wc
    totals = {
        r.o_orderkey: r.total_c
        for r in load_table(spark, SF, "orders")
        .select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("total_c"),
        )
        .collect()
    }
    for r in rows:
        ideal = totals[r.l_orderkey] * w[(r.l_orderkey, r.l_partkey)] / sw[r.l_orderkey]
        assert abs(r.alloc_c - ideal) <= 1.0


def test_copurchase_pairs_shape(spark):
    rows = REGISTRY["copurchase_pairs"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_orders >= 1
    # deterministic top-20 ordering: count desc, then keys
    keys = [(-r.n_orders, r.part_a, r.part_b) for r in rows]
    assert keys == sorted(keys)


def test_chi2_dof_and_nonnegativity(spark):
    row = REGISTRY["chi2_segment_status"].fn(spark, SF).collect()[0]
    assert row.chi2_micros >= 0
    c = load_table(spark, SF, "customer")
    o = load_table(spark, SF, "orders")
    j = o.join(c, o.o_custkey == c.c_custkey)
    nseg = j.select("c_mktsegment").distinct().count()
    nstat = j.select("o_orderstatus").distinct().count()
    assert row.dof == (nseg - 1) * (nstat - 1)


def test_entropy_bounds(spark):
    rows = REGISTRY["event_type_entropy"].fn(spark, SF).collect()
    assert rows
    n_types = (
        load_table(spark, SF, "events").select("event_type").distinct().count()
    )
    cap = math.log(n_types) * 1_000_000 + n_types  # +1 micro-nat slack/term
    for r in rows:
        assert 0 <= r.entropy_unat <= cap
    # a uniform 2-type toy distribution scores ln(2) micro-nats
    toy = spark.createDataFrame(
        [(1, "a"), (1, "b")], "user_id long, event_type string"
    )
    # reuse the same expression shape on the toy frame
    c = toy.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    t = c.select(
        "user_id", "n", F.sum("n").over(Window.partitionBy("user_id")).alias("n_u")
    )
    p = F.col("n").cast("double") / F.col("n_u")
    term = F.floor(-p * F.log(p) * 1000000 + F.lit(0.5)).cast("bigint")
    got = t.groupBy("user_id").agg(F.sum(term).alias("e")).collect()[0].e
    assert abs(got - round(math.log(2) * 1_000_000)) <= 2


def test_grouping_sets_grains_are_consistent(spark):
    rows = REGISTRY["grouping_sets_revenue"].fn(spark, SF).collect()
    total = [r for r in rows if r.region_name == "ALL" and r.status == "ALL"]
    assert len(total) == 1
    by_region = [r for r in rows if r.region_name != "ALL"]
    by_status = [r for r in rows if r.status != "ALL"]
    assert sum(r.n for r in by_region) == total[0].n
    assert sum(r.n for r in by_status) == total[0].n
    assert abs(sum(r.revenue for r in by_region) - total[0].revenue) < 0.01
