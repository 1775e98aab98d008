"""Semantic invariants for wave 61 (assortativity, supplier reach)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_assortativity_in_range(spark):
    r = REGISTRY["degree_assortativity"].fn(spark, SF).collect()[0]
    assert r.n_edges > 0 and r.n_edges % 2 == 0  # symmetrized
    if r.assortativity is not None:  # constant-degree graphs yield null
        assert -1.0001 <= r.assortativity <= 1.0001


def test_supplier_reach_bounds(spark):
    rows = REGISTRY["supplier_order_reach"].fn(spark, SF).collect()
    li = load_table(spark, SF, "lineitem")
    n_orders = li.select("l_orderkey").distinct().count()
    own = {
        r.l_suppkey: r.n
        for r in li.groupBy("l_suppkey")
        .agg(F.count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        # reach includes at least the supplier's own orders, at most all
        assert own[r.l_suppkey] <= r.n_orders_reached <= n_orders
