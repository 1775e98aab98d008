"""Semantic invariants for wave 64 (GDPR impact, schema evolution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_gdpr_cascade_consistency(spark):
    rows = {r.table_name: r.n_rows for r in
            REGISTRY["gdpr_delete_impact"].fn(spark, SF).collect()}
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    # cascade: doomed lineitems exist iff doomed orders exist
    if rows["orders"] > 0:
        assert rows["lineitem"] > 0
    # the lineitem cascade only counts lines of doomed orders
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    doomed = orders.filter(F.col("o_custkey") % 97 == 0).select("o_orderkey")
    expect = li.join(doomed, li.l_orderkey == doomed.o_orderkey, "left_semi").count()
    assert rows["lineitem"] == expect


def test_schema_evolution_reconciles(spark):
    r = REGISTRY["schema_evolution_roundtrip"].fn(spark, SF).collect()[0]
    n = load_table(spark, SF, "documents").count()
    assert r.n_total == n
    assert r.n_v1_null_lang + r.n_v2_with_lang == n
    assert r.n_v1_null_lang > 0 and r.n_v2_with_lang > 0
