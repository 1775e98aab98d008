"""Semantic invariants for wave 74 (RFM, Gini, HHI)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_rfm_codes_partition_customers(spark):
    rows = REGISTRY["rfm_segments"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        code = r.rfm_code
        assert 111 <= code <= 555
        assert 1 <= code // 100 <= 5
        assert 1 <= (code // 10) % 10 <= 5
        assert 1 <= code % 10 <= 5
    n_cust = (
        REGISTRY["gini_customer_revenue"].fn(spark, SF).collect()[0].n_customers
    )
    assert sum(r.n_customers for r in rows) == n_cust


def test_gini_uniform_is_zero(spark):
    # Equal revenue for every customer -> Gini exactly 0.
    import mapreduce6240project_spark.plans.tpch_analytics as w74
    from unittest import mock

    o = spark.createDataFrame(
        [(c, "2024-01-01", 10.0) for c in range(6)],
        "o_custkey long, o_orderdate string, o_totalprice double",
    ).selectExpr(
        "o_custkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "o_totalprice",
    )
    with mock.patch.object(w74, "load_table", lambda s, d, n: o):
        r = w74.q_gini_customer_revenue(spark, SF).collect()[0]
    assert r.gini_permyriad == 0
    assert r.n_customers == 6


def test_gini_bounds_real_data(spark):
    r = REGISTRY["gini_customer_revenue"].fn(spark, SF).collect()[0]
    assert 0 <= r.gini_permyriad < 10000
    assert r.total_rev_c > 0


def test_hhi_monopoly_is_full(spark):
    # One supplier per nation -> HHI = 10000 exactly.
    import mapreduce6240project_spark.plans.tpch_analytics as w74
    from unittest import mock

    li = spark.createDataFrame(
        [(1, 50.0), (1, 70.0), (2, 30.0)],
        "l_suppkey long, l_extendedprice double",
    )
    sup = spark.createDataFrame(
        [(1, 10), (2, 20)], "s_suppkey long, s_nationkey int"
    )
    tables = {"lineitem": li, "supplier": sup}
    with mock.patch.object(
        w74, "load_table", lambda s, d, n: tables[n]
    ):
        rows = w74.q_hhi_supplier_nation(spark, SF).collect()
    assert {r.s_nationkey: r.hhi_permyriad for r in rows} == {
        10: 10000,
        20: 10000,
    }


def test_hhi_bounds_real_data(spark):
    rows = REGISTRY["hhi_supplier_nation"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # HHI of n equal shares is 10000/n; always in (0, 10000], and
        # Cauchy-Schwarz gives hhi >= 10000/n minus share-quantization
        # slack (each permyriad share floors by < 1).
        assert 0 < r.hhi_permyriad <= 10000
        assert r.hhi_permyriad * r.n_suppliers >= 10000 - 3 * r.n_suppliers
