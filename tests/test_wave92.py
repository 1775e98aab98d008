"""Semantic invariants for wave 92 (dedup bias, annual seasonality,
first-order predictiveness)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_dedup_bias_totals(spark):
    rows = REGISTRY["dedup_survivor_length_bias"].fn(spark, SF).collect()
    assert sum(r.n_docs for r in rows) == 500
    # total kept equals the exact-dedup survivor count
    survivors = REGISTRY["dedup_exact"].fn(spark, SF).count()
    assert sum(r.n_kept for r in rows) == survivors
    for r in rows:
        assert 0 < r.n_kept <= r.n_docs
        assert 0 <= r.keep_pm <= 10000


def test_dedup_bias_planted(spark):
    import mapreduce6240project_spark.plans.dedup_ext as w92

    # two short dups (one kept) and one long unique doc (kept)
    docs = spark.createDataFrame(
        [
            (1, "dup text", 100),
            (2, "dup  text", 150),  # same normalized -> dropped
            (3, "x " * 500, 1000),
        ],
        "doc_id long, text string, n_chars int",
    )
    with mock.patch.object(w92, "load_table", lambda s, d, n: docs):
        out = {
            r.len_band: (r.n_docs, r.n_kept)
            for r in w92.q_dedup_survivor_length_bias(spark, SF).collect()
        }
    assert out[0] == (2, 1)  # short band: 2 docs, 1 survivor
    assert out[3] == (1, 1)  # long band untouched


def test_month_index_covers_year(spark):
    rows = REGISTRY["month_of_year_index"].fn(spark, SF).collect()
    moys = sorted(r.moy for r in rows)
    assert moys == list(range(1, 13))
    # indices average 10000 (12 months x share-of-total x 12)
    total = sum(r.index_pm for r in rows)
    assert 120000 - 12 <= total <= 120000
    assert sum(r.n_orders for r in rows) == 1500


def test_first_order_ltv_perfect_corr(spark):
    import mapreduce6240project_spark.plans.dedup_ext as w92

    # one order per customer -> first value IS the LTV -> r = 1
    orders = spark.createDataFrame(
        [(i, i, f"1995-01-0{1 + i % 5}", 100.0 * (i + 1)) for i in range(8)],
        "o_orderkey long, o_custkey long, o_orderdate string,"
        " o_totalprice double",
    ).selectExpr(
        "o_orderkey",
        "o_custkey",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "o_totalprice",
    )
    with mock.patch.object(w92, "load_table", lambda s, d, n: orders):
        r = w92.q_first_order_vs_ltv(spark, SF).collect()[0]
    assert r.n_customers == 8
    assert r.r == 1.0


def test_first_order_ltv_real_data(spark):
    r = REGISTRY["first_order_vs_ltv"].fn(spark, SF).collect()[0]
    assert r.n_customers > 0
    assert -1.0 <= r.r <= 1.0
