"""Semantic invariants for wave 88 (MoM growth, order aging, OBT
export)."""

from __future__ import annotations

from unittest import mock

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_mom_growth_planted(spark):
    import mapreduce6240project_spark.plans.tpch_analytics as w88

    orders = spark.createDataFrame(
        [
            (1, "1995-01-15", 100.0),
            (2, "1995-02-15", 150.0),  # +50%
            (3, "1995-03-15", 75.0),  # -50%
        ],
        "o_orderkey long, o_orderdate string, o_totalprice double",
    ).selectExpr(
        "o_orderkey",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "o_totalprice",
    )
    with mock.patch.object(w88, "load_table", lambda s, d, n: orders):
        out = {
            r.mon: r.growth_pm
            for r in w88.q_mom_revenue_growth(spark, SF).collect()
        }
    assert out == {1995 * 12 + 2: 5000, 1995 * 12 + 3: -5000}


def test_mom_growth_real_data(spark):
    rows = REGISTRY["mom_revenue_growth"].fn(spark, SF).collect()
    assert len(rows) >= 12  # orders span multiple years
    mons = sorted(r.mon for r in rows)
    assert len(set(mons)) == len(mons)


def test_open_order_aging_counts(spark):
    from mapreduce6240project_spark.sources.tables import load_table

    rows = REGISTRY["open_order_aging"].fn(spark, SF).collect()
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem").select("l_orderkey").distinct()
    n_open = o.join(
        li, o.o_orderkey == F.col("l_orderkey"), "left_anti"
    ).count()
    assert sum(r.n_orders for r in rows) == n_open
    assert n_open > 0  # the synthetic data has never-fulfilled orders
    assert all(r.age_years >= 0 for r in rows)
    assert all(r.exposure_c > 0 for r in rows)


def test_obt_checksum_matches_source_side(spark):
    """The partitioned export must reproduce the source-side checksum
    computed WITHOUT the write/read round-trip."""
    from mapreduce6240project_spark.functions.hashing import hash60
    from mapreduce6240project_spark.sources.tables import load_table

    got = {
        r.region: (r.n_rows, r.checksum)
        for r in REGISTRY["obt_export_checksum"].fn(spark, SF).collect()
    }
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    n = load_table(spark, SF, "nation")
    rg = load_table(spark, SF, "region")
    obt = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(rg, n.n_regionkey == rg.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            hash60(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey"),
                    F.col("o_custkey"),
                    F.col("c_name"),
                    F.col("n_name"),
                    F.expr(
                        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
                    ),
                )
            ).alias("hv"),
        )
    )
    want = {
        r.region: (r.n, r.cs)
        for r in obt.groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.sum(F.col("hv").cast("decimal(38,0)")) % ((1 << 61) - 1))
            .cast("bigint")
            .alias("cs"),
        )
        .collect()
    }
    assert got == want
    assert len(got) == 5
