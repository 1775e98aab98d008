"""Semantic invariants for wave 68 (ABC classes, growth accounting)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_abc_classes_partition_revenue(spark):
    rows = {r.abc_class: r for r in
            REGISTRY["abc_parts_classification"].fn(spark, SF).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    total_rev = sum(r.revenue_cents for r in rows.values())
    # A-class: few parts, most revenue (the Pareto shape)
    a = rows["A"]
    n_parts = sum(r.n_parts for r in rows.values())
    assert a.revenue_cents * 100 >= total_rev * 60
    assert a.n_parts < n_parts


def test_new_vs_returning_first_month_all_new(spark):
    rows = sorted(
        REGISTRY["new_vs_returning_monthly"].fn(spark, SF).collect(),
        key=lambda r: r.month,
    )
    assert rows
    # the earliest month has no prior history: all revenue is "new"
    assert rows[0].returning_rev_cents == 0
    assert rows[0].new_rev_cents > 0
    # later months accumulate returning revenue
    assert any(r.returning_rev_cents > 0 for r in rows[1:])
