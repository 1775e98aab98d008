"""Semantic invariants for wave 55 (k-anonymity, randomized response)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_k_anonymity_reconciles(spark):
    rows = REGISTRY["k_anonymity_audit"].fn(spark, SF).collect()
    n_cust = load_table(spark, SF, "customer").count()
    assert sum(r.n for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.l_diversity <= r.n
        assert r.k5_ok == (1 if r.n >= 5 else 0)


def test_randomized_response_debias_close(spark):
    rows = REGISTRY["randomized_response_segments"].fn(spark, SF).collect()
    n = sum(r.n_true for r in rows)
    assert sum(r.n_reported for r in rows) == n  # mechanism only relabels
    for r in rows:
        # debiased estimate (est_milli / 1000) lands near the truth:
        # RR noise at n~1500, p=3/4 has sd ~ sqrt(n*0.2)/0.75 ~ 25
        assert abs(r.est_milli / 1000 - r.n_true) < 120, (
            r.c_mktsegment,
            r.est_milli,
            r.n_true,
        )
