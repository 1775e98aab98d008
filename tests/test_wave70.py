"""Semantic invariants for wave 70 (isotropy, bounce rate)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_isotropy_gauge(spark):
    r = REGISTRY["embedding_isotropy_audit"].fn(spark, SF).collect()[0]
    n = load_table(spark, SF, "embeddings").count()
    assert r.n_vecs == n
    assert -1_000_000 <= r.mean_cos_micro <= 1_000_000
    assert 0 <= r.n_in_cone <= n


def test_bounce_rate_consistent(spark):
    r = REGISTRY["session_bounce_rate"].fn(spark, SF).collect()[0]
    assert 0 <= r.n_bounces <= r.n_sessions
    assert r.bounce_permyriad == r.n_bounces * 10000 // r.n_sessions
