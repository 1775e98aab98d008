"""Semantic invariants for wave 42 (tokenizer fertility, diameter
sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_fertility_arithmetic(spark):
    rows = REGISTRY["tokenizer_fertility"].fn(spark, SF).collect()
    assert len(rows) >= 2
    for r in rows:
        # punctuation splits off as extra subwords: fertility >= 1
        assert r.n_subwords >= r.n_words > 0
        assert r.fertility_micro == r.n_subwords * 1_000_000 // r.n_words


def test_diameter_sweep_extends_first_bfs(spark):
    from mapreduce6240project_spark.operators.graph import bfs_hops, simgraph_pairs

    out = REGISTRY["graph_diameter_sweep"].fn(spark, SF).collect()[0]
    pairs = simgraph_pairs(spark, SF)
    d1 = bfs_hops(pairs, source=0, max_hops=4)
    ecc1 = d1.agg(F.max("hops")).collect()[0][0]
    # the double sweep's estimate is >= the first sweep's eccentricity
    # (the far node's eccentricity dominates the source's)
    assert out.diameter_est >= ecc1
    assert out.n_reached >= 1
