"""Semantic invariants for wave 71 (Zipf slope, token entropy)."""

from __future__ import annotations

import math

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_zipf_slope_negative(spark):
    r = REGISTRY["zipf_slope_tokens"].fn(spark, SF).collect()[0]
    # rank-frequency is decreasing by construction: slope strictly < 0.
    # The synthetic vocabulary is tiny and near-uniform in the head, so
    # the magnitude is well below natural language's ~-1.
    assert r.slope_micro < 0
    assert r.k > 10


def test_token_entropy_bounds(spark):
    r = REGISTRY["token_entropy"].fn(spark, SF).collect()[0]
    assert r.n_distinct > 1 and r.n_tokens > r.n_distinct
    # 0 < H <= ln(n_distinct) (uniform upper bound), micro-nats
    upper = int(math.log(r.n_distinct) * 1_000_000) + r.n_distinct  # +quant slack
    assert 0 < r.entropy_unat <= upper
