"""Semantic invariants for wave 65 (method agreement, selectivity)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_dedup_method_agreement_bounds(spark):
    r = REGISTRY["dedup_method_agreement"].fn(spark, SF).collect()[0]
    assert r.n_both <= min(r.n_simhash, r.n_minhash)
    union = r.n_simhash + r.n_minhash - r.n_both
    assert r.pair_jaccard_permyriad == r.n_both * 10000 // union
    # the planted dups should be found by both methods: non-trivial overlap
    assert r.n_both > 0


def test_selectivity_estimate_within_sketch_error(spark):
    r = REGISTRY["selectivity_estimate_audit"].fn(spark, SF).collect()[0]
    assert r.n_actual > 0
    # the log-bucket sketch guarantees <= 1/16 relative VALUE error;
    # the count error at the boundary bucket is data-dependent but must
    # stay well under half the population for this smooth distribution
    assert r.err_permyriad < 2500, r
