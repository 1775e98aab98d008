"""Clustering invariants (SURVEY.md section 5 item 4): true-nearest
assignment, medoid membership, deterministic seeds, convergence."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.distance import HASHTAG_WEIGHT
from mapreduce6240project_spark.operators import (
    assign_clusters,
    cluster_cost,
    kmedoids,
    sample_k_seeds,
)
from mapreduce6240project_spark.operators.clustering import _py_distance
from mapreduce6240project_spark.sources.tweets import tweet_features_from_events

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def feats(spark):
    return tweet_features_from_events(spark, SF).cache()


def test_sample_k_seeds_deterministic(feats):
    a = [r.tweet_id for r in sample_k_seeds(feats, 3).collect()]
    b = [r.tweet_id for r in sample_k_seeds(feats, 3).collect()]
    assert a == b and len(set(a)) == 3


def test_assignment_is_true_argmin(spark, feats):
    res = kmedoids(feats, k=3, max_iter=2)
    rows = res.assignments.limit(200).collect()
    for r in rows:
        d = [_py_distance(r.asDict(), m) for m in res.medoids]
        # fixed argmin semantics (SURVEY 2.9.1): first minimal index
        assert r.cluster == d.index(min(d))


def test_medoid_in_own_cluster(feats):
    res = kmedoids(feats, k=3, max_iter=5)
    assigned = {r.tweet_id: r.cluster for r in res.assignments.collect()}
    for i, m in enumerate(res.medoids):
        assert assigned[m["tweet_id"]] == i


def test_empty_cluster_keeps_old_medoid(spark):
    # two identical points + far seed pair: one cluster can empty out
    rows = [
        (1, "en", 0, 0, 0), (2, "en", 0, 0, 0), (3, "en", 9, 3, 1),
    ]
    df = spark.createDataFrame(
        rows, "tweet_id long, language string, num_hashtags int, time_bucket int, has_video int"
    ).withColumn("reply_count", F.lit(0)) \
     .withColumn("retweet_count", F.lit(0)).withColumn("like_count", F.lit(0))
    res = kmedoids(df, seeds=[1, 3], max_iter=3)
    assert len(res.medoids) == 2
    assert res.converged


def test_cost_decreases_or_converges(feats):
    seeds = [r.tweet_id for r in sample_k_seeds(feats, 4).collect()]
    res = kmedoids(feats, seeds=seeds, max_iter=8, tol=0.0)
    assert res.converged
    # history displacements end at zero
    assert all(d == 0.0 for d in res.history[-1])


def test_cluster_cost_matches_python(feats):
    res = kmedoids(feats, k=3, max_iter=3)
    got = {r.cluster: (r.n_members, r.total_cost)
           for r in cluster_cost(res.assignments, res.medoids).collect()}
    rows = res.assignments.collect()
    want: dict[int, list] = {}
    for r in rows:
        d = _py_distance(r.asDict(), res.medoids[r.cluster])
        n, c = want.get(r.cluster, (0, 0.0))
        want[r.cluster] = (n + 1, c + d)
    for k, (n, c) in want.items():
        assert got[k][0] == n
        assert math.isclose(got[k][1], round(c, 4), rel_tol=1e-6)
