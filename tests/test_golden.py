"""Golden pipeline test (SURVEY.md section 5 item 2): fixed seeds on the
fixed sf0.001 testdata must reproduce the exact clustering result.

If an intentional algorithm change breaks these constants, re-derive
them with the printed actuals -- but any *unintentional* drift in
parsing, distance, assignment, or the update rule lands here first.
"""

from __future__ import annotations

import pytest

from mapreduce6240project_spark.operators import cluster_cost, kmedoids, sample_k_seeds
from mapreduce6240project_spark.sources.tweets import tweet_features_from_events

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def feats(spark):
    return tweet_features_from_events(spark, SF).cache()


def test_golden_seed_draw(feats):
    assert [r.tweet_id for r in sample_k_seeds(feats, 5).collect()] == [0, 541, 469, 397, 938]


def test_golden_kmedoids_k3(feats):
    res = kmedoids(feats, k=3, max_iter=10, tol=0.0)
    assert res.converged
    assert [m["tweet_id"] for m in res.medoids] == [1, 13, 11]
    costs = {r.cluster: (r.n_members, r.total_cost)
             for r in cluster_cost(res.assignments, res.medoids).collect()}
    assert costs == {0: (331, 528.3055), 1: (465, 692.3985), 2: (204, 225.379)}
