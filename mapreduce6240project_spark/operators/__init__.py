"""Operator inventory (SURVEY.md section 2) + large-scale extensions."""

from mapreduce6240project_spark.operators.clustering import (
    assign_clusters,
    cluster_cost,
    elbow,
    kmedoids,
    update_medoids,
)
from mapreduce6240project_spark.operators.lookup import (
    lookup_join,
    point_lookup,
    range_scan,
)
from mapreduce6240project_spark.operators.sampling import (
    bernoulli_sample,
    sample_k_seeds,
)

__all__ = [
    "assign_clusters",
    "cluster_cost",
    "elbow",
    "kmedoids",
    "update_medoids",
    "lookup_join",
    "point_lookup",
    "range_scan",
    "bernoulli_sample",
    "sample_k_seeds",
]
