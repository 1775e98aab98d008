"""Scalar Column-expression kernels (no Python UDFs -- everything here
compiles to Catalyst expression trees inside whole-stage codegen)."""

from mapreduce6240project_spark.functions.distance import (
    feature_distance,
    medoid_distance_literal,
)
from mapreduce6240project_spark.functions.parsing import (
    bool01,
    hashtag_count,
    parse_or_zero,
    recode_language,
    time_bucket,
)

__all__ = [
    "feature_distance",
    "medoid_distance_literal",
    "bool01",
    "hashtag_count",
    "parse_or_zero",
    "recode_language",
    "time_bucket",
]
