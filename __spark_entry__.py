"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship k-medoids pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md section 2 (plus extensions) via the shared registry in
``mapreduce6240project_spark.plans``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mapreduce6240project_spark.plans import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: ingest features from
    events, run k=3 k-medoids to convergence, return per-cluster
    member counts + elbow cost (exercises scan, filter, project,
    literal-broadcast assignment, self equi-join, group-by agg, argmin,
    and the iterative driver loop)."""
    return REGISTRY["kmedoids_k3"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
