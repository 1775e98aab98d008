"""Query registry: every implemented operator exposed as a named query
with (where SQL-expressible) a DuckDB oracle."""

from mapreduce6240project_spark.plans.registry import REGISTRY, QuerySpec
from mapreduce6240project_spark.plans import extensions as _extensions  # noqa: F401
from mapreduce6240project_spark.plans import parity as _parity  # noqa: F401
from mapreduce6240project_spark.plans import relational as _relational  # noqa: F401
from mapreduce6240project_spark.plans import wave2 as _wave2  # noqa: F401
from mapreduce6240project_spark.plans import wave3 as _wave3  # noqa: F401

__all__ = ["REGISTRY", "QuerySpec"]
