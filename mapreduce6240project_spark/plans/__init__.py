"""Query registry: every implemented operator exposed as a named query
with (where SQL-expressible) a DuckDB oracle."""

from mapreduce6240project_spark.plans.registry import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
