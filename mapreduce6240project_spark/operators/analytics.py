"""Group-by analytics (SURVEY.md section 2.5: A1-A3, with P9 recode).

Replaces Analysis.java (histogram over cluster output hydrated from the
feature store) and test.java (global count with in-mapper combining --
which is exactly Spark's partial aggregation, so ``df.count()``).

All of these are single-shuffle groupBy plans: Catalyst emits
HashAggregate(partial) -> Exchange -> HashAggregate(final); the partial
side is the reference's hand-written in-mapper combining for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.parsing import recode_language


def histogram(df: DataFrame, key: str) -> DataFrame:
    """A1 (Analysis.java:98,123-142): value -> count."""
    return df.groupBy(key).agg(F.count("*").alias("n"))


def group_avg(df: DataFrame, key, value: str, ndigits: int = 4) -> DataFrame:
    """A2 (Analysis.java:104-109,128-141): per-group average (the
    reference computes sum/count by hand in the reducer)."""
    return df.groupBy(key).agg(
        F.count("*").alias("n"),
        F.round(F.avg(value), ndigits).alias(f"avg_{value}"),
    )


def lang_recoded_avg(features: DataFrame, value: str = "like_count") -> DataFrame:
    """A2 + P9: the Analysis.java shape -- language recoded to
    {en, tr, others} then averaged."""
    return group_avg(
        features.withColumn("lang_group", recode_language("language")),
        "lang_group",
        value,
    )


def row_count(df: DataFrame) -> DataFrame:
    """A3 (test.java): global count as a 1-row DataFrame."""
    return df.agg(F.count("*").alias("n"))
