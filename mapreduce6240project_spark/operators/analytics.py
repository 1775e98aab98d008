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


def association_rules(
    lineitem: DataFrame,
    min_support: int = 3,
    k: int = 20,
) -> DataFrame:
    """Directed association rules A -> B over the order/part basket
    table with exact integer metrics: ``support`` (orders containing
    both), ``conf_micro`` = support * 1e6 // c(A), and ``lift_micro`` =
    conf_micro * N // c(B) -- all truncating integer arithmetic over
    order-level counts, so the metric table replays exactly in SQL.
    (lift composed from conf_micro rather than the single fraction
    support*N*1e6/(cA*cB) keeps every intermediate within bigint at any
    order count; the composition is the *definition* here, mirrored in
    the oracle.)

    Plan shape: one basket aggregate (collect_set per order), a bounded
    within-basket pair expansion (basket size is schema-bounded, so the
    expansion is O(k^2) per order and skew-safe), a pair-count
    aggregate, and two joins against the part-level order counts --
    the item-count table is part-cardinality and broadcasts until parts
    outgrow memory, at which point the same plan degrades to hash joins
    on the part key.  Top-k by confidence via TakeOrderedAndProject.
    """
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    item = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c_item"))
    n_orders = op.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    baskets = op.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = (
        baskets.select(F.explode("parts").alias("part_a"), F.col("parts"))
        .select("part_a", F.explode("parts").alias("part_b"))
        .filter(F.col("part_a") != F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return (
        pairs.join(item.select(F.col("l_partkey").alias("part_a"),
                               F.col("c_item").alias("c_a")), "part_a")
        .join(item.select(F.col("l_partkey").alias("part_b"),
                          F.col("c_item").alias("c_b")), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "support",
            F.expr("support * 1000000 div c_a").alias("conf_micro"),
            F.expr("(support * 1000000 div c_a) * n_orders div c_b").alias(
                "lift_micro"
            ),
        )
        .orderBy(F.desc("conf_micro"), "part_a", "part_b")
        .limit(k)
    )
