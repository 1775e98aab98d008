"""Group-by analytics (SURVEY.md section 2.5: A1-A3, with P9 recode).

Replaces Analysis.java (histogram over cluster output hydrated from the
feature store) and test.java (global count with in-mapper combining --
which is exactly Spark's partial aggregation, so a bare row count).

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


#: 0.9^age in 6-decimal fixed point for ages 0..63, precomputed in
#: Python and embedded as literals in BOTH the Spark plan and the SQL
#: oracle -- neither engine ever calls pow()/exp(), whose last-ulp libm
#: differences could flip a rounded value between platforms.
DECAY_MICRO: tuple[int, ...] = tuple(
    int(round(0.9**age * 1_000_000)) for age in range(64)
)


def trending_scores(
    events: DataFrame,
    decay_micro: tuple[int, ...] = DECAY_MICRO,
) -> DataFrame:
    """Exponentially time-decayed trending score per event type:
    ``score_micro = sum(n_day * decay_micro[age])`` where age is whole
    days before the newest event.  The decayed-count ranking behind
    "trending now" surfaces, in exact integer arithmetic.

    Plan: one (type, day) count aggregate (map-side partials), a
    broadcast join to the 64-row literal decay table, and a final
    type-level sum.  The newest-day scalar is a 1-row broadcast.  At
    any volume the shuffled state is (n_types x n_days) rows.
    """
    spark = events.sparkSession
    by_day = events.select(
        "event_type", F.col("ts").cast("date").alias("day")
    ).groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    maxd = by_day.agg(F.max("day").alias("maxd"))
    decay = spark.createDataFrame(
        list(enumerate(decay_micro)), "age int, decay_micro long"
    )
    # clamp: events older than the table's horizon contribute at the
    # smallest weight instead of silently vanishing from the score once
    # the event span exceeds len(decay_micro) days (round-3 advice)
    max_age = len(decay_micro) - 1
    return (
        by_day.crossJoin(F.broadcast(maxd))
        .withColumn("age", F.least(F.datediff("maxd", "day"), F.lit(max_age)))
        .join(F.broadcast(decay), "age")
        .groupBy("event_type")
        .agg(F.sum(F.expr("n * decay_micro")).alias("score_micro"))
        .orderBy(F.desc("score_micro"), "event_type")
    )
