"""Round-3 coverage wave 52: late-interaction retrieval scoring and
closed-form trend estimation.

- ``label_maxsim_rank``: ColBERT-style MaxSim scoring at the group
  grain -- each label is a bag of vectors, scored by the MAXIMUM
  member cosine against the query; the late-interaction relaxation of
  mean-pooled retrieval (one strong member match beats a diluted
  average).  One narrow cosine pass + a label-keyed max aggregate.
- ``segment_trend_slope``: per-segment ordinary-least-squares slope of
  daily revenue over time from the closed-form sums
  ``(n*Sdy - Sd*Sy) / (n*Sdd - Sd*Sd)`` -- all exact integer cents and
  day indices, reported as truncating cents/day with the numerator and
  denominator exposed.  The distributed-regression shape: sufficient
  statistics per group, no per-point state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "label_maxsim_rank",
    """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
           WHERE vec_id = 0),
sims AS (
  SELECT label,
         list_dot_product(CAST(embedding AS DOUBLE[]), qv)
         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])))
            * sqrt(list_dot_product(qv, qv))) AS s
  FROM embeddings, q
),
mx AS (SELECT label, round(max(s), 4) AS max_sim FROM sims GROUP BY 1)
SELECT label, max_sim,
       CAST(row_number() OVER (ORDER BY max_sim DESC, label) AS BIGINT) AS rk
FROM mx""",
    ref="extension: MaxSim late-interaction scoring per label group -- "
    "one cosine pass, label-keyed max, deterministic rank",
)
def q_label_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import cosine
    from mapreduce6240project_spark.plans.extensions import _query_vec

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    q = F.array(*[F.lit(float(x)) for x in qv])
    mx = (
        emb.select("label", cosine("embedding", q).alias("s"))
        .groupBy("label")
        .agg(F.round(F.max("s"), 4).alias("max_sim"))
    )
    return mx.select(
        "label",
        "max_sim",
        F.expr("row_number() OVER (ORDER BY max_sim DESC, label)")
        .cast("bigint")
        .alias("rk"),
    )


@_register(
    "segment_trend_slope",
    """
WITH daily AS (
  SELECT c.c_mktsegment AS seg,
         CAST(o.o_orderdate AS DATE)
           - (SELECT min(CAST(o_orderdate AS DATE)) FROM orders) AS d,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
s AS (
  SELECT seg, count(*) AS n, sum(d) AS sd, sum(y) AS sy,
         sum(d * y) AS sdy, sum(d * d) AS sdd
  FROM daily GROUP BY 1
)
-- HUGEINT products: n * sdy overflowed BIGINT at the 10x stress run
-- (SCALE.md); the Spark twin computes in DECIMAL(38,0)
SELECT seg AS c_mktsegment,
       -- exposed as DOUBLE on both engines: exact below 2^53 and
       -- identically rounded above (pandas stringifies both as float64)
       CAST(CAST(n AS HUGEINT) * sdy - CAST(sd AS HUGEINT) * sy AS DOUBLE) AS num,
       CAST(CAST(n AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd AS DOUBLE) AS den,
       -- truncate toward zero (DuckDB // floors; Spark div truncates --
       -- a negative slope would diverge by one without the sign split)
       CAST(CASE WHEN CAST(n AS HUGEINT) * sdy - CAST(sd AS HUGEINT) * sy < 0
                 THEN -((-(CAST(n AS HUGEINT) * sdy - CAST(sd AS HUGEINT) * sy))
                        // (CAST(n AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd))
                 ELSE (CAST(n AS HUGEINT) * sdy - CAST(sd AS HUGEINT) * sy)
                      // (CAST(n AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd) END
            AS BIGINT) AS slope_cents_per_day
FROM s""",
    ref="extension: per-segment OLS trend slope from closed-form "
    "sufficient statistics -- exact integer cents/day-index sums, one "
    "(seg, day) aggregate + one seg aggregate",
)
def q_segment_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    mind = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("mind")
    )
    daily = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .crossJoin(F.broadcast(mind))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.datediff(F.col("o_orderdate").cast("date"), F.col("mind")).alias(
                "d"
            ),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            ).alias("y")
        )
    )
    # DECIMAL(38,0) sufficient statistics: the bigint form overflowed on
    # the n * sdy product at the 10x stress run (ARITHMETIC_OVERFLOW,
    # recorded in SCALE.md) -- decimal keeps the closed form exact to
    # 38 digits and `div` still truncates toward zero
    s = daily.groupBy("seg").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("d").cast("decimal(38,0)").alias("sd"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * y")).alias("sdy"),
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d")).alias("sdd"),
    )
    return s.select(
        F.col("seg").alias("c_mktsegment"),
        F.expr("CAST(n * sdy - sd * sy AS DOUBLE)").alias("num"),
        F.expr("CAST(n * sdd - sd * sd AS DOUBLE)").alias("den"),
        F.expr("(n * sdy - sd * sy) div (n * sdd - sd * sd)")
        .cast("bigint")
        .alias("slope_cents_per_day"),
    )
