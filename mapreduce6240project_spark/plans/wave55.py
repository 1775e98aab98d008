"""Round-3 coverage wave 55: privacy engineering.

- ``k_anonymity_audit``: k-anonymity / l-diversity profiling of the
  quasi-identifier pair (nation, market segment) -- per group: size,
  distinct sensitive values (account-balance band), and whether the
  group passes k=5.  The re-identification-risk query run before any
  customer-grain data release.
- ``randomized_response_segments``: local differential privacy by
  randomized response -- each customer reports their true segment with
  p = 3/4, otherwise a hash-drawn uniform segment; the query returns
  true counts (for calibration), the noisy reported counts, and the
  debiased estimate est = (20*reported - n) / 15 in sign-split
  truncating milli units.  The whole mechanism is hash60-driven, so
  both engines draw the identical noise and the estimator replays
  exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.hashing import hash60, hash60_sql
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@_register(
    "k_anonymity_audit",
    """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
            AS BIGINT) AS l_diversity,
       CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS k5_ok
FROM customer
GROUP BY 1, 2""",
    ref="extension: k-anonymity / l-diversity audit over the "
    "(nation, segment) quasi-identifier -- group sizes + distinct "
    "sensitive bands + k=5 flag",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(
            F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)")
        ).alias("l_diversity"),
        F.when(F.count(F.lit(1)) >= 5, 1).otherwise(0).alias("k5_ok"),
    )


def _rr_sql() -> str:
    segs = ", ".join(f"'{s}'" for s in _SEGMENTS)
    u = f"{hash60_sql('CAST(c_custkey AS VARCHAR)')} % 100"
    draw = hash60_sql("'x:' || CAST(c_custkey AS VARCHAR)") + " % 5"
    return f"""
WITH rr AS (
  SELECT c_mktsegment AS true_seg,
         CASE WHEN {u} < 75 THEN c_mktsegment
              ELSE ([{segs}])[CAST({draw} AS INT) + 1] END AS rep_seg
  FROM customer
),
t AS (SELECT true_seg AS seg, count(*) AS n_true FROM rr GROUP BY 1),
r AS (SELECT rep_seg AS seg, count(*) AS n_reported FROM rr GROUP BY 1),
n AS (SELECT count(*) AS n FROM rr)
SELECT t.seg AS c_mktsegment, CAST(t.n_true AS BIGINT) AS n_true,
       CAST(coalesce(r.n_reported, 0) AS BIGINT) AS n_reported,
       CAST(CASE WHEN 20 * coalesce(r.n_reported, 0) - n.n < 0
                 THEN -((-(20 * coalesce(r.n_reported, 0) - n.n)) * 1000 // 15)
                 ELSE (20 * coalesce(r.n_reported, 0) - n.n) * 1000 // 15 END
            AS BIGINT) AS est_milli
FROM t LEFT JOIN r ON t.seg = r.seg, n"""


@_register(
    "randomized_response_segments",
    _rr_sql(),
    ref="extension: local-DP randomized response (p=3/4 truth, hash60 "
    "noise draw) with the exact debiased estimator (20*rep - n)/15 in "
    "sign-split truncating milli units",
)
def q_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    u = hash60(F.col("c_custkey").cast("string")) % 100
    draw = (hash60(F.concat(F.lit("x:"), F.col("c_custkey").cast("string"))) % 5).cast(
        "int"
    )
    seg_arr = F.array(*[F.lit(s) for s in _SEGMENTS])
    rr = cust.select(
        F.col("c_mktsegment").alias("true_seg"),
        F.when(u < 75, F.col("c_mktsegment"))
        .otherwise(F.element_at(seg_arr, draw + 1))
        .alias("rep_seg"),
    )
    t = rr.groupBy(F.col("true_seg").alias("seg")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    r = rr.groupBy(F.col("rep_seg").alias("seg")).agg(
        F.count(F.lit(1)).alias("n_reported")
    )
    n = rr.agg(F.count(F.lit(1)).alias("n"))
    return (
        t.join(r, "seg", "left")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("seg").alias("c_mktsegment"),
            F.col("n_true").cast("bigint").alias("n_true"),
            F.coalesce("n_reported", F.lit(0)).cast("bigint").alias("n_reported"),
            F.expr(
                "(20 * coalesce(n_reported, 0) - n) * 1000 div 15"
            )
            .cast("bigint")
            .alias("est_milli"),
        )
    )
