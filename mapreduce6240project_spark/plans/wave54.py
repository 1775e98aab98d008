"""Round-3 coverage wave 54: schema discovery and drift monitoring.

- ``fd_violation_audit``: functional-dependency checking -- for each
  claimed FD, how many left-hand-side groups map to more than one
  right-hand-side value.  The profiling query behind schema discovery
  and constraint validation: ``o_orderkey -> o_custkey`` must hold (a
  key), ``c_nationkey -> c_mktsegment`` must not (a genuine
  many-to-many).  One count-distinct aggregate per FD.
- ``embedding_drift_l1``: distribution drift between two halves of the
  embedding corpus (even vs odd ids standing in for old vs new
  snapshots) -- L1 distance between their vector-norm histograms in
  truncating permyriad proportions.  The monitoring metric that says
  "the new embedding batch does not look like the old one" before it
  poisons an index; norms via IEEE sqrt (correctly rounded, so both
  engines quantize identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_FDS = (
    ("orders", "o_orderkey", "o_custkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
)


def _fd_sql() -> str:
    return " UNION ALL ".join(
        f"""
SELECT '{t}.{l}->{r}' AS fd,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating
FROM (SELECT {l}, count(DISTINCT {r}) AS nr FROM {t} GROUP BY {l})"""
        for t, l, r in _FDS
    )


@_register(
    "fd_violation_audit",
    _fd_sql(),
    ref="extension: functional-dependency violation audit -- LHS groups "
    "with >1 distinct RHS per claimed FD; schema-discovery profiling",
)
def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for t, l, r in _FDS:
        df = load_table(spark, sf_dir, t)
        g = df.groupBy(l).agg(F.count_distinct(F.col(r)).alias("nr"))
        outs.append(
            g.agg(
                F.lit(f"{t}.{l}->{r}").alias("fd"),
                F.count(F.lit(1)).alias("n_lhs"),
                F.sum(F.when(F.col("nr") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@_register(
    "embedding_drift_l1",
    """
WITH norms AS (
  SELECT vec_id % 2 AS half,
         CAST(floor(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                          CAST(embedding AS DOUBLE[])))
                    * 1000 + 0.5) AS BIGINT) // 100 AS bucket
  FROM embeddings
),
h AS (
  SELECT bucket,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS p,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS q
  FROM norms GROUP BY 1
),
tot AS (SELECT sum(p) AS np, sum(q) AS nq FROM h)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(abs(p * 10000 // np - q * 10000 // nq)) AS BIGINT)
         AS drift_permyriad
FROM h, tot""",
    ref="extension: embedding-distribution drift (L1 distance of "
    "norm-bucket histograms between corpus halves, truncating permyriad "
    "proportions) -- index-poisoning monitor",
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("embedding"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norms = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        F.floor(F.sqrt(dot) * 1000 + F.lit(0.5)).cast("bigint").alias("nmilli"),
    ).select("half", F.expr("nmilli div 100").alias("bucket"))
    h = norms.groupBy("bucket").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("p"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("q"),
    )
    tot = h.agg(F.sum("p").alias("np"), F.sum("q").alias("nq"))
    return h.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.expr("abs(p * 10000 div np - q * 10000 div nq)"))
        .cast("bigint")
        .alias("drift_permyriad"),
    )
