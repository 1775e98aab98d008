"""Round-3 coverage wave 48: int8 retrieval audit and a join-strategy
advisor.

- ``int8_recall_audit``: recall@10 of top-k retrieval over the int8-
  quantized vectors (integer dot products) vs the exact float dot-
  product top-k -- completes the compression-audit family (matryoshka
  = fewer dims, PQ = coded subspaces, int8 = narrower arithmetic).
  Quantization is the exact expression ``floor(x * 127 / max|x| +
  0.5)`` on both engines, so the integer scores replay bit-for-bit.
- ``join_strategy_advisor``: the broadcast-vs-shuffle decision a
  cost-based optimizer makes, materialized as a query -- per candidate
  dimension table, exact row count, estimated bytes from literal row
  widths, and the recommended strategy at a 10 MB broadcast threshold.
  The advisor pattern: statistics in, physical-plan decision out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

#: nominal encoded row widths (bytes) for the advisor -- literals shared
#: by both engines; a real CBO reads them from ANALYZE statistics.
_ROW_WIDTH = {"customer": 144, "supplier": 120, "part": 128}
_BROADCAST_BYTES = 10 * 1024 * 1024


@_register(
    "int8_recall_audit",
    """
WITH ev AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS ma
  FROM embeddings
),
qv AS (
  SELECT list_transform(v, x -> CAST(floor(x * 127 / ma + 0.5) AS BIGINT)) AS q
  FROM ev WHERE vec_id = 0
),
iq AS (
  SELECT vec_id,
         CASE WHEN ma = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
              ELSE list_transform(v, x -> CAST(floor(x * 127 / ma + 0.5)
                                              AS BIGINT)) END AS iv
  FROM ev
),
iscore AS (
  SELECT vec_id, list_dot_product(iv, q) AS s FROM iq, qv
),
itop AS (SELECT vec_id FROM (
  SELECT vec_id, row_number() OVER (ORDER BY s DESC, vec_id) AS rn FROM iscore)
  WHERE rn <= 10),
fq AS (SELECT v AS q FROM ev WHERE vec_id = 0),
fscore AS (SELECT vec_id, list_dot_product(v, q) AS s FROM ev, fq),
ftop AS (SELECT vec_id FROM (
  SELECT vec_id, row_number() OVER (ORDER BY s DESC, vec_id) AS rn FROM fscore)
  WHERE rn <= 10)
SELECT CAST(10 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_overlap,
       CAST(100 * count(*) // 10 AS BIGINT) AS recall_pct
FROM itop JOIN ftop USING (vec_id)""",
    ref="extension: int8-quantized retrieval recall audit vs exact "
    "float dot top-k -- integer scores, bit-exact quantization on both "
    "engines",
)
def q_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    xs = [float(x) for x in row.embedding]
    ma = max(abs(x) for x in xs)
    import math

    qlit = [int(math.floor(x * 127 / ma + 0.5)) for x in xs]

    iq = quantize_embeddings(emb).select("vec_id", "qvec")
    qarr = F.array(*[F.lit(v) for v in qlit])
    iscore = iq.select(
        "vec_id",
        F.aggregate(
            F.zip_with(F.col("qvec"), qarr, lambda a, b: a.cast("long") * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("s"),
    )
    itop = iscore.orderBy(F.desc("s"), "vec_id").limit(10).select("vec_id")

    ev = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    flit = F.array(*[F.lit(x) for x in xs])
    fscore = ev.select(
        "vec_id",
        F.aggregate(
            F.zip_with(F.col("v"), flit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("s"),
    )
    ftop = fscore.orderBy(F.desc("s"), "vec_id").limit(10).select("vec_id")
    return itop.join(ftop, "vec_id").agg(
        F.lit(10).cast("long").alias("k"),
        F.count(F.lit(1)).alias("n_overlap"),
        F.expr("100 * count(1) div 10").cast("long").alias("recall_pct"),
    )


def _advisor_sql() -> str:
    branches = " UNION ALL ".join(
        f"""
SELECT '{t}' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) * {w} AS BIGINT) AS est_bytes,
       CASE WHEN count(*) * {w} < {_BROADCAST_BYTES}
            THEN 'broadcast' ELSE 'shuffle' END AS strategy
FROM {t}"""
        for t, w in sorted(_ROW_WIDTH.items())
    )
    return branches


@_register(
    "join_strategy_advisor",
    _advisor_sql(),
    ref="extension: CBO-style broadcast-vs-shuffle advisor -- exact row "
    "counts x literal row widths against the 10 MB broadcast threshold; "
    "statistics in, physical-plan decision out",
)
def q_join_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for t, w in sorted(_ROW_WIDTH.items()):
        df = load_table(spark, sf_dir, t)
        outs.append(
            df.agg(
                F.lit(t).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) * w).cast("bigint").alias("est_bytes"),
                F.when(
                    F.count(F.lit(1)) * w < _BROADCAST_BYTES, F.lit("broadcast")
                )
                .otherwise(F.lit("shuffle"))
                .alias("strategy"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
