"""Round-3 coverage wave 71: corpus-naturalness statistics.

- ``zipf_slope_tokens``: the Zipf rank-frequency slope over the top-200
  tokens -- natural language sits near -1; template/spam corpora drift
  far from it, so the slope is a cheap corpus-naturalness gate.  OLS on
  (ln rank, ln freq) with every per-row term micro-quantized BEFORE
  summation (the event_type_entropy convention), so the closed-form
  sums are order-free integers and the final slope is a divide-first
  integer ratio.
- ``token_entropy``: corpus unigram entropy in micro-nats (same
  quantized-term trick) plus token totals -- the diversity companion
  to the vocabulary-coverage queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOPK = 200


@_register(
    "zipf_slope_tokens",
    f"""
WITH tok AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS t
  FROM documents WHERE {_NORM} <> ''
),
freq AS (
  SELECT t, count(*) AS n FROM tok GROUP BY 1
  ORDER BY n DESC, t LIMIT {_TOPK}
),
rk AS (
  SELECT row_number() OVER (ORDER BY n DESC, t) AS r, n FROM freq
),
q AS (
  SELECT CAST(floor(ln(r) * 1000000 + 0.5) AS BIGINT) AS qx,
         CAST(floor(ln(n) * 1000000 + 0.5) AS BIGINT) AS qy
  FROM rk
),
s AS (
  SELECT count(*) AS k, sum(qx) AS sx, sum(qy) AS sy,
         sum(qx * qy) AS sxy, sum(qx * qx) AS sxx
  FROM q
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(CASE WHEN k * sxy - sx * sy < 0
                 THEN -((-(k * sxy - sx * sy))
                        // ((k * sxx - sx * sx) // 1000000))
                 ELSE (k * sxy - sx * sy)
                      // ((k * sxx - sx * sx) // 1000000) END
            AS BIGINT) AS slope_micro
FROM s""",
    ref="extension: Zipf rank-frequency slope (micro-quantized log "
    "terms, divide-first integer OLS) -- corpus-naturalness gate; "
    "natural text sits near slope -1",
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.textstats import vocab_topk

    docs = load_table(spark, sf_dir, "documents")
    freq = vocab_topk(docs, k=_TOPK)
    rk = freq.select(
        F.expr("row_number() OVER (ORDER BY n DESC, token)").alias("r"), "n"
    )
    q = rk.select(
        F.expr("CAST(floor(ln(r) * 1000000 + 0.5) AS BIGINT)").alias("qx"),
        F.expr("CAST(floor(ln(n) * 1000000 + 0.5) AS BIGINT)").alias("qy"),
    )
    s = q.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.expr("qx * qy")).alias("sxy"),
        F.sum(F.expr("qx * qx")).alias("sxx"),
    )
    return s.select(
        F.col("k").cast("bigint").alias("k"),
        F.expr(
            "(k * sxy - sx * sy) div ((k * sxx - sx * sx) div 1000000)"
        )
        .cast("bigint")
        .alias("slope_micro"),
    )


@_register(
    "token_entropy",
    f"""
WITH tok AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS t
  FROM documents WHERE {_NORM} <> ''
),
c AS (SELECT t, count(*) AS n FROM tok GROUP BY 1),
tot AS (SELECT sum(n) AS nt FROM c)
SELECT CAST(sum(CAST(floor(
         -(CAST(n AS DOUBLE) / nt) * ln(CAST(n AS DOUBLE) / nt)
         * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS entropy_unat,
       CAST((SELECT nt FROM tot) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct
FROM c, tot""",
    ref="extension: corpus unigram entropy in micro-nats (quantized "
    "terms, order-free sums; event_type_entropy convention) -- token "
    "diversity companion to vocabulary coverage",
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(normalize_text("text").alias("nm")).filter(
        F.col("nm") != ""
    ).select(F.explode(F.split("nm", " ")).alias("t"))
    c = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").alias("nt"))
    withtot = c.crossJoin(F.broadcast(tot))
    return withtot.agg(
        F.sum(
            F.expr(
                "CAST(floor(-(CAST(n AS DOUBLE) / nt)"
                " * ln(CAST(n AS DOUBLE) / nt) * 1000000 + 0.5) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("entropy_unat"),
        F.max("nt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
