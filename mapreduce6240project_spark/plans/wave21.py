"""Round-3 coverage wave 21: ML feature-engineering primitives.

- ``feature_hashing``: the hashing trick -- tokens map straight to a
  fixed 2^k-bucket sparse vector with no vocabulary pass, the
  featurizer of choice when the vocab is unbounded (URLs, user agents,
  n-grams).  Buckets come from the engine's SQL-replayable md5 hash
  family, and each document's sparse vector is summarized as an
  integer checksum (sum of bucket*count) plus nnz, so the oracle
  hash-checks the whole vector without comparing array formats.
- ``target_encode_loo``: leave-one-out target (mean) encoding of a
  categorical column -- each event's category is replaced by the mean
  target of OTHER events in the category, the standard
  leakage-avoiding encoder for supervised training.  One aggregate
  per category broadcast back; LOO is computed row-side as
  ``(sum - own) / (n - 1)`` from exact integer micros, so no
  second pass and no float drift.

Reference parity note: feature engineering is an LLM/ML-pipeline
extension alongside SURVEY.md section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.extensions import _NORM
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

HASH_BITS = 10  # 1024 feature buckets
_HASH_MOD = 1 << HASH_BITS


@_register(
    "feature_hashing",
    f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS token FROM documents
),
bucketed AS (
  SELECT doc_id,
         ('0x' || substr(md5(token), 1, 15))::BIGINT % {_HASH_MOD} AS bucket
  FROM tok
),
vec AS (
  SELECT doc_id, bucket, count(*) AS n FROM bucketed GROUP BY doc_id, bucket
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS nnz,
       CAST(sum(bucket * n) AS BIGINT) AS vec_checksum
FROM vec GROUP BY doc_id""",
    ref="extension: hashing-trick featurization (md5 -> 2^k buckets, no "
    "vocabulary pass); sparse vector verified via integer checksum",
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("bigint")
        % _HASH_MOD
    )
    vec = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n"))
    )
    return vec.groupBy("doc_id").agg(
        F.count("*").alias("nnz"),
        F.sum(F.col("bucket") * F.col("n")).alias("vec_checksum"),
    )


@_register(
    "target_encode_loo",
    """
WITH ev AS (
  SELECT event_id, event_type,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vmic
  FROM events
),
stats AS (
  SELECT event_type, count(*) AS n, sum(vmic) AS s
  FROM ev GROUP BY event_type
)
SELECT e.event_id,
       CASE WHEN st.n > 1
            THEN floor((st.s - e.vmic) / 1000000.0 / (st.n - 1) * 10000 + 0.5)
                 / 10000.0
       END AS loo_mean_value
FROM ev e JOIN stats st USING (event_type)""",
    ref="extension: leave-one-out target encoding ((sum - own)/(n - 1) "
    "from exact integer micros; category stats broadcast back, no "
    "leakage of the row's own target)",
)
def q_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint").alias("vmic"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("vmic").alias("s")
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        # floor(x*1e4 + 0.5) is identical IEEE arithmetic in both
        # engines; engine round() implementations differ at
        # representation boundaries (same convention as quality_score)
        F.when(
            F.col("n") > 1,
            F.floor(
                (F.col("s") - F.col("vmic")) / 1000000.0 / (F.col("n") - 1) * 10000
                + F.lit(0.5)
            )
            / 10000.0,
        ).alias("loo_mean_value"),
    )
