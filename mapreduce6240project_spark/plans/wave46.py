"""Round-3 coverage wave 46: ML-pipeline split/QA utilities.

- ``kfold5_assign``: stratified 5-fold cross-validation assignment --
  rank within each (mktsegment) stratum by a deterministic LCG draw,
  fold = rank % 5, reported as per-(stratum, fold) counts.  The
  counts prove near-perfect balance (the property k-fold exists for)
  while keeping the result stratum-bounded.
- ``lang_confusion_matrix``: the marker-based language identifier's
  full confusion matrix against the labeled ``lang`` column -- the
  diagnostic behind the single-number ``lang_id_accuracy``; per
  (true_lang, pred_lang) counts.
- ``events_throttle_1h``: time-scoped dedup / rate limiting -- keep an
  event only if the same (user, type) has not fired within the
  preceding hour (lag window per key).  The feed-semantics dedup where
  suppression EXPIRES, unlike fingerprint dedup; note the kept set is
  defined against the raw stream (a kept-only cascade would need an
  iterative pass), the standard throttling-audit semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

#: LCG constants shared with operators/sampling.py (glibc-style, public)
_LCG = "((c_custkey % 2147483648) * 1103515245 + 12345) % 2147483648"


@_register(
    "kfold5_assign",
    f"""
WITH ranked AS (
  SELECT c_mktsegment,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY {_LCG}, c_custkey) AS rk
  FROM customer
)
SELECT c_mktsegment, CAST((rk - 1) % 5 AS BIGINT) AS fold,
       CAST(count(*) AS BIGINT) AS n
FROM ranked GROUP BY 1, 2""",
    ref="extension: stratified 5-fold CV assignment -- LCG-ranked "
    "round-robin within each stratum; per-(stratum, fold) counts prove "
    "balance",
)
def q_kfold5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    ranked = cust.select(
        "c_mktsegment",
        F.expr(
            f"row_number() OVER (PARTITION BY c_mktsegment ORDER BY {_LCG},"
            " c_custkey)"
        ).alias("rk"),
    )
    return (
        ranked.select(
            "c_mktsegment", F.expr("(rk - 1) % 5").cast("bigint").alias("fold")
        )
        .groupBy("c_mktsegment", "fold")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _confusion_sql() -> str:
    # Reuses the exact scoring/argmax SQL the verified lang_id oracle
    # runs, so the matrix can never drift from the classifier.
    from mapreduce6240project_spark.plans.extensions import _marker_hits_sql

    return f"""
WITH scored AS (
  SELECT lang AS true_lang,
    CASE WHEN greatest(s_en, s_es, s_fr, s_de) <= 0 THEN 'unknown'
         WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
         WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
         WHEN s_fr >= s_de THEN 'fr'
         ELSE 'de' END AS pred_lang
  FROM (
    SELECT lang,
      {_marker_hits_sql(("the", "and", "of", "to", "is"))} AS s_en,
      {_marker_hits_sql(("el", "la", "los", "que", "es"))} AS s_es,
      {_marker_hits_sql(("le", "la", "les", "et", "est"))} AS s_fr,
      {_marker_hits_sql(("der", "die", "das", "und", "ist"))} AS s_de
    FROM documents
  )
)
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
FROM scored GROUP BY 1, 2"""


@_register(
    "lang_confusion_matrix",
    _confusion_sql(),
    ref="extension: language-ID confusion matrix (marker-hit argmax vs "
    "labeled lang) -- the per-pair diagnostic behind lang_id_accuracy; "
    "oracle reuses the verified lang_id scoring SQL verbatim",
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.textstats import lang_id

    docs = load_table(spark, sf_dir, "documents")
    pred = lang_id(docs)  # (doc_id, pred_lang)
    truth = docs.select("doc_id", F.col("lang").alias("true_lang"))
    return (
        truth.join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "events_throttle_1h",
    """
WITH g AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS prev_us
  FROM events
)
SELECT user_id, event_type,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 3600000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM g GROUP BY 1, 2""",
    ref="extension: time-scoped dedup / rate limiting (suppress repeats "
    "of (user, type) within 1 h via a lag window); suppression expires, "
    "unlike fingerprint dedup",
)
def q_events_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    g = ev.select(
        "user_id",
        "event_type",
        "us",
        F.expr(
            "lag(us) OVER (PARTITION BY user_id, event_type"
            " ORDER BY us, event_id)"
        ).alias("prev_us"),
    )
    return g.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(
            F.when(
                F.col("prev_us").isNull()
                | (F.col("us") - F.col("prev_us") > 3_600_000_000),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_kept"),
    )
