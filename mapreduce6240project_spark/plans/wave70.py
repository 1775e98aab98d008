"""Round-3 coverage wave 70: embedding isotropy and bounce rate.

- ``embedding_isotropy_audit``: anisotropy check -- the mean cosine
  between each vector and the corpus centroid.  Transformer embeddings
  famously collapse into a narrow cone (mean cosine near 1), which
  wrecks cosine-based retrieval; this is the audit that detects it.
  One d-bounded centroid aggregate + one narrow cosine pass; the mean
  is micro-quantized per row before summation so the aggregate is
  order-independent.
- ``session_bounce_rate``: fraction of 30-minute-gap sessions with
  exactly one event -- the bounce metric of product analytics, on the
  same session CTE family as session_window / session_path_top10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "embedding_isotropy_audit",
    """
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
dims AS (
  -- centroid in 6-decimal fixed point: integer sum + truncating div,
  -- so mu is bit-exact under any aggregation order / engine (a float
  -- avg here could shift a boundary cosine across the quantization
  -- step -- round-3 advice)
  SELECT CAST(t.i AS INT) AS i,
         sum(CAST(floor(v[CAST(t.i AS INT)] * 1000000 + 0.5) AS BIGINT))
           // count(*) AS mu_micro
  FROM vecs, unnest(range(1, len(v) + 1)) AS t(i)
  GROUP BY 1
),
cent AS (
  SELECT list(CAST(mu_micro AS DOUBLE) / 1000000 ORDER BY i) AS c FROM dims
),
cos AS (
  SELECT CAST(floor(
           list_dot_product(v, c)
           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(c, c)))
           * 1000000 + 0.5) AS BIGINT) AS cos_micro
  FROM vecs, cent
)
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(cos_micro) // count(*) AS BIGINT) AS mean_cos_micro,
       CAST(sum(CASE WHEN cos_micro > 500000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_in_cone
FROM cos""",
    ref="extension: embedding isotropy/anisotropy audit -- mean cosine "
    "to the corpus centroid (cone-collapse detector); d-bounded "
    "centroid + micro-quantized per-row cosines",
)
def q_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # centroid components as integer micro-sums + truncating div: the
    # mean is associative/order-free, so the centroid literal below is
    # bit-identical to the oracle's (a float avg could flip a boundary
    # cosine after quantization -- round-3 advice)
    dv = emb.select(
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1_000_000 + F.lit(0.5)).cast(
                    "bigint"
                ),
            )
        ).alias("i", "qx")
    )
    dims = (
        dv.groupBy("i")
        .agg(F.expr("sum(qx) div count(*)").alias("mu_micro"))
        .orderBy("i")
    )
    centroid = [r.mu_micro / 1_000_000 for r in dims.collect()]  # d-bounded
    c = F.array(*[F.lit(x) for x in centroid])
    from mapreduce6240project_spark.operators.similarity import cosine

    cos = emb.select(
        F.floor(cosine("embedding", c) * 1_000_000 + F.lit(0.5))
        .cast("bigint")
        .alias("cos_micro")
    )
    return cos.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.expr("sum(cos_micro) div count(*)").cast("bigint").alias(
            "mean_cos_micro"
        ),
        F.sum(F.when(F.col("cos_micro") > 500_000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_in_cone"),
    )


@_register(
    "session_bounce_rate",
    """
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS session
  FROM flagged
),
sizes AS (SELECT user_id, session, count(*) AS n FROM sess GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 10000 // count(*)
            AS BIGINT) AS bounce_permyriad
FROM sizes""",
    ref="extension: session bounce rate -- single-event sessions over "
    "the 30-min gaps-and-islands CTE; product-analytics KPI",
)
def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    flagged = ev.select(
        "user_id",
        "us",
        "event_id",
        F.expr(
            "CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us,"
            " event_id) IS NULL OR us - lag(us) OVER (PARTITION BY user_id"
            " ORDER BY us, event_id) >= 1800000000 THEN 1 ELSE 0 END"
        ).alias("new_s"),
    )
    sess = flagged.select(
        "user_id",
        F.expr(
            "sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id)"
        ).alias("session"),
    )
    sizes = sess.groupBy("user_id", "session").agg(
        F.count(F.lit(1)).alias("n")
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
        F.expr(
            "sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 10000 div count(*)"
        )
        .cast("bigint")
        .alias("bounce_permyriad"),
    )
