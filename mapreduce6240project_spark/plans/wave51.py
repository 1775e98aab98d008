"""Round-3 coverage wave 51: T5-style span corruption and a daily
leaderboard.

- ``span_corruption_plan``: deterministic span-corruption masking (the
  T5/UL2 pre-training objective) -- positions START a 3-token span when
  ``hash60(doc:pos) % 100 < 5``, and a token is masked when any start
  falls in its trailing 3-position window (span union via a rows-frame
  max, fully relational -- no sequential scan).  Per-doc totals plus a
  masked-position checksum verify the exact plan, the span-level twin
  of ``mlm_mask_plan``'s token-level masking.
- ``daily_top3_types``: per-day top-3 event types by count -- the
  leaderboard shape at time grain; rank<=3 rides WindowGroupLimit so
  only 3 rows per day survive below the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.hashing import hash60, hash60_sql
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_SPAN_RATE = 5
_SPAN_LEN = 3


@_register(
    "span_corruption_plan",
    f"""
WITH pos AS (
  SELECT doc_id,
         generate_subscripts(string_split({_NORM}, ' '), 1) AS p
  FROM documents
),
starts AS (
  SELECT doc_id, p,
         CASE WHEN {hash60_sql("doc_id || ':' || p")} % 100 < {_SPAN_RATE}
              THEN 1 ELSE 0 END AS s
  FROM pos
),
cov AS (
  SELECT doc_id, p, s,
         max(s) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN {_SPAN_LEN - 1} PRECEDING AND CURRENT ROW)
           AS m
  FROM starts
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(s) AS BIGINT) AS n_spans,
       CAST(sum(m) AS BIGINT) AS n_masked,
       CAST(sum(CASE WHEN m = 1 THEN p ELSE 0 END) AS BIGINT)
         AS masked_pos_checksum
FROM cov GROUP BY doc_id""",
    ref="extension: T5-style span corruption plan -- hash-seeded span "
    "starts, rows-frame max for the span union; verified by the "
    "masked-position checksum",
)
def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import tokens

    pos = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(tokens("text")).alias("pos0", "tok"))
        .select("doc_id", (F.col("pos0") + 1).alias("p"))
    )
    h = hash60(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), F.col("p").cast("string")
        )
    )
    starts = pos.select(
        "doc_id", "p", F.when(h % 100 < _SPAN_RATE, 1).otherwise(0).alias("s")
    )
    cov = starts.withColumn(
        "m",
        F.expr(
            f"max(s) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN"
            f" {_SPAN_LEN - 1} PRECEDING AND CURRENT ROW)"
        ),
    )
    return cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("s").cast("bigint").alias("n_spans"),
        F.sum("m").cast("bigint").alias("n_masked"),
        F.sum(F.when(F.col("m") == 1, F.col("p")).otherwise(0))
        .cast("bigint")
        .alias("masked_pos_checksum"),
    )


@_register(
    "daily_top3_types",
    """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT CAST(strftime(day, '%Y-%m-%d') AS VARCHAR) AS day, event_type,
       CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT day, event_type, n,
         row_number() OVER (PARTITION BY day ORDER BY n DESC, event_type) AS rk
  FROM d
) WHERE rk <= 3""",
    ref="extension: per-day top-3 leaderboard -- rank<=3 under "
    "WindowGroupLimit, 3 rows per day survive below the sort",
)
def q_daily_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("ts").cast("date").alias("day0"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        d.withColumn(
            "rk",
            F.expr(
                "row_number() OVER (PARTITION BY day0"
                " ORDER BY n DESC, event_type)"
            ),
        )
        .filter(F.col("rk") <= 3)
        .select(
            F.date_format("day0", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )
