"""Round-3 coverage wave 77: backlog accounting, weekday seasonality,
dedup inflation.

- ``orders_backlog_daily``: open-order backlog per day via event
  sourcing -- each order contributes +1 on its order date and -1 on its
  fulfillment date (max lineitem ship date); the backlog is the running
  sum of those deltas over the day grain.  The delta aggregation is one
  shuffle over orders; the cumulative scan runs on the tiny day
  dimension (calendar-bounded), the same prefix-sum shape as
  ``changepoint_day``.  Orders with no lineitems never close and stay
  in the backlog tail.
- ``weekday_value_index``: day-of-week seasonality index of event
  value -- mean value per ISO weekday relative to the overall mean, in
  permyriad integers.  The sufficient statistics are exact cent sums;
  the final ratio ``floor(sum_d * n_total * 10000 / (n_d *
  sum_total))`` runs in IEEE doubles with identical expression shape
  in both engines (the all-bigint form overflows at 10x -- same
  stress-found failure mode as ``gini_customer_revenue``).  Spark has
  no ``isodow``; ``weekday() + 1`` is the documented equivalent
  (0=Monday shifted to 1=Monday..7=Sunday, matching DuckDB's
  ``isodow``).
- ``corpus_dedup_inflation``: the single-row corpus-card stat every
  dedup report leads with -- documents and tokens before vs after
  exact dedup, and the token inflation factor in permyriad.  Tokens
  "after dedup" counts each distinct normalized text once (the
  survivor's tokens), so inflation = tokens_total / tokens_unique.

Scale: all three are aggregation-only; the backlog's ordered scan is
over distinct days (bounded by the calendar), never over orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_NTOK = f"len(string_split({_NORM}, ' '))"


@_register(
    "orders_backlog_daily",
    """
WITH fulfill AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS ship_d
  FROM lineitem GROUP BY 1
), deltas AS (
  SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM orders
  UNION ALL
  SELECT f.ship_d AS day, -1 AS delta
  FROM orders o JOIN fulfill f ON o.o_orderkey = f.l_orderkey
), by_day AS (
  SELECT day, sum(delta) AS net FROM deltas GROUP BY 1
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(sum(net) OVER (ORDER BY day) AS BIGINT) AS backlog
FROM by_day""",
    ref="extension: open-order backlog by event sourcing -- +1 at "
    "order date, -1 at last ship date, prefix sum over the bounded "
    "day dimension",
)
def q_orders_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    fulfill = li.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("ship_d")
    )
    opened = o.select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.lit(1).alias("delta"),
    )
    closed = (
        o.join(fulfill, o.o_orderkey == fulfill.l_orderkey)
        .select(F.col("ship_d").alias("day"), F.lit(-1).alias("delta"))
    )
    by_day = (
        opened.unionByName(closed)
        .groupBy("day")
        .agg(F.sum("delta").alias("net"))
    )
    # ordered scan over distinct days only (calendar-bounded)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return by_day.select(
        F.col("day").cast("string").alias("day"),
        F.sum("net").over(w).cast("bigint").alias("backlog"),
    )


@_register(
    "weekday_value_index",
    """
WITH per_dow AS (
  SELECT isodow(CAST(ts AS DATE)) AS dow,
         count(*) AS n_d,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sum_d
  FROM events GROUP BY 1
)
SELECT CAST(dow AS BIGINT) AS dow, CAST(n_d AS BIGINT) AS n_events,
       CAST(sum_d AS BIGINT) AS sum_value_c,
       CAST(floor(CAST(sum_d AS DOUBLE) * sum(n_d) OVER () * 10000
                  / (CAST(n_d AS DOUBLE) * sum(sum_d) OVER ()))
            AS BIGINT) AS index_pm
FROM per_dow""",
    ref="extension: weekday seasonality index -- per-ISO-weekday mean "
    "value vs overall mean, exact cents, single end division",
)
def q_weekday_value_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        (F.weekday(F.col("ts").cast("date")) + 1).alias("dow"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
    )
    per_dow = ev.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_d"), F.sum("v_c").alias("sum_d")
    )
    w = Window.partitionBy()
    return per_dow.select(
        F.col("dow").cast("bigint").alias("dow"),
        F.col("n_d").cast("bigint").alias("n_events"),
        F.col("sum_d").cast("bigint").alias("sum_value_c"),
        F.expr(
            "CAST(floor(CAST(sum_d AS DOUBLE) * sum(n_d) OVER () * 10000"
            " / (CAST(n_d AS DOUBLE) * sum(sum_d) OVER ()))"
            " AS BIGINT)"
        ).alias("index_pm"),
    )


@_register(
    "corpus_dedup_inflation",
    f"""
WITH toks AS (
  SELECT md5({_NORM}) AS fp, {_NTOK} AS n_tok FROM documents
), uniq AS (
  SELECT fp, min(n_tok) AS n_tok, count(*) AS n_copies
  FROM toks GROUP BY fp
)
SELECT CAST(sum(n_copies) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_unique_docs,
       CAST(sum(n_tok * n_copies) AS BIGINT) AS tokens_total,
       CAST(sum(n_tok) AS BIGINT) AS tokens_unique,
       CAST(sum(n_tok * n_copies) * 10000 AS BIGINT)
         // CAST(sum(n_tok) AS BIGINT) AS inflation_pm
FROM uniq""",
    ref="extension: corpus dedup-inflation card stat -- docs/tokens "
    "before vs after exact dedup in one digest shuffle (identical "
    "texts share one token count, so min = the survivor's)",
)
def q_corpus_dedup_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.md5(normalize_text("text")).alias("fp"),
        F.size(F.split(normalize_text("text"), " ")).alias("n_tok"),
    )
    uniq = toks.groupBy("fp").agg(
        F.min("n_tok").alias("n_tok"), F.count(F.lit(1)).alias("n_copies")
    )
    return uniq.agg(
        F.sum("n_copies").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique_docs"),
        F.sum(F.col("n_tok") * F.col("n_copies"))
        .cast("bigint")
        .alias("tokens_total"),
        F.sum("n_tok").cast("bigint").alias("tokens_unique"),
        F.expr(
            "CAST(sum(n_tok * n_copies) * 10000 AS BIGINT)"
            " div CAST(sum(n_tok) AS BIGINT)"
        ).alias("inflation_pm"),
    )
