"""Round-3 coverage wave 85: group-aware folds, event-time disorder
profile, Kaplan-Meier survival.

- ``group_kfold_sources``: group-aware k-fold assignment -- every doc
  from a source lands in the SAME fold (``hash60(source) mod 5``), the
  split that prevents near-duplicate leakage across folds when
  duplicates cluster within a source.  The row-level variant is
  ``kfold5_assign``; this is the GroupKFold counterpart.  Map-only,
  replayable, and re-run stable (the properties that matter for
  training splits).
- ``out_of_order_lag``: event-time disorder profile -- for each event,
  how far behind the per-user running-max event time it arrived
  (arrival order = ``event_id``), bucketed into a bounded minutes-lag
  histogram.  This is THE statistic that sizes a streaming watermark:
  the p99 of this table is your allowed-lateness setting; everything
  above it is the data a watermark would drop (cf. the
  ``streaming_*`` jobs and test_streaming_late).  One user-partitioned
  ordered window + a bounded histogram aggregation.
- ``km_repurchase_survival``: Kaplan-Meier product-limit estimate of
  time-to-repurchase with right-censoring -- consecutive purchase gaps
  per user are event spells, the tail from each user's last purchase
  to the corpus end is a CENSORED spell (ignoring censoring biases the
  curve optimistic; this is the correct estimator).  Day-grain spells
  reduce to a bounded duration histogram; the risk set is a reverse
  cumulative window and the log-survival curve is a forward cumulative
  sum of micro-nat-quantized ``ln((n-d)/n)`` terms (deterministic
  integers, the ``zipf_slope_tokens`` convention) -- both windows run
  over the ~30-row duration table.

Scale: hash-split and lag are map-only/window-narrow; KM shrinks to a
calendar-bounded histogram before any sequential math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "group_kfold_sources",
    """
WITH f AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(source), 1, 15))::BIGINT % 5 AS fold
  FROM documents
)
SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM f GROUP BY fold""",
    ref="extension: GroupKFold by source (hash60(source) mod 5) -- "
    "leakage-safe splits when near-dups cluster within a source; "
    "row-level variant is kfold5_assign",
)
def q_group_kfold_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.functions.hashing import hash60

    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "doc_id", "source", (hash60(F.col("source")) % 5).alias("fold")
    )
    return f.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
    )


@_register(
    "out_of_order_lag",
    """
WITH lagged AS (
  SELECT epoch_us(max(ts) OVER (PARTITION BY user_id ORDER BY event_id))
           - epoch_us(ts) AS lag_us
  FROM events
)
SELECT CAST(lag_us // 60000000 AS BIGINT) AS lag_min,
       CAST(count(*) AS BIGINT) AS n_events
FROM lagged GROUP BY 1""",
    ref="extension: event-time disorder histogram (running-max event "
    "time minus event time over arrival order, minute buckets) -- the "
    "watermark-sizing statistic for the streaming jobs",
)
def q_out_of_order_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lagged = ev.select(
        (F.unix_micros(F.max("ts").over(w)) - F.unix_micros(F.col("ts")))
        .alias("lag_us")
    )
    return (
        lagged.select(F.expr("lag_us div 60000000").alias("lag_min"))
        .groupBy("lag_min")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(F.col("lag_min").cast("bigint").alias("lag_min"), "n_events")
    )


@_register(
    "km_repurchase_survival",
    """
WITH p AS (
  SELECT user_id, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events WHERE event_type = 'purchase'
), endt AS (
  SELECT max(ts) AS t_end FROM events
), spells AS (
  SELECT CASE WHEN nxt IS NOT NULL
              THEN (epoch_us(nxt) - epoch_us(ts)) // 86400000000
              ELSE (epoch_us((SELECT t_end FROM endt)) - epoch_us(ts))
                   // 86400000000 END AS dur_d,
         CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS is_event
  FROM p
), h AS (
  SELECT dur_d, sum(is_event) AS d, count(*) - sum(is_event) AS c
  FROM spells GROUP BY dur_d
), risk AS (
  SELECT dur_d, d,
         sum(d + c) OVER (ORDER BY dur_d DESC) AS n_risk
  FROM h
), curve AS (
  SELECT dur_d, d, n_risk,
         sum(CASE WHEN d > 0 AND n_risk = d THEN -99000000
                  WHEN d > 0 THEN CAST(floor(
               ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) ELSE 0 END)
           OVER (ORDER BY dur_d) AS log_surv_micro
  FROM risk
)
SELECT CAST(dur_d AS BIGINT) AS dur_d,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       CAST(log_surv_micro AS BIGINT) AS log_surv_micro
FROM curve WHERE d > 0""",
    ref="extension: Kaplan-Meier time-to-repurchase with right "
    "censoring at corpus end -- day-grain spell histogram, reverse "
    "cumulative risk set, micro-nat-quantized product-limit curve",
)
def q_km_repurchase_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = purch.select(
        F.unix_micros("ts").alias("t_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("nxt_us"),
    )
    t_end = ev.agg(F.unix_micros(F.max("ts")).alias("end_us"))
    spells = p.crossJoin(F.broadcast(t_end)).select(
        F.expr(
            "CASE WHEN nxt_us IS NOT NULL"
            " THEN (nxt_us - t_us) div 86400000000"
            " ELSE (end_us - t_us) div 86400000000 END"
        ).alias("dur_d"),
        F.when(F.col("nxt_us").isNotNull(), 1).otherwise(0).alias(
            "is_event"
        ),
    )
    h = spells.groupBy("dur_d").agg(
        F.sum("is_event").alias("d"),
        (F.count(F.lit(1)) - F.sum("is_event")).alias("c"),
    )
    # both cumulative scans run over the bounded duration histogram
    w_risk = Window.orderBy(F.desc("dur_d")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = h.select(
        "dur_d", "d", F.sum(F.col("d") + F.col("c")).over(w_risk).alias(
            "n_risk"
        )
    )
    w_curve = Window.orderBy("dur_d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # n_risk == d would be ln(0): survival hits exactly zero; use a
    # deterministic -99 nat sentinel (e^-99 ~ 0) in both engines
    term = F.expr(
        "CASE WHEN d > 0 AND n_risk = d THEN -99000000"
        " WHEN d > 0 THEN CAST(floor("
        "ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))"
        " * 1000000 + 0.5) AS BIGINT) ELSE 0 END"
    )
    curve = risk.select(
        "dur_d",
        "d",
        "n_risk",
        F.sum(term).over(w_curve).alias("log_surv_micro"),
    )
    return curve.filter(F.col("d") > 0).select(
        F.col("dur_d").cast("bigint").alias("dur_d"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.col("log_surv_micro").cast("bigint").alias("log_surv_micro"),
    )
