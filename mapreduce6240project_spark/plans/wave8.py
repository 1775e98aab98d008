"""Round-3 coverage wave 8: product-analytics shapes over the event
stream -- weekly retention cohorts, within-session transition bigrams
(Markov edges), and the day-of-week x hour activity heatmap.

All integer-exact outputs: week offsets are exact epoch arithmetic
(both engines truncate weeks to naive Monday midnights), transitions
count lead() pairs under the unique (ts, event_id) sort, and the
heatmap derives day-of-week from epoch days (dayofweek() numbering
differs between engines; ``(epoch_day + 4) % 7`` with 0=Sunday does
not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.numeric import stable_sum_micros
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

# -- weekly retention cohorts ----------------------------------------------


@_register(
    "retention_cohorts",
    """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort
  FROM events GROUP BY user_id
),
act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
SELECT CAST(epoch(cohort) AS BIGINT) AS cohort_start,
       CAST((epoch(wk) - epoch(cohort)) / 604800 AS INT) AS week_offset,
       count(*) AS n_users
FROM act JOIN firsts USING (user_id)
GROUP BY 1, 2""",
    ref="extension: weekly retention cohorts (first-activity week x "
    "active week); two aggregations + one key join, offsets are exact "
    "epoch arithmetic on Monday-truncated weeks",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.unix_timestamp(F.date_trunc("week", F.min("ts"))).alias("cohort_s")
    )
    act = ev.select(
        "user_id", F.unix_timestamp(F.date_trunc("week", F.col("ts"))).alias("wk_s")
    ).distinct()
    return (
        act.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_s").alias("cohort_start"),
            ((F.col("wk_s") - F.col("cohort_s")) / 604800)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# -- within-session transition bigrams -------------------------------------


@_register(
    "session_transitions",
    """
WITH o AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
f AS (
  SELECT *, CASE WHEN us - lag(us) OVER w >= 1800000000
                   OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, sum(new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM f
),
t AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id, sess
                                ORDER BY us, event_id) AS dst
  FROM s
)
SELECT src, dst, count(*) AS n
FROM t WHERE dst IS NOT NULL
GROUP BY 1, 2 ORDER BY n DESC, src, dst LIMIT 20""",
    ref="extension: within-session Markov transition edges (sessionize "
    "via gaps-and-islands + lead bigrams); one shuffle on the user key, "
    "top-k via TakeOrderedAndProject",
)
def q_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    new = (
        F.when(
            (us - F.lag(us).over(w) >= 1_800_000_000)
            | F.lag(us).over(w).isNull(),
            1,
        )
        .otherwise(0)
    )
    flagged = ev.withColumn("_new", new).withColumn(
        "_sess", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    wt = Window.partitionBy("user_id", "_sess").orderBy(us, "event_id")
    pairs = flagged.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wt).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "src", "dst")
        .limit(20)
    )


# -- day-of-week x hour activity heatmap -----------------------------------


@_register(
    "hourly_heatmap",
    """
SELECT CAST((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7 AS INT) AS dow,
       CAST(hour(ts) AS INT) AS hour,
       count(*) AS n,
       round(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)) / 1000000.0, 4)
         AS sum_value
FROM events GROUP BY 1, 2""",
    ref="extension: day-of-week x hour activity heatmap; dow from epoch "
    "days ((day+4)%7, 0=Sunday) because dayofweek() numbering differs "
    "between engines",
)
def q_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch_day = F.floor(F.unix_timestamp("ts") / 86400).cast("bigint")
    return ev.groupBy(
        ((epoch_day + 4) % 7).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        stable_sum_micros("value").alias("sum_value"),
    )


# -- per-user value trend (exact-integer regression slope) -----------------


@_register(
    "user_value_trend",
    """
WITH pts AS (
  SELECT user_id,
         epoch_us(ts) // 1000000 - 1704067200 AS x,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y
  FROM events
),
aggs AS (
  SELECT user_id,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM pts GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_micros_per_s
FROM aggs WHERE n * sxx - sx * sx <> 0""",
    ref="extension: per-user OLS trend of event value over time.  The "
    "closed-form slope (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is computed from "
    "exact integer sums (x = whole epoch seconds rebased to 2024-01-01, "
    "y = value in fixed-point micros, accumulated as decimal(38,0)): "
    "associative, so bit-identical under any partial-agg order, unlike a "
    "raw float regr_slope.  One shuffle on user_id; seconds (not micros) "
    "keep n*Sxx inside 38 digits even at 1e7 events/user",
)
def q_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    x = (F.expr("unix_micros(ts) div 1000000") - F.lit(1704067200)).cast(dec)
    y = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint").cast(dec)
    aggs = (
        ev.select("user_id", x.alias("x"), y.alias("y"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    n = F.col("n_events").cast(dec)
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        aggs.filter(den != 0)
        .select(
            "user_id",
            "n_events",
            F.round(num.cast("double") / den.cast("double"), 6).alias(
                "slope_micros_per_s"
            ),
        )
    )
