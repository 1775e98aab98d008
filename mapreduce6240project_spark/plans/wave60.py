"""Round-3 coverage wave 60: abuse/fraud detection heuristics.

- ``bot_regularity_audit``: inter-event-time regularity per user -- the
  classic bot signal (machine traffic fires on a clock; human gaps are
  overdispersed).  Relative variance of gap seconds in exact integer
  arithmetic: rel_var_permyriad = (n*Sgg - Sg^2) * 10000 / Sg^2 via the
  closed-form sums, reported as (n_users_scored, n_regular) with the
  regular threshold at 20% relative variance.  Gap seconds (not
  micros) keep every product inside bigint at any volume.
- ``burst_users_10min``: velocity rule -- users whose peak 10-minute
  event count exceeds a threshold.  Tumbling-window counts then a
  per-user max; the same shape a streaming rules engine runs with a
  sliding state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_REL_VAR_MAX = 2000  # permyriad: 20% relative variance
_BURST_N = 5


@_register(
    "bot_regularity_audit",
    f"""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) // 1000000
           - lag(epoch_us(ts) // 1000000)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events
),
s AS (
  SELECT user_id, count(*) AS n, sum(gap_s) AS sg,
         sum(gap_s * gap_s) AS sgg
  FROM g WHERE gap_s IS NOT NULL GROUP BY 1
  HAVING count(*) >= 5 AND sum(gap_s) > 0
),
rv AS (
  SELECT user_id,
         (n * sgg - sg * sg) * 10000 // (sg * sg) AS rel_var_permyriad
  FROM s
)
SELECT CAST(count(*) AS BIGINT) AS n_users_scored,
       CAST(sum(CASE WHEN rel_var_permyriad < {_REL_VAR_MAX}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_regular
FROM rv""",
    ref="extension: bot-regularity heuristic -- exact integer relative "
    "variance of inter-event gap seconds per user (closed-form sums); "
    "gap seconds bound every product inside bigint",
)
def q_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # order the lag by FULL-resolution micros (the oracle orders by ts):
    # ordering by floored seconds could pair different neighbors when
    # two events share a second
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    g = ev.select(
        "user_id",
        (
            F.expr("us div 1000000")
            - F.expr(
                "lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)"
                " div 1000000"
            )
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    s = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("gap_s").alias("sg"),
            F.sum(F.expr("gap_s * gap_s")).alias("sgg"),
        )
        .filter((F.col("n") >= 5) & (F.col("sg") > 0))
    )
    rv = s.select(
        F.expr("(n * sgg - sg * sg) * 10000 div (sg * sg)").alias(
            "rel_var_permyriad"
        )
    )
    return rv.agg(
        F.count(F.lit(1)).alias("n_users_scored"),
        F.sum(
            F.when(F.col("rel_var_permyriad") < _REL_VAR_MAX, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_regular"),
    )


@_register(
    "burst_users_10min",
    f"""
WITH w AS (
  SELECT user_id, epoch_us(ts) // 600000000 AS win, count(*) AS n
  FROM events GROUP BY 1, 2
),
peaks AS (SELECT user_id, max(n) AS peak FROM w GROUP BY 1)
SELECT user_id, CAST(peak AS BIGINT) AS peak_10min
FROM peaks WHERE peak >= {_BURST_N}""",
    ref="extension: velocity rule -- peak tumbling-10-minute event "
    "count per user, flagged above the burst threshold; the batch twin "
    "of a streaming rules engine",
)
def q_burst_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = ev.groupBy(
        "user_id", F.expr("unix_micros(ts) div 600000000").alias("win")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        w.groupBy("user_id")
        .agg(F.max("n").alias("peak"))
        .filter(F.col("peak") >= _BURST_N)
        .select("user_id", F.col("peak").cast("bigint").alias("peak_10min"))
    )
