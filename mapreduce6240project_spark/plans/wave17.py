"""Round-3 coverage wave 17: strict ordered-sequence funnel.

``funnel_strict_3step``: users who performed click -> view -> purchase
in strictly increasing time order, with the whole sequence inside 30
minutes of the first click -- MATCH_RECOGNIZE-style sequence detection
expressed as a chain of conditional min-aggregations:

    c = min(ts | click)                  per user
    v = min(ts | view    and ts > c)     per user
    p = min(ts | purchase and ts > v)    per user

Each step is one hash aggregation over events joined to the (1 row per
user) previous step -- the earliest-match semantics of a sequential
scan, with no per-user sort, no window funnel, no state machine.  The
per-stage frames are user-count-sized, so every join broadcasts or
shuffles a skinny table, never the event log twice.

Reference parity note: sequence/funnel analytics are engine extensions
alongside SURVEY.md section 2.11's event surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

FUNNEL_WINDOW_US = 30 * 60 * 1_000_000


@_register(
    "funnel_strict_3step",
    f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
s1 AS (
  SELECT user_id, min(us) AS c_us FROM ev WHERE event_type = 'click'
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, s1.c_us, min(e.us) AS v_us
  FROM ev e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'view' AND e.us > s1.c_us
  GROUP BY e.user_id, s1.c_us
),
s3 AS (
  SELECT e.user_id, s2.c_us, min(e.us) AS p_us
  FROM ev e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.us > s2.v_us
  GROUP BY e.user_id, s2.c_us
)
SELECT (SELECT count(*) FROM s1) AS n_click,
       (SELECT count(*) FROM s2) AS n_click_view,
       (SELECT count(*) FROM s3
         WHERE p_us - c_us <= {FUNNEL_WINDOW_US}) AS n_full_funnel""",
    ref="extension: strict ordered-sequence funnel (earliest-match "
    "click->view->purchase within 30 min) via chained conditional "
    "min-aggregations; MATCH_RECOGNIZE semantics without a per-user "
    "sort or state machine",
)
def q_funnel_strict_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s1 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("us") > F.col("c_us"))
        .groupBy("user_id", "c_us")
        .agg(F.min("us").alias("v_us"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("us") > F.col("v_us"))
        .groupBy("user_id", "c_us")
        .agg(F.min("us").alias("p_us"))
    )
    full = s3.filter(F.col("p_us") - F.col("c_us") <= FUNNEL_WINDOW_US)
    return (
        s1.agg(F.count("*").alias("n_click"))
        .crossJoin(s2.agg(F.count("*").alias("n_click_view")))
        .crossJoin(full.agg(F.count("*").alias("n_full_funnel")))
    )
