"""Round-3 coverage wave 87: calendar densification, label-centroid
affinity, cohort LTV.

- ``calendar_fill_daily``: zero-filled continuous daily revenue series
  -- the calendar densification every BI/forecast consumer needs
  before differencing or window math (a missing day silently skews
  moving averages; ``gapfill_locf`` carries values forward, this one
  makes gaps EXPLICIT zeros).  The full day range is generated with
  ``sequence`` + ``explode`` from the 1-row min/max aggregate (no
  driver loop, no external calendar table) and left-joined to the
  day aggregate.  Day arithmetic on integer epoch-day indices.
- ``label_centroid_affinity``: pairwise cosine similarity between the
  per-label embedding centroids -- the class-confusability matrix (two
  labels whose centroids sit close will confuse any classifier;
  the between-class companion to ``label_scatter_ratio``).  Centroids
  are exact integer fixed-point means (posexplode -> truncating
  per-(label, pos) mean, the ``kmeans_embeddings`` convention); the
  pairwise cosine runs over the tiny label x dim table and is rounded
  to micro units in double (identical expression both engines).
- ``cohort_ltv_curve``: weekly-cohort cumulative-value (LTV) curve --
  users cohorted by first-active ISO week, value summed per (cohort,
  age-in-weeks) and accumulated along age: the table behind every
  "payback by cohort" chart, the value-weighted companion to
  ``retention_cohorts`` (which counts presence only).  Two user-keyed
  shuffles plus a cumulative window over the bounded (cohort, age)
  grid.

Scale: sequence explode is driver-free generation; centroids reduce
embeddings to labels x dims before any pairwise step; LTV windows run
on the bounded cohort-age grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "calendar_fill_daily",
    """
WITH d AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
         count(*) AS n, sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v_c
  FROM events GROUP BY 1
), bounds AS (
  SELECT min(day_idx) AS lo, max(day_idx) AS hi FROM d
), cal AS (
  SELECT unnest(generate_series(lo, hi)) AS day_idx FROM bounds
)
SELECT CAST(cal.day_idx AS BIGINT) AS day_idx,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
       CAST(coalesce(d.v_c, 0) AS BIGINT) AS value_c
FROM cal LEFT JOIN d ON cal.day_idx = d.day_idx""",
    ref="extension: calendar densification -- sequence-generated full "
    "day range left-joined to the daily aggregate, explicit zeros for "
    "missing days; the densify step before any window math",
)
def q_calendar_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("bigint")
            .alias("day_idx"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
        )
        .groupBy("day_idx")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v_c").alias("v_c"))
    )
    cal = (
        d.agg(F.min("day_idx").alias("lo"), F.max("day_idx").alias("hi"))
        .select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day_idx")
        )
    )
    return cal.join(d, "day_idx", "left").select(
        F.col("day_idx").cast("bigint").alias("day_idx"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce(F.col("v_c"), F.lit(0)).cast("bigint").alias("value_c"),
    )


@_register(
    "label_centroid_affinity",
    """
WITH comp AS (
  SELECT label, CAST(t.i AS INT) - 1 AS pos,
         CAST(floor(CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) * 1000000)
              AS BIGINT) AS q
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
), cent AS (
  SELECT label, pos, CAST(sum(q) // count(*) AS BIGINT) AS c
  FROM comp GROUP BY 1, 2
), pair AS (
  SELECT a.label AS label_a, b.label AS label_b,
         sum(CAST(a.c AS HUGEINT) * b.c) AS dot,
         sum(CAST(a.c AS HUGEINT) * a.c) AS na,
         sum(CAST(b.c AS HUGEINT) * b.c) AS nb
  FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2
)
SELECT CAST(label_a AS BIGINT) AS label_a,
       CAST(label_b AS BIGINT) AS label_b,
       CAST(floor(CAST(dot AS DOUBLE)
                  / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS cos_micro
FROM pair""",
    ref="extension: pairwise cosine between per-label embedding "
    "centroids (class confusability) -- exact fixed-point centroid "
    "means (kmeans_embeddings convention), tiny label x dim pair join",
)
def q_label_centroid_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label",
        "pos",
        F.expr("CAST(floor(x * 1000000) AS BIGINT)").alias("q"),
    )
    cent = comp.groupBy("label", "pos").agg(
        F.expr("CAST(sum(q) div count(*) AS BIGINT)").alias("c")
    )
    a, b = cent.alias("a"), cent.alias("b")
    dec = lambda s: F.expr(s).cast("decimal(38,0)")  # noqa: E731
    pair = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(
            F.sum(dec("a.c") * dec("b.c")).alias("dot"),
            F.sum(dec("a.c") * dec("a.c")).alias("na"),
            F.sum(dec("b.c") * dec("b.c")).alias("nb"),
        )
    )
    return pair.select(
        F.col("label_a").cast("bigint").alias("label_a"),
        F.col("label_b").cast("bigint").alias("label_b"),
        F.expr(
            "CAST(floor(CAST(dot AS DOUBLE)"
            " / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"
            " * 1000000 + 0.5) AS BIGINT)"
        ).alias("cos_micro"),
    )


@_register(
    "cohort_ltv_curve",
    """
WITH uw AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01',
                   CAST(date_trunc('week', ts) AS DATE)) AS wk,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
), cohort AS (
  SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1
), cell AS (
  SELECT c.cohort_wk, (u.wk - c.cohort_wk) // 7 AS age_wk,
         count(DISTINCT u.user_id) AS n_users, sum(u.v_c) AS v_c
  FROM uw u JOIN cohort c ON u.user_id = c.user_id
  GROUP BY 1, 2
)
SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
       CAST(age_wk AS BIGINT) AS age_wk,
       CAST(n_users AS BIGINT) AS n_active_users,
       CAST(sum(v_c) OVER (PARTITION BY cohort_wk ORDER BY age_wk)
            AS BIGINT) AS cum_value_c
FROM cell""",
    ref="extension: weekly-cohort cumulative LTV curve -- first-active "
    "week cohorts, value per (cohort, age) cell, cumulative window "
    "over the bounded cohort-age grid; value-weighted "
    "retention_cohorts",
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.datediff(
            F.date_trunc("week", F.col("ts")).cast("date"),
            F.lit("1970-01-01").cast("date"),
        )
        .cast("bigint")
        .alias("wk"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
    )
    cohort = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    cell = (
        uw.join(cohort, "user_id")
        .groupBy(
            "cohort_wk",
            F.expr("(wk - cohort_wk) div 7").alias("age_wk"),
        )
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.sum("v_c").alias("v_c"),
        )
    )
    w = Window.partitionBy("cohort_wk").orderBy("age_wk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return cell.select(
        F.col("cohort_wk").cast("bigint").alias("cohort_wk"),
        F.col("age_wk").cast("bigint").alias("age_wk"),
        F.col("n_users").cast("bigint").alias("n_active_users"),
        F.sum("v_c").over(w).cast("bigint").alias("cum_value_c"),
    )
