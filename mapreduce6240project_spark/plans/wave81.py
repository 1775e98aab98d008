"""Round-3 coverage wave 81: Mann-Kendall trend test, fixed-bin
calibration, mutual information.

- ``mann_kendall_daily``: the Mann-Kendall S statistic over the daily
  revenue series -- the standard non-parametric monotone-trend test
  (rank-based, outlier-immune), the distribution-free companion to
  ``segment_trend_slope`` (OLS).  Events aggregate to exact daily cent
  totals FIRST (one shuffle); the pairwise ``sign(v_j - v_i)`` join
  then runs over the tiny day dimension only (calendar-bounded, ~30
  rows at any scale factor, ~3.6k at a 10-year corpus) -- the same
  "shrink before the quadratic step" shape as ``changepoint_day``.
  Ties contribute 0 via ``sign``.  All integer.
- ``value_bin_purchase_rate``: reliability/calibration audit -- events
  bucketed into fixed $10 value bins (integer division, NO ntile/global
  sort), per-bin event count, purchase count, and purchase share in
  permyriad.  The fixed-width binning is the scale-safe calibration
  shape: bin assignment is map-only and the bin table is bounded by
  the value domain.
- ``mi_type_valuebin``: mutual information between event type and
  value bin in integer micro-nats -- the feature-selection statistic
  (does knowing the value band tell you the event type?), companion to
  ``chi2_segment_status`` (independence test) and ``token_entropy``
  (marginal uncertainty).  Shape: one (type, bin) count shuffle; the
  contingency table is tiny (5 types x bounded bins), marginals and
  the quantized-log sum run on it locally-parallel.  Per-cell log
  terms are floor-quantized to micro-nats before the integer sum --
  the repo's established deterministic-float convention
  (``zipf_slope_tokens``).

Scale: every quadratic or log step runs on a domain-bounded table
(days, bins, cells), never on raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "mann_kendall_daily",
    """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v_c
  FROM events GROUP BY 1
)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
       CAST(sum(sign(b.v_c - a.v_c)) AS BIGINT) AS s_stat,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM d a JOIN d b ON b.day > a.day""",
    ref="extension: Mann-Kendall monotone-trend S over daily revenue -- "
    "aggregate to the bounded day dimension first, pairwise sign join "
    "on days only; rank-based companion to segment_trend_slope",
)
def q_mann_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            F.col("ts").cast("date").alias("day"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
        )
        .groupBy("day")
        .agg(F.sum("v_c").alias("v_c"))
    )
    a = d.alias("a")
    b = d.alias("b")
    pairs = a.join(F.broadcast(b), F.col("b.day") > F.col("a.day"))
    n_days = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    stats = pairs.agg(
        F.sum(F.signum(F.col("b.v_c") - F.col("a.v_c")))
        .cast("bigint")
        .alias("s_stat"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    return n_days.crossJoin(F.broadcast(stats))


@_register(
    "value_bin_purchase_rate",
    """
WITH e AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) // 1000 AS bin,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(bin * 1000 AS BIGINT) AS bin_lo_c,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(is_p) AS BIGINT) AS n_purchases,
       CAST(sum(is_p) * 10000 // count(*) AS BIGINT) AS purchase_pm
FROM e GROUP BY bin""",
    ref="extension: fixed-width $10 value-bin purchase-rate calibration "
    "table -- map-only bin assignment (no ntile/global sort), bounded "
    "bin dimension",
)
def q_value_bin_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 1000").alias(
            "bin"
        ),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "is_p"
        ),
    )
    return (
        e.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_p").alias("n_purchases"),
        )
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            (F.col("bin") * 1000).cast("bigint").alias("bin_lo_c"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_purchases").cast("bigint").alias("n_purchases"),
            F.expr("n_purchases * 10000 div n_events")
            .cast("bigint")
            .alias("purchase_pm"),
        )
    )


@_register(
    "mi_type_valuebin",
    """
WITH cell AS (
  SELECT event_type AS x,
         CAST(floor(value * 100 + 0.5) AS BIGINT) // 1000 AS y,
         count(*) AS n_xy
  FROM events GROUP BY 1, 2
), m AS (
  SELECT x, y, n_xy,
         sum(n_xy) OVER (PARTITION BY x) AS n_x,
         sum(n_xy) OVER (PARTITION BY y) AS n_y,
         sum(n_xy) OVER () AS n
  FROM cell
)
SELECT CAST(max(n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(n_xy * CAST(floor(ln(CAST(n AS DOUBLE) * n_xy
                                     / (n_x * n_y)) * 1000000 + 0.5)
                            AS BIGINT)) AS BIGINT) AS mi_micro_sum
FROM m""",
    ref="extension: mutual information I(event_type; value bin) in "
    "micro-nats -- one contingency shuffle, quantized per-cell log "
    "terms (zipf_slope_tokens convention); feature-selection gauge "
    "next to chi2_segment_status",
)
def q_mi_type_valuebin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    cell = (
        ev.select(
            F.col("event_type").alias("x"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 1000")
            .alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    m = cell.select(
        "n_xy",
        F.sum("n_xy").over(Window.partitionBy("x")).alias("n_x"),
        F.sum("n_xy").over(Window.partitionBy("y")).alias("n_y"),
        F.sum("n_xy").over(Window.partitionBy()).alias("n"),
    )
    return m.agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(
            F.col("n_xy")
            * F.expr(
                "CAST(floor(ln(CAST(n AS DOUBLE) * n_xy / (n_x * n_y))"
                " * 1000000 + 0.5) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("mi_micro_sum"),
    )
