"""Round-3 coverage wave 83: dynamic-partition-overwrite sink,
correlation matrix, overdispersion gauge.

- ``dynamic_partition_overwrite``: the lakehouse backfill write path --
  events land in a day-partitioned parquet table, then ONE day is
  re-written (values doubled, simulating a late correction) with
  ``partitionOverwriteMode=dynamic``: only the touched partition is
  replaced, every other partition's files are left untouched (verified
  by re-reading the whole table).  The static default would TRUNCATE
  the table first -- dynamic mode is the difference between a backfill
  and a data-loss incident.  The oracle computes what the corrected
  table must aggregate to.  Read-back goes through the partition-
  pruned directory layout (day is a partition column, not a data
  column).
- ``event_type_corr_matrix``: pairwise Pearson correlation matrix of
  the five event types' daily counts -- the co-movement panel behind
  anomaly triage ("errors spike with clicks?").  Daily counts first
  (one shuffle, ~150 rows at any SF -- the day dimension is calendar-
  bounded), then a 10-pair self-join on day and five DECIMAL(38) power
  sums per pair; one final double ratio rounded to 4 decimals (the
  ``acf1_daily_value`` convention).
- ``value_overdispersion``: variance-to-mean ratio (Fisher dispersion
  index) of value cents per event type -- the gauge that tells you a
  count/value stream is NOT Poisson-like before you model it as one
  (VMR >> 1 means bursty/fat-tailed; the companion diagnostic to
  ``event_anomalies``).  Sufficient stats only: n, sum(x), sum(x^2) in
  DECIMAL(38) (exact out to ~1e12 rows, the stress-found convention
  from ``segment_trend_slope``), VMR in permyriad via one final
  integer-widened division.

Scale: the sink writes per-partition files (the same layout a
1000-executor job produces); corr and VMR shrink to calendar/type
dimensions before any quadratic or pairwise step.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "dynamic_partition_overwrite",
    """
WITH corrected AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CASE WHEN CAST(ts AS DATE) = DATE '2024-01-01'
              THEN CAST(floor(value * 100 + 0.5) AS BIGINT) * 2
              ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS v_c
  FROM events
)
SELECT day, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(v_c) AS BIGINT) AS sum_c
FROM corrected GROUP BY day""",
    ref="extension: partitionOverwriteMode=dynamic backfill -- rewrite "
    "one day partition in a day-partitioned parquet table without "
    "touching the others; oracle is the corrected table's aggregate",
)
def q_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").cast("string").alias("day"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
    )
    path = tempfile.mkdtemp(prefix="sparkgraft_dpo_")
    ev.write.mode("overwrite").partitionBy("day").parquet(path)

    # backfill: double 2024-01-01's values; dynamic mode replaces ONLY
    # that partition (static mode would truncate the whole table)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        ev.filter(F.col("day") == "2024-01-01").withColumn(
            "v_c", F.col("v_c") * 2
        ).write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = spark.read.parquet(path)
    return back.groupBy(F.col("day").cast("string").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("v_c").cast("bigint").alias("sum_c"),
    )


@_register(
    "event_type_corr_matrix",
    """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(a.n AS HUGEINT) AS x, CAST(b.n AS HUGEINT) AS y
  FROM daily a JOIN daily b
    ON a.day = b.day AND a.event_type < b.event_type
), sums AS (
  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_days,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT type_a, type_b, n_days,
       floor(CAST(n_days * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
                    * CAST(n_days * syy - sy * sy AS DOUBLE))
             * 10000 + 0.5) / 10000.0 AS r
FROM sums""",
    ref="extension: pairwise Pearson matrix of per-type daily counts -- "
    "calendar-bounded daily table, 10-pair self-join, DECIMAL(38) "
    "power sums, one final double ratio (acf1_daily_value convention)",
)
def q_event_type_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    a, b = daily.alias("a"), daily.alias("b")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pairs = a.join(
        b,
        (F.col("a.day") == F.col("b.day"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.n").cast("decimal(38,0)").alias("x"),
        F.col("b.n").cast("decimal(38,0)").alias("y"),
    )
    sums = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    num = (
        F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double")
    den = F.sqrt(
        (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        * (F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return sums.select(
        "type_a",
        "type_b",
        "n_days",
        (F.floor(num / den * 10000 + F.lit(0.5)) / 10000.0).alias("r"),
    )


@_register(
    "value_overdispersion",
    """
WITH s AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT)
           AS sx,
         sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT)
             * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sxx
  FROM events GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       CAST(sx // n AS BIGINT) AS mean_c,
       CAST((n * sxx - sx * sx) * 10000 // (n * n * (sx // n))
            AS BIGINT) AS vmr_pm
FROM s""",
    ref="extension: Fisher variance-to-mean dispersion index per event "
    "type -- DECIMAL(38)/HUGEINT sufficient stats (n, sum, sum-of-"
    "squares), permyriad VMR; burstiness gauge next to event_anomalies",
)
def q_value_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("v_c")).alias("sx"),
        F.sum(dec("v_c") * dec("v_c")).alias("sxx"),
    )
    # mean first (integer), then the widened VMR division -- matching
    # the oracle's expression shape exactly
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.expr("CAST(sx div n AS BIGINT)").alias("mean_c"),
        F.expr(
            "CAST((n * sxx - sx * sx) * 10000"
            " div (n * n * (sx div n)) AS BIGINT)"
        ).alias("vmr_pm"),
    )
