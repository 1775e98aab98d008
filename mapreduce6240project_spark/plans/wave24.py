"""Round-3 coverage wave 24: curation splits + time-series statistics.

- ``exact_split_strata``: exact-proportion stratified train/val/test
  split -- per language stratum, rows are ordered by md5(doc_id) (a
  deterministic pseudo-random order both engines replay) and cut at
  exact 80/10/10 integer thresholds (``rn*10 <= n*8`` etc., no float
  proportions).  Unlike the hash splits (``split_counts``), this
  guarantees the exact per-stratum counts a curriculum requires.
- ``nucleus_docs_90``: top-p (nucleus) selection per language -- the
  smallest prefix of documents (by size desc, id-tiebroken) covering
  90% of the stratum's total character mass, the mass-coverage
  counterpart of percentile cuts.  All-integer: cumulative sums and
  the 10*cum >= 9*total threshold never touch a float.
- ``cusum_max_deviation``: CUSUM change-point score per event type
  over the daily value series.  The classic drift statistic
  ``max_t |sum_{i<=t}(x_i - mean)|`` is computed EXACTLY by scaling
  with the day count: ``sum(D*x_i - T)`` over integer micros (D days,
  T total), so no mean division ever happens.  One (type, day)
  aggregate, one ordered window per type.
- ``acf1_daily_value``: lag-1 autocorrelation of the daily value
  series per event type -- Pearson over (x_t, x_{t-1}) pairs from the
  five integer power sums, products widened to DECIMAL(38)/HUGEINT --
  exact out to 38-digit magnitudes (far past realistic cent-scale
  series) before one final double ratio.

Reference parity note: extends the windows/order-statistics families
(SURVEY.md sections 2.6, 2.11) with exact split/selection curation ops
and drift statistics for monitoring pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.ranking import stratum_order_stats
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "exact_split_strata",
    """
WITH ranked AS (
  SELECT lang,
         row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
),
tagged AS (
  SELECT lang,
         CASE WHEN rn * 10 <= n * 8 THEN 'train'
              WHEN rn * 10 <= n * 9 THEN 'val'
              ELSE 'test' END AS split
  FROM ranked
)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs
FROM tagged GROUP BY lang, split""",
    ref="extension: exact-proportion stratified split (md5 order + "
    "integer 80/10/10 thresholds per stratum; guarantees exact counts, "
    "unlike hash splits)",
)
def q_exact_split_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-stratum rank WITHOUT a per-lang window partition (a handful
    # of langs over 100 TB = one executor per stratum): the shared
    # range-exchange + pid-offsets helper (operators.ranking).
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    ranked = stratum_order_stats(
        docs, strata=["lang"], order=["h", "doc_id"]
    ).select("lang", "rn", "n")
    split = (
        F.when(F.col("rn") * 10 <= F.col("n") * 8, "train")
        .when(F.col("rn") * 10 <= F.col("n") * 9, "val")
        .otherwise("test")
    )
    return ranked.select("lang", split.alias("split")).groupBy(
        "lang", "split"
    ).agg(F.count("*").alias("n_docs"))


@_register(
    "nucleus_docs_90",
    """
WITH cum AS (
  SELECT lang, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         sum(n_chars) OVER (PARTITION BY lang) AS tw
  FROM documents
),
sel AS (
  SELECT lang, n_chars,
         CASE WHEN (cw - n_chars) * 10 < tw * 9 THEN 1 ELSE 0 END AS keep
  FROM cum
)
SELECT lang,
       CAST(sum(keep) AS BIGINT) AS n_selected,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_selected
FROM sel GROUP BY lang""",
    ref="extension: top-p (nucleus) mass-coverage selection per stratum "
    "-- smallest size-desc prefix covering 90% of character mass; "
    "all-integer cumulative threshold, deterministic tie-break",
)
def q_nucleus_docs_90(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same stratum-scalable shape as exact_split_strata: the per-lang
    # size-desc cumulative sum via the shared range-exchange helper.
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        "n_chars",
        (-F.col("n_chars")).alias("neg_chars"),
    )
    cum = stratum_order_stats(
        docs,
        strata=["lang"],
        order=["neg_chars", "doc_id"],
        weight="n_chars",
    ).select("lang", "n_chars", "cw", "tw")
    # a doc is kept iff the mass BEFORE it is still under the 90% bar
    # (the prefix is minimal: the first doc crossing the bar is kept,
    # everything after is not)
    keep = F.when(
        (F.col("cw") - F.col("n_chars")) * 10 < F.col("tw") * 9, 1
    ).otherwise(0)
    return cum.select("lang", "n_chars", keep.alias("keep")).groupBy(
        "lang"
    ).agg(
        F.sum("keep").alias("n_selected"),
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("keep") == 1, F.col("n_chars")).otherwise(0)).alias(
            "chars_selected"
        ),
    )


@_register(
    "cusum_max_deviation",
    """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_no,
         CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS x
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS d,
         CAST(sum(x) AS BIGINT) AS t
  FROM daily GROUP BY event_type
),
cusum AS (
  SELECT daily.event_type, day_no,
         sum(d * x - t) OVER (PARTITION BY daily.event_type ORDER BY day_no
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS c
  FROM daily JOIN stats ON daily.event_type = stats.event_type
)
SELECT event_type,
       CAST(max(abs(c)) AS BIGINT) AS max_abs_cusum_scaled,
       CAST(min(CASE WHEN rnk = 1 THEN day_no END) AS BIGINT) AS peak_day
FROM (
  SELECT event_type, day_no, c,
         rank() OVER (PARTITION BY event_type ORDER BY abs(c) DESC, day_no)
           AS rnk
  FROM cusum
) GROUP BY event_type""",
    ref="extension: CUSUM change-point statistic per series -- "
    "max_t |sum(x_i - mean)| computed EXACTLY as sum(D*x_i - T) in "
    "scaled integer micros (no mean division); one daily aggregate + "
    "one ordered window per series",
)
def q_cusum_max_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_no"),
    ).agg(
        F.sum(
            F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
        ).alias("x")
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("d"), F.sum("x").alias("t")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day_no",
        F.sum(F.col("d") * F.col("x") - F.col("t")).over(w_cum).alias("c"),
    )
    ranked = cusum.select(
        "event_type",
        "day_no",
        "c",
        F.rank()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.abs(F.col("c")).desc(), "day_no"
            )
        )
        .alias("rnk"),
    )
    return ranked.groupBy("event_type").agg(
        F.max(F.abs(F.col("c"))).alias("max_abs_cusum_scaled"),
        F.min(F.when(F.col("rnk") == 1, F.col("day_no"))).alias("peak_day"),
    )


@_register(
    "acf1_daily_value",
    """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_no,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, x,
         lag(x) OVER (PARTITION BY event_type ORDER BY day_no) AS xp
  FROM daily
),
sums AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(xp) AS HUGEINT) AS sy,
         sum(CAST(x AS HUGEINT) * xp) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(xp AS HUGEINT) * xp) AS syy
  FROM lagged WHERE xp IS NOT NULL GROUP BY event_type
)
SELECT event_type,
       floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) * 10000 + 0.5)
         / 10000.0 AS acf1,
       n AS n_pairs
FROM sums""",
    ref="extension: lag-1 autocorrelation per series -- Pearson over "
    "(x_t, x_{t-1}) from five integer power sums widened to "
    "DECIMAL(38)/HUGEINT (exact to 38-digit magnitudes), one final "
    "double ratio",
)
def q_acf1_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_no"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias(
            "x"
        )
    )
    lagged = daily.select(
        "event_type",
        "x",
        F.lag("x").over(
            Window.partitionBy("event_type").orderBy("day_no")
        ).alias("xp"),
    ).filter(F.col("xp").isNotNull())
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = lagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("xp")).alias("sy"),
        F.sum(dec("x") * dec("xp")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("xp") * dec("xp")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return sums.select(
        "event_type",
        (F.floor(num / den * 10000 + F.lit(0.5)) / 10000.0).alias("acf1"),
        F.col("n").alias("n_pairs"),
    )
