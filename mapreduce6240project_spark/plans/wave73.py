"""Round-3 coverage wave 73: distribution-drift and score-separability
audits.

- ``ks_value_drift``: two-sample Kolmogorov-Smirnov statistic between
  the ``value`` distributions of two deterministic user cohorts
  (user_id parity -- the A/B-split drift check every experimentation
  pipeline runs).  Values are quantized to unit-width bins so the CDF
  comparison runs over a BOUNDED histogram (~500 rows), not the raw
  event stream: per-bin counts are one group-by shuffle, the cumulative
  scan is a window over the tiny histogram.  The statistic is exact
  integer arithmetic -- ``|cumA*nB - cumB*nA| * 10000 div (nA*nB)`` in
  DECIMAL(38,0) -- so Spark and the DuckDB oracle agree bit-for-bit
  (no float CDF summation).
- ``score_auc_audit``: Mann-Whitney / rank-sum AUC of how well
  ``value`` separates purchase events from the rest.  Scores are
  quantized to integer cents; per-bin (n_pos, n_neg) is one group-by,
  then ``U2 = sum(2*n_pos*cum_neg_below + n_pos*n_neg)`` over the
  bounded bin table (ties get the standard half credit, doubled into
  integers).  AUC is reported as the exact rational (auc_num2,
  auc_den2) plus an integer permyriad -- no floating point anywhere.

Scale: both audits reduce the data to a quantized histogram first (one
partial-aggregated shuffle at any input size); the windowed cumulative
pass runs over the histogram, whose size is bounded by the
quantization, not the row count.  DECIMAL(38,0) sufficient statistics
keep the cross-products overflow-safe past bigint range (same pattern
as the wave-53 trend slope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "ks_value_drift",
    """
WITH binned AS (
  SELECT CAST(floor(value) AS BIGINT) AS bin,
         count(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
         count(*) FILTER (WHERE user_id % 2 = 1) AS n_b
  FROM events GROUP BY 1
), cdf AS (
  SELECT bin,
         CAST(sum(n_a) OVER (ORDER BY bin) AS DECIMAL(38,0)) AS cum_a,
         CAST(sum(n_b) OVER (ORDER BY bin) AS DECIMAL(38,0)) AS cum_b,
         CAST(sum(n_a) OVER () AS DECIMAL(38,0)) AS tot_a,
         CAST(sum(n_b) OVER () AS DECIMAL(38,0)) AS tot_b
  FROM binned
), diffs AS (
  SELECT bin, tot_a, tot_b,
         abs(cum_a * tot_b - cum_b * tot_a) AS num
  FROM cdf
)
SELECT CAST(tot_a AS BIGINT) AS n_a, CAST(tot_b AS BIGINT) AS n_b,
       CAST(num * 10000 AS BIGINT) // CAST(tot_a * tot_b AS BIGINT)
         AS ks_permyriad,
       CAST(bin AS BIGINT) AS argmax_bin
FROM diffs ORDER BY num DESC, bin ASC LIMIT 1""",
    ref="extension: two-sample KS drift audit over unit-value bins -- "
    "exact integer CDF comparison on a bounded histogram",
)
def q_ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    binned = (
        ev.groupBy(F.floor("value").cast("bigint").alias("bin"))
        .agg(
            F.count(F.when(F.col("user_id") % 2 == 0, 1)).alias("n_a"),
            F.count(F.when(F.col("user_id") % 2 == 1, 1)).alias("n_b"),
        )
    )
    # The window runs over the bounded bin histogram (<= ~500 rows at
    # any scale), not the raw events -- a single-partition scan here is
    # deliberate and safe.
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    dec = "decimal(38,0)"
    cdf = binned.select(
        "bin",
        F.sum("n_a").over(w_cum).cast(dec).alias("cum_a"),
        F.sum("n_b").over(w_cum).cast(dec).alias("cum_b"),
        F.sum("n_a").over(w_all).cast(dec).alias("tot_a"),
        F.sum("n_b").over(w_all).cast(dec).alias("tot_b"),
    ).select(
        "bin",
        "tot_a",
        "tot_b",
        F.abs(
            F.col("cum_a") * F.col("tot_b") - F.col("cum_b") * F.col("tot_a")
        ).alias("num"),
    )
    return (
        cdf.orderBy(F.col("num").desc(), F.col("bin").asc())
        .limit(1)
        .select(
            F.col("tot_a").cast("bigint").alias("n_a"),
            F.col("tot_b").cast("bigint").alias("n_b"),
            F.expr("CAST(num * 10000 div (tot_a * tot_b) AS BIGINT)").alias(
                "ks_permyriad"
            ),
            F.col("bin").cast("bigint").alias("argmax_bin"),
        )
    )


@_register(
    "score_auc_audit",
    """
WITH binned AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS bin,
         count(*) FILTER (WHERE event_type = 'purchase') AS n_pos,
         count(*) FILTER (WHERE event_type <> 'purchase') AS n_neg
  FROM events GROUP BY 1
), scanned AS (
  SELECT CAST(n_pos AS DECIMAL(38,0)) AS n_pos,
         CAST(n_neg AS DECIMAL(38,0)) AS n_neg,
         CAST(coalesce(sum(n_neg) OVER (ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS DECIMAL(38,0)) AS cum_neg_below
  FROM binned
)
SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
       CAST(sum(n_neg) AS BIGINT) AS n_neg,
       CAST(sum(2 * n_pos * cum_neg_below + n_pos * n_neg) AS BIGINT)
         AS auc_num2,
       CAST(2 * sum(n_pos) * sum(n_neg) AS BIGINT) AS auc_den2,
       CAST(sum(2 * n_pos * cum_neg_below + n_pos * n_neg) * 10000
            AS BIGINT)
         // CAST(2 * sum(n_pos) * sum(n_neg) AS BIGINT) AS auc_permyriad
FROM scanned""",
    ref="extension: Mann-Whitney rank-sum AUC of value vs purchase "
    "label over cent-quantized score bins -- exact rational, tie-aware",
)
def q_score_auc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    binned = (
        ev.groupBy(
            F.floor(F.col("value") * 100).cast("bigint").alias("bin")
        )
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "n_pos"
            ),
            F.count(F.when(F.col("event_type") != "purchase", 1)).alias(
                "n_neg"
            ),
        )
    )
    # Bounded histogram (<= ~49k cent bins); the ordered scan is over
    # bins, never raw rows.
    w_below = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, -1
    )
    dec = "decimal(38,0)"
    scanned = binned.select(
        F.col("n_pos").cast(dec).alias("n_pos"),
        F.col("n_neg").cast(dec).alias("n_neg"),
        F.coalesce(F.sum("n_neg").over(w_below), F.lit(0))
        .cast(dec)
        .alias("cum_neg_below"),
    )
    u2 = F.sum(
        2 * F.col("n_pos") * F.col("cum_neg_below")
        + F.col("n_pos") * F.col("n_neg")
    )
    return scanned.agg(
        F.sum("n_pos").cast("bigint").alias("n_pos"),
        F.sum("n_neg").cast("bigint").alias("n_neg"),
        u2.cast("bigint").alias("auc_num2"),
        (2 * F.sum("n_pos") * F.sum("n_neg")).cast("bigint").alias("auc_den2"),
        F.expr(
            "CAST(sum(2 * n_pos * cum_neg_below + n_pos * n_neg) * 10000"
            " div (2 * sum(n_pos) * sum(n_neg)) AS BIGINT)"
        ).alias("auc_permyriad"),
    )
