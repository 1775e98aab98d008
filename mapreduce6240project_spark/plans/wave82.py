"""Round-3 coverage wave 82: Poisson bootstrap, sentence segmentation,
Lorenz concentration curve.

- ``bootstrap_mean_value``: the distributed (Poisson) bootstrap -- THE
  cluster-scale resampling scheme: classical bootstrap needs a global
  N-out-of-N draw, but Poisson(1) weights approximate it with a purely
  per-row decision, so 20 replicates of the mean are one map-side
  explode + one aggregation, no coordination.  Weights are exact
  integers: the replicate's uniform draw is the 60-bit md5-prefix hash
  of ``event_id:replicate`` compared against precomputed INTEGER
  Poisson(1) CDF thresholds (``floor(cdf_k * 2^60)``) -- identical
  arithmetic in both engines, no float RNG anywhere.  Output is the
  per-replicate (n_eff, mean_c) table; the CI is its quantile spread.
- ``sentence_stats_source``: sentence-level segmentation audit per
  source -- sentences split on ``[.!?]+`` runs over normalized text,
  per-source sentence count, word totals, mean words-per-sentence
  (permyriad), and the longest sentence.  Sentence length distribution
  is a classic human-vs-generated signal next to the token-level gates
  (``text_quality``, ``hapax_ratio_source``).  Map-only explode plus
  one small rollup.
- ``lorenz_deciles``: the revenue-concentration (Lorenz) table behind
  ``gini_customer_revenue`` -- customers ranked into revenue deciles,
  each decile's revenue share and the cumulative share in permyriad
  (the 10 points of the Lorenz curve; "top decile owns X%" reads off
  the last row).  ``ntile`` runs on the *aggregated* per-customer
  table (|customers| << |orders|) with a deterministic
  ``(rev_c, custkey)`` order; the cumulative window scans 10 rows.

Scale: bootstrap is embarrassingly parallel by construction (that is
its entire point); sentence stats are map-only; the only sort is over
per-customer aggregates, never facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

#: floor(Poisson(1).cdf(k) * 2^60) for k = 0..5: a replicate weight is
#: the count of thresholds <= the row's 60-bit hash (capped at 6).
_POIS_T = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
)
_B = 20  # bootstrap replicates

_W_SQL = " + ".join(
    f"(CASE WHEN h >= {t} THEN 1 ELSE 0 END)" for t in _POIS_T
)


@_register(
    "bootstrap_mean_value",
    f"""
WITH r AS (
  SELECT e.event_id,
         CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS v_c,
         b.b,
         ('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || ':'
                             || CAST(b.b AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events e CROSS JOIN (
    SELECT unnest(generate_series(0, {_B - 1})) AS b) b
), w AS (
  SELECT b, v_c, {_W_SQL} AS wt FROM r
)
SELECT CAST(b AS BIGINT) AS replicate,
       CAST(sum(wt) AS BIGINT) AS n_eff,
       CAST(sum(wt * v_c) // sum(wt) AS BIGINT) AS mean_c
FROM w GROUP BY b""",
    ref="extension: Poisson(1) distributed bootstrap of the mean -- "
    "per-row integer-threshold weights from the cross-engine 60-bit "
    "hash, 20 replicates in one explode + one aggregation",
)
def q_bootstrap_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.functions.hashing import hash60

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("eid"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
    )
    r = ev.select(
        "eid",
        "v_c",
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
    ).select(
        "b",
        "v_c",
        hash60(
            F.concat(F.col("eid"), F.lit(":"), F.col("b").cast("string"))
        ).alias("h"),
    )
    w = r.withColumn("wt", F.expr(_W_SQL))
    return w.groupBy("b").agg(
        F.sum("wt").cast("bigint").alias("n_eff"),
        F.expr("sum(wt * v_c) div sum(wt)").cast("bigint").alias("mean_c"),
    ).select(
        F.col("b").cast("bigint").alias("replicate"), "n_eff", "mean_c"
    )


_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@_register(
    "sentence_stats_source",
    f"""
WITH sent AS (
  SELECT source, trim(s) AS s
  FROM (
    SELECT source,
           unnest(regexp_split_to_array({_NORM}, '[.!?]+')) AS s
    FROM documents
  )
  WHERE trim(s) <> ''
), ws AS (
  SELECT source, len(string_split(s, ' ')) AS n_words FROM sent
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_sentences,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_words) * 10000 // count(*) AS BIGINT)
         AS words_per_sentence_pm,
       CAST(max(n_words) AS BIGINT) AS max_sentence_words
FROM ws GROUP BY source""",
    ref="extension: per-source sentence segmentation stats -- "
    "[.!?]+ split over normalized text, mean/max sentence length; "
    "human-vs-generated length-profile gate",
)
def q_sentence_stats_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    sent = (
        docs.select(
            "source",
            F.explode(
                F.split(normalize_text("text"), r"[.!?]+")
            ).alias("s0"),
        )
        .select("source", F.trim(F.col("s0")).alias("s"))
        .filter(F.col("s") != "")
    )
    ws = sent.select(
        "source", F.size(F.split(F.col("s"), " ")).alias("n_words")
    )
    return (
        ws.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.max("n_words").cast("bigint").alias("_mx"),
        )
        .select(
            "source",
            "n_sentences",
            "n_words",
            F.expr("n_words * 10000 div n_sentences")
            .cast("bigint")
            .alias("words_per_sentence_pm"),
            F.col("_mx").alias("max_sentence_words"),
        )
    )


@_register(
    "lorenz_deciles",
    """
WITH per_cust AS (
  SELECT o_custkey,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1
), dec AS (
  SELECT rev_c,
         ntile(10) OVER (ORDER BY rev_c, o_custkey) AS decile
  FROM per_cust
), agg AS (
  SELECT decile, count(*) AS n_customers, sum(rev_c) AS rev_c
  FROM dec GROUP BY 1
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST(rev_c AS BIGINT) AS revenue_c,
       CAST(rev_c * 10000 // sum(rev_c) OVER () AS BIGINT) AS share_pm,
       CAST(sum(rev_c) OVER (ORDER BY decile) * 10000
            // sum(rev_c) OVER () AS BIGINT) AS cum_share_pm
FROM agg""",
    ref="extension: Lorenz concentration-curve deciles behind "
    "gini_customer_revenue -- ntile over the aggregated per-customer "
    "table, 10-row cumulative window",
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).alias("rev_c")
    )
    dec = per_cust.select(
        "rev_c",
        F.ntile(10).over(Window.orderBy("rev_c", "o_custkey")).alias(
            "decile"
        ),
    )
    agg = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("rev_c").alias("rev_c")
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return agg.select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.col("rev_c").cast("bigint").alias("revenue_c"),
        F.expr("rev_c * 10000").alias("_num"),
        F.sum("rev_c").over(w_all).alias("_den"),
        (F.sum("rev_c").over(w_cum) * 10000).alias("_cnum"),
    ).select(
        "decile",
        "n_customers",
        "revenue_c",
        F.expr("_num div _den").cast("bigint").alias("share_pm"),
        F.expr("_cnum div _den").cast("bigint").alias("cum_share_pm"),
    )
