"""Round-3 coverage wave 92: dedup bias audit, annual seasonality,
first-purchase predictiveness.

- ``dedup_survivor_length_bias``: does exact dedup disproportionately
  drop certain document lengths?  Keep-first survivorship (min doc_id
  per fingerprint, the ``dedup_exact`` rule) compared against the
  population across length quartile bands: a keep rate that varies by
  band means the deduped corpus has a different length profile than
  the raw one -- the curation-bias audit that should accompany every
  dedup stage (cf. ``corpus_dedup_inflation`` for the volume side).
  Bands come from fixed character thresholds (map-only, no ntile).
- ``month_of_year_index``: month-of-year seasonality of order revenue
  across the multi-year history -- mean revenue share per calendar
  month vs the uniform 1/12, in permyriad (the annual analogue of
  ``weekday_value_index``; with ~6 years of orders each month-of-year
  has multiple observations).  Exact cent sums, one final widened
  division.
- ``first_order_vs_ltv``: does the first order's value predict the
  customer's lifetime revenue?  Per customer: first order (min date,
  orderkey tie-break, taken via one min_by-style struct-min -- no
  second scan) vs total revenue; Pearson r from DECIMAL(38) power sums
  (``acf1_daily_value`` convention) plus the exact covariance sign.
  The single number behind "can we forecast LTV at day 0".

Scale: all three reduce to customer/month/band grids before any
statistics; the first-order pick is one struct-min aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
#: fixed char-length band edges (map-only; ntile would need a sort)
_BANDS = (200, 400, 800)


def _band_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} < {_BANDS[0]} THEN 0"
        f" WHEN {col} < {_BANDS[1]} THEN 1"
        f" WHEN {col} < {_BANDS[2]} THEN 2 ELSE 3 END"
    )


@_register(
    "dedup_survivor_length_bias",
    f"""
WITH fp AS (
  SELECT doc_id, n_chars, md5({_NORM}) AS f FROM documents
), surv AS (
  SELECT doc_id, n_chars,
         CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY f)
              THEN 1 ELSE 0 END AS kept
  FROM fp
)
SELECT CAST({_band_sql("n_chars")} AS BIGINT) AS len_band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(sum(kept) * 10000 // count(*) AS BIGINT) AS keep_pm
FROM surv GROUP BY 1""",
    ref="extension: dedup survivorship bias by length band -- keep-"
    "first exact-dedup keep rate across fixed char bands; the "
    "curation-bias audit behind dedup_exact",
)
def q_dedup_survivor_length_bias(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "n_chars", F.md5(normalize_text("text")).alias("f")
    )
    surv = fp.select(
        "n_chars",
        F.when(
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy("f")),
            1,
        )
        .otherwise(0)
        .alias("kept"),
    )
    return (
        surv.select(
            F.expr(_band_sql("n_chars")).cast("bigint").alias("len_band"),
            "kept",
        )
        .groupBy("len_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            F.expr("sum(kept) * 10000 div count(*)")
            .cast("bigint")
            .alias("keep_pm"),
        )
    )


@_register(
    "month_of_year_index",
    """
WITH m AS (
  SELECT month(CAST(o_orderdate AS DATE)) AS moy,
         count(*) AS n,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1
)
SELECT CAST(moy AS BIGINT) AS moy,
       CAST(n AS BIGINT) AS n_orders,
       CAST(rev_c AS BIGINT) AS revenue_c,
       CAST(CAST(rev_c AS HUGEINT) * 120000
            // sum(CAST(rev_c AS HUGEINT)) OVER () AS BIGINT)
         AS index_pm
FROM m""",
    ref="extension: month-of-year revenue seasonality index (share of "
    "annual revenue vs the uniform 1/12, permyriad x12) -- annual "
    "analogue of weekday_value_index over the multi-year order history",
)
def q_month_of_year_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    m = o.select(
        F.month(F.col("o_orderdate").cast("date")).alias("moy"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "v"
        ),
    ).groupBy("moy").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("rev_c")
    )
    w = Window.partitionBy()
    return m.select(
        F.col("moy").cast("bigint").alias("moy"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("rev_c").cast("bigint").alias("revenue_c"),
        (F.col("rev_c").cast("decimal(38,0)") * 120000).alias("_tmp"),
        F.sum(F.col("rev_c").cast("decimal(38,0)")).over(w).alias("_den"),
    ).select(
        "moy",
        "n_orders",
        "revenue_c",
        F.expr("CAST(_tmp div _den AS BIGINT)").alias("index_pm"),
    )


@_register(
    "first_order_vs_ltv",
    """
WITH rk AS (
  SELECT o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v_c,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS r
  FROM orders
), per_cust AS (
  SELECT o_custkey,
         max(CASE WHEN r = 1 THEN v_c END) AS first_c,
         sum(v_c) AS ltv_c
  FROM rk GROUP BY 1
), xy AS (
  SELECT CAST(first_c AS DECIMAL(38,0)) AS x,
         CAST(ltv_c AS DECIMAL(38,0)) AS y
  FROM per_cust
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM xy
)
SELECT n AS n_customers,
       floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE))
             * 10000 + 0.5) / 10000.0 AS r
FROM s""",
    ref="extension: Pearson r between first-order value and customer "
    "lifetime revenue -- struct-min first-order pick (one scan), "
    "DECIMAL(38) power sums, acf1 rounding convention",
)
def q_first_order_vs_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    rk = o.select(
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "v_c"
        ),
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("r"),
    )
    per_cust = rk.groupBy("o_custkey").agg(
        F.max(F.when(F.col("r") == 1, F.col("v_c"))).alias("first_c"),
        F.sum("v_c").alias("ltv_c"),
    )
    xy = per_cust.select(
        F.col("first_c").cast("decimal(38,0)").alias("x"),
        F.col("ltv_c").cast("decimal(38,0)").alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return s.select(
        F.col("n").alias("n_customers"),
        (F.floor(num / den * 10000 + F.lit(0.5)) / 10000.0).alias("r"),
    )
