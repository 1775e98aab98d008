"""Round-3 coverage wave 74: customer-value concentration analytics.

- ``rfm_segments``: the classic Recency/Frequency/Monetary segmentation
  -- per-customer last-order recency (days vs the corpus max date),
  order count, and lifetime revenue in cents, each cut into quintiles
  with ``ntile(5)`` (deterministic tiebreak on custkey), combined into
  a 3-digit RFM code and reported as segment sizes.  ntile's bucket
  arithmetic is integer and identical in Spark and DuckDB.
- ``gini_customer_revenue``: Gini coefficient of lifetime revenue
  across ordering customers, from the exact rank formula
  ``G = (2*sum(i*x_i) - (n+1)*sum(x))/(n*sum(x))`` over cents revenue
  with a deterministic (revenue, custkey) total order.  All sufficient
  statistics in DECIMAL(38,0); the single final division runs in IEEE
  doubles under an explicit ``floor`` -- the numerator times 10000
  exceeds bigint already at sf0.1 (caught by tools/stress10x.py), and
  DuckDB's ``//`` on decimals rounds instead of flooring (wave-73
  lesson), so double division with identical expression shape in both
  engines is the deterministic overflow-proof form (the established
  ``quality_score`` convention).
- ``hhi_supplier_nation``: Herfindahl-Hirschman concentration of
  supplier revenue within each nation -- permyriad shares of
  dollar-quantized revenue (``rev_d * 10000 div sum(rev_d)``), then an
  integer sum of squared shares.  Dollar quantization keeps every
  intermediate below 2^63 at any input scale (the naive
  ``sum(rev_c^2)`` form overflowed bigint already at sf0.001);
  aggregation + one nation-partitioned window, embarrassingly scalable.

Scale: ``hhi_supplier_nation`` is group-by only.  The RFM ntile and the
Gini rank use a global customer-ordered window -- exact by design at
test scale; the 100 TB variant swaps the exact ranks for quantile
cut-points (approx_percentile) and a binned Lorenz curve, which the
docstring records as the intended production fallback (same pattern as
``doc_size_pct_rank``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


@_register(
    "rfm_segments",
    f"""
WITH per_cust AS (
  SELECT o_custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   CAST(max(max(o_orderdate)) OVER () AS DATE)) AS recency_d,
         count(*) AS freq,
         sum({_CENTS}) AS monetary_c
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT ntile(5) OVER (ORDER BY recency_d, o_custkey) AS r_q,
         ntile(5) OVER (ORDER BY freq, o_custkey) AS f_q,
         ntile(5) OVER (ORDER BY monetary_c, o_custkey) AS m_q
  FROM per_cust
)
SELECT CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS rfm_code,
       CAST(count(*) AS BIGINT) AS n_customers
FROM scored GROUP BY 1""",
    ref="extension: RFM quintile segmentation -- per-customer recency/"
    "frequency/monetary ntile(5) codes with deterministic tiebreaks",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.expr(_CENTS)).alias("monetary_c"),
        )
        .withColumn(
            "recency_d",
            F.datediff(F.max("last_d").over(Window.partitionBy()), F.col("last_d")),
        )
    )
    scored = per_cust.select(
        F.ntile(5)
        .over(Window.orderBy("recency_d", "o_custkey"))
        .alias("r_q"),
        F.ntile(5).over(Window.orderBy("freq", "o_custkey")).alias("f_q"),
        F.ntile(5)
        .over(Window.orderBy("monetary_c", "o_custkey"))
        .alias("m_q"),
    )
    return (
        scored.groupBy(
            (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
            .cast("bigint")
            .alias("rfm_code")
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@_register(
    "gini_customer_revenue",
    f"""
WITH rev AS (
  SELECT o_custkey, CAST(sum({_CENTS}) AS DECIMAL(38,0)) AS rev_c
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT rev_c,
         CAST(row_number() OVER (ORDER BY rev_c, o_custkey)
              AS DECIMAL(38,0)) AS i
  FROM rev
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(rev_c) AS BIGINT) AS total_rev_c,
       CAST(floor(CAST(2 * sum(i * rev_c) - (count(*) + 1) * sum(rev_c)
                       AS DOUBLE) * 10000
                  / CAST(count(*) * sum(rev_c) AS DOUBLE)) AS BIGINT)
         AS gini_permyriad
FROM ranked""",
    ref="extension: exact Gini coefficient of customer lifetime revenue "
    "from the rank formula, integer cents + DECIMAL(38,0) statistics",
)
def q_gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.expr(_CENTS)).cast("decimal(38,0)").alias("rev_c")
    )
    ranked = rev.select(
        "rev_c",
        F.row_number()
        .over(Window.orderBy("rev_c", "o_custkey"))
        .cast("decimal(38,0)")
        .alias("i"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("rev_c").cast("bigint").alias("total_rev_c"),
        F.expr(
            "CAST(floor(CAST(2 * sum(i * rev_c) - (count(*) + 1) * sum(rev_c)"
            " AS DOUBLE) * 10000"
            " / CAST(count(*) * sum(rev_c) AS DOUBLE)) AS BIGINT)"
        ).alias("gini_permyriad"),
    )


@_register(
    "hhi_supplier_nation",
    """
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) // 100
           AS rev_d
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
), shares AS (
  SELECT s_nationkey,
         rev_d * 10000
           // greatest(sum(rev_d) OVER (PARTITION BY s_nationkey), 1)
           AS share_pm
  FROM rev
)
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(share_pm * share_pm) // 10000 AS BIGINT) AS hhi_permyriad
FROM shares GROUP BY 1""",
    ref="extension: Herfindahl-Hirschman supplier concentration per "
    "nation -- permyriad shares of dollar-quantized revenue (bigint-"
    "safe at any scale: dollars*10000 < 2^63 up to $9e14 per supplier), "
    "then an exact integer sum of squared shares",
)
def q_hhi_supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.expr(
                "sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))"
                " div 100"
            ).alias("rev_d")
        )
    )
    shares = rev.select(
        "s_nationkey",
        F.expr(
            "rev_d * 10000 div greatest("
            "sum(rev_d) OVER (PARTITION BY s_nationkey), 1)"
        ).alias("share_pm"),
    )
    return (
        shares.groupBy(
            F.col("s_nationkey").cast("bigint").alias("s_nationkey")
        )
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.expr(
                "CAST(sum(share_pm * share_pm) div 10000 AS BIGINT)"
            ).alias("hhi_permyriad"),
        )
    )
