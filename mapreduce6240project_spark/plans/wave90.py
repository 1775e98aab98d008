"""Round-3 coverage wave 90: tail-index estimation, join-skew
profiling, leaderboard stability.

- ``hill_tail_index``: the Hill estimator of the value distribution's
  tail exponent over the top-200 order statistics -- the standard
  fat-tail diagnostic (alpha ~ 1/mean(ln(x_i/x_k))): alpha <= 2 means
  infinite variance and every mean-based dashboard is lying; the
  parametric companion to ``value_overdispersion`` and
  ``benford_totalprice``.  Top-k is a rank over cents (no global
  materialized sort -- Catalyst takes TakeOrdered for the k rows);
  each log term is micro-quantized (``zipf_slope_tokens`` convention)
  and the estimate is one integer division: alpha_micro =
  k * 1e12 / sum(ln_micro).
- ``join_key_skew_profile``: count-of-counts profile of the
  orders |><| lineitem join key -- how many orders have 1, 2, ... line
  items, plus each multiplicity's share of join output rows.  The
  exact-skew companion to ``join_size_cms`` (sketched) and
  ``join_strategy_advisor`` (decision): a key whose multiplicity share
  concentrates is the key you salt (``salted_*``).  Two bounded
  aggregations.
- ``topk_stability_bootstrap``: is the top-10 customer leaderboard
  real or noise?  Re-rank customers under each of 20 Poisson(1)
  bootstrap replicates (per-ORDER integer-threshold hash weights, the
  ``bootstrap_mean_value`` machinery) and report, for every customer
  appearing in any replicate's top 10, how many replicates keep them
  there.  A customer in 20/20 is a stable fact; 3/20 is sampling
  noise.  One explode + replicate-partitioned rank over per-customer
  aggregates -- parallel across replicates, never a global sort of raw
  facts.

Scale: top-k and count-of-counts are bounded outputs; the bootstrap
ranks run per replicate over customer aggregates (|customers| <<
|orders|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.plans.wave82 import _POIS_T
from mapreduce6240project_spark.sources.tables import load_table

_HILL_K = 200
_B = 20

_W_SQL = " + ".join(
    f"(CASE WHEN h >= {t} THEN 1 ELSE 0 END)" for t in _POIS_T
)


@_register(
    "hill_tail_index",
    f"""
WITH v AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
         row_number() OVER (ORDER BY floor(value * 100 + 0.5) DESC,
                            event_id) AS r
  FROM events
), topk AS (
  SELECT x, r FROM v WHERE r <= {_HILL_K}
), xk AS (
  SELECT x AS x_k FROM topk WHERE r = {_HILL_K}
), terms AS (
  SELECT CAST(floor(ln(CAST(t.x AS DOUBLE) / k.x_k) * 1000000 + 0.5)
              AS BIGINT) AS ln_micro
  FROM topk t CROSS JOIN xk k
  WHERE t.r < {_HILL_K}
)
SELECT CAST(count(*) AS BIGINT) AS k_used,
       CAST(sum(ln_micro) AS BIGINT) AS sum_ln_micro,
       CAST(count(*) * 1000000000000 // greatest(sum(ln_micro), 1)
            AS BIGINT) AS alpha_micro
FROM terms""",
    ref="extension: Hill tail-exponent estimator over the top-200 "
    "value order statistics -- TakeOrdered top-k, micro-quantized log "
    "terms, one integer division; fat-tail gate next to "
    "value_overdispersion",
)
def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("x"),
        "event_id",
    ).select(
        "x",
        F.row_number()
        .over(Window.orderBy(F.desc("x"), F.col("event_id")))
        .alias("r"),
    )
    topk = v.filter(F.col("r") <= _HILL_K)
    xk = topk.filter(F.col("r") == _HILL_K).select(
        F.col("x").alias("x_k")
    )
    terms = (
        topk.filter(F.col("r") < _HILL_K)
        .crossJoin(F.broadcast(xk))
        .select(
            F.expr(
                "CAST(floor(ln(CAST(x AS DOUBLE) / x_k) * 1000000 + 0.5)"
                " AS BIGINT)"
            ).alias("ln_micro")
        )
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        F.sum("ln_micro").cast("bigint").alias("sum_ln_micro"),
        F.expr(
            "CAST(count(*) * 1000000000000"
            " div greatest(sum(ln_micro), 1) AS BIGINT)"
        ).alias("alpha_micro"),
    )


@_register(
    "join_key_skew_profile",
    """
WITH per_key AS (
  SELECT l_orderkey, count(*) AS m FROM lineitem GROUP BY 1
), cc AS (
  SELECT m, count(*) AS n_keys FROM per_key GROUP BY m
)
SELECT CAST(m AS BIGINT) AS multiplicity,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(m * n_keys AS BIGINT) AS join_rows,
       CAST(m * n_keys * 10000 // sum(m * n_keys) OVER () AS BIGINT)
         AS join_rows_pm
FROM cc""",
    ref="extension: exact count-of-counts skew profile of the "
    "orders-lineitem join key with per-multiplicity join-output "
    "share; the measured input to join_strategy_advisor / salting",
)
def q_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("m"))
    cc = per_key.groupBy("m").agg(F.count(F.lit(1)).alias("n_keys"))
    w = Window.partitionBy()
    return cc.select(
        F.col("m").cast("bigint").alias("multiplicity"),
        F.col("n_keys").cast("bigint").alias("n_keys"),
        (F.col("m") * F.col("n_keys")).cast("bigint").alias("join_rows"),
        F.expr(
            "m * n_keys * 10000 div "
            "sum(m * n_keys) OVER ()"
        )
        .cast("bigint")
        .alias("join_rows_pm"),
    )


@_register(
    "topk_stability_bootstrap",
    f"""
WITH r AS (
  SELECT o.o_custkey,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS v_c,
         b.b,
         ('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || ':'
                             || CAST(b.b AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM orders o CROSS JOIN (
    SELECT unnest(generate_series(0, {_B - 1})) AS b) b
), w AS (
  SELECT b, o_custkey, sum(({_W_SQL}) * v_c) AS rev_c FROM r
  GROUP BY 1, 2
), rk AS (
  SELECT b, o_custkey,
         row_number() OVER (PARTITION BY b
                            ORDER BY rev_c DESC, o_custkey) AS r
  FROM w
)
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_top10
FROM rk WHERE r <= 10 GROUP BY o_custkey""",
    ref="extension: leaderboard stability audit -- re-rank customers "
    "under 20 Poisson bootstrap replicates (bootstrap_mean_value "
    "machinery) and count how often each holds a top-10 seat",
)
def q_topk_stability_bootstrap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mapreduce6240project_spark.functions.hashing import hash60

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderkey").cast("string").alias("oid"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "v_c"
        ),
    )
    r = o.select(
        "o_custkey",
        "v_c",
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
        "oid",
    ).select(
        "o_custkey",
        "v_c",
        "b",
        hash60(
            F.concat(F.col("oid"), F.lit(":"), F.col("b").cast("string"))
        ).alias("h"),
    )
    w = r.groupBy("b", "o_custkey").agg(
        F.sum(F.expr(f"({_W_SQL}) * v_c")).alias("rev_c")
    )
    rk = w.select(
        "b",
        "o_custkey",
        F.row_number()
        .over(
            Window.partitionBy("b").orderBy(
                F.desc("rev_c"), F.col("o_custkey")
            )
        )
        .alias("r"),
    )
    return (
        rk.filter(F.col("r") <= 10)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_top10"))
    )
