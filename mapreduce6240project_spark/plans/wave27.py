"""Round-3 coverage wave 27: sketch set algebra.

``hll_set_algebra``: distinct-user overlap between two behaviors
(click vs purchase) WITHOUT a distinct-pair shuffle -- the portable
HLL registers of each side merge by per-bucket max into the union's
registers (max over a multiset equals max over its set, so no dedup
pass is needed), and the intersection estimate falls out of
inclusion-exclusion ``|A| + |B| - |A u B|``.  The exact intersection
rides along for error inspection.  This is the sketch-algebra pattern
that replaces exact distinct joins at 100 TB: three m-row register
aggregates instead of a users-sized shuffle.

The whole estimate is the engine's deterministic md5-based HLL
(operators.sketch), so the oracle replays every register and the
correction branch bit-for-bit -- including the same inclusion-
exclusion on the SQL side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.sketch import (
    hll_estimate,
    hll_oracle_sql,
    hll_registers,
)
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_CLICKS = "(SELECT user_id FROM events WHERE event_type = 'click') tc"
_PURCH = "(SELECT user_id FROM events WHERE event_type = 'purchase') tp"
_UNION = (
    "(SELECT user_id FROM events"
    " WHERE event_type IN ('click', 'purchase')) tu"
)


@_register(
    "hll_set_algebra",
    f"""
WITH a AS ({hll_oracle_sql(_CLICKS, "user_id")}),
b AS ({hll_oracle_sql(_PURCH, "user_id")}),
u AS ({hll_oracle_sql(_UNION, "user_id")}),
x AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_inter FROM (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
)
SELECT a.n_approx AS est_clicks,
       b.n_approx AS est_purchases,
       u.n_approx AS est_union,
       CAST(a.n_approx + b.n_approx - u.n_approx AS BIGINT)
         AS est_intersection,
       x.exact_inter AS exact_intersection
FROM a, b, u, x""",
    ref="extension: sketch set algebra -- HLL registers max-merge into "
    "the union sketch, intersection by inclusion-exclusion; replaces a "
    "users-sized distinct join with three m-row register aggregates",
)
def q_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    regs_a = hll_registers(clicks, "user_id")
    regs_b = hll_registers(purchases, "user_id")
    regs_u = (
        regs_a.unionByName(regs_b).groupBy("j").agg(F.max("M").alias("M"))
    )
    est_a = hll_estimate(regs_a).select(F.col("n_approx").alias("est_clicks"))
    est_b = hll_estimate(regs_b).select(
        F.col("n_approx").alias("est_purchases")
    )
    est_u = hll_estimate(regs_u).select(F.col("n_approx").alias("est_union"))
    exact = (
        clicks.select("user_id")
        .distinct()
        .join(purchases.select("user_id").distinct(), "user_id", "left_semi")
        .agg(F.count("*").alias("exact_intersection"))
    )
    return (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .crossJoin(exact)
        .select(
            "est_clicks",
            "est_purchases",
            "est_union",
            (
                F.col("est_clicks")
                + F.col("est_purchases")
                - F.col("est_union")
            ).alias("est_intersection"),
            "exact_intersection",
        )
    )
