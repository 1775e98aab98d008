"""Round-3 coverage wave 33: diversity selection and quantile-sketch
rollup.

- ``kcenter_select_8``: greedy k-center / farthest-point traversal
  (Gonzalez 1985) over the embeddings -- coreset/diversity selection
  with a 2-approximate coverage radius.  Exact integer squared-L2 over
  micro-quantized components makes the greedy trajectory bit-identical
  across engines; the oracle unrolls the 8 selection rounds as
  MATERIALIZED CTEs over the long-format (vec_id, i, qx) table.
- ``qsketch_grain_rollup``: per-day p50/p90 of event value AND the
  all-time quantiles, the total derived by MERGING the per-day
  log-bucket sketches (adding counts) -- the quantile twin of
  ``hll_mergeable_rollup``: one raw scan, any coarser grain is a
  ~512-row bucket merge, never a rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_K_CENTERS = 8

#: SQL twin of operators.sampling.seed_hash
_SEED_HASH = "((vec_id % 2147483648) * 1103515245 + 12345) % 2147483648"


def _kcenter_oracle_sql(k: int) -> str:
    """Unrolled farthest-point traversal.  ``d{r}`` holds every
    vector's min squared distance to the first r centers; ``c{r+1}``
    is its argmax.  All MATERIALIZED: each round references the
    long-format table and its predecessor multiply."""
    parts = [
        f"""
WITH q AS MATERIALIZED (
  SELECT e.vec_id, CAST(t.i AS INT) AS i,
         CAST(floor(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE) * 1000000
                    + 0.5) AS BIGINT) AS qx
  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
),
c1 AS MATERIALIZED (
  SELECT vec_id FROM embeddings ORDER BY {_SEED_HASH}, vec_id LIMIT 1),
d1 AS MATERIALIZED (
  SELECT q.vec_id,
         CAST(sum((q.qx - c.qx) * (q.qx - c.qx)) AS BIGINT) AS mind
  FROM q JOIN (SELECT i, qx FROM q
               WHERE vec_id = (SELECT vec_id FROM c1)) c USING (i)
  GROUP BY q.vec_id)"""
    ]
    for r in range(2, k + 1):
        parts.append(
            f""",
c{r} AS MATERIALIZED (
  SELECT vec_id, mind FROM d{r - 1} ORDER BY mind DESC, vec_id LIMIT 1),
d{r} AS MATERIALIZED (
  SELECT d.vec_id, least(d.mind, dn.dist) AS mind
  FROM d{r - 1} d JOIN (
    SELECT q.vec_id,
           CAST(sum((q.qx - c.qx) * (q.qx - c.qx)) AS BIGINT) AS dist
    FROM q JOIN (SELECT i, qx FROM q
                 WHERE vec_id = (SELECT vec_id FROM c{r})) c USING (i)
    GROUP BY q.vec_id) dn USING (vec_id))"""
        )
    rounds = " UNION ALL ".join(
        f"SELECT {r} AS round, vec_id, CAST(mind AS BIGINT) AS radius_sq FROM c{r}"
        for r in range(2, k + 1)
    )
    parts.append(
        f"""
SELECT 1 AS round, (SELECT vec_id FROM c1) AS vec_id,
       CAST(0 AS BIGINT) AS radius_sq
UNION ALL {rounds}"""
    )
    return "".join(parts)


@_register(
    "kcenter_select_8",
    _kcenter_oracle_sql(_K_CENTERS),
    ref="extension: greedy k-center diversity/coreset selection "
    "(Gonzalez 1985 farthest-point, 2-approx radius) -- per round one "
    "literal-center narrow map + TakeOrderedAndProject argmax, k-vector "
    "driver state (Cluster.java:310-386 iterate doctrine); exact "
    "integer distances, bit-identical trajectory",
)
def q_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.vectors import kcenter_select

    return kcenter_select(
        load_table(spark, sf_dir, "embeddings"), k=_K_CENTERS
    )


def _qsketch_rollup_sql() -> str:
    from mapreduce6240project_spark.operators.sketch import (
        QSKETCH_BID_SQL,
        QSKETCH_REP_SQL,
    )

    bid = QSKETCH_BID_SQL.format(m="m")
    rep = QSKETCH_REP_SQL.format(b="bid")
    return f"""
WITH mm AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS m
  FROM events
),
day_b AS MATERIALIZED (
  SELECT day, {bid} AS bid, CAST(count(*) AS BIGINT) AS n
  FROM mm WHERE m >= 0 GROUP BY 1, 2
),
tot_b AS (SELECT bid, CAST(sum(n) AS BIGINT) AS n FROM day_b GROUP BY bid),
g AS (
  SELECT day AS grain_key, bid, n FROM day_b
  UNION ALL
  SELECT 'all' AS grain_key, bid, n FROM tot_b
),
c AS (
  SELECT grain_key, bid, n,
         CAST(sum(n) OVER (PARTITION BY grain_key ORDER BY bid) AS BIGINT)
           AS cum,
         CAST(sum(n) OVER (PARTITION BY grain_key) AS BIGINT) AS total
  FROM g
),
q AS (SELECT unnest(['p50', 'p90']) AS label, unnest([5000, 9000]) AS q10k),
sel AS (
  SELECT grain_key, label, min(bid) AS bid, max(total) AS n_total
  FROM c, q WHERE cum >= (q10k * total + 9999) // 10000
  GROUP BY grain_key, label
)
SELECT grain_key, label, {rep} AS est_micros,
       CAST(n_total AS BIGINT) AS n_total
FROM sel"""


@_register(
    "qsketch_grain_rollup",
    _qsketch_rollup_sql(),
    ref="extension: mergeable quantile-sketch rollup (per-day log-bucket "
    "sketches summed into the all-time sketch; one raw scan, coarser "
    "grains are ~512-row bucket merges) -- the quantile twin of "
    "hll_mergeable_rollup",
)
def q_qsketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.sketch import (
        quantile_sketch_estimate_grouped,
        quantile_sketch_grouped,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "value"
    )
    # localCheckpoint, not persist: materialized once for both grains,
    # released with the plan (same discipline as hll_mergeable_rollup)
    day_b = quantile_sketch_grouped(ev, "value", group_cols=("day",)).localCheckpoint()
    tot_b = day_b.groupBy("bid").agg(F.sum("n").cast("bigint").alias("n"))
    g = day_b.select(F.col("day").alias("grain_key"), "bid", "n").unionByName(
        tot_b.select(F.lit("all").alias("grain_key"), "bid", "n")
    )
    quantiles = {"p50": 0.5, "p90": 0.9}
    return quantile_sketch_estimate_grouped(
        g, quantiles, group_cols=("grain_key",)
    )
