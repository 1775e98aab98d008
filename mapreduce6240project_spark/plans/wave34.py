"""Round-3 coverage wave 34: spectral iteration and join-size
estimation.

- ``pca_power_top``: dominant principal direction by 40 rounds of
  power iteration over the EXACT integer covariance numerator (the
  synthetic embeddings' eigengap is small -- lambda2/lambda1 ~ 0.93
  -- so convergence is genuinely slow; rounds are driver-side integer
  matvecs and 64-row oracle CTEs, both cheap) -- all
  integer arithmetic (max-abs renormalization with floor-on-magnitude
  division), so the whole trajectory replays bit-for-bit in SQL.  The
  data-sized work is the covariance (Arrow-batched Gram partials);
  the iteration itself is d^2-bounded driver state, like the kmedoids
  medoid list.
- ``join_size_cms``: equi-join cardinality estimated WITHOUT running
  the join, via the Count-Min/AMS sketch inner product
  ``min_i sum_p cmsL[i][p] * cmsR[i][p]`` -- what a cost-based
  optimizer consults before choosing broadcast vs shuffle.  Exact
  size computed alongside for calibration; the estimator never
  underestimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.sketch import (
    cms_inner_product,
    cms_inner_product_oracle_sql,
)
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_PCA_ITERS = 40


def _pca_oracle_sql(iters: int) -> str:
    """Unrolled integer power iteration.  MATERIALIZED throughout: the
    covariance CTE is referenced every round, and each v{r} references
    u{r} (which references v{r-1}) multiply."""
    parts = [
        """
WITH q AS MATERIALIZED (
  SELECT e.vec_id, CAST(t.i AS INT) - 1 AS i,
         CAST(floor(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE) * 1000000
                    + 0.5) AS BIGINT) AS qx
  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
),
n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
s AS MATERIALIZED (
  SELECT i, CAST(sum(qx) AS HUGEINT) AS s_i FROM q GROUP BY i),
g AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, CAST(sum(a.qx * b.qx) AS HUGEINT) AS s_ij
  FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2),
c AS MATERIALIZED (
  SELECT g.i, g.j,
         (SELECT n FROM n) * g.s_ij - sa.s_i * sb.s_i AS cv
  FROM g JOIN s sa ON g.i = sa.i JOIN s sb ON g.j = sb.i),
v0 AS MATERIALIZED (
  SELECT i, CAST(CASE WHEN i = 0 THEN 1000000 ELSE 0 END AS HUGEINT) AS v
  FROM s)"""
    ]
    for r in range(1, iters + 1):
        parts.append(
            f""",
u{r} AS MATERIALIZED (
  SELECT c.i, sum(c.cv * v.v) AS u
  FROM c JOIN v{r - 1} v ON c.j = v.i GROUP BY c.i),
m{r} AS MATERIALIZED (SELECT max(abs(u)) AS m FROM u{r}),
v{r} AS MATERIALIZED (
  SELECT u.i,
         CASE WHEN (SELECT m FROM m{r}) = 0 THEN pv.v
              ELSE (CASE WHEN u.u >= 0 THEN 1 ELSE -1 END)
                   * (abs(u.u) * 1000000 // (SELECT m FROM m{r})) END AS v
  FROM u{r} u JOIN v{r - 1} pv ON u.i = pv.i)"""
        )
    parts.append(f"\nSELECT i, CAST(v AS BIGINT) AS v FROM v{iters}")
    return "".join(parts)


@_register(
    "pca_power_top",
    _pca_oracle_sql(_PCA_ITERS),
    ref="extension: dominant principal direction via integer power "
    "iteration on the exact covariance numerator (max-abs "
    "renormalization, floor-on-magnitude division -- trunc-vs-floor "
    "cannot diverge); data-sized work = one Gram pass, iteration = "
    "d^2-bounded driver state (Cluster.java:310-386 doctrine)",
)
def q_pca_power_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.vectors import pca_power_top

    return pca_power_top(
        load_table(spark, sf_dir, "embeddings"), iterations=_PCA_ITERS
    )


_L_CTE = (
    "SELECT CAST(user_id AS VARCHAR) AS uid FROM events "
    "WHERE event_type = 'click'"
)
_R_CTE = (
    "SELECT CAST(user_id AS VARCHAR) AS uid FROM events "
    "WHERE event_type = 'purchase'"
)


@_register(
    "join_size_cms",
    cms_inner_product_oracle_sql(_L_CTE, _R_CTE, "uid"),
    ref="extension: join-cardinality estimation by CMS/AMS sketch inner "
    "product (Alon-Matias-Szegedy) -- two d*w-bounded sketch passes + "
    "a broadcast-sized counter join estimate |clicks JOIN purchases| "
    "without running the join; exact size alongside for calibration",
)
def q_join_size_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").cast("string").alias("uid")
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").cast("string").alias("uid")
    )
    return cms_inner_product(left, right, "uid")
