"""Round-3 coverage wave 49: hypothesis testing and CDC apply.

- ``permutation_test_value``: distributed permutation test -- is the
  mean event value of purchasers really different from clickers, or
  noise?  The observed integer-cents mean gap is compared against 20
  deterministic label permutations (LCG re-labelings of users), and the
  p-value numerator is the count of permuted gaps at least as extreme.
  Every permutation is a hash re-labeling, so the full test is one
  explode (x21) + two hash aggregates -- the scale-honest way to run
  resampling statistics (no driver-side resampling loop).
- ``cdc_latest_state``: changelog apply with delete semantics -- the
  event stream read as CDC (``error`` = tombstone, everything else =
  upsert of the event value); final state = last event per user, users
  whose last event is a tombstone are absent.  The MERGE-style
  compaction every lakehouse table maintenance job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_K_PERMS = 20

#: deterministic permutation label: LCG over (user_id, k) -> {0, 1}
_PERM = (
    "(((user_id * 31 + {k}) % 2147483648) * 1103515245 + 12345)"
    " % 2147483648 % 2"
)


def _perm_test_sql() -> str:
    perm_branches = " UNION ALL ".join(
        f"SELECT {k} AS perm, CAST({_PERM.format(k=k)} AS BIGINT) AS grp,"
        " cents FROM base"
        for k in range(1, _K_PERMS + 1)
    )
    return f"""
WITH base AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
),
obs AS (
  SELECT abs(
    (SELECT sum(cents) // count(*) FROM base WHERE event_type = 'purchase')
    - (SELECT sum(cents) // count(*) FROM base WHERE event_type = 'click')
  ) AS gap
),
perms AS ({perm_branches}),
pgaps AS (
  SELECT perm,
         abs(
           sum(CASE WHEN grp = 1 THEN cents END)
             // count(CASE WHEN grp = 1 THEN 1 END)
           - sum(CASE WHEN grp = 0 THEN cents END)
             // count(CASE WHEN grp = 0 THEN 1 END)
         ) AS gap
  FROM perms GROUP BY perm
)
SELECT CAST((SELECT gap FROM obs) AS BIGINT) AS obs_gap_cents,
       CAST(count(*) AS BIGINT) AS n_perms,
       CAST(sum(CASE WHEN p.gap >= (SELECT gap FROM obs) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_extreme
FROM pgaps p"""


@_register(
    "permutation_test_value",
    _perm_test_sql(),
    ref="extension: distributed permutation test (20 LCG label "
    "permutations, integer-cents mean gap) -- resampling statistics as "
    "one explode + hash aggregates, no driver loop",
)
def q_perm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    obs = base.agg(
        F.abs(
            F.expr(
                "sum(CASE WHEN event_type = 'purchase' THEN cents END)"
                " div count(CASE WHEN event_type = 'purchase' THEN 1 END)"
                " - sum(CASE WHEN event_type = 'click' THEN cents END)"
                " div count(CASE WHEN event_type = 'click' THEN 1 END)"
            )
        ).alias("obs_gap")
    )
    perms = base.select(
        "user_id",
        "cents",
        F.explode(
            F.array(*[F.lit(k) for k in range(1, _K_PERMS + 1)])
        ).alias("perm"),
    ).withColumn("grp", F.expr(_PERM.format(k="perm")).cast("bigint"))
    pgaps = perms.groupBy("perm").agg(
        F.abs(
            F.expr(
                "sum(CASE WHEN grp = 1 THEN cents END)"
                " div count(CASE WHEN grp = 1 THEN 1 END)"
                " - sum(CASE WHEN grp = 0 THEN cents END)"
                " div count(CASE WHEN grp = 0 THEN 1 END)"
            )
        ).alias("gap")
    )
    return pgaps.crossJoin(F.broadcast(obs)).agg(
        F.max("obs_gap").cast("bigint").alias("obs_gap_cents"),
        F.count(F.lit(1)).alias("n_perms"),
        F.sum(F.when(F.col("gap") >= F.col("obs_gap"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_extreme"),
    )


@_register(
    "cdc_latest_state",
    """
WITH ranked AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, cents AS last_value_cents
FROM ranked WHERE rn = 1 AND event_type <> 'error'""",
    ref="extension: CDC/MERGE compaction with tombstones -- last event "
    "per key wins, trailing 'error' deletes the key; WindowGroupLimit "
    "keeps one row per key below the sort",
)
def q_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    ranked = ev.withColumn(
        "rn",
        F.expr(
            "row_number() OVER (PARTITION BY user_id"
            " ORDER BY ts DESC, event_id DESC)"
        ),
    )
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select("user_id", F.col("cents").alias("last_value_cents"))
    )
