"""Round-3 coverage wave 15: null-semantics joins and complex-type
aggregation.

- ``null_safe_prop_pairs``: a join whose condition uses NULL-SAFE
  equality (``<=>`` / ``IS NOT DISTINCT FROM``) on a nullable
  JSON-extracted property: two events of one user pair up when their
  property values are equal *or both missing* -- semantics a plain
  equi-join silently drops (NULL = NULL is never true).  The join still
  hash-partitions on the non-nullable ``user_id`` key, so the null-safe
  predicate rides an ordinary shuffle join, not a cartesian.
- ``event_props_map``: per-user map-shaped aggregation
  (event_type -> count) rendered canonically: sorted struct array ->
  joined string, so map iteration order can never flip the result
  hash.  The standard "build a feature map per entity" shape, with the
  determinism handled explicitly.

Reference parity note: the reference has neither NULL-aware join
semantics nor complex types; this wave belongs to the engine-semantics
extension surface alongside SURVEY.md section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "null_safe_prop_pairs",
    """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_pairs
FROM ev a JOIN ev b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND a.k IS NOT DISTINCT FROM b.k
GROUP BY a.event_type, b.event_type""",
    ref="extension: null-safe equality join (<=> / IS NOT DISTINCT "
    "FROM) on a nullable JSON property; both-missing pairs match, "
    "which a plain equi-join drops",
)
def q_null_safe_prop_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    a, b = ev.alias("a"), ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & F.col("a.k").eqNullSafe(F.col("b.k")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
    )


@_register(
    "event_props_map",
    """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       string_agg(event_type || ':' || n, ',' ORDER BY event_type)
         AS type_counts
FROM counts GROUP BY user_id""",
    ref="extension: per-entity map-shaped aggregation "
    "(event_type -> count) with canonical sorted rendering, so map "
    "iteration order cannot flip the hash",
)
def q_event_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    return counts.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("event_type", "n"))),
                lambda s: F.concat_ws(":", s["event_type"], s["n"].cast("string")),
            ),
            ",",
        ).alias("type_counts")
    )
