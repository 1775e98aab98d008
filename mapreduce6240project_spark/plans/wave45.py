"""Round-3 coverage wave 45: Spark 4 VariantType and session path
mining.

- ``props_variant_deciles``: the semi-structured ``props`` column
  ingested through Spark 4's VariantType (``parse_json`` ->
  ``variant_get``) instead of per-access string parsing --
  variant decodes the JSON once into a binary form that repeated path
  accesses read without re-parsing, the semi-structured analog of
  columnar pushdown.  The query itself is a decile histogram of the
  extracted integer.
- ``session_path_top10``: top opening event-type paths (first three
  events) per 30-minute-gap session -- the product-analytics "how do
  sessions start" query, one step beyond pairwise transition counts.
  Ties in event time resolve by event id, so paths are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "props_variant_deciles",
    """
SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT)
         AS decile,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1""",
    ref="extension: VariantType ingestion (parse_json -> variant_get) "
    "of the semi-structured props column; decile histogram of the "
    "extracted integer",
)
def q_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select(k.alias("k"))
        .select(F.expr("k div 10").cast("bigint").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_SESS_CTE = """
WITH flagged AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, event_type, us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS session
  FROM flagged
),
rk AS (
  SELECT user_id, session, event_type,
         row_number() OVER (PARTITION BY user_id, session
                            ORDER BY us, event_id) AS rn
  FROM sess
),
paths AS (
  SELECT user_id, session, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM rk WHERE rn <= 3 GROUP BY 1, 2
)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM paths GROUP BY 1 ORDER BY n DESC, path LIMIT 10"""


@_register(
    "session_path_top10",
    _SESS_CTE,
    ref="extension: session opening-path mining -- 30-min gaps-and-"
    "islands sessionization, first-3 event-type path per session, "
    "corpus top-10; same session CTE family as session_window",
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        F.expr(
            "CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)"
            " IS NULL OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us,"
            " event_id) >= 1800000000 THEN 1 ELSE 0 END"
        ).alias("new_s"),
    )
    sess = flagged.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        F.expr(
            "sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id)"
        ).alias("session"),
    )
    rk = sess.select(
        "user_id",
        "session",
        "event_type",
        F.expr(
            "row_number() OVER (PARTITION BY user_id, session"
            " ORDER BY us, event_id)"
        ).alias("rn"),
    ).filter(F.col("rn") <= 3)
    paths = rk.groupBy("user_id", "session").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )
