"""Semantic invariants for wave 45 (variant ingestion, session
paths)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_variant_matches_string_json_path(spark):
    ev = spark.createDataFrame(
        [(1, '{"k": 7}'), (2, '{"k": 15}'), (3, '{"k": 15}')],
        "event_id long, props string",
    )
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    out = {
        r.decile: r.n
        for r in ev.select(k.alias("k"))
        .select(F.expr("k div 10").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == {0: 1, 1: 2}


def test_variant_registered_query_sums_to_rowcount(spark):
    from mapreduce6240project_spark.sources.tables import load_table

    out = REGISTRY["props_variant_deciles"].fn(spark, SF).collect()
    assert sum(r.n for r in out) == load_table(spark, SF, "events").count()


def test_session_paths_split_on_gap(spark):
    t0 = datetime.datetime(2024, 1, 1, 9, 0)

    def at(mins):
        return t0 + datetime.timedelta(minutes=mins)

    ev = spark.createDataFrame(
        [
            # user 1, session 1: a > b > c (plus a 4th event, truncated)
            (1, 1, "a", at(0)), (2, 1, "b", at(1)), (3, 1, "c", at(2)),
            (4, 1, "d", at(3)),
            # gap > 30 min -> session 2: a > b
            (5, 1, "a", at(60)), (6, 1, "b", at(61)),
            # user 2, one session: a > b > c
            (7, 2, "a", at(0)), (8, 2, "b", at(5)), (9, 2, "c", at(6)),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    spark45 = ev.sparkSession
    ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    ).createOrReplaceTempView("__ev45")
    out = spark45.sql("""
        WITH flagged AS (
          SELECT user_id, event_id, event_type, us,
                 CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                           OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) >= 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM __ev45),
        sess AS (
          SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id) AS session
          FROM flagged),
        rk AS (
          SELECT user_id, session, event_type,
                 row_number() OVER (PARTITION BY user_id, session ORDER BY us, event_id) AS rn
          FROM sess),
        paths AS (
          SELECT user_id, session, array_join(transform(array_sort(collect_list(struct(rn, event_type))), s -> s.event_type), '>') AS path
          FROM rk WHERE rn <= 3 GROUP BY 1, 2)
        SELECT path, count(*) AS n FROM paths GROUP BY 1 ORDER BY n DESC, path
    """).collect()
    got = {r.path: r.n for r in out}
    assert got == {"a>b>c": 2, "a>b": 1}
