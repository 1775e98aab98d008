"""Semantic invariants for wave 44 (RANGE-frame moving average,
containment pairs)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY


def test_moving_avg_range_frame_semantics(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def at(mins):
        return t0 + datetime.timedelta(minutes=mins)

    ev = spark.createDataFrame(
        [
            (1, 7, at(0), 10.0),
            (2, 7, at(10), 20.0),   # within 30m of #1
            (3, 7, at(50), 40.0),   # #1,#2 out of its 30m frame
            (4, 8, at(10), 99.0),   # other user: frames don't mix
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    ev.createOrReplaceTempView("__ev44")
    out = {r.event_id: r.avg_cents for r in ev.sparkSession.sql("""
        SELECT event_id,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
               div count(*) OVER w AS avg_cents
        FROM (SELECT event_id, user_id, unix_micros(ts) AS tmic, value
              FROM __ev44)
        WINDOW w AS (PARTITION BY user_id ORDER BY tmic
                     RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
    """).collect()}
    assert out[1] == 1000
    assert out[2] == (1000 + 2000) // 2
    assert out[3] == 4000  # events 40+ minutes earlier fall out of range
    assert out[4] == 9900


def test_containment_catches_excerpt_jaccard_misses(spark):
    from mapreduce6240project_spark.operators.dedup import ngram_jaccard_pairs

    quote = "alpha beta gamma delta epsilon"
    long_doc = quote + " " + " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc)], "doc_id long, text string"
    )
    docs.createOrReplaceTempView("__docs44")
    # Jaccard misses: the union is dominated by the long doc
    jac = ngram_jaccard_pairs(docs, threshold=0.8)
    assert jac.count() == 0
    # containment catches: every shingle of the quote is in the long doc
    from mapreduce6240project_spark.operators.dedup import shingles

    sh = docs.select("doc_id", F.explode(F.array_distinct(shingles("text", 3))).alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") != F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_sub"), F.col("b.doc_id").alias("id_sup"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    cont = (
        inter.join(sizes.withColumnRenamed("doc_id", "id_sub"), "id_sub")
        .filter(F.expr("n_inter * 10000 div n_sh") >= 8000)
    )
    rows = {(r.id_sub, r.id_sup) for r in cont.collect()}
    assert (1, 2) in rows       # the quote is contained in the long doc
    assert (2, 1) not in rows   # not vice versa


def test_containment_prefix_equals_naive(spark):
    """The prefix-filtered containment join is lossless: identical pair
    set to the naive all-shared-shingle join on a planted corpus."""
    from mapreduce6240project_spark.operators.dedup import (
        containment_prefix_pairs,
        shingles,
    )

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, quote + " " + " ".join(f"w{i}" for i in range(30))),
            (3, "totally different words here in this one document body"),
            (4, quote),  # identical to 1: mutual containment
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_sub, r.id_sup, r.n_inter, r.cont_permyriad)
        for r in containment_prefix_pairs(docs, 8000).collect()
    }
    # naive spec
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(shingles("text", 3))).alias("s")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s"))
               & (F.col("a.doc_id") != F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_sub"),
                 F.col("b.doc_id").alias("id_sup"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    want = {
        (r.id_sub, r.id_sup, r.n_inter, r.cont)
        for r in inter.join(
            sizes.withColumnRenamed("doc_id", "id_sub"), "id_sub"
        )
        .selectExpr(
            "id_sub", "id_sup", "n_inter",
            "n_inter * 10000 div n_sh AS cont",
        )
        .filter("cont >= 8000")
        .collect()
    }
    assert got == want and len(got) >= 3  # (1,2),(1,4),(4,1) at least
