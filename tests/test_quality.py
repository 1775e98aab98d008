"""Unit tests for the wave-6 operators: DQ audit, MAD outliers,
UDTF chunking, linear interpolation, inter-arrival gaps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators import quality as Q
from mapreduce6240project_spark.operators.textstats import (
    CHUNK_STRIDE,
    CHUNK_WORDS,
    chunk_documents_udtf,
)
from mapreduce6240project_spark.operators.windows import (
    inter_event_gaps,
    interpolate_linear_grid,
)


def test_column_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "k int, v string"
    )
    got = {
        (r.column_name, r.metric): r.value
        for r in Q.column_profile(df, "t", ["k", "v"]).collect()
    }
    assert got[("*", "n_rows")] == 4
    assert got[("k", "n_null")] == 1
    assert got[("k", "n_distinct")] == 3
    assert got[("v", "n_null")] == 1
    assert got[("v", "n_distinct")] == 2


def test_referential_violations_counts_orphans_and_null_keys(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    row = Q.referential_violations(child, parent, "fk", "pk", "c->p").first()
    assert row.value == 2  # orphan 9 + null key
    assert row.table_name == "c->p"


def test_mad_outliers_flags_far_point(spark):
    # group 'g': 9 points near 10.00 and one at 1000.00 -> exactly one outlier
    rows = [("g", 10.0 + i * 0.01) for i in range(9)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "grp string, amt double")
    r = Q.mad_outliers(df, "grp", "amt").first()
    assert r.n == 10
    assert r.n_outliers == 1


def test_mad_outliers_constant_group_has_zero_mad(spark):
    df = spark.createDataFrame([("g", 5.0)] * 4, "grp string, amt double")
    r = Q.mad_outliers(df, "grp", "amt").first()
    assert r.mad4 == 0
    assert r.n_outliers == 0  # 0 > 0 is false: constants are not outliers


@pytest.mark.parametrize(
    "n_words,expect_chunks",
    [(1, 1), (CHUNK_WORDS, 1), (CHUNK_WORDS + 1, 2), (CHUNK_WORDS + CHUNK_STRIDE, 2),
     (CHUNK_WORDS + CHUNK_STRIDE + 1, 3)],
)
def test_udtf_chunk_boundaries(spark, n_words, expect_chunks):
    text = " ".join(f"w{i}" for i in range(n_words))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents_udtf(docs).collect()
    assert len(out) == expect_chunks
    # every word appears in some chunk; last chunk reaches the last word
    assert out[-1].chunk.endswith(f"w{n_words - 1}")
    assert sum(1 for r in out if r.chunk_idx == 0) == 1


def test_interpolation_exact_midpoint(spark):
    # obs at 12:00:30 value 0 and 12:02:30 value 10; grid points 12:01
    # (fraction 0.25 -> 2.5) and 12:02 (0.75 -> 7.5)
    df = spark.createDataFrame(
        [(1, "2024-01-01 12:00:30", 0.0), (1, "2024-01-01 12:02:30", 10.0)],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    r = interpolate_linear_grid(df).first()
    assert r.n_points == 2
    assert r.sum_micros == 2_500_000 + 7_500_000


def test_inter_event_gaps_buckets(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00.0"),
            (2, 1, "2024-01-01 00:00:00.5"),  # 0.5s -> lt_1s
            (3, 1, "2024-01-01 00:00:30.5"),  # 30s -> 1s_60s
            (4, 2, "2024-01-01 02:00:00.0"),  # first event of user 2: no gap
        ],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    got = {r.bucket: r.n for r in inter_event_gaps(df).collect()}
    assert got == {"lt_1s": 1, "1s_60s": 1}


def test_new_operators_handle_empty_input(spark):
    """Empty-input smoke: none of the wave-6 operators may crash on a
    zero-row frame (schema-preserving degenerate output instead)."""
    from pyspark.sql import functions as F

    from mapreduce6240project_spark.operators.windows import (
        inter_event_gaps,
        interpolate_linear_grid,
        rolling_median,
    )

    empty = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, value double"
    )
    assert interpolate_linear_grid(empty).count() == 0
    assert inter_event_gaps(empty).count() == 0
    assert rolling_median(empty).count() == 0

    edocs = spark.createDataFrame([], "doc_id long, text string")
    from mapreduce6240project_spark.operators.curation import (
        contamination_ngram_hits,
    )

    assert contamination_ngram_hits(edocs, edocs).count() == 0

    eprof = spark.createDataFrame([], "k int, v string")
    from mapreduce6240project_spark.operators.quality import (
        column_profile,
        mad_outliers,
        referential_violations,
    )

    prof = {
        (r.column_name, r.metric): r.value
        for r in column_profile(eprof, "t", ["k"]).collect()
    }
    assert prof[("*", "n_rows")] == 0 and prof[("k", "n_distinct")] == 0
    assert referential_violations(eprof, eprof, "k", "k", "t->t").first().value == 0
    assert mad_outliers(eprof.select("k", F.lit(1.0).alias("amt")), "k", "amt").count() == 0

    from mapreduce6240project_spark.operators.sketch import (
        quantile_sketch,
        quantile_sketch_estimate,
    )

    sk = quantile_sketch(
        spark.createDataFrame([], "value double"), "value"
    )
    assert quantile_sketch_estimate(sk, {"p50": 0.5}).count() == 0


def test_wave11_16_operators_handle_empty_input(spark):
    """Empty-input smoke for the round-3 tail waves: zero-row frames
    must produce schema-preserving degenerate output, not crash."""
    from pyspark.sql import functions as F  # noqa: F401

    from mapreduce6240project_spark.operators.dedup import doc_chunks
    from mapreduce6240project_spark.operators.graph import bfs_hops

    edocs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert doc_chunks(edocs).count() == 0

    epairs = spark.createDataFrame([], "id_a long, id_b long")
    # source node alone is still hop 0 even with no edges
    got = {r.node: r.hops for r in bfs_hops(epairs, source=7, max_hops=2).collect()}
    assert got == {7: 0}
