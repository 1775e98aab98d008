"""Semantic invariants for wave 39 (source overlap, compaction plan)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY


def _overlap(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.createOrReplaceTempView("__docs39")
    from mapreduce6240project_spark.operators.dedup import normalize_text
    from pyspark.sql import functions as F

    fp = df.select(F.md5(normalize_text("text")).alias("fingerprint"), "source").distinct()
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def test_source_overlap_counts_shared_fingerprints(spark):
    rows = [
        (1, "same text", "s1"),
        (2, "same text", "s2"),   # shared s1-s2
        (3, "same  TEXT ", "s2"),  # normalizes equal -> same fingerprint
        (4, "other", "s1"),
        (5, "third", "s3"),
    ]
    out = {(r.source_a, r.source_b): r.n_shared for r in _overlap(spark, rows).collect()}
    # distinct (fp, source): the duplicate inside s2 collapses first
    assert out == {("s1", "s2"): 1}


def test_source_overlap_no_self_pairs(spark):
    rows = [(1, "x", "s1"), (2, "x", "s1")]
    assert _overlap(spark, rows).count() == 0


def test_compaction_plan_groups_respect_target(spark):
    # target 4000 chars: group boundary moves when the cumsum crosses it
    out = REGISTRY["compaction_plan"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, groups in by_src.items():
        ranks = sorted(g.out_group for g in groups)
        # group ids are dense from 0
        assert ranks[0] == 0
        assert ranks == sorted(set(ranks))
        # every group except possibly the last holds >= target... the
        # cursor rule guarantees a group's *preceding* mass fits below
        # the boundary, so each non-final group total + next file spills
        # past the target; the weaker invariant that always holds: no
        # group other than group 0 can be reached without the previous
        # groups covering >= group_id * target chars in total
        total = sum(g.total_chars for g in groups)
        max_group = max(g.out_group for g in groups)
        assert total >= max_group * 4000
