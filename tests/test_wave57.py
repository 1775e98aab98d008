"""Semantic invariants for wave 57 (incremental dedup, survivor
remap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_excludes_seen(spark):
    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = load_table(spark, SF, "documents")
    fp = docs.select(
        "doc_id", F.md5(normalize_text("text")).alias("fingerprint")
    )
    seen = {
        r.fingerprint
        for r in fp.filter(F.col("doc_id") % 2 == 0).collect()
    }
    out = REGISTRY["incremental_dedup_new"].fn(spark, SF).collect()
    assert out
    for r in out:
        assert r.fingerprint not in seen
        assert r.doc_id % 2 == 1
        assert r.n_batch_copies >= 1


def test_survivor_remap_points_to_lower_canonical(spark):
    rows = REGISTRY["doc_survivor_remap"].fn(spark, SF).collect()
    assert rows  # the corpus plants near-duplicates (J >= 0.5)
    assert all(r.canonical_id < r.doc_id for r in rows)
    # canonical ids are never themselves remapped
    dropped = {r.doc_id for r in rows}
    assert all(r.canonical_id not in dropped for r in rows)
