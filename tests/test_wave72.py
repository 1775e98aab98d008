"""Semantic invariants for wave 72 (bag fingerprint, peer
percentile)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_bag_fingerprint_collapses_reordered_copies(spark):
    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    bag = F.md5(
        F.array_join(F.sort_array(F.split(normalize_text("text"), " ")), " ")
    )
    out = (
        docs.select("doc_id", bag.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n"))
        .collect()
    )
    by_id = {r.doc_id: r.n for r in out}
    assert by_id == {1: 2, 3: 1}  # docs 1 and 2 collapse


def test_peer_percentile_bounds(spark):
    rows = REGISTRY["supplier_peer_percentile"].fn(spark, SF).collect()
    assert rows
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.s_nationkey, []).append(r)
    for nk, rs in by_nation.items():
        assert all(0 <= r.pct_permyriad <= 10000 for r in rs)
        if len(rs) > 1:
            top = max(rs, key=lambda r: (r.rev_c, -r.s_suppkey))
            assert top.pct_permyriad == 10000
