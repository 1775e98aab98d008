"""Semantic invariants for wave 43 (TWS streaming peaks, dataset
card)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_tws_matches_batch_groupby(spark):
    got = {
        r.user_id: (r.n, r.max_micros)
        for r in REGISTRY["streaming_tws_peaks"].fn(spark, SF).collect()
    }
    want = {
        r.user_id: (r.n, r.max_micros)
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(
                F.expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)")
            ).alias("max_micros"),
        )
        .collect()
    }
    assert got == want


def test_dataset_card_grains_consistent(spark):
    rows = REGISTRY["dataset_card"].fn(spark, SF).collect()
    total = [r for r in rows if r.source == "<all>" and r.lang == "<all>"]
    assert len(total) == 1
    per_source = [r for r in rows if r.source != "<all>" and r.lang == "<all>"]
    per_pair = [r for r in rows if r.source != "<all>" and r.lang != "<all>"]
    # grain sums reconcile to the grand total
    assert sum(r.n_docs for r in per_source) == total[0].n_docs
    assert sum(r.n_docs for r in per_pair) == total[0].n_docs
    assert sum(r.total_words for r in per_pair) == total[0].total_words
