"""Semantic invariants for wave 25 (percentile ranks, PMI
collocations, left-outer streaming join)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pct_rank_bounds_and_order(spark):
    rows = REGISTRY["doc_size_pct_rank"].fn(spark, SF).collect()
    sizes = {
        r.doc_id: r.n_chars
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    by_lang = defaultdict(list)
    for r in rows:
        assert 0 <= r.pct_micro <= 1_000_000
        by_lang[r.lang].append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (sizes[r.doc_id], r.doc_id))
        pcts = [r.pct_micro for r in rs]
        assert pcts == sorted(pcts), lang
        assert pcts[0] == 0 and pcts[-1] == 1_000_000


def test_bigram_pmi_reference_value(spark):
    rows = REGISTRY["bigram_pmi_top20"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 20
    # replay the corpus counts driver-side and check each reported PMI
    from mapreduce6240project_spark.operators.dedup import tokens

    docs = (
        load_table(spark, SF, "documents")
        .select(tokens("text").alias("w"))
        .collect()
    )
    uni: Counter = Counter()
    bg: Counter = Counter()
    for r in docs:
        uni.update(r.w)
        bg.update(zip(r.w, r.w[1:]))
    n1 = sum(uni.values())
    n2 = sum(bg.values())
    for r in rows:
        assert r.cab >= 5
        assert bg[(r.wa, r.wb)] == r.cab
        pmi = math.log((r.cab * n1 * n1) / (n2 * uni[r.wa] * uni[r.wb]))
        assert abs(r.pmi_micro / 1e6 - pmi) <= 2e-6
    keys = [(-r.pmi_micro, r.wa, r.wb) for r in rows]
    assert keys == sorted(keys)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_streaming_left_join_matches_batch(spark, sf_dir):
    # BOTH scales in one run: the watermark-cutoff rule (cut at
    # min(per-side max) - watermark - tolerance - margin) was found
    # when sf0.01 hash-matched but sf0.001 dropped the last click's
    # null-padded row (BASELINE.md) -- this pair pins the rule
    got = {
        (r.click_id, r.purchase_id)
        for r in REGISTRY["streaming_left_join"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("us").alias("pus"),
    )
    side_max = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max("us").alias("m"))
        .agg(F.min("m"))
        .collect()[0][0]
    )
    j = clicks.join(
        purchases,
        (F.col("user_id") == F.col("pu"))
        & (F.col("pus") >= F.col("us"))
        & (F.col("pus") <= F.col("us") + 600_000_000),
        "left",
    ).filter(F.col("us") <= side_max - 7_200_000_000)
    want = {
        (r.event_id, r.pid if r.pid is not None else -1) for r in j.collect()
    }
    assert got == want
    assert any(p == -1 for _, p in got), "expected unmatched clicks"
    assert any(p != -1 for _, p in got), "expected matched clicks"
