"""Semantic invariants for wave 30 (frequent triples, ES weighted
sample)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.plans.curation_ext import (
    _ES_K,
    _TRIPLE_SUPPORT_DIV,
    _TRIPLE_SUPPORT_MIN,
)
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_frequent_triples_brute_force(spark):
    rows = REGISTRY["frequent_triples"].fn(spark, SF).collect()
    baskets = defaultdict(set)
    for r in (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    ):
        baskets[r.l_orderkey].add(r.l_partkey)
    tau = max(_TRIPLE_SUPPORT_MIN, len(baskets) // _TRIPLE_SUPPORT_DIV)
    counts: dict = defaultdict(int)
    for items in baskets.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                for k in range(j + 1, len(s)):
                    counts[(s[i], s[j], s[k])] += 1
    frequent = {t: n for t, n in counts.items() if n >= tau}
    want = sorted(frequent.items(), key=lambda kv: (-kv[1], kv[0]))[: max(len(rows), 1)]
    got = [((r.p1, r.p2, r.p3), r.n_orders) for r in rows]
    if frequent:
        assert got == want[: len(got)]
        assert got, "expected frequent triples at this support"
    else:
        assert got == []


def test_es_sample_replay_and_weight_bias(spark):
    rows = REGISTRY["weighted_sample_orders_es"].fn(spark, SF).collect()
    orders = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("w_c"),
        )
        .collect()
    )
    keys = {}
    for r in orders:
        h = int(
            hashlib.md5(str(r.o_orderkey).encode()).hexdigest()[:15], 16
        )
        u = (h + 1) / float(1 << 60)
        keys[r.o_orderkey] = (math.log(u) / r.w_c, r.w_c)
    want = sorted(keys.items(), key=lambda kv: (-kv[1][0], kv[0]))[:_ES_K]
    got = [(r.o_orderkey, r.w_c) for r in rows]
    assert got == [(k, wc) for k, (_, wc) in want]
    # weighted sampling bias: the sample's mean weight exceeds the
    # population mean (heavier orders are preferentially drawn)
    pop_mean = sum(r.w_c for r in orders) / len(orders)
    samp_mean = sum(r.w_c for r in rows) / len(rows)
    assert samp_mean > pop_mean
