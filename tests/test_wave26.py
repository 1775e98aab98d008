"""Semantic invariants for wave 26 (TWAP, OHLC bars, Benford audit)."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_twap_brute_force(spark):
    got = {
        r.user_id: (r.twap_micro, r.span_s)
        for r in REGISTRY["twap_user_value"].fn(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v_c"),
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.us, r.event_id))
        wsum = 0
        span = 0
        for a, b in zip(rows, rows[1:]):
            dt = (b.us - a.us) // 1_000_000
            wsum += a.v_c * dt
            span += dt
        if span > 0:
            assert got[uid] == ((wsum * 10000) // span, span), uid
            # TWAP lies within the observed value range (in micro-units)
            lo = min(r.v_c for r in rows) * 10000
            hi = max(r.v_c for r in rows) * 10000
            assert lo <= got[uid][0] <= hi
        else:
            assert uid not in got


def test_ohlc_bar_invariants(spark):
    rows = REGISTRY["ohlc_hourly_value"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.low_c <= r.open_c <= r.high_c
        assert r.low_c <= r.close_c <= r.high_c
        assert r.n >= 1
        if r.n == 1:
            assert r.open_c == r.close_c == r.high_c == r.low_c
    # bar count equals the distinct (type, hour) bucket count
    n_buckets = (
        load_table(spark, SF, "events")
        .select(
            "event_type", F.expr("unix_micros(ts) div 3600000000").alias("h")
        )
        .distinct()
        .count()
    )
    assert len(rows) == n_buckets


def test_benford_expectation_and_totals(spark):
    rows = REGISTRY["benford_totalprice"].fn(spark, SF).collect()
    n = sum(r.n_obs for r in rows)
    n_orders = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .count()
    )
    assert n == n_orders
    digits = {r.digit for r in rows}
    assert digits <= set(range(1, 10))
    for r in rows:
        want = math.floor(
            n * (math.log(1.0 + 1.0 / r.digit) / math.log(10.0)) * 1e6 + 0.5
        )
        assert r.expected_micro == want
    # expectations sum to ~N (within per-digit rounding)
    tot_exp = sum(
        math.floor(n * (math.log(1 + 1 / d) / math.log(10)) * 1e6 + 0.5)
        for d in range(1, 10)
    )
    assert abs(tot_exp - n * 1_000_000) <= 9
