"""Semantic invariants for the wave-24 operators (exact splits, nucleus
selection, CUSUM, lag-1 autocorrelation)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_exact_split_proportions(spark):
    """Counts must be the exact integer 80/10/10 cuts, per stratum."""
    got = defaultdict(dict)
    for r in REGISTRY["exact_split_strata"].fn(spark, SF).collect():
        got[r.lang][r.split] = r.n_docs
    totals = {
        r.lang: r.n
        for r in load_table(spark, SF, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, n in totals.items():
        train = (n * 8) // 10
        val = (n * 9) // 10 - train
        test = n - (n * 9) // 10
        want = {k: v for k, v in
                (("train", train), ("val", val), ("test", test)) if v}
        assert got[lang] == want, lang


def test_exact_split_is_md5_order_deterministic(spark):
    """The same cut must be reproduced by a driver-side replay of the
    md5 ordering (membership, not just counts)."""
    docs = load_table(spark, SF, "documents").select("doc_id", "lang").collect()
    by_lang = defaultdict(list)
    for r in docs:
        by_lang[r.lang].append(r.doc_id)
    want = defaultdict(lambda: defaultdict(int))
    for lang, ids in by_lang.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        n = len(ids)
        for rn, _ in enumerate(ids, start=1):
            split = (
                "train" if rn * 10 <= n * 8
                else "val" if rn * 10 <= n * 9
                else "test"
            )
            want[lang][split] += 1
    got = defaultdict(dict)
    for r in REGISTRY["exact_split_strata"].fn(spark, SF).collect():
        got[r.lang][r.split] = r.n_docs
    assert {k: dict(v) for k, v in want.items()} == dict(got)


def test_nucleus_covers_and_is_minimal(spark):
    rows = {r.lang: r for r in REGISTRY["nucleus_docs_90"].fn(spark, SF).collect()}
    docs = load_table(spark, SF, "documents").select(
        "lang", "doc_id", "n_chars"
    ).collect()
    by_lang = defaultdict(list)
    for r in docs:
        by_lang[r.lang].append((r.n_chars, r.doc_id))
    for lang, items in by_lang.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        tw = sum(c for c, _ in items)
        got = rows[lang]
        assert got.n_total == len(items)
        # brute-force the minimal size-desc prefix covering 90%
        cum = 0
        sel = 0
        chars = 0
        for c, _ in items:
            if cum * 10 < tw * 9:
                sel += 1
                chars += c
            cum += c
        assert (got.n_selected, got.chars_selected) == (sel, chars)
        assert got.chars_selected * 10 >= tw * 9  # covers
        assert sel == 0 or (got.chars_selected - items[sel - 1][0]) * 10 < tw * 9  # minimal


def test_cusum_brute_force(spark):
    got = {
        r.event_type: (r.max_abs_cusum_scaled, r.peak_day)
        for r in REGISTRY["cusum_max_deviation"].fn(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint").alias("v"),
    ).collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        daily[r.event_type][r.day] += r.v
    for t, days in daily.items():
        xs = sorted(days.items())
        d = len(xs)
        tot = sum(v for _, v in xs)
        c = 0
        best = (-1, None)
        for day, x in xs:
            c += d * x - tot
            if abs(c) > best[0]:
                best = (abs(c), day)
        assert got[t] == best, t


def test_acf1_matches_float_reference(spark):
    got = {r.event_type: r.acf1 for r in
           REGISTRY["acf1_daily_value"].fn(spark, SF).collect()}
    ev = load_table(spark, SF, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v"),
    ).collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        daily[r.event_type][r.day] += r.v
    for t, days in daily.items():
        xs = [v for _, v in sorted(days.items())]
        pairs = list(zip(xs[1:], xs[:-1]))
        n = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        r_ref = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        assert abs(got[t] - r_ref) <= 1e-4 + 1e-12, t
        assert -1.0 <= got[t] <= 1.0
