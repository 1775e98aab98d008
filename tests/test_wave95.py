"""Semantic invariants for wave 95 (Mann-Whitney/Cliff's delta, Wald
IV, Jensen-Shannon source drift, AMS F2 sketch, ECE, elbow knee).
Oracle equivalence at sf0.001 is covered by test_registry_oracle;
these pin the statistics against brute-force pure-Python references
and mechanism-level bounds."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _events(spark):
    return [
        (r.event_type, r.user_id, r.value)
        for r in load_table(spark, SF, "events")
        .select("event_type", "user_id", "value")
        .collect()
    ]


def test_mann_whitney_matches_bruteforce(spark):
    ev = _events(spark)
    a = [
        math.floor(v * 100 + 0.5)
        for t, _, v in ev
        if v is not None and t == "purchase"
    ]
    b = [
        math.floor(v * 100 + 0.5)
        for t, _, v in ev
        if v is not None and t == "click"
    ]
    u2 = sum(2 if x > y else (1 if x == y else 0) for x in a for y in b)
    r = REGISTRY["mann_whitney_effect"].fn(spark, SF).collect()[0]
    assert (r.n_a, r.n_b, r.u2_a) == (len(a), len(b), u2)
    want_delta = math.floor(
        (u2 - len(a) * len(b)) * 1000000.0 / (len(a) * len(b)) + 0.5
    )
    assert r.cliffs_delta_micro == want_delta
    assert -1_000_000 <= r.cliffs_delta_micro <= 1_000_000


def test_iv_wald_matches_bruteforce(spark):
    ev = _events(spark)
    users: dict[int, list] = {}
    for t, uid, v in ev:
        if uid is None or v is None:
            continue
        rec = users.setdefault(uid, [0, 0])
        rec[0] |= t == "purchase"
        rec[1] += math.floor(v * 100 + 0.5)
    u1 = [r for uid, r in users.items() if uid % 2 == 1]
    u0 = [r for uid, r in users.items() if uid % 2 == 0]
    d1, d0 = sum(r[0] for r in u1), sum(r[0] for r in u0)
    y1, y0 = sum(r[1] for r in u1), sum(r[1] for r in u0)
    den = d1 * len(u0) - d0 * len(u1)
    num = y1 * len(u0) - y0 * len(u1)
    r = REGISTRY["iv_wald_estimate"].fn(spark, SF).collect()[0]
    assert (r.u1, r.u0, r.d1, r.d0, r.y1, r.y0) == (
        len(u1),
        len(u0),
        d1,
        d0,
        y1,
        y0,
    )
    if den == 0:
        assert r.wald_cents_micro is None
    else:
        assert r.wald_cents_micro == math.floor(num * 1000000.0 / den + 0.5)


def test_js_divergence_bounds_and_python_mirror(spark):
    docs = [
        (r.source, r.lang)
        for r in load_table(spark, SF, "documents")
        .select("source", "lang")
        .collect()
        if r.source is not None and r.lang is not None
    ]
    from collections import Counter

    cnt = Counter(docs)
    ns = Counter(s for s, _ in docs)
    cl = Counter(lang for _, lang in docs)
    nn = len(docs)
    want = {}
    for s in ns:
        tot = 0
        for lang in cl:
            ca = cnt.get((s, lang), 0)
            p = ca * 1.0 / ns[s]
            q = cl[lang] * 1.0 / nn
            m = (p + q) / 2
            t = (0.0 if ca == 0 else 0.5 * p * math.log(p / m)) + 0.5 * q * math.log(
                q / m
            )
            tot += math.floor(t * 1000000000 + 0.5)
        want[s] = (ns[s], tot)
    got = {
        r.source: (r.n_docs, r.js_nano)
        for r in REGISTRY["js_divergence_sources"].fn(spark, SF).collect()
    }
    assert got == want
    # JS is bounded by ln 2 nats; quantization can dip a term slightly
    # below zero
    for _, js in got.values():
        assert -1000 <= js <= int(math.log(2) * 1e9) + 1000


def test_ams_f2_replay_and_accuracy(spark):
    ev = _events(spark)
    uids = [str(uid) for _, uid, _ in ev if uid is not None]
    z = [0] * 16
    for u in uids:
        for i in range(1, 17):
            h = int(hashlib.md5(f"{u}:{i}".encode()).hexdigest()[:15], 16)
            z[i - 1] += 1 if h % 2 == 0 else -1
    est = sum(v * v for v in z) // 16
    from collections import Counter

    exact = sum(c * c for c in Counter(uids).values())
    r = REGISTRY["ams_f2_user_stream"].fn(spark, SF).collect()[0]
    assert (r.est_f2, r.exact_f2) == (est, exact)
    assert r.err_ppm == math.floor(abs(est - exact) * 1000000.0 / exact + 0.5)
    # 16 counters give ~1/sqrt(16) relative error; allow a loose 3x
    assert r.err_ppm <= 750_000


def test_ece_consistent_with_reliability_bins(spark):
    """ECE recomputed from the brier_reliability_bins u-table
    construction must match: rebuild p/y per user in Python."""
    rows = (
        load_table(spark, SF, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("t"))
        .collect()
    )
    mid = (min(r.t for r in rows) + max(r.t for r in rows)) // 2
    users: dict[int, list] = {}
    for r in rows:
        rec = users.setdefault(r.user_id, [0, 0, 0])
        if r.t < mid:
            rec[0] += 1
            rec[1] += r.event_type == "purchase"
        elif r.event_type == "purchase":
            rec[2] = 1
    bins: dict[int, list] = {}
    for npre, kpre, y in users.values():
        if npre == 0:
            continue
        p = (1000000 * kpre) // npre
        b = min(p // 100000, 9)
        rec = bins.setdefault(b, [0, 0, 0])
        rec[0] += 1
        rec[1] += p
        rec[2] += y
    n_users = sum(v[0] for v in bins.values())
    gaps = {b: abs(1000000 * v[2] - v[1]) for b, v in bins.items()}
    r = REGISTRY["ece_calibration"].fn(spark, SF).collect()[0]
    assert r.n_users == n_users
    assert r.n_bins == len(bins)
    assert r.ece_micro == sum(gaps.values()) // n_users
    assert r.mce_micro == max(gaps[b] // bins[b][0] for b in bins)


def test_elbow_knee_geometry(spark):
    rows = {r.k: r for r in REGISTRY["elbow_knee_k"].fn(spark, SF).collect()}
    assert sorted(rows) == [2, 3, 4, 5]
    k1, kn = 2, 5
    c1, cn = rows[k1].cost_micro, rows[kn].cost_micro
    for k, r in rows.items():
        want = abs((cn - c1) * (k - k1) - (kn - k1) * (r.cost_micro - c1))
        assert r.knee_score == want
        assert r.cost_micro > 0
    interior = {k: rows[k].knee_score for k in (3, 4)}
    best = min(k for k in interior if interior[k] == max(interior.values()))
    assert [k for k, r in rows.items() if r.is_knee == 1] == [best]
    # the knee cost sits on or below the chord (it's an elbow, not a
    # bulge): signed cross product at the knee is non-positive
    signed = (cn - c1) * (best - k1) - (kn - k1) * (
        rows[best].cost_micro - c1
    )
    assert signed >= 0  # cost below the chord makes the term positive


def test_elbow_costs_match_elbow_sweep_totals(spark):
    """Per-k total cost must agree with the elbow_sweep query's
    per-cluster costs (same medoids, same distance kernel) to within
    the two queries' quantization grains (per-row micro floor here,
    per-cluster 4-digit rounding there)."""
    sweep = REGISTRY["elbow_sweep"].fn(spark, SF).collect()
    totals: dict[int, float] = {}
    for r in sweep:
        totals[r.k] = totals.get(r.k, 0.0) + r.total_cost
    knee = {r.k: r.cost_micro for r in REGISTRY["elbow_knee_k"].fn(spark, SF).collect()}
    for k, micro in knee.items():
        assert abs(micro / 1e6 - totals[k]) < 0.01
