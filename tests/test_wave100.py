"""Semantic invariants for wave 100 (b-bit MinHash audit, mixture
ESS)."""

from __future__ import annotations

import hashlib
import math

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

_P = 2147483647


def test_bbit_estimator_replays_and_is_unbiasedish(spark):
    """Replay the 32 Carter-Wegman low bits in pure Python for every
    audited pair; the estimate formula must match bit-for-bit, and on
    the (high-similarity) verified pairs the mean absolute error must
    sit inside the binomial noise envelope of a 32-perm sketch."""
    docs = {
        r.doc_id: " ".join(r.text.lower().split())
        for r in load_table(spark, SF, "documents").collect()
        if r.text is not None
    }

    def shingle_set(t):
        w = t.split(" ")
        if len(w) >= 3:
            return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        return {t}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _P

    sigs = {}
    for d, t in docs.items():
        hs = [h60(s) for s in shingle_set(t)]
        sigs[d] = [
            min(((2 * i + 1) * h + (i * 12345 + 7)) % _P for h in hs) % 2
            for i in range(1, 33)
        ]
    rows = REGISTRY["bbit_minhash_audit"].fn(spark, SF).collect()
    assert rows
    errs = []
    for r in rows:
        n_coll = sum(
            1 for a, b in zip(sigs[r.id_a], sigs[r.id_b]) if a == b
        )
        assert r.est_permyriad == 625 * n_coll - 10000
        assert r.abs_err_permyriad == abs(r.est_permyriad - r.jac_permyriad)
        errs.append(r.abs_err_permyriad)
    # 32 perms -> sd of the 1-bit estimate ~ 2*sqrt(c(1-c)/32) <~ 0.18;
    # allow 3 sigma on the mean
    assert sum(errs) / len(errs) <= 3 * 1800


def test_mixture_ess_matches_python_and_bounds(spark):
    from collections import Counter

    srcs = [
        r.source
        for r in load_table(spark, SF, "documents").collect()
        if r.source is not None
    ]
    cnt = Counter(srcs)
    nn = len(srcs)
    tw = {s: (c / nn) ** 0.75 for s, c in cnt.items()}
    z = sum(tw.values())
    r_micro = {
        s: math.floor((tw[s] / z) / (cnt[s] / nn) * 1000000 + 0.5)
        for s in cnt
    }
    s1 = sum(cnt[s] * r_micro[s] for s in cnt)
    s2 = sum(cnt[s] * r_micro[s] ** 2 for s in cnt)
    want = math.floor(s1 * 1.0 * s1 / (s2 * 1.0 * nn) * 10000 + 0.5)
    row = REGISTRY["mixture_ess_audit"].fn(spark, SF).collect()[0]
    assert (row.n_docs, row.n_sources) == (nn, len(cnt))
    assert row.min_r_micro == min(r_micro.values())
    assert row.max_r_micro == max(r_micro.values())
    assert row.ess_permyriad == want
    # ESS is a fraction of N: (0, 1] in permyriad
    assert 0 < row.ess_permyriad <= 10000


def test_neyman_allocation_exact_budget_and_python_mirror(spark):
    rows = REGISTRY["neyman_allocation"].fn(spark, SF).collect()
    assert rows
    assert sum(r.alloc for r in rows) == 1000
    docs = [
        (r.source, r.n_chars)
        for r in load_table(spark, SF, "documents").collect()
        if r.source is not None and r.n_chars is not None
    ]
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0])
    for s, y in docs:
        a = agg[s]
        a[0] += 1
        a[1] += y
        a[2] += y * y
    w = {}
    for s, (n, s1, s2) in agg.items():
        if n < 2:
            w[s] = 0
        else:
            w[s] = math.floor(
                n * math.sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1)))
                * 1000000 + 0.5
            )
    wt = sum(w.values())
    floor_a = {s: 1000 * w[s] // wt for s in w}
    rem = {s: 1000 * w[s] % wt for s in w}
    k = 1000 - sum(floor_a.values())
    order = sorted(w, key=lambda s: (-rem[s], s))
    want = {
        s: floor_a[s] + (1 if order.index(s) < k else 0) for s in w
    }
    got = {r.source: (r.n_docs, r.w_micro, r.alloc) for r in rows}
    assert got == {s: (agg[s][0], w[s], want[s]) for s in w}
    # Neyman dominates proportional: bigger-variance strata get more
    # than proportional share iff their S_h exceeds the pooled mean
    # (sanity: allocations track weights monotonically)
    by_w = sorted(rows, key=lambda r: r.w_micro)
    allocs = [r.alloc for r in by_w]
    assert all(b - a >= -1 for a, b in zip(allocs, allocs[1:]))
