"""Semantic invariants for wave 97 (edge triangle support, QTE)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_edge_support_consistent_with_triangle_count(spark):
    """Sum of per-edge supports = 3 * total triangles (every triangle
    contributes one support unit to each of its three edges), checked
    against an adjacency-set brute force."""
    rows = REGISTRY["edge_triangle_support"].fn(spark, SF).collect()
    assert rows
    edges = {(r.id_a, r.id_b) for r in rows}
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {
        (a, b): len(adj[a] & adj[b]) for a, b in edges
    }
    got = {(r.id_a, r.id_b): r.tri_support for r in rows}
    assert got == want
    n_tri = sum(
        1
        for a, b in edges
        for z in adj[a] & adj[b]
        if a < b < z
    )
    assert sum(got.values()) == 3 * n_tri
    for r in rows:
        assert r.in_truss4 == (1 if r.tri_support >= 2 else 0)


def test_qte_matches_bruteforce_quantiles(spark):
    ev = (
        load_table(spark, SF, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "click")
        )
        .select("event_type", "value")
        .collect()
    )
    arms = {1: [], 0: []}
    for r in ev:
        arms[1 if r.event_type == "purchase" else 0].append(
            math.floor(r.value * 100 + 0.5)
        )

    def q(vals, d):
        vals = sorted(vals)
        tw = len(vals)
        cw = 0
        seen = 0
        # lower quantile over the value histogram: min v with cum*10 >= d*tw
        from collections import Counter

        for v, c in sorted(Counter(vals).items()):
            seen += c
            if seen * 10 >= d * tw:
                return v
        return vals[-1]

    got = {
        r.decile: (r.q_treat_cents, r.q_ctrl_cents, r.qte_cents)
        for r in REGISTRY["qte_deciles"].fn(spark, SF).collect()
    }
    assert sorted(got) == list(range(1, 10))
    for d in range(1, 10):
        qt, qc = q(arms[1], d), q(arms[0], d)
        assert got[d] == (qt, qc, qt - qc)
    # quantiles are monotone in the decile
    ts = [got[d][0] for d in range(1, 10)]
    cs = [got[d][1] for d in range(1, 10)]
    assert ts == sorted(ts) and cs == sorted(cs)


def test_split_leakage_counts_reconcile(spark):
    """Every Jaccard>=0.5 pair lands in exactly one split-pair bucket;
    the is_leak flag marks exactly the off-diagonal rows."""
    from mapreduce6240project_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, SF, "documents")
    n_pairs_total = (
        ngram_jaccard_pairs(docs, threshold=0.5).select("id_a", "id_b").count()
    )
    rows = REGISTRY["split_leakage_audit"].fn(spark, SF).collect()
    assert rows
    assert sum(r.n_pairs for r in rows) == n_pairs_total
    for r in rows:
        assert r.split_a <= r.split_b
        assert r.is_leak == (1 if r.split_a != r.split_b else 0)
    # the planted near-dup corpus must exhibit some cross-split pairs
    # at the 80/10/10 split (probabilistic but extremely safe: pairs
    # land cross-split unless the md5 order conspires for every pair)
    assert any(r.is_leak == 1 for r in rows)


# --- wave 98 -----------------------------------------------------------


def test_wasserstein_matches_bruteforce(spark):
    ev = (
        load_table(spark, SF, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "click")
        )
        .select("event_type", "value")
        .collect()
    )
    a = sorted(
        math.floor(r.value * 100 + 0.5) for r in ev if r.event_type == "purchase"
    )
    b = sorted(
        math.floor(r.value * 100 + 0.5) for r in ev if r.event_type == "click"
    )
    grid = sorted(set(a) | set(b))
    ta, tb = len(a), len(b)
    import bisect

    num = 0
    for v, nxt in zip(grid, grid[1:]):
        cwa = bisect.bisect_right(a, v)
        cwb = bisect.bisect_right(b, v)
        num += abs(cwa * tb - cwb * ta) * (nxt - v)
    r = REGISTRY["wasserstein_value_gap"].fn(spark, SF).collect()[0]
    assert (r.n_treat, r.n_ctrl, r.w1_num) == (ta, tb, num)
    assert r.w1_cents == num // (ta * tb)
    # W1 in cents must also equal the classic quantile-coupling form
    # (within truncation): sanity bound against the mean gap
    mean_gap = abs(sum(a) // ta - sum(b) // tb)
    assert r.w1_cents >= mean_gap - 1  # W1 >= |mean difference|


def test_bh_fdr_monotone_and_exact_pvalues(spark):
    rows = REGISTRY["bh_fdr_type_gaps"].fn(spark, SF).collect()
    assert rows
    by_rank = sorted(rows, key=lambda r: r.rank_i)
    ps = [r.p_num for r in by_rank]
    assert ps == sorted(ps)
    assert all(r.p_den == 21 for r in rows)
    assert all(1 <= r.p_num <= 21 for r in rows)
    # BH step-up: the rejection set is exactly ranks 1..imax where imax
    # is the largest i with p_(i) <= q*i/K (q=0.25)
    kk = len(rows)
    ok = [r.rank_i for r in by_rank if r.p_num * kk * 4 <= r.rank_i * r.p_den]
    imax = max(ok) if ok else 0
    for r in rows:
        assert r.rejected == (1 if r.rank_i <= imax else 0)


# --- wave 99 -----------------------------------------------------------


def test_f1_sweep_confusion_reconciles_and_best_is_argmax(spark):
    rows = REGISTRY["f1_threshold_sweep"].fn(spark, SF).collect()
    assert len(rows) == 10
    n_users = {r.tp + r.fp + r.fn for r in rows if r.cut_micro == 0}
    for r in rows:
        if r.tp + r.fp > 0:
            assert r.prec_micro == r.tp * 1000000 // (r.tp + r.fp)
        if r.tp + r.fn > 0:
            assert r.rec_micro == r.tp * 1000000 // (r.tp + r.fn)
        if 2 * r.tp + r.fp + r.fn > 0:
            assert r.f1_micro == 2 * r.tp * 1000000 // (2 * r.tp + r.fp + r.fn)
    # cut 0 keeps every user positive: recall = 1
    r0 = next(r for r in rows if r.cut_micro == 0)
    assert r0.fn == 0 and (r0.rec_micro == 1000000 or r0.tp == 0)
    # exact argmax with smallest-cut tie-break
    def f1_frac(r):
        den = 2 * r.tp + r.fp + r.fn
        return (2 * r.tp, den if den else 1)

    best = min(
        (r for r in rows),
        key=lambda r: (-(f1_frac(r)[0] / f1_frac(r)[1]), r.cut_micro),
    )
    assert [r.cut_micro for r in rows if r.is_best == 1] == [best.cut_micro]
    assert n_users  # monotone positives: tp+fp shrinks as cut grows
    by_cut = sorted(rows, key=lambda r: r.cut_micro)
    pos = [r.tp + r.fp for r in by_cut]
    assert pos == sorted(pos, reverse=True)


def test_stump_split_matches_bruteforce_gini(spark):
    li = (
        load_table(spark, SF, "lineitem")
        .filter(
            F.col("l_discount").isNotNull() & F.col("l_returnflag").isNotNull()
        )
        .select("l_discount", "l_returnflag")
        .collect()
    )
    cells: dict[int, list] = {}
    for r in li:
        b = math.floor(r.l_discount * 100 + 0.5)
        rec = cells.setdefault(b, [0, 0])
        rec[0] += 1
        rec[1] += r.l_returnflag == "R"
    nt = sum(v[0] for v in cells.values())
    rt = sum(v[1] for v in cells.values())

    def gini_micro(rr, nn):
        if nn == 0:
            return 0
        p1 = rr * 1.0 / nn
        p0 = (nn - rr) * 1.0 / nn
        return math.floor((1.0 - p1 * p1 - p0 * p0) * 1000000 + 0.5)

    want = {}
    for s in range(1, 10):
        nl = sum(v[0] for b, v in cells.items() if b < s)
        rl = sum(v[1] for b, v in cells.items() if b < s)
        nr, rr = nt - nl, rt - rl
        gl, gr = gini_micro(rl, nl), gini_micro(rr, nr)
        want[s] = (nl, rl, nr, rr, gl, gr, (nl * gl + nr * gr) // (nl + nr))
    got = {
        r.split_bin: (
            r.nl,
            r.rl,
            r.nr,
            r.rr,
            r.gini_l_micro,
            r.gini_r_micro,
            r.weighted_micro,
        )
        for r in REGISTRY["stump_split_gain"].fn(spark, SF).collect()
    }
    assert got == want
    mw = min(v[6] for v in want.values())
    best = min(s for s, v in want.items() if v[6] == mw)
    flags = [
        r.split_bin
        for r in REGISTRY["stump_split_gain"].fn(spark, SF).collect()
        if r.is_best == 1
    ]
    assert flags == [best]
