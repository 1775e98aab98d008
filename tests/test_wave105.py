"""Semantic invariants for wave 105 (txlog change feed, prefix-cache
planning, sharded-dedup consistency, RM3 query expansion) -- each
query checked against a pure-Python brute force at sf0.001."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.lower()).strip()


def _docs(spark):
    return [
        (r.doc_id, _norm(r.text))
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    ]


def test_txlog_changes_matches_set_diff(spark):
    """The file-delta change feed must equal the brute-force snapshot
    diff: inserts = new images of surviving merged keys, deletes =
    pre-merge images of every touched key."""
    rows = REGISTRY["txlog_changes_cdf"].fn(spark, SF).collect()
    base = [
        (r.k, r.status, r.cents)
        for r in load_table(spark, SF, "orders")
        .filter(
            F.col("o_orderkey").isNotNull()
            & F.col("o_orderstatus").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
        )
        .collect()
    ]
    ins = Counter()
    dels = Counter()
    for k, status, cents in base:
        if k % 7 == 0 and k % 13 != 0:
            ins["X"] += 1
        if k % 7 == 0 or k % 13 == 0:
            dels[status] += 1
    got_ins = {r.status: r.n_rows for r in rows if r.change_type == "insert"}
    got_del = {r.status: r.n_rows for r in rows if r.change_type == "delete"}
    assert got_ins == dict(ins)
    assert got_del == dict(dels)
    # cents conservation on the insert side: each new image is +1 cent
    ins_cents = sum(
        cents + 1
        for k, _, cents in base
        if k % 7 == 0 and k % 13 != 0
    )
    assert sum(r.sum_cents for r in rows if r.change_type == "insert") == ins_cents


def test_prefix_cache_savings_bruteforce(spark):
    rows = REGISTRY["prefix_cache_savings"].fn(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    groups: dict[str, list[int]] = {}
    total = 0
    for _, text in _docs(spark):
        w = text.split(" ")
        total += len(w)
        p = " ".join(w[:8])
        groups.setdefault(p, []).append(min(len(w), 8))
    multi = {p: v for p, v in groups.items() if len(v) >= 2}
    saved = sum((len(v) - 1) * v[0] for v in multi.values())
    assert r.n_groups == len(multi)
    assert r.n_docs_covered == sum(len(v) for v in multi.values())
    assert r.tokens_saved == saved
    assert r.total_tokens == total
    assert r.savings_ppm == saved * 1000000 // total


def test_dedup_shard_consistency_bruteforce(spark):
    import hashlib

    rows = REGISTRY["dedup_shard_consistency"].fn(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    fps = [
        hashlib.md5(text.encode()).hexdigest() for _, text in _docs(spark)
    ]
    shards: dict[int, set] = {}
    for fp in fps:
        s = int(hashlib.md5(fp.encode()).hexdigest()[:15], 16) % 8
        shards.setdefault(s, set()).add(fp)
    locals_ = [len(v) for v in shards.values()]
    assert r.n_docs == len(fps)
    assert r.n_distinct_global == len(set(fps))
    assert r.sum_local_distinct == sum(locals_)
    assert r.n_shards == len(shards)
    assert r.max_shard_distinct == max(locals_)
    assert r.min_shard_distinct == min(locals_)
    assert bool(r.shards_compose) is True
    # the consistency claim itself, independently of the query
    assert sum(locals_) == len(set(fps))


def test_rm3_matches_bruteforce(spark):
    """Full two-pass RM3 brute force: BM25 (Lucene idf) on the original
    terms, top-3 feedback docs, top-5 expansion terms, weighted
    re-rank -- micro-quantization replicated per term."""
    K1, B = 1.2, 0.75
    Q = ["join", "filter", "scan"]
    docs = _docs(spark)
    toks = {d: t.split(" ") for d, t in docs}
    nd = len(toks)
    nt = sum(len(w) for w in toks.values())
    avgdl = float(nt) / float(nd)

    def scores(term_weights: dict[str, int]) -> dict[int, int]:
        tf: dict[tuple[int, str], int] = Counter()
        for d, w in toks.items():
            for t in w:
                if t in term_weights:
                    tf[(d, t)] += 1
        dfreq = Counter(t for (_, t) in tf)
        out: dict[int, int] = Counter()
        for (d, t), f_ in tf.items():
            idf = math.log(
                1.0 + (float(nd) - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            )
            dl = len(toks[d])
            denom = float(f_) + K1 * ((1.0 - B) + B * float(dl) / avgdl)
            c = math.floor(idf * float(f_) * (K1 + 1.0) / denom * 1e6 + 0.5)
            out[d] += term_weights[t] * int(c)
        return out

    s1 = scores({t: 1 for t in Q})
    fb = [d for d, _ in sorted(s1.items(), key=lambda kv: (-kv[1], kv[0]))[:3]]
    exp_counts = Counter(
        t for d in fb for t in toks[d] if t not in Q
    )
    exp = [
        t
        for t, _ in sorted(exp_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    ]
    weights = {t: 2 for t in Q}
    weights.update({t: 1 for t in exp})
    s2 = scores(weights)
    want = sorted(s2.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r.doc_id, r.rm3_micros)
        for r in REGISTRY["rm3_expansion_top10"].fn(spark, SF).collect()
    ]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == want


def test_rm3_duplicate_query_terms_are_deduped(spark):
    """A duplicated query term must not fan out the pass-2 joins
    (review finding): scores with ['join','join','filter','scan']
    equal scores with the deduped list."""
    from mapreduce6240project_spark.operators.retrieval import (
        rm3_expansion_topk,
    )

    docs = load_table(spark, SF, "documents")
    a = {
        (r.doc_id, r.rm3_micros)
        for r in rm3_expansion_topk(
            docs, ["join", "join", "filter", "scan"], k=10
        ).collect()
    }
    b = {
        (r.doc_id, r.rm3_micros)
        for r in rm3_expansion_topk(
            docs, ["join", "filter", "scan"], k=10
        ).collect()
    }
    assert a == b
