"""Semantic invariants for wave 31 (inverted index, token budgets,
k-core)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.dedup import tokens
from mapreduce6240project_spark.operators.graph import kcore
from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.plans.retrieval import (
    _BUDGET_TOKENS,
    _MIN_DF,
    _POSTING_CAP,
)
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_inverted_index_brute_force(spark):
    rows = REGISTRY["inverted_index_top100"].fn(spark, SF).collect()
    docs = (
        load_table(spark, SF, "documents")
        .select("doc_id", tokens("text").alias("toks"))
        .collect()
    )
    postings = defaultdict(set)
    for r in docs:
        for t in set(r.toks):
            postings[t].add(r.doc_id)
    assert rows, "expected indexed terms"
    got_terms = set()
    for r in rows:
        got_terms.add(r.term)
        want_ids = sorted(postings[r.term])
        assert r.df == len(want_ids)
        assert r.df >= _MIN_DF
        assert r.postings == ",".join(
            str(i) for i in want_ids[:_POSTING_CAP]
        )
    # ranking: every returned term's df >= every omitted qualifying
    # term's df (the top-terms cut keeps the most frequent)
    if len(rows) == 100:
        min_kept = min(r.df for r in rows)
        omitted = [
            len(ids)
            for t, ids in postings.items()
            if t not in got_terms and len(ids) >= _MIN_DF
        ]
        assert all(d <= min_kept for d in omitted)


def test_token_budget_admission(spark):
    rows = REGISTRY["token_budget_docs"].fn(spark, SF).collect()
    docs = (
        load_table(spark, SF, "documents")
        .select("lang", "doc_id", F.size(tokens("text")).alias("n_tok"))
        .collect()
    )

    def pri(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)

    by_lang = defaultdict(list)
    for r in docs:
        by_lang[r.lang].append((pri(r.doc_id), r.doc_id, r.n_tok))
    want = []
    for lang, items in by_lang.items():
        cum = 0
        for _, doc_id, n_tok in sorted(items):
            if cum < _BUDGET_TOKENS:
                want.append((lang, doc_id, n_tok, cum + n_tok))
            cum += n_tok
    assert sorted((r.lang, r.doc_id, r.n_tok, r.cum_tok) for r in rows) == sorted(
        want
    )
    # budget semantics: per lang, the total admitted is >= budget (or
    # the lang ran out of docs) and the overshoot is < one document
    admitted = defaultdict(list)
    for r in rows:
        admitted[r.lang].append(r)
    for lang, rs in admitted.items():
        total = sum(r.n_tok for r in rs)
        lang_total = sum(n for _, _, n in by_lang[lang])
        if total < _BUDGET_TOKENS:
            assert total == lang_total  # exhausted the stratum
        else:
            assert total - max(r.n_tok for r in rs) < _BUDGET_TOKENS


def test_kcore_invariants(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {(r.node, r.core_deg) for r in kcore(df, k=3).collect()}
    # {1,2,3,4} is the 3-core (K4); 5 and 6 peel away
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}
    # k larger than any degree -> empty core
    assert kcore(df, k=5).count() == 0


def test_kcore_degree_bound(spark):
    from mapreduce6240project_spark.plans.graph_ext import (
        _copurchase_edges_with_pairs,
    )

    _, cp = _copurchase_edges_with_pairs(spark, SF)
    core = kcore(cp, k=3).collect()
    assert all(r.core_deg >= 3 for r in core)
