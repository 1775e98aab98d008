"""Semantic invariants for wave 37 (bigram LM, char-trigram LID)."""

from __future__ import annotations

from mapreduce6240project_spark.operators.textstats import (
    bigram_lm_continuations,
    chartrigram_lang_id,
)


def test_bigram_lm_add_one_arithmetic(spark):
    # corpus: "a b", "a b", "a c" -> context 'a': c(b)=2, c(c)=1, c1=3;
    # vocab = {a, b, c} -> V=3
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    rows = bigram_lm_continuations(docs, "a", k=10).collect()
    got = {r.next_tok: (r.c12, r.prob_micro) for r in rows}
    # P(b|a) = (2+1)/(3+3) = 0.5 -> 500000; P(c|a) = (1+1)/6 -> 333333
    assert got == {"b": (2, 500_000), "c": (1, 333_333)}
    # ordering: higher count first
    assert [r.next_tok for r in rows] == ["b", "c"]


def test_bigram_lm_absent_context_empty(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert bigram_lm_continuations(docs, "zzz").count() == 0


def test_chartrigram_lid_learns_separable_langs(spark):
    # two "languages" with disjoint alphabets; even ids train, odd test
    rows = []
    for i in range(40):
        if i % 4 < 2:
            rows.append((i, "aaabbbaaabbb", "aa"))
        else:
            rows.append((i, "xxxyyyxxxyyy", "xx"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.lang: (r.n_docs, r.n_correct) for r in
           chartrigram_lang_id(docs, profile_k=5).collect()}
    # disjoint alphabets -> zero cross-profile hits -> perfect accuracy
    assert out["aa"][0] == out["aa"][1] > 0
    assert out["xx"][0] == out["xx"][1] > 0


def test_chartrigram_lid_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(0, "abcdef", "en"), (1, "abcdef", "en"), (3, "ab", "en")],
        "doc_id long, text string, lang string",
    )
    out = chartrigram_lang_id(docs, profile_k=5).collect()
    # doc 3 (2 chars) unclassifiable; doc 1 classified correctly
    assert len(out) == 1 and out[0].n_docs == 1 and out[0].n_correct == 1
