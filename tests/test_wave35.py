"""Semantic invariants for wave 35 (skip-gram pairs, bigram coverage,
trigram novelty) on planted toy corpora where the answers are countable
by hand."""

from __future__ import annotations

from mapreduce6240project_spark.operators.curation import (
    bigram_coverage,
    skipgram_pairs_topk,
    trigram_novelty,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_skipgram_window_membership(spark):
    # "a b c d": +-2 pairs of 'b' are a (x2-dir), c, d -> after mirroring
    # every unordered pair within distance 2 appears in both directions.
    out = skipgram_pairs_topk(_docs(spark, [(1, "a b c d")]), window=2, k=100)
    got = {(r.center, r.context): r.n for r in out.collect()}
    # distance-1: (a,b) (b,c) (c,d); distance-2: (a,c) (b,d) -- mirrored
    expect = {}
    for a, b in [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d")]:
        expect[(a, b)] = 1
        expect[(b, a)] = 1
    assert got == expect


def test_skipgram_counts_accumulate_across_docs(spark):
    out = skipgram_pairs_topk(
        _docs(spark, [(1, "x y"), (2, "x y"), (3, "y x")]), window=2, k=10
    )
    got = {(r.center, r.context): r.n for r in out.collect()}
    # each doc contributes one adjacent pair, mirrored
    assert got == {("x", "y"): 3, ("y", "x"): 3}


def test_bigram_coverage_percent(spark):
    # "a b" occurs twice corpus-wide (docs 1, 2); "b c" once.
    out = bigram_coverage(
        _docs(spark, [(1, "a b c"), (2, "a b")]), min_count=2
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_bigrams == 2 and by_id[1].n_common == 1
    assert by_id[1].coverage_pct == 50  # 100 * 1 div 2
    assert by_id[2].n_bigrams == 1 and by_id[2].n_common == 1
    assert by_id[2].coverage_pct == 100


def test_bigram_coverage_drops_short_docs(spark):
    out = bigram_coverage(_docs(spark, [(1, "solo"), (2, "a b")])).collect()
    assert {r.doc_id for r in out} == {2}


def test_trigram_novelty_first_doc_wins(spark):
    # doc 1 introduces "a b c"; doc 2 repeats it and adds "b c d".
    out = trigram_novelty(
        _docs(spark, [(1, "a b c"), (2, "a b c d")])
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_tri == 1 and by_id[1].n_novel == 1
    assert by_id[2].n_tri == 2 and by_id[2].n_novel == 1


def test_trigram_novelty_within_doc_dedup(spark):
    # the repeated trigram inside one doc counts once (distinct)
    out = trigram_novelty(_docs(spark, [(7, "a b c a b c a b c")])).collect()
    # trigrams: {a b c, b c a, c a b} each repeated -> 3 distinct, all novel
    assert out[0].n_tri == 3 and out[0].n_novel == 3
