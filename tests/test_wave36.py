"""Semantic invariants for wave 36 (phrase retrieval, matryoshka recall,
kNN graph) on planted inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.retrieval import phrase_match
from mapreduce6240project_spark.operators.similarity import (
    knn_graph,
    matryoshka_recall,
)


def test_phrase_match_counts_occurrences(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick fox and the quick fox again"),
            (2, "quick fox"),
            (3, "the fox quick"),  # tokens present, order wrong
            (4, "the quick"),  # incomplete phrase
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_occurrences for r in phrase_match(docs, "the quick fox").collect()}
    assert out == {1: 2}


def test_phrase_match_single_term(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b")], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_occurrences for r in phrase_match(docs, "a").collect()}
    assert out == {1: 2}


def test_matryoshka_recall_perfect_when_prefix_decides(spark):
    # vectors differ only in the first 2 dims -> 2-dim prefix ranking
    # equals the full ranking, recall 100
    rows = [(i, [float(i + 1), float(i % 3), 0.0, 0.0]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = matryoshka_recall(emb, [1.0, 0.5, 0.0, 0.0], prefix_dims=2, k=5).collect()[0]
    assert out.k == 5 and out.n_overlap == 5 and out.recall_pct == 100


def test_knn_graph_shape_and_symmetric_sims(spark):
    rows = [(i, [float((i * 7) % 5 + 1), float((i * 3) % 4 + 1), 1.0]) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    g = knn_graph(emb, k=3, n_cells=2)
    rowsg = g.collect()
    # rank bounded by k, no self loops
    assert all(1 <= r.rank <= 3 for r in rowsg)
    assert all(r.src != r.nbr for r in rowsg)
    # per-source ranks are 1..m without gaps
    per = {}
    for r in rowsg:
        per.setdefault(r.src, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    # cos_sim is a valid cosine
    assert all(-1.0001 <= r.cos_sim <= 1.0001 for r in rowsg)


def test_knn_graph_ranks_by_similarity(spark):
    # one cell (n_cells=1): exact neighbors; nearest of [1,0] is [2,0]
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [2.0, 0.0]),  # cos = 1 with vec 0
            (2, [1.0, 1.0]),  # cos ~ .707
            (3, [0.0, 1.0]),  # cos = 0
        ],
        "vec_id long, embedding array<float>",
    )
    g = {(r.src, r.rank): r.nbr for r in knn_graph(emb, k=3, n_cells=1).collect()}
    assert g[(0, 1)] == 1 and g[(0, 2)] == 2 and g[(0, 3)] == 3
