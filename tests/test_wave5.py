"""Property tests for the wave-5 operators: prefix-filtered similarity
join exactness + pruning, degree-oriented triangle counting, BM25
ranking, RRF fusion, Z-order interleaving, char-LM scoring, and the
decayed rolling feature.  The registry oracle test covers value
parity; these pin the *semantic* claims the oracles can't express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.dedup import (
    jaccard_prefix_pairs,
    ngram_jaccard_pairs,
)
from mapreduce6240project_spark.operators.graph import triangle_count
from mapreduce6240project_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    rrf_fuse,
)
from mapreduce6240project_spark.operators.textstats import charlm_doc_logprob
from mapreduce6240project_spark.operators.windows import decayed_rolling_value
from mapreduce6240project_spark.sources.layout import zorder_key
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# -- prefix-filtered exact similarity join ---------------------------------


def test_prefix_join_equals_exact_join(spark):
    docs = load_table(spark, SF, "documents")
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_prefix_pairs(docs, threshold=0.5).collect()
    }
    want = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert got == want
    assert got, "planted near-dups should produce pairs"


def test_prefix_join_thresholds(spark):
    """Raising the threshold can only shrink the pair set."""
    docs = load_table(spark, SF, "documents")
    lo = {
        (r.id_a, r.id_b)
        for r in jaccard_prefix_pairs(docs, threshold=0.5).collect()
    }
    hi = {
        (r.id_a, r.id_b)
        for r in jaccard_prefix_pairs(docs, threshold=0.9).collect()
    }
    assert hi <= lo


# -- triangle counting -----------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_triangle_count_k4(spark):
    """K4 has C(4,3) = 4 triangles."""
    k4 = _edges(
        spark, [(a, b) for a in range(4) for b in range(a + 1, 4)]
    )
    assert triangle_count(k4).first()["n_triangles"] == 4


def test_triangle_count_path_and_star(spark):
    path = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    assert triangle_count(path).first()["n_triangles"] == 0
    star = _edges(spark, [(0, i) for i in range(1, 6)])
    assert triangle_count(star).first()["n_triangles"] == 0


def test_triangle_count_two_sharing_edge(spark):
    """Two triangles sharing edge (1,2)."""
    g = _edges(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
    assert triangle_count(g).first()["n_triangles"] == 2


# -- BM25 ------------------------------------------------------------------


@pytest.fixture(scope="module")
def toy_docs(spark):
    rows = [
        (0, "join join join hash"),        # heavy on the query term
        (1, "join hash merge sort"),       # one hit
        (2, "hash merge sort filter sort"),  # no 'join'
        (3, "join"),                       # short doc, high density
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_tf_monotone(toy_docs):
    scores = {
        r.doc_id: r.score_micros
        for r in bm25_scores(toy_docs, ["join"]).collect()
    }
    assert 2 not in scores  # no query term, no row
    assert scores[0] > scores[1]  # higher tf wins at similar length
    assert scores[3] > scores[1]  # shorter doc, same tf -> higher score


def test_bm25_topk_orders_desc(toy_docs):
    top = bm25_topk(toy_docs, ["join", "filter"], k=10).collect()
    vals = [r.score_micros for r in top]
    assert vals == sorted(vals, reverse=True)


# -- RRF -------------------------------------------------------------------


def test_rrf_both_lists_beat_one(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(1, 2), (3, 1)], "doc_id long, rank long")
    got = {r.doc_id: r.rrf_micros for r in rrf_fuse(a, b).collect()}
    # doc 1 in both lists > doc 3 (rank-1 in one list) > doc 2 (rank 2)
    assert got[1] > got[3] > got[2]
    want_doc1 = math.floor((1 / 61 + 1 / 62) * 1e6 + 0.5)
    assert got[1] == want_doc1


# -- Z-order ---------------------------------------------------------------


def _z_ref(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_matches_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 2, 7, 1000)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", zorder_key("x", "y")
    )
    for r in df.collect():
        assert r.z == _z_ref(r.x, r.y), (r.x, r.y)


def test_zorder_locality(spark):
    """Nearby points interleave to nearby keys: the max key within a
    small tile is bounded (tile [0,3]x[0,3] -> keys < 16)."""
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", zorder_key("x", "y")
    )
    keys = sorted(r.z for r in df.collect())
    assert keys == list(range(16))


# -- char-LM quality -------------------------------------------------------


def test_charlm_prefers_corpus_like_text(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)]
    rows.append((100, "the quick brown fox jumps over the lazy dog"))
    rows.append((101, "zq xv qq jzx wqk vvx zzq kjq"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.logprob_micros / r.n_tri
        for r in charlm_doc_logprob(docs).collect()
    }
    assert got[100] > got[101]  # corpus-like text: higher avg logprob


# -- decayed rolling feature ----------------------------------------------


def test_decayed_rolling_hand_computed(spark):
    rows = [
        (1, 10, "2024-01-01 00:00:00", 1.0),
        (2, 10, "2024-01-01 00:01:00", 2.0),
        (3, 10, "2024-01-01 00:02:00", 4.0),
        (4, 20, "2024-01-01 00:00:00", 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.event_id: r.decayed_micros
        for r in decayed_rolling_value(ev, alpha=0.5, depth=8).collect()
    }

    def q(x):
        return math.floor(x * 1e6 + 0.5)

    assert got[1] == q(1.0)
    assert got[2] == q(1.0 * 0.5) + q(2.0)
    assert got[3] == q(1.0 * 0.25) + q(2.0 * 0.5) + q(4.0)
    assert got[4] == q(5.0)
