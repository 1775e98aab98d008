"""Dedup extension tests: planted exact + near duplicates; LSH methods
validated against the exact relational Jaccard ground truth."""

from __future__ import annotations

import pytest

from mapreduce6240project_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # 1-word change -> high jaccard
FAR = (
    "completely different content about spark query engines and columnar "
    "storage formats with vectorized execution and adaptive planning"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),                      # exact dup of 1
        (3, "  " + BASE.upper() + " "),  # normalized dup of 1
        (4, NEAR),                      # near dup of 1
        (5, FAR),
        (6, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup_collapses_normalized(docs):
    out = exact_dedup(docs).collect()
    by_id = {r.doc_id: r.n_copies for r in out}
    assert by_id[1] == 3          # 1, 2, 3 share a fingerprint; min id kept
    assert by_id[4] == 1 and by_id[5] == 1 and by_id[6] == 1


def test_ngram_jaccard_finds_planted_pair(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 4) in pairs and 0.5 < pairs[(1, 4)] < 1.0
    assert (1, 5) not in pairs


def test_minhash_lsh_agrees_with_ground_truth(docs):
    truth = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    lsh = {(r.id_a, r.id_b): r.est_jaccard
           for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # every high-jaccard true pair must be found by LSH at 16 bands
    assert truth <= set(lsh)
    # and the estimate for the planted near pair is in a sane band
    assert lsh[(1, 4)] > 0.5
    # no false positive between unrelated docs
    assert (1, 5) not in lsh and (5, 6) not in lsh


def test_minhash_dedup_survivors(docs):
    survivors = {r.doc_id for r in minhash_dedup(docs, threshold=0.5).collect()}
    assert 1 in survivors          # lowest id of the dup cluster survives
    assert 2 not in survivors and 3 not in survivors and 4 not in survivors
    assert {5, 6} <= survivors


def test_simhash_near_pairs(docs):
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0   # identical token sets
    assert (1, 4) in pairs and pairs[(1, 4)] <= 10     # near dup, small hamming
    assert (1, 5) not in pairs


def test_winnow_fingerprints_detect_shared_substring(spark, docs):
    from mapreduce6240project_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    fps = {r.doc_id: set(r.fingerprints) for r in winnow_fingerprints(docs).collect()}
    # identical normalized texts -> identical fingerprint sets
    assert fps[1] == fps[2] == fps[3]
    # near dup shares most fingerprints; unrelated shares none
    assert len(fps[1] & fps[4]) / len(fps[1] | fps[4]) > 0.5
    assert not (fps[1] & fps[5])
    # winnowing guarantee: every doc has at least one fingerprint
    assert all(len(v) >= 1 for v in fps.values())

    pairs = {(r.id_a, r.id_b): r.overlap
             for r in winnow_overlap_pairs(docs, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0 and (1, 4) in pairs and (1, 5) not in pairs


def test_paragraph_dedup_removes_shared_span(spark):
    from mapreduce6240project_spark.operators.dedup import dedup_paragraphs

    span = " ".join(f"w{i}" for i in range(10))  # one exact 10-token chunk
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, f"{span} {uniq_a}"), (2, f"{span} {uniq_b}")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}
    # doc 1 (first occurrence) keeps both chunks; doc 2 loses the span
    assert out[1].n_kept_chunks == 2 and out[1].dedup_text == f"{span} {uniq_a}"
    assert out[2].n_kept_chunks == 1 and out[2].dedup_text == uniq_b


def test_paragraph_dedup_short_doc_single_chunk(spark):
    from mapreduce6240project_spark.operators.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [(1, "only three words")], "doc_id bigint, text string"
    )
    r = dedup_paragraphs(docs).first()
    assert r.n_kept_chunks == 1 and r.dedup_text == "only three words"


# ---------------------------------------------------------------------------
# hot-band skew: identical-text masses (round-3 verdict item 2)
# ---------------------------------------------------------------------------


def test_candidate_pairs_collapse_equals_naive(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from mapreduce6240project_spark.operators.dedup import minhash_candidate_pairs

    naive = sorted(
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(docs, collapse_identical=False).collect()
    )
    coll = sorted(
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(docs, collapse_identical=True).collect()
    )
    assert coll == naive and len(coll) > 0


def test_lsh_pairs_collapse_est_jaccard_parity(docs):
    # est-Jaccard values (carried signatures) must survive the collapse
    # + expansion path unchanged, including the swap orientation
    naive = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.0, collapse_identical=False).collect()
    }
    coll = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.0, collapse_identical=True).collect()
    }
    assert coll == naive


def test_identical_mass_no_quadratic_bucket(spark):
    # 10k byte-identical docs + 3 distinct: the banded join must see ONE
    # row per band bucket for the identical mass (representatives), with
    # the m^2/2 pair set produced only by the salted expansion.  The
    # naive path would put all ~50M pairs in a single join task.
    from mapreduce6240project_spark.operators.dedup import minhash_candidate_pairs

    m = 10_000
    rows = [(i, BASE) for i in range(m)] + [
        (m + 1, NEAR),
        (m + 2, FAR),
        (m + 3, "tiny"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cand = minhash_candidate_pairs(docs)
    n_pairs = cand.count()
    # all within-mass pairs, plus NEAR pairing with every BASE copy
    # (identical signatures -> identical band collisions)
    assert n_pairs >= m * (m - 1) // 2
    within_expected = m * (m - 1) // 2
    near_cross = cand.filter("id_b = 10001").count()
    assert n_pairs == within_expected + near_cross
    assert near_cross in (0, m)  # NEAR collides with all copies or none


def test_identical_mass_survivors(spark):
    from mapreduce6240project_spark.operators.dedup import (
        minhash_dedup,
        release_dedup_caches,
    )

    m = 500
    rows = [(i, BASE) for i in range(m)] + [(m + 1, FAR), (m + 2, "tiny")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    survivors = sorted(r.doc_id for r in minhash_dedup(docs, threshold=0.5).collect())
    assert survivors == [0, m + 1, m + 2]
    assert release_dedup_caches() > 0


def test_release_dedup_caches_empties_tracker(docs):
    from mapreduce6240project_spark.operators import dedup as D

    D.minhash_candidate_pairs(docs).count()
    assert len(D._live_caches) > 0
    D.release_dedup_caches()
    assert len(D._live_caches) == 0
