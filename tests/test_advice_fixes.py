"""Planted regressions for the round-3 advice fixes (wave70 isotropy
quantize-before-mean, wave93 heaps guard, analytics decay clamp is in
test_parsing, graph truncation warning is in test_graph)."""

from __future__ import annotations

import pytest


def test_heaps_law_tiny_doc_space(spark, monkeypatch):
    # max(doc_id) < step: sequence() must not throw, and the single
    # guarded checkpoint at 100 must count everything below it
    from mapreduce6240project_spark.plans import stats_drift as wave93

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (7, "alpha")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(wave93, "load_table", lambda s, d, t: docs)
    rows = wave93.q_heaps_law_curve(spark, "ignored").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.cutoff_doc == 100
    assert r.n_tokens == 5  # 2 + 2 + 1
    assert r.n_types == 3  # alpha, beta, gamma


def test_heaps_law_sparse_prefix_emits_zero_rows(spark, monkeypatch):
    # no doc below the first checkpoints: rows must appear with 0s, not
    # be dropped by an inner join (round-3 advice)
    from mapreduce6240project_spark.plans import stats_drift as wave93

    docs = spark.createDataFrame(
        [(250, "alpha beta gamma")], "doc_id long, text string"
    )
    monkeypatch.setattr(wave93, "load_table", lambda s, d, t: docs)
    rows = {r.cutoff_doc: (r.n_tokens, r.n_types)
            for r in wave93.q_heaps_law_curve(spark, "ignored").collect()}
    assert rows[100] == (0, 0)
    assert rows[200] == (0, 0)
    # doc 250 is past cutoff 200; the grid tops out at the guarded
    # greatest(max_doc_id, step) bound of 200 (250 // 100 * 100)
    assert max(rows) == 200


def test_isotropy_integer_centroid(spark, monkeypatch):
    # single vector: centroid equals its quantization, cosine is exactly
    # 1.0 -> mean_cos_micro == 1_000_000 with no float-mean wobble
    from mapreduce6240project_spark.plans import vectors_ext as wave70

    emb = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125, 1.0])], "vec_id long, embedding array<float>"
    )
    monkeypatch.setattr(wave70, "load_table", lambda s, d, t: emb)
    r = wave70.q_isotropy(spark, "ignored").collect()[0]
    assert r.n_vecs == 1
    assert r.mean_cos_micro == 1_000_000
    assert r.n_in_cone == 1
