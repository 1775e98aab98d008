"""Semantic invariants for wave 76 (cross-doc repetition, Welch t)."""

from __future__ import annotations

import math
from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_cross_doc_repetition_planted(spark):
    import mapreduce6240project_spark.plans.text_corpus as w76

    shared = "the quick brown fox jumps"
    docs = spark.createDataFrame(
        [
            (1, shared + " over one lazy dog"),
            (2, shared + " under two lazy dogs"),
            (3, "nothing in common at all here"),
        ],
        "doc_id long, text string",
    )
    with mock.patch.object(w76, "load_table", lambda s, d, n: docs):
        rows = {
            r.doc_id: r
            for r in w76.q_cross_doc_repetition(spark, SF).collect()
        }
    # docs 1 and 2 share the 3 shingles of the 5-token lead; doc 3
    # shares nothing.
    assert rows[3].n_shared == 0 and rows[3].shared_pm == 0
    assert rows[1].n_shared == 3 and rows[2].n_shared == 3
    assert rows[1].shared_pm == 3 * 10000 // rows[1].n_shingles


def test_cross_doc_repetition_bounds(spark):
    rows = REGISTRY["cross_doc_repetition"].fn(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r.n_shared <= r.n_shingles
        assert 0 <= r.shared_pm <= 10000


def test_welch_t_matches_closed_form(spark):
    import mapreduce6240project_spark.plans.text_corpus as w76

    # user parity defines cohorts; values chosen with clear separation
    rows = [(0, 1.0), (2, 2.0), (4, 3.0), (1, 10.0), (3, 12.0), (5, 14.0)]
    ev = spark.createDataFrame(rows, "user_id long, value double")
    with mock.patch.object(w76, "load_table", lambda s, d, n: ev):
        r = w76.q_welch_t_value(spark, SF).collect()[0]
    a = [100, 200, 300]  # cents
    b = [1000, 1200, 1400]
    ma, mb = sum(a) / 3, sum(b) / 3
    va = sum((x - ma) ** 2 for x in a) / 2
    vb = sum((x - mb) ** 2 for x in b) / 2
    t = (ma - mb) / math.sqrt(va / 3 + vb / 3)
    assert r.t_milli == math.floor(t * 1000)
    assert r.n_a == 3 and r.n_b == 3


def test_welch_t_real_data_is_small(spark):
    # Parity cohorts are arbitrary: |t| should be modest on real data.
    r = REGISTRY["welch_t_value"].fn(spark, SF).collect()[0]
    assert abs(r.t_milli) < 5000  # |t| < 5
    assert r.n_a + r.n_b == 1000
