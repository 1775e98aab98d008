"""Semantic invariants for wave 91 (uncertainty sampling, label
conflicts, exact quartiles)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_margin_selects_ambiguous(spark):
    import mapreduce6240project_spark.plans.curation_ext as w91

    # two tight clusters on the axes plus one vector on the diagonal:
    # the diagonal vector is equidistant from both centroids -> the
    # smallest margin
    rows = [(i, [1.0, 0.0], 0) for i in range(5)]
    rows += [(10 + i, [0.0, 1.0], 1) for i in range(5)]
    rows.append((99, [0.7071, 0.7071], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    with mock.patch.object(w91, "load_table", lambda s, d, n: emb):
        out = w91.q_active_learning_margin(spark, SF).collect()
    assert out[0].vec_id == 99
    assert out[0].margin_micro < 200000  # near-ambiguous
    assert all(r.margin_micro >= 0 for r in out)


def test_margin_real_data(spark):
    rows = REGISTRY["active_learning_margin"].fn(spark, SF).collect()
    assert len(rows) == 20
    margins = [r.margin_micro for r in rows]
    assert margins == sorted(margins)
    assert all(m >= 0 for m in margins)


def test_label_conflicts_planted(spark):
    import mapreduce6240project_spark.plans.curation_ext as w91

    docs = spark.createDataFrame(
        [
            (1, "Hello  World", "en"),
            (2, "hello world", "de"),  # same normalized text, new label
            (3, "hello world", "en"),
            (4, "unique text", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    with mock.patch.object(w91, "load_table", lambda s, d, n: docs):
        rows = w91.q_lang_label_conflicts(spark, SF).collect()
    assert len(rows) == 1
    assert rows[0].n_docs == 3 and rows[0].n_labels == 2


def test_quartiles_ordering(spark):
    rows = REGISTRY["value_quartiles_by_type"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.p25_c <= r.p50_c <= r.p75_c
        assert r.n_events > 0


def test_quartiles_planted_exact(spark):
    import mapreduce6240project_spark.plans.curation_ext as w91

    # values 1..100 cents -> p25 = 25, p50 = 50, p75 = 75 under the
    # ceil(q*n) cumulative definition
    ev = spark.createDataFrame(
        [(i, "a", i / 100.0) for i in range(1, 101)],
        "event_id long, event_type string, value double",
    )
    with mock.patch.object(w91, "load_table", lambda s, d, n: ev):
        r = w91.q_value_quartiles_by_type(spark, SF).collect()[0]
    assert (r.p25_c, r.p50_c, r.p75_c) == (25, 50, 75)
