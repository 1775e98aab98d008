"""Semantic invariants for wave 82 (Poisson bootstrap, sentence stats,
Lorenz deciles)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_bootstrap_replicates_shape(spark):
    rows = REGISTRY["bootstrap_mean_value"].fn(spark, SF).collect()
    assert len(rows) == 20
    assert sorted(r.replicate for r in rows) == list(range(20))
    means = [r.mean_c for r in rows]
    for r in rows:
        # Poisson(1) weights: n_eff concentrates near N=1000
        assert 800 <= r.n_eff <= 1200
    # replicates differ (hash-driven) but stay near the plain mean
    assert len(set(means)) > 1
    spread = max(means) - min(means)
    assert spread < max(means) * 0.5


def test_bootstrap_weights_match_poisson_mass(spark):
    """Weight frequencies across all (row, replicate) draws should be
    close to Poisson(1) pmf: ~36.8% zeros, ~36.8% ones."""
    from pyspark.sql import functions as F

    import mapreduce6240project_spark.plans.text_corpus as w82
    from mapreduce6240project_spark.functions.hashing import hash60
    from mapreduce6240project_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").select(
        F.col("event_id").cast("string").alias("eid")
    )
    r = ev.select(
        "eid", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("b")
    ).select(
        hash60(
            F.concat(F.col("eid"), F.lit(":"), F.col("b").cast("string"))
        ).alias("h")
    )
    w = r.withColumn("wt", F.expr(w82._W_SQL))
    freq = {
        row.wt: row.c
        for row in w.groupBy("wt").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    total = sum(freq.values())
    assert total == 20000
    assert abs(freq.get(0, 0) / total - 0.3679) < 0.02
    assert abs(freq.get(1, 0) / total - 0.3679) < 0.02
    assert freq.get(2, 0) / total < 0.22


def test_sentence_stats_planted(spark):
    import mapreduce6240project_spark.plans.text_corpus as w82

    docs = spark.createDataFrame(
        [
            (1, "Hello world. How are you? Fine!", "s1"),
            (2, "One two three.", "s1"),
            (3, "...", "s2"),  # only separators -> zero sentences
            (4, "no terminator here", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    with mock.patch.object(w82, "load_table", lambda s, d, n: docs):
        out = {
            r.source: (
                r.n_sentences,
                r.n_words,
                r.words_per_sentence_pm,
                r.max_sentence_words,
            )
            for r in w82.q_sentence_stats_source(spark, SF).collect()
        }
    # s1: "hello world"(2) "how are you"(3) "fine"(1) "one two three"(3)
    assert out["s1"] == (4, 9, 22500, 3)
    # s2: doc 3 vanishes, doc 4 is one unterminated sentence of 3 words
    assert out["s2"] == (1, 3, 30000, 3)


def test_sentence_stats_real_data(spark):
    rows = REGISTRY["sentence_stats_source"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_sentences >= 1
        assert r.max_sentence_words * r.n_sentences >= r.n_words


def test_lorenz_monotone_and_complete(spark):
    rows = sorted(
        REGISTRY["lorenz_deciles"].fn(spark, SF).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    # revenue per decile is non-decreasing (sorted ascending by revenue)
    revs = [r.revenue_c for r in rows]
    assert revs == sorted(revs)
    cums = [r.cum_share_pm for r in rows]
    assert cums == sorted(cums)
    assert 9990 <= cums[-1] <= 10000  # floor rounding
    # concentration: top decile share > bottom decile share
    assert rows[-1].share_pm > rows[0].share_pm
