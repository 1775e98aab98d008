"""Semantics tests for the curation operators (operators/curation.py)
on hand-built fixtures: the synthetic documents table contains no PII
and few exact duplicates, so the registry oracle only proves plumbing;
these pin the actual masking / ratio / split / anti-join behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.operators import curation as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redact_pii_masks_and_counts(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at jane.doe+spam@example.co.uk or call +1 (555) 123-4567"),
            (2, "card 4111111111111111 expires soon"),
            (3, "nothing sensitive here"),
            (4, ""),
        ],
    )
    got = {r.doc_id: r for r in C.redact_pii(df).collect()}
    assert got[1].redacted_text == "mail me at <EMAIL> or call <PHONE>"
    assert got[1].n_redactions == 2
    assert got[2].redacted_text == "card <NUM> expires soon"
    assert got[2].n_redactions == 1
    assert got[3].redacted_text == "nothing sensitive here"
    assert got[3].n_redactions == 0
    assert got[4].n_redactions == 0


def test_repetition_stats_ratios(spark):
    df = _docs(spark, [(1, "a a a a"), (2, "w x y z"), (3, "b b c")])
    got = {r.doc_id: r for r in C.repetition_stats(df).collect()}
    assert (got[1].n_tokens, got[1].n_distinct) == (4, 1)
    assert got[1].dup_ratio == 0.75 and got[1].top_tok_share == 1.0
    assert got[2].dup_ratio == 0.0 and got[2].top_tok_share == 0.25
    assert (got[3].n_tokens, got[3].n_distinct) == (3, 2)
    assert abs(got[3].top_tok_share - 0.6667) < 1e-9


def test_decontaminate_drops_eval_matches(spark):
    train = _docs(spark, [(1, "keep me"), (2, "Leaked  Doc"), (3, "also kept")])
    evals = _docs(spark, [(10, "leaked doc"), (11, "unrelated")])
    kept = sorted(r.doc_id for r in C.decontaminate(train, evals).collect())
    assert kept == [1, 3]  # id 2 matches id 10 after normalization


def test_assign_split_deterministic_and_weighted(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = C.assign_split(df).groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in out}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] + counts["test"]
    # stable under repartitioning (hash of id, not rand)
    again = C.assign_split(df.repartition(7)).groupBy("split").count().collect()
    assert {r.split: r["count"] for r in again} == counts


def test_bigram_topk(spark):
    df = _docs(spark, [(1, "to be or not to be"), (2, "to be is to do")])
    top = C.bigram_topk(df, k=2).collect()
    assert [(r.bigram, r.n) for r in top] == [("to be", 3), ("be is", 1)]


def test_source_cap_respects_quota(spark):
    from mapreduce6240project_spark.operators.curation import source_cap
    from mapreduce6240project_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    capped = source_cap(docs, max_per_source=5)
    per_src = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per_src and all(n <= 5 for n in per_src.values())
    # deterministic: the same draw survives a re-run and a repartition
    again = source_cap(docs.repartition(7), max_per_source=5)
    assert {tuple(r) for r in capped.select("doc_id").collect()} == {
        tuple(r) for r in again.select("doc_id").collect()
    }


def test_training_shards_cover_and_balance(spark):
    from mapreduce6240project_spark.operators.curation import training_shards
    from mapreduce6240project_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n = docs.count()
    shards = training_shards(docs, n_shards=8)
    assert shards.count() == n
    rng = shards.agg(F.min("shard"), F.max("shard")).first()
    assert rng[0] >= 0 and rng[1] < 8
    # pos is a contiguous 1..k ranking within each shard
    tops = {
        (r["shard"], r["mx"], r["cnt"])
        for r in shards.groupBy("shard")
        .agg(F.max("pos").alias("mx"), F.count("*").alias("cnt"))
        .collect()
    }
    assert all(mx == cnt for _, mx, cnt in tops)


def test_token_frequency_score_bounds(spark):
    from mapreduce6240project_spark.operators.textstats import token_frequency_score
    from mapreduce6240project_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    scored = token_frequency_score(docs)
    assert scored.count() == docs.count()
    bounds = scored.agg(
        F.min("rare_ratio"), F.max("rare_ratio"), F.min("mean_token_freq")
    ).first()
    assert 0.0 <= bounds[0] and bounds[1] <= 1.0
    assert bounds[2] >= 1.0  # every token occurs at least once (itself)


def test_contamination_ngram_hits(spark):
    from mapreduce6240project_spark.operators.curation import (
        contamination_ngram_hits,
    )

    w = lambda k: " ".join(f"w{k}_{i}" for i in range(10))  # noqa: E731
    train = spark.createDataFrame(
        [
            (1, w(0)),  # identical 10 words -> shares 8-grams (3 of them)
            (2, w(0).replace("w0_0", "zzz")),  # first word differs -> 2 shared
            (3, w(9)),  # disjoint vocabulary -> clean
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame([(100, w(0))], "doc_id long, text string")
    got = {
        r.doc_id: r.n_shared_grams
        for r in contamination_ngram_hits(train, eval_docs, n=8).collect()
    }
    assert got == {1: 3, 2: 2}  # doc 3 absent: clean
