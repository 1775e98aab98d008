"""Consistent sampling + vocabulary/tf-idf operators: the properties
that make them pipeline-safe (subset stability, per-stratum fractions,
deterministic ordering), checked at sf0.001."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)
from mapreduce6240project_spark.operators.textstats import (
    tfidf_top_terms,
    vocab_topk,
)
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_hash_sample_is_subset_stable(spark):
    """Raising the fraction only ADDS rows -- the property that lets a
    pipeline grow its eval split without reshuffling past decisions."""
    cust = load_table(spark, SF, "customer")
    small = {r.c_custkey for r in hash_sample(cust, 0.05, "c_custkey").collect()}
    large = {r.c_custkey for r in hash_sample(cust, 0.2, "c_custkey").collect()}
    assert small <= large
    n = cust.count()
    assert 0 < len(small) < len(large) < n
    # fraction lands in a loose CLT band
    assert abs(len(large) / n - 0.2) < 0.1


def test_hash_sample_is_repartition_invariant(spark):
    cust = load_table(spark, SF, "customer")
    a = {r.c_custkey for r in hash_sample(cust, 0.1, "c_custkey").collect()}
    b = {
        r.c_custkey
        for r in hash_sample(cust.repartition(7), 0.1, "c_custkey").collect()
    }
    assert a == b


def test_stratified_sample_fractions(spark):
    orders = load_table(spark, SF, "orders")
    fr = {"O": 0.1, "F": 0.5}
    got = stratified_hash_sample(orders, fr, "o_orderstatus", "o_orderkey")
    counts = {
        r.o_orderstatus: r.n
        for r in got.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r.o_orderstatus: r.n
        for r in orders.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    assert "P" not in counts  # unlisted stratum dropped
    for s, frac in fr.items():
        assert abs(counts[s] / totals[s] - frac) < 0.15


def test_vocab_topk_matches_manual_count(spark):
    docs = load_table(spark, SF, "documents")
    got = vocab_topk(docs, k=10).collect()
    assert len(got) == 10
    # monotone non-increasing counts, ties broken by token ascending
    for a, b in zip(got, got[1:]):
        assert a.n > b.n or (a.n == b.n and a.token < b.token)
    # the #1 token really is the max over a manual full count
    full = (
        docs.select(
            F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("t")
        )
        .groupBy("t")
        .count()
        .orderBy(F.desc("count"), "t")
        .first()
    )
    assert got[0].token == full.t and got[0].n == full["count"]


def test_tfidf_planted_keyword(spark):
    """A token unique to one document must be that document's top term."""
    docs = load_table(spark, SF, "documents").limit(50)
    planted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 1, F.concat(F.lit("zzzuniq zzzuniq zzzuniq "), F.col("text"))).otherwise(
            F.col("text")
        ),
    )
    top = tfidf_top_terms(planted, top_n=1).filter(F.col("doc_id") == 1).first()
    assert top.token == "zzzuniq"
    assert top.tfidf > 0
    # score is ln-based and bounded by ln(N)
    assert top.tfidf <= math.log(50) + 1e-9


def test_tfidf_rows_per_doc(spark):
    docs = load_table(spark, SF, "documents")
    got = tfidf_top_terms(docs, top_n=3)
    per_doc = got.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert per_doc.filter(F.col("n") > 3).count() == 0
    assert got.filter(F.col("tfidf") < 0).count() == 0


def test_pack_chunks_prefix_sum_is_exact(spark):
    """The distributed prefix sum must equal a single-partition global
    cumsum, partition boundaries notwithstanding."""
    from pyspark.sql import Window

    from mapreduce6240project_spark.operators.textstats import (
        pack_chunks,
        token_count,
    )

    docs = load_table(spark, SF, "documents")
    got = pack_chunks(docs, budget=512)
    naive = (
        docs.select(F.col("doc_id"), token_count("text").alias("n_tokens"))
        .withColumn(
            "chunk_id",
            F.expr("(sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens) DIV 512"),
        )
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    # chunk ids are dense from 0 and each holds <= ~budget first-tokens
    mx = got.agg(F.max("chunk_id")).first()[0]
    assert got.select("chunk_id").distinct().count() == mx + 1


def test_pack_chunks_budget_monotone(spark):
    from mapreduce6240project_spark.operators.textstats import pack_chunks

    docs = load_table(spark, SF, "documents")
    big = pack_chunks(docs, budget=4096).withColumnRenamed("chunk_id", "big")
    small = pack_chunks(docs, budget=1024).withColumnRenamed("chunk_id", "small")
    j = big.select("doc_id", "big").join(small.select("doc_id", "small"), "doc_id")
    # a coarser budget can only merge chunks, never reorder docs
    assert j.filter(F.col("big") * 4 > F.col("small") + 3).count() == 0


def test_mixture_resample_hits_targets(spark):
    from mapreduce6240project_spark.operators.sampling import mixture_resample

    docs = load_table(spark, SF, "documents")
    targets = {"en": 0.5, "es": 0.25, "fr": 0.25}
    out = mixture_resample(docs, targets, "lang", "doc_id")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= set(targets)  # untargeted strata dropped
    total = sum(counts.values())
    for s, share in targets.items():
        # loose band: hash sampling is Bernoulli-ish, not exact-count
        assert abs(counts.get(s, 0) / total - share) < 0.15
    # no upsampling: every stratum within its source count
    src = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for s, n in counts.items():
        assert n <= src[s]


def test_mixture_resample_empty_targets(spark):
    from mapreduce6240project_spark.operators.sampling import mixture_resample

    docs = load_table(spark, SF, "documents")
    assert mixture_resample(docs, {"xx": 1.0}, "lang", "doc_id").count() == 0


def test_weighted_sample_prefers_heavy_rows(spark):
    from mapreduce6240project_spark.operators.sampling import (
        weighted_priority_sample,
    )

    orders = load_table(spark, SF, "orders")
    n = orders.count()
    k = 200
    picked = weighted_priority_sample(
        orders, k=k, weight_col="o_totalprice", key="o_orderkey"
    ).cache()
    assert picked.count() == min(k, n)
    # inclusion probability rises with weight: the sampled mean price
    # must exceed the population mean by a clear margin
    pop = orders.agg(F.avg("o_totalprice")).first()[0]
    got = picked.agg(F.avg("o_totalprice")).first()[0]
    assert got > pop * 1.1
    # deterministic: a re-run draws the identical set
    again = weighted_priority_sample(
        orders.repartition(7), k=k, weight_col="o_totalprice", key="o_orderkey"
    )
    a = {r.o_orderkey for r in picked.collect()}
    b = {r.o_orderkey for r in again.collect()}
    assert a == b


def test_weighted_sample_drops_nonpositive_weights(spark):
    from mapreduce6240project_spark.operators.sampling import (
        weighted_priority_sample,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, -5.0), (4, 20.0)], "id long, w double"
    )
    got = {r.id for r in weighted_priority_sample(df, 10, "w", "id").collect()}
    assert got == {1, 4}


def test_weighted_sample_per_group_counts_and_plan(spark):
    from mapreduce6240project_spark.operators.sampling import (
        weighted_priority_sample_per_group,
    )

    orders = load_table(spark, SF, "orders")
    got = weighted_priority_sample_per_group(
        orders, k=20, weight_col="o_totalprice", key="o_orderkey",
        group_col="o_orderstatus",
    )
    per = {r.o_orderstatus: r.n for r in
           got.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    pop = {r.o_orderstatus: r.n for r in
           orders.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    for status, n in per.items():
        assert n == min(20, pop[status])
    # the rank bound is pushed below the window sort
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_temperature_resample_flattens_lang_mixture(spark):
    from mapreduce6240project_spark.operators.sampling import temperature_resample

    docs = load_table(spark, SF, "documents").filter(F.col("lang").isNotNull())
    before = {r.lang: r.n for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    after = {r.lang: r.n for r in
             temperature_resample(docs, 0.5, "lang", "doc_id")
             .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # no stratum upsampled, every input stratum survives
    assert set(after) == set(before)
    for lang, n in after.items():
        assert n <= before[lang]
    # the mixture is flatter: max/min share ratio strictly shrinks
    def spread(d):
        return max(d.values()) / min(d.values())

    assert spread(after) < spread(before)
