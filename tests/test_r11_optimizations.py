"""Focused tests for the round-11 optimization internals.

Each test pins an equivalence a r11 rewrite relies on:
* the SQL-string shingle builder is exactly the Column builder
  (including the NULL / short-doc / empty-text branches);
* the fused one-expr MinHash aggregate returns the identical signature
  arrays the per-column construction returned;
* first_row() returns what .first() returned on probe aggregates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirty_docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "the  QUICK   brown fox"),  # multi-space + case
        (3, None),  # NULL text
        (4, ""),  # empty
        (5, "   "),  # whitespace-only
        (6, "one"),  # shorter than the shingle width
        (7, "two words"),
        (8, "exactly three words"),
        (9, "Ünïcode tëxt with ACCENTS and punctuation!!! ok?"),
        (10, "a a a a a a"),  # repeated token
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingles_sql_matches_column_builder(dirty_docs):
    from mapreduce6240project_spark.operators.dedup import shingles, shingles_sql

    for n in (2, 3, 4):
        want = dirty_docs.select(
            "doc_id", shingles("text", n).alias("sh")
        ).collect()
        got = dirty_docs.selectExpr(
            "doc_id", f"{shingles_sql('text', n)} AS sh"
        ).collect()
        assert [(r["doc_id"], r["sh"]) for r in got] == [
            (r["doc_id"], r["sh"]) for r in want
        ], f"n={n}"


def test_normalize_sql_matches_column_builder(dirty_docs):
    from mapreduce6240project_spark.operators.dedup import (
        normalize_sql,
        normalize_text,
    )

    want = dirty_docs.select(normalize_text("text").alias("t")).collect()
    got = dirty_docs.selectExpr(f"{normalize_sql('text')} AS t").collect()
    assert [r["t"] for r in got] == [r["t"] for r in want]


def _old_style_signatures(docs, n_hashes=64, shingle_n=3):
    """The pre-r11 construction, kept verbatim as the reference: explode
    via the Column shingle builder, one min-expression per permutation,
    array assembled in a separate select."""
    from mapreduce6240project_spark.operators.dedup import shingles
    from mapreduce6240project_spark.operators.fanout import fan_out

    p = (1 << 31) - 1
    rng_a = [(2654435761 * (i + 1) + 104729) % (p - 1) + 1 for i in range(n_hashes)]
    rng_b = [(40503 * (i + 1) * 69621 + 12345) % p for i in range(n_hashes)]
    ex = fan_out(docs).select(
        F.col("doc_id"),
        F.explode(F.array_distinct(shingles("text", shingle_n))).alias("s"),
    )
    hashed = ex.select(F.col("doc_id"), F.pmod(F.xxhash64("s"), F.lit(p)).alias("h"))
    mins = [
        F.expr(f"min((h * {rng_a[i]} + {rng_b[i]}) % {p}) AS _m{i}")
        for i in range(n_hashes)
    ]
    return (
        hashed.groupBy("doc_id")
        .agg(*mins)
        .select(
            F.col("doc_id"),
            F.array(*[f"_m{i}" for i in range(n_hashes)]).alias("sig"),
        )
    )


def test_fused_minhash_signatures_identical(spark, dirty_docs):
    from mapreduce6240project_spark.operators.dedup import minhash_signatures
    from mapreduce6240project_spark.sources.tables import load_table

    for docs in (load_table(spark, SF, "documents"), dirty_docs):
        want = {
            r["doc_id"]: r["sig"] for r in _old_style_signatures(docs).collect()
        }
        got = {
            r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()
        }
        assert got == want


def test_first_row_matches_first(spark):
    from mapreduce6240project_spark.functions.actions import first_row
    from mapreduce6240project_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    agg = docs.agg(F.count("*").alias("n"), F.sum(F.octet_length("text")).alias("b"))
    assert first_row(agg) == agg.first()
    empty = docs.filter(F.lit(False)).select("doc_id")
    assert first_row(empty) is None and empty.first() is None


def _old_style_simhash(docs, token_hash="xxhash64"):
    """Pre-r11 construction, verbatim: per-bit sum aggregates + a
    when/otherwise fold."""
    from mapreduce6240project_spark.operators.dedup import (
        SIMHASH_BITS,
        _token_hash,
        tokens,
    )
    from mapreduce6240project_spark.operators.fanout import fan_out

    bits = SIMHASH_BITS[token_hash]
    ex = fan_out(docs).select(
        F.col("doc_id"), F.explode(F.array_distinct(tokens("text"))).alias("t")
    )
    hashed = ex.select(F.col("doc_id"), _token_hash("t", token_hash).alias("h"))
    aggs = [F.count("*").alias("_n")] + [
        F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"_b{b}")
        for b in range(bits)
    ]
    per_doc = hashed.groupBy("doc_id").agg(*aggs)
    total = F.lit(0).cast("bigint")
    for b in range(bits):
        total = total + F.when(
            F.col(f"_b{b}") * 2 > F.col("_n"), F.lit(2**b).cast("bigint")
        ).otherwise(F.lit(0))
    return per_doc.select(F.col("doc_id"), total.alias("simhash"))


def test_fused_simhash_identical(spark, dirty_docs):
    from mapreduce6240project_spark.operators.dedup import simhash
    from mapreduce6240project_spark.sources.tables import load_table

    for docs in (load_table(spark, SF, "documents"), dirty_docs):
        for th in ("xxhash64", "md5"):
            want = {r["doc_id"]: r["simhash"] for r in _old_style_simhash(docs, th).collect()}
            got = {r["doc_id"]: r["simhash"] for r in simhash(docs, token_hash=th).collect()}
            assert got == want, th


class _SyncPool:
    """Synchronous stand-in for ThreadPoolExecutor: submit() runs the
    callable inline, restoring the pre-overlap sequential execution
    order so the overlap refactors can be diffed against it."""

    def __init__(self, max_workers=None):
        pass

    def submit(self, fn, *a, **kw):
        import concurrent.futures

        f = concurrent.futures.Future()
        try:
            f.set_result(fn(*a, **kw))
        except BaseException as e:  # pragma: no cover - propagate like a pool
            f.set_exception(e)
        return f

    def shutdown(self, wait=True):
        pass


def test_kmedoids_probe_overlap_matches_sequential(spark, monkeypatch):
    """The r11 seed-draw/combo-probe overlap (guide section 2.6) is pure
    scheduling: with the pool stubbed synchronous the exact same jobs run
    back to back and the result must be identical."""
    import concurrent.futures

    from mapreduce6240project_spark.operators.clustering import kmedoids
    from mapreduce6240project_spark.sources.tweets import tweet_features_from_events

    feats = tweet_features_from_events(spark, SF).cache()
    try:
        overlapped = kmedoids(feats, k=3, max_iter=10, tol=0.0)
        over = (overlapped.medoids, sorted(
            (r.tweet_id, r.cluster) for r in overlapped.assignments.collect()
        ))
        monkeypatch.setattr(concurrent.futures, "ThreadPoolExecutor", _SyncPool)
        sequential = kmedoids(feats, k=3, max_iter=10, tol=0.0)
        seq = (sequential.medoids, sorted(
            (r.tweet_id, r.cluster) for r in sequential.assignments.collect()
        ))
        assert over == seq
    finally:
        feats.unpersist()


def test_adaptive_dedup_matches_forced_branches(spark):
    """The adaptive collapse decision (pre-probe) must route each corpus
    to a branch whose pair set equals the forced branch exactly: a
    dup-light corpus to the naive join, a corpus with >= 64 identical
    texts to the collapse expansion.  (Pins the r11 re-measurement of
    the speculative signature fill, which was reverted: the adaptive
    path is byte-identical to the forced paths.)"""
    from mapreduce6240project_spark.operators.dedup import minhash_lsh_pairs
    from mapreduce6240project_spark.sources.tables import load_table

    light = load_table(spark, SF, "documents")  # dup-light: decision False
    heavy = light.orderBy("doc_id").limit(30).select(
        F.lit(1).alias("g"), "doc_id", "text"
    ).join(
        spark.range(70).select((F.col("id") + 1).alias("m"), F.lit(1).alias("g")),
        "g",
    ).select(
        (F.col("doc_id") * 1000 + F.col("m")).alias("doc_id"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("boilerplate page text"))
        .otherwise(F.col("text"))
        .alias("text"),
    )  # 70 copies of each text: decision True (>= collapse_min_group)

    def pairs(df, **kw):
        return sorted(
            (r.id_a, r.id_b, r.est_jaccard)
            for r in minhash_lsh_pairs(df, threshold=0.0, **kw).collect()
        )

    for docs, forced in ((light, False), (heavy, True)):
        want = pairs(docs, collapse_identical=forced)
        assert pairs(docs) == want


def test_bbit_packed_bits_match_per_column_case_sum(spark):
    """bbit_minhash_audit r11 rewrite: the 32 one-bit signature slots
    packed into one bigint + bit_count(xor) must reproduce the exact
    n_coll the 32-column CASE sum produced (pre-r11 construction, kept
    verbatim here as the reference)."""
    from mapreduce6240project_spark.functions.hashing import hash60
    from mapreduce6240project_spark.operators.dedup import shingles
    from mapreduce6240project_spark.plans.dedup_ext import _BBIT_P, _BBIT_PERMS
    from mapreduce6240project_spark.plans.registry import REGISTRY
    from mapreduce6240project_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(shingles("text", 3))).alias("s")
    )
    hm = sh.select("doc_id", (hash60(F.col("s")) % _BBIT_P).alias("hm"))
    old_sig = hm.groupBy("doc_id").agg(
        *[
            ((F.min(((2 * i + 1) * F.col("hm") + (i * 12345 + 7)) % _BBIT_P)) % 2)
            .cast("bigint")
            .alias(f"b{i}")
            for i in range(1, _BBIT_PERMS + 1)
        ]
    )
    x = old_sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"b{i}").alias(f"xa{i}") for i in range(1, _BBIT_PERMS + 1)],
    )
    y = old_sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"b{i}").alias(f"yb{i}") for i in range(1, _BBIT_PERMS + 1)],
    )
    n_coll = sum(
        F.when(F.col(f"xa{i}") == F.col(f"yb{i}"), 1).otherwise(0)
        for i in range(1, _BBIT_PERMS + 1)
    ).cast("bigint")
    est = (F.lit(625) * n_coll - 10000).cast("bigint")
    # all doc pairs (bounded corpus at sf0.001) -- wider than the
    # audit's verified-pair subset, so every packed comparison is hit
    want = {
        (r.id_a, r.id_b): r.est
        for r in x.crossJoin(y)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", est.alias("est"))
        .collect()
    }
    got_rows = REGISTRY["bbit_minhash_audit"].fn(spark, SF).collect()
    assert got_rows, "audit returned no verified pairs at sf0.001"
    for r in got_rows:
        assert r.est_permyriad == want[(r.id_a, r.id_b)], (r.id_a, r.id_b)
        assert r.abs_err_permyriad == abs(r.est_permyriad - r.jac_permyriad)


def test_pq_encode_sql_string_matches_column_builder(spark):
    """pq_encode r11 rewrite: the one-parse SQL projection must assign
    the identical code per vector as the pre-r11 Column build (kept
    verbatim here), including the lowest-code tie-break."""
    from mapreduce6240project_spark.operators import similarity as S
    from mapreduce6240project_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    books = S.pq_codebooks(emb)
    m, sub = len(books), len(books[0][0])
    iv = S._int_vec("embedding")
    code_cols = []
    for s in range(m):
        sl = F.slice(iv, s * sub + 1, sub)
        cands = [
            F.struct(
                S._int_l2(sl, F.array(*[F.lit(int(x)) for x in cv])).alias("d"),
                F.lit(ci).alias("c"),
            )
            for ci, cv in enumerate(books[s])
        ]
        code_cols.append(F.least(*cands)["c"].cast("int"))
    want = {
        r.vec_id: r.codes
        for r in emb.select("vec_id", F.array(*code_cols).alias("codes")).collect()
    }
    got = {r.vec_id: r.codes for r in S.pq_encode(emb, books).collect()}
    assert got == want
