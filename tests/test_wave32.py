"""Semantic invariants for wave 32 (BPE training, covariance, vocab
coverage)."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.dedup import tokens
from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.plans.text_corpus import _BPE_TOP_WORDS
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bpe_merges_replay(spark):
    rows = REGISTRY["bpe_merges_10"].fn(spark, SF).collect()
    toks = (
        load_table(spark, SF, "documents")
        .select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .collect()
    )
    wf = Counter(r.w for r in toks)
    top = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_TOP_WORDS]
    # seq representation + Python str.replace = the same leftmost
    # non-overlapping scan the engine and the oracle use
    seqs = {w: " " + " ".join(w) + " " for w, _ in top}
    freqs = dict(top)
    for r_row in rows:
        counts: dict = defaultdict(int)
        for w, seq in seqs.items():
            syms = seq.split()
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freqs[w]
        assert counts, "round ran out of pairs"
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (pa, pb), n = best
        assert (r_row.pa, r_row.pb, r_row.n) == (pa, pb, n), r_row
        pat, rep = f" {pa} {pb} ", f" {pa}{pb} "
        seqs = {w: s.replace(pat, rep) for w, s in seqs.items()}
    assert [r.round for r in rows] == list(range(1, len(rows) + 1))


def test_embedding_covariance_exact(spark):
    import numpy as np

    rows = REGISTRY["embedding_covariance"].fn(spark, SF).collect()
    vecs = [
        r.embedding
        for r in load_table(spark, SF, "embeddings").select("embedding").collect()
    ]
    mat = np.asarray([[float(x) for x in v] for v in vecs], dtype=np.float64)
    q = np.floor(mat * 1_000_000 + 0.5).astype(object)  # python ints, no overflow
    n = len(vecs)
    s = q.sum(axis=0)
    got = {(r.i, r.j): int(r.cov_num) for r in rows}
    d = mat.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            want = n * int((q[:, i] * q[:, j]).sum()) - int(s[i]) * int(s[j])
            assert got[(i, j)] == want, (i, j)


def test_vocab_coverage_invariants(spark):
    rows = REGISTRY["vocab_coverage_100"].fn(spark, SF).collect()
    assert [r.k for r in rows] == list(range(1, len(rows) + 1))
    # frequencies non-increasing; cumulative exact; shares monotone <= 1e6
    for prev, cur in zip(rows, rows[1:]):
        assert prev.n >= cur.n
        assert cur.cum_n == prev.cum_n + cur.n
        assert cur.share_micro >= prev.share_micro
    assert rows[0].cum_n == rows[0].n
    assert rows[-1].share_micro <= 1_000_000
