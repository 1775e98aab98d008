"""Semantic invariants for wave 29 (vocab encoding, MLM mask plan)."""

from __future__ import annotations

import hashlib
from collections import Counter

from mapreduce6240project_spark.operators.dedup import normalize_text  # noqa: F401
from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.plans.text_corpus import _MASK_PCT, _MAXLEN, _VOCAB
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _doc_tokens(spark):
    from pyspark.sql import functions as F

    from mapreduce6240project_spark.operators.dedup import tokens

    return {
        r.doc_id: r.w
        for r in load_table(spark, SF, "documents")
        .select("doc_id", tokens("text").alias("w"))
        .collect()
    }


def test_vocab_encode_replay(spark):
    docs = _doc_tokens(spark)
    counts = Counter()
    for w in docs.values():
        counts.update(w)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_VOCAB]
    vocab = {tok: i + 1 for i, (tok, _) in enumerate(ranked)}
    got = {
        r.doc_id: (r.seq_len, r.ids_checksum)
        for r in REGISTRY["vocab_encode_docs"].fn(spark, SF).collect()
    }
    for doc_id, w in docs.items():
        trunc = w[:_MAXLEN]
        checksum = sum(
            (i + 1) * vocab.get(tok, 0) for i, tok in enumerate(trunc)
        )
        assert got[doc_id] == (len(trunc), checksum), doc_id


def test_mlm_mask_plan_replay_and_rate(spark):
    docs = _doc_tokens(spark)
    got = {
        r.doc_id: (r.n_tokens, r.n_masked, r.masked_pos_checksum)
        for r in REGISTRY["mlm_mask_plan"].fn(spark, SF).collect()
    }
    total = masked = 0
    for doc_id, w in docs.items():
        n_masked = 0
        chk = 0
        for p in range(1, len(w) + 1):
            h = int(
                hashlib.md5(f"{doc_id}:{p}".encode()).hexdigest()[:15], 16
            )
            if h % 100 < _MASK_PCT:
                n_masked += 1
                chk += p
        assert got[doc_id] == (len(w), n_masked, chk), doc_id
        total += len(w)
        masked += n_masked
    # aggregate rate is near the configured 15% (hash uniformity)
    assert abs(masked / total - _MASK_PCT / 100) < 0.02
