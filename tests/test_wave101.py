"""Semantic invariants for wave 101 (padding waste, vocab overlap)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_padding_waste_matches_bruteforce_and_sorting_dominates(spark):
    docs = sorted(
        (r.doc_id, len(" ".join(r.text.lower().split()).split(" ")))
        for r in load_table(spark, SF, "documents").collect()
        if r.text is not None
    )
    lens_arrival = [n for _, n in docs]  # doc_id order
    lens_sorted = sorted(
        (n, d) for d, n in docs
    )  # (n_tok, doc_id) order

    def waste(lens):
        total = 0
        for i in range(0, len(lens), 32):
            batch = lens[i : i + 32]
            total += max(batch) * len(batch) - sum(batch)
        return total

    wa = waste(lens_arrival)
    ws = waste([n for n, _ in lens_sorted])
    toks = sum(lens_arrival)
    r = REGISTRY["padding_waste_audit"].fn(spark, SF).collect()[0]
    assert (r.real_tokens, r.arrival_pad_tokens, r.sorted_pad_tokens) == (
        toks,
        wa,
        ws,
    )
    assert r.arrival_waste_permyriad == wa * 10000 // (toks + wa)
    assert r.sorted_waste_permyriad == ws * 10000 // (toks + ws)
    # length-sorted bucketing can never waste more than arrival order
    assert r.sorted_pad_tokens <= r.arrival_pad_tokens


def test_vocab_overlap_matches_bruteforce(spark):
    from collections import Counter

    docs = [
        (r.source, " ".join(r.text.lower().split()))
        for r in load_table(spark, SF, "documents").collect()
        if r.source is not None and r.text is not None
    ]
    tf: dict[str, Counter] = {}
    for s, t in docs:
        tf.setdefault(s, Counter()).update(w for w in t.split(" ") if w)
    top = {
        s: {
            t
            for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        }
        for s, c in tf.items()
    }
    want = {}
    srcs = sorted(top)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            common = len(top[a] & top[b])
            if common:
                want[(a, b)] = (
                    common,
                    common * 10000 // (len(top[a]) + len(top[b]) - common),
                )
    got = {
        (r.src_a, r.src_b): (r.n_common, r.jaccard_permyriad)
        for r in REGISTRY["source_vocab_overlap"].fn(spark, SF).collect()
    }
    assert got == want
    assert all(0 <= v[1] <= 10000 for v in got.values())


def test_epoch_shuffle_quality_matches_bruteforce(spark):
    ids = [
        r.doc_id for r in load_table(spark, SF, "documents").collect()
    ]

    import hashlib

    def order(epoch):
        def key(d):
            h = int(
                hashlib.md5(f"{d}:{epoch}".encode()).hexdigest()[:15], 16
            )
            return (h, d)

        return sorted(ids, key=key)

    def pairs(seq):
        return {
            (min(a, b), max(a, b)) for a, b in zip(seq, seq[1:])
        }

    p1, p2 = pairs(order(1)), pairs(order(2))
    r = REGISTRY["epoch_shuffle_quality"].fn(spark, SF).collect()[0]
    assert r.n_docs == len(ids)
    assert r.n_preserved == len(p1 & p2)
    assert r.preserved_permyriad == len(p1 & p2) * 10000 // (len(ids) - 1)
    # a decent keyed permutation preserves essentially no adjacency
    assert r.preserved_permyriad <= 100
