"""Semantic invariants for wave 106 (Kruskal-Wallis, WAV silence
spans, rare-term cosine pairs) -- pure-Python brute forces at
sf0.001, plus the corrupt-media contract for the new audio stage."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_kruskal_wallis_bruteforce(spark):
    rows = REGISTRY["kruskal_wallis_types"].fn(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .collect()
    )
    data = [(x.event_type, x.c) for x in ev]
    n = len(data)
    by_val = Counter(c for _, c in data)
    # doubled average rank per distinct value
    r2 = {}
    cum = 0
    for c in sorted(by_val):
        m = by_val[c]
        r2[c] = 2 * cum + m + 1
        cum += m
    groups: dict[str, list[int]] = {}
    for g, c in data:
        groups.setdefault(g, []).append(c)
    h_micro = 0
    for g, vals in groups.items():
        n_g = len(vals)
        s2 = sum(r2[c] for c in vals)
        d = s2 - n_g * (n + 1)
        h_g = 3.0 * float(d) * float(d) / (
            float(n_g) * float(n) * float(n + 1)
        )
        h_micro += math.floor(h_g * 1e6 + 0.5)
    t3 = sum(m**3 - m for m in by_val.values())
    n3 = n**3 - n
    if t3 >= n3:
        h_adj = 0
    else:
        h_adj = math.floor(h_micro / (1.0 - t3 / n3) + 0.5)
    crit = [
        3841459, 5991465, 7814728, 9487729, 11070498, 12591587,
        14067140, 15507313, 16918978, 18307038, 19675138, 21026070,
    ][min(len(groups) - 1, 12) - 1]
    assert r.n_total == n
    assert r.n_groups == len(groups)
    assert r.h_micro == h_micro
    assert r.h_adj_micro == h_adj
    assert bool(r.homogeneity_rejected) == (h_adj > crit)
    # sanity: H is non-negative and bounded by N-1 (up to quantization)
    assert 0 <= r.h_micro <= (n - 1) * 1_000_000 + len(groups)


def test_wav_silence_spans_bruteforce_and_corrupt(spark):
    from mapreduce6240project_spark.operators.multimodal import (
        audio_silence_spans,
        golden_wav_payload,
        synth_golden_media,
    )

    ids = (
        load_table(spark, SF, "documents")
        .select("doc_id")
        .filter((F.col("doc_id") < 32) & (F.col("doc_id") % 2 == 1))
    )
    got = {
        r.media_id: (r.n_silence_spans, r.silent_samples, r.longest_span)
        for r in audio_silence_spans(synth_golden_media(ids)).collect()
    }
    assert len(got) == 16
    for d in got:
        samples = [(d * 13 + j * 17) % 65536 - 32768 for j in range(96)]
        spans, silent, longest, run = 0, 0, 0, 0
        for v in samples:
            if abs(v) < 3277:
                run += 1
            elif run:
                spans, silent, longest, run = (
                    spans + 1, silent + run, max(longest, run), 0,
                )
        if run:
            spans, silent, longest = spans + 1, silent + run, max(longest, run)
        assert got[d] == (spans, silent, longest), d
    # corrupt-media contract: garbage bytes yield a NULL-feature row,
    # never an exception (same replay discipline as audio_features)
    bad = spark.createDataFrame(
        [(900, "unknown", bytearray(b"not a wav")),
         (901, "unknown", bytearray(golden_wav_payload(1)[:20]))],
        "media_id LONG, kind STRING, payload BINARY",
    )
    rows = audio_silence_spans(bad).collect()
    assert {r.media_id for r in rows} == {900, 901}
    assert all(r.n_silence_spans is None for r in rows)


def test_rare_term_cosine_bruteforce(spark):
    rows = REGISTRY["rare_term_cosine_pairs"].fn(spark, SF).collect()
    docs = [
        (r.doc_id, re.sub(r"\s+", " ", r.text.lower()).strip())
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    nd = len(docs)
    tf: dict[int, Counter] = {d: Counter(t.split(" ")) for d, t in docs}
    dfreq = Counter()
    for d in tf:
        for term in tf[d]:
            dfreq[term] += 1
    rare = {t for t, c in dfreq.items() if c <= 20}
    vec = {
        d: {
            t: math.floor(
                float(c) * math.log(float(nd) / dfreq[t]) * 100 + 0.5
            )
            for t, c in cnts.items()
            if t in rare
        }
        for d, cnts in tf.items()
    }
    inv: dict[str, list[int]] = {}
    for d, ws in vec.items():
        for t in ws:
            inv.setdefault(t, []).append(d)
    pairs = set()
    for t, ds in inv.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pairs.add((ds[i], ds[j]))
    scored = []
    for a, b in pairs:
        dot = sum(w * vec[b].get(t, 0) for t, w in vec[a].items())
        na = math.sqrt(float(sum(w * w for w in vec[a].values())))
        nb = math.sqrt(float(sum(w * w for w in vec[b].values())))
        scored.append(
            (a, b, math.floor(float(dot) / (na * nb) * 1e6 + 0.5))
        )
    want = sorted(scored, key=lambda x: (-x[2], x[0], x[1]))[:20]
    got = [(r.id_a, r.id_b, r.cos_micro) for r in rows]
    assert sorted(got, key=lambda x: (-x[2], x[0], x[1])) == want
