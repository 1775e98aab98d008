"""Semantic invariants for wave 107 (ER blocking quality, cluster
bootstrap CI) -- pure-Python brute forces at sf0.001."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_blocking_quality_bruteforce(spark):
    rows = REGISTRY["blocking_quality_audit"].fn(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    docs = {
        d.doc_id: re.sub(r"\s+", " ", d.text.lower()).strip()
        for d in load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    }
    # ground truth: 3-gram Jaccard >= 0.1 pairs (the simgraph contract)
    sh = {}
    for d, t in docs.items():
        w = t.split(" ")
        sh[d] = (
            {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
            if len(w) >= 3
            else {" ".join(w)}
        )
    ids = sorted(docs)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.1:
                truth.add((a, b))
    bk = {d: " ".join(t.split(" ")[:4]) for d, t in docs.items()}
    captured = sum(1 for a, b in truth if bk[a] == bk[b])
    blocks = Counter(bk.values())
    cand = sum(m * (m - 1) // 2 for m in blocks.values())
    n = len(docs)
    total = n * (n - 1) // 2
    assert r.n_docs == n
    assert r.n_true_pairs == len(truth)
    assert r.n_candidate_pairs == cand
    assert r.n_captured == captured
    assert r.completeness_ppm == captured * 1000000 // len(truth)
    assert r.reduction_ppm == (total - cand) * 1000000 // total
    # the audit is meaningful only if blocking actually reduces work
    assert r.reduction_ppm > 900000  # prefix-4 blocks avoid >90% of pairs


def test_cluster_bootstrap_bruteforce(spark):
    rows = REGISTRY["cluster_bootstrap_ratio_ci"].fn(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select(
            "user_id",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .collect()
    )
    users: dict[int, list[int]] = {}
    for x in ev:
        users.setdefault(x.user_id, []).append(x.c)
    cdf = []
    acc = 0.0
    for k in range(6):
        acc += math.exp(-1.0) / math.factorial(k)
        cdf.append(acc)

    def weight(u: int, rep: int) -> int:
        h = int(
            hashlib.md5(f"{u}:{rep}".encode()).hexdigest()[:15], 16
        )
        x = float(h) / float(1 << 60)
        for k, c in enumerate(cdf):
            if x < c:
                return k
        return 6

    ests = []
    for rep in range(32):
        wc = wn = 0
        for u, cs in users.items():
            w = weight(u, rep)
            wc += w * sum(cs)
            wn += w * len(cs)
        if wn > 0:
            ests.append((math.floor(wc / wn * 1e6 + 0.5), rep))
    ests.sort()
    tc = sum(sum(cs) for cs in users.values())
    tn = sum(len(cs) for cs in users.values())
    assert r.n_users == len(users)
    assert r.n_reps == 32
    assert r.point_micro == math.floor(tc / tn * 1e6 + 0.5)
    assert r.ci_lo_micro == ests[1][0]  # rank 2
    assert r.ci_hi_micro == ests[30][0]  # rank 31
    # the CI brackets the point estimate for this well-behaved metric
    assert r.ci_lo_micro <= r.point_micro <= r.ci_hi_micro
