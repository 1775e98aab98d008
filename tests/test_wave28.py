"""Semantic invariants for wave 28 (Adamic-Adar, random walks) on the
support-filtered co-purchase part graph."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.plans.graph_ext import _copurchase_edges

SF = "/root/testdata/sf0.001"


def _adj(spark):
    adj = defaultdict(set)
    for r in _copurchase_edges(spark, SF).collect():
        adj[r.u].add(r.v)
    return adj


def test_adamic_adar_brute_force(spark):
    """Replays the capped-adjacency two-hop semantics exactly: z comes
    from a's out-list, b from z's out-list (the working graph after the
    top-K cap is directed)."""
    adj = _adj(spark)
    rows = REGISTRY["adamic_adar_topk"].fn(spark, SF).collect()
    assert rows, "co-purchase graph must yield predicted links"
    common: dict = {}
    for a, outs in adj.items():
        for z in outs:
            for b in adj.get(z, ()):
                if b > a and b not in adj[a]:
                    common.setdefault((a, b), set()).add(z)
    scores = {
        pair: (
            sum(
                math.floor(1e6 / math.log(len(adj[z])) + 0.5) for z in zs
            ),
            len(zs),
        )
        for pair, zs in common.items()
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[: len(rows)]
    got = [((r.a, r.b), (r.aa_micro, r.n_common)) for r in rows]
    assert got == want


def test_random_walks_follow_edges_deterministically(spark):
    adj = _adj(spark)
    rows = REGISTRY["random_walks_k3"].fn(spark, SF).collect()
    assert rows

    def step(node, k):
        nbrs = sorted(adj[node])
        h = int(hashlib.md5(f"{node}:{k}".encode()).hexdigest()[:15], 16)
        return nbrs[h % len(nbrs)]

    starts = set()
    for r in rows:
        assert r.n1 in adj[r.start]
        assert r.n2 in adj[r.n1]
        assert r.n3 in adj[r.n2]
        assert r.n1 == step(r.start, 1)
        assert r.n2 == step(r.n1, 2)
        assert r.n3 == step(r.n2, 3)
        starts.add(r.start)
    # every node with at least one edge starts a walk
    assert starts == set(adj)
