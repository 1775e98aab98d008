"""Semantic invariants for wave 63 (Markov stationary, Merkle roots)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"

_M61 = (1 << 61) - 1


def test_stationary_mass_nearly_conserved(spark):
    rows = REGISTRY["markov_stationary_events"].fn(spark, SF).collect()
    assert len(rows) >= 3
    total = sum(r.stationary_micro for r in rows)
    # row-stochastic matrix preserves mass up to truncation (each of the
    # 3 iterations loses < k*k micro-units to integer division)
    assert 950_000 <= total <= 1_000_000
    assert all(r.stationary_micro > 0 for r in rows)


def test_merkle_root_is_modular_sum_of_sources(spark):
    rows = {r.scope: r for r in
            REGISTRY["corpus_merkle_roots"].fn(spark, SF).collect()}
    root = rows.pop("<root>")
    assert root.n_docs == sum(r.n_docs for r in rows.values())
    assert root.checksum == sum(r.checksum for r in rows.values()) % _M61
