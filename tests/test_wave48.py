"""Semantic invariants for wave 48 (int8 recall, join advisor)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_int8_recall_high(spark):
    r = REGISTRY["int8_recall_audit"].fn(spark, SF).collect()[0]
    assert r.k == 10
    # int8 keeps ~7 bits: most of the top-10 survives (measured 7/10 at
    # sf0.001 -- near-ties at the boundary flip under quantization, the
    # finding this audit exists to surface)
    assert r.n_overlap >= 6, r.n_overlap
    assert r.recall_pct == 100 * r.n_overlap // 10


def test_join_advisor_small_dims_broadcast(spark):
    rows = {r.table_name: r for r in
            REGISTRY["join_strategy_advisor"].fn(spark, SF).collect()}
    assert set(rows) == {"customer", "supplier", "part"}
    for t, r in rows.items():
        assert r.est_bytes == r.n_rows * {"customer": 144, "supplier": 120,
                                          "part": 128}[t]
        # at sf0.001 every dim fits the broadcast threshold
        assert r.strategy == "broadcast"
