"""Semantic invariants for wave 93 (Heaps' law, discount response,
class rebalance)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_heaps_monotone_and_sublinear(spark):
    rows = sorted(
        REGISTRY["heaps_law_curve"].fn(spark, SF).collect(),
        key=lambda r: r.cutoff_doc,
    )
    assert len(rows) >= 4
    toks = [r.n_tokens for r in rows]
    typs = [r.n_types for r in rows]
    assert toks == sorted(toks) and typs == sorted(typs)
    assert all(t <= n for t, n in zip(typs, toks))
    # Heaps: type growth decelerates -- second half adds fewer types
    # per token than the first half
    mid = len(rows) // 2
    first_rate = typs[mid] / toks[mid]
    last_rate = (typs[-1] - typs[mid]) / max(toks[-1] - toks[mid], 1)
    assert last_rate < first_rate


def test_discount_response_bands(spark):
    rows = REGISTRY["discount_qty_response"].fn(spark, SF).collect()
    assert rows
    from mapreduce6240project_spark.sources.tables import load_table

    assert sum(r.n_lines for r in rows) == load_table(
        spark, SF, "lineitem"
    ).count()
    for r in rows:
        assert 0 <= r.disc_pct <= 100
        assert r.avg_qty_milli > 0


def test_balanced_downsample_equal_classes(spark):
    rows = REGISTRY["balanced_downsample_labels"].fn(spark, SF).collect()
    assert rows
    n_afters = {r.n_after for r in rows}
    assert len(n_afters) == 1  # every class capped to the same size
    cap = n_afters.pop()
    assert cap == min(r.n_before for r in rows)
    assert all(r.n_after <= r.n_before for r in rows)
