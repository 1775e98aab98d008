"""Semantic invariants for wave 40 (recall curve, sketch error audit)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_recall_curve_monotone_in_probes(spark):
    rows = sorted(
        REGISTRY["ivf_recall_curve"].fn(spark, SF).collect(),
        key=lambda r: r.n_probe,
    )
    assert [r.n_probe for r in rows] == [1, 2, 4]
    # probing more cells can only add candidates: recall is monotone
    assert rows[0].hits <= rows[1].hits <= rows[2].hits
    assert all(0 <= r.hits <= r.k == 10 for r in rows)


def test_qsketch_audit_honors_error_contract(spark):
    rows = REGISTRY["qsketch_error_audit"].fn(spark, SF).collect()
    assert {r.label for r in rows} == {"p50", "p90", "p99"}
    for r in rows:
        # DDSketch-style log buckets guarantee <= 1/16 relative error
        # per bucket vs the rank value; vs the *interpolated* quantile
        # allow the bucket bound plus one bucket of interpolation slack
        assert r.err_permyriad <= 1250, (r.label, r.err_permyriad)
        assert r.est_e4 > 0 and r.exact_e4 > 0
