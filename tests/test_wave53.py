"""Semantic invariants for wave 53 (quantile normalization)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_qnorm_covers_every_doc_once(spark):
    out = REGISTRY["quantile_normalize_doclen"].fn(spark, SF)
    n_docs = load_table(spark, SF, "documents").count()
    rows = out.collect()
    # the banded bucket join matches each doc exactly once
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs


def test_qnorm_monotone_within_source(spark):
    rows = REGISTRY["quantile_normalize_doclen"].fn(spark, SF).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r.pr10k, r.doc_id))
        # normalized value is non-decreasing in within-source rank
        assert all(
            a.norm_micros <= b.norm_micros for a, b in zip(rs, rs[1:])
        ), src
        assert all(0 <= r.pr10k <= 10000 for r in rs)
