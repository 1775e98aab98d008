"""Semantic invariants for wave 58 (quarantine report, streaming
CDC)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_quarantine_accounting_balances(spark):
    r = REGISTRY["ingest_quarantine_report"].fn(spark, SF).collect()[0]
    assert r.n_input == r.n_kept + r.n_empty + r.n_arity + r.n_badid
    assert (r.n_empty, r.n_arity, r.n_badid) == (1, 1, 1)
    assert r.n_kept == load_table(spark, SF, "events").count()


def test_streaming_cdc_matches_batch(spark):
    got = {
        r.user_id: r.last_value_cents
        for r in REGISTRY["streaming_cdc"].fn(spark, SF).collect()
    }
    want = {
        r.user_id: r.last_value_cents
        for r in REGISTRY["cdc_latest_state"].fn(spark, SF).collect()
    }
    assert got == want and len(got) > 0
