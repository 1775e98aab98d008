"""Semantic invariants for wave 73 (KS drift, rank-sum AUC)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_ks_identical_cohorts_is_zero(spark):
    # Build events where both parities see the SAME value multiset:
    # KS must be exactly 0.
    rows = [(u, float(v)) for v in (1, 2, 3, 4, 5) for u in (0, 1)]
    ev = spark.createDataFrame(rows, "user_id long, value double")
    ev.createOrReplaceTempView("_wave73_ev")
    import mapreduce6240project_spark.plans.stats_drift as w73
    from unittest import mock

    with mock.patch.object(w73, "load_table", lambda s, d, n: ev):
        out = w73.q_ks_value_drift(spark, SF).collect()
    assert len(out) == 1
    assert out[0].ks_permyriad == 0


def test_ks_disjoint_cohorts_is_full(spark):
    # Parity-0 users only see small values, parity-1 only large:
    # KS must be 10000 (CDFs are 1 vs 0 at the crossover).
    rows = [(0, 1.0), (0, 2.0), (2, 3.0), (1, 100.0), (3, 200.0)]
    ev = spark.createDataFrame(rows, "user_id long, value double")
    import mapreduce6240project_spark.plans.stats_drift as w73
    from unittest import mock

    with mock.patch.object(w73, "load_table", lambda s, d, n: ev):
        out = w73.q_ks_value_drift(spark, SF).collect()
    assert out[0].ks_permyriad == 10000
    assert out[0].n_a == 3 and out[0].n_b == 2


def test_auc_perfect_separation(spark):
    # All purchases score above all non-purchases -> AUC = 1.
    rows = [("purchase", 10.0), ("purchase", 11.0), ("click", 1.0),
            ("view", 2.0)]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    import mapreduce6240project_spark.plans.stats_drift as w73
    from unittest import mock

    with mock.patch.object(w73, "load_table", lambda s, d, n: ev):
        out = w73.q_score_auc_audit(spark, SF).collect()
    r = out[0]
    assert r.auc_num2 == r.auc_den2  # exact 1.0 as a rational
    assert r.auc_permyriad == 10000


def test_auc_all_tied_is_half(spark):
    # Every event has the same score -> AUC = 1/2 exactly (tie credit).
    rows = [("purchase", 5.0), ("purchase", 5.0), ("click", 5.0),
            ("view", 5.0), ("error", 5.0)]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    import mapreduce6240project_spark.plans.stats_drift as w73
    from unittest import mock

    with mock.patch.object(w73, "load_table", lambda s, d, n: ev):
        out = w73.q_score_auc_audit(spark, SF).collect()
    r = out[0]
    assert r.auc_num2 * 2 == r.auc_den2
    assert r.auc_permyriad == 5000


def test_registry_rows_at_sf0001(spark):
    for name in ("ks_value_drift", "score_auc_audit"):
        rows = REGISTRY[name].fn(spark, SF).collect()
        assert len(rows) == 1
        r = rows[0].asDict()
        assert all(v is not None for v in r.values()), (name, r)
