"""Semantic invariants for wave 54 (FD audit, embedding drift)."""

from __future__ import annotations

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_fd_audit_key_holds_nonkey_does_not(spark):
    rows = {r.fd: r for r in REGISTRY["fd_violation_audit"].fn(spark, SF).collect()}
    # primary key: zero violations by construction
    assert rows["orders.o_orderkey->o_custkey"].n_violating == 0
    # nation -> segment is many-to-many in TPC-H-ish data
    assert rows["customer.c_nationkey->c_mktsegment"].n_violating > 0


def test_drift_small_between_random_halves(spark):
    r = REGISTRY["embedding_drift_l1"].fn(spark, SF).collect()[0]
    assert r.n_buckets > 0
    # even/odd ids are exchangeable random halves: drift far below the
    # maximum (20000 = completely disjoint histograms)
    assert 0 <= r.drift_permyriad < 10000
