"""Planted-data semantics for the round-5 batch (entity resolution,
privacy audits, leakage-free encoding, physical-encoding advice,
feature hashing)."""

from __future__ import annotations

import hashlib

from unittest import mock

SF = "/root/testdata/sf0.001"


def _parts(spark, rows):
    return spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_retailprice double, p_size long"
    )


# three-name chain in block 'tower' (lev-1 hops), one singleton
ER_PARTS = [
    (1, "aaaa zz tower", 10.00, 5),
    (2, "aaab zz tower", 30.00, 9),
    (3, "aabb zz tower", 20.00, 7),
    (4, "unique thing here", 99.00, 1),
]


def test_er_match_clusters_planted(spark):
    import mapreduce6240project_spark.plans.dedup_ext as m

    with mock.patch.object(m, "load_table", lambda s, d, n: _parts(spark, ER_PARTS)):
        rows = {r.cluster_size: r.n_clusters for r in m.q_er_match_clusters(spark, SF).collect()}
    # chain 1-2-3 folds transitively into ONE cluster (lev(1,3)=2 has no
    # direct edge but CC closes it); name 4 is a singleton
    assert rows == {3: 1, 1: 1}


def test_er_golden_records_planted(spark):
    import mapreduce6240project_spark.plans.dedup_ext as m

    with mock.patch.object(m, "load_table", lambda s, d, n: _parts(spark, ER_PARTS)):
        out = m.q_er_golden_records(spark, SF).collect()
    assert len(out) == 1  # only the multi-member cluster
    g = out[0]
    assert g.component == "aaaa zz tower"  # min name labels the cluster
    assert g.golden_partkey == 1
    assert g.n_parts == 3 and g.n_name_variants == 3
    assert g.min_price_cents == 1000 and g.max_size == 9


def test_er_block_skew_audit_planted(spark):
    import mapreduce6240project_spark.plans.dedup_ext as m

    rows = ER_PARTS + [(5, "xx yy misc", 1.0, 1), (6, "xy yy misc", 1.0, 1)]
    with mock.patch.object(m, "load_table", lambda s, d, n: _parts(spark, rows)):
        out = {r.block: r for r in m.q_er_block_skew_audit(spark, SF).collect()}
    # block 'tower': 3 names -> 3 pairs, mass 6; 'misc': 2 names -> 1
    # pair, mass 2; singleton block 'here' filtered out
    assert set(out) == {"tower", "misc"}
    assert out["tower"].n_names == 3 and out["tower"].cand_pairs == 3
    assert out["misc"].n_names == 2 and out["misc"].cand_pairs == 1
    assert out["tower"].pair_share_pm == 6 * 10000 // 8
    assert out["misc"].pair_share_pm == 2 * 10000 // 8


def _customers(spark, rows):
    return spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string, c_acctbal double"
    )


def test_k_anonymity_risk_summary_planted(spark):
    import mapreduce6240project_spark.plans.curation_ext as m

    # two customers share (nation 1, AUTO, bucket 0); one is alone
    rows = [
        (1, 1, "AUTO", 100.00),
        (2, 1, "AUTO", 150.00),
        (3, 2, "BIKE", 100.00),
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _customers(spark, rows)):
        r = m.q_k_anonymity_risk_summary(spark, SF).collect()[0]
    assert r.k_min == 1 and r.n_groups == 2
    assert r.groups_below_5 == 2 and r.rows_below_5 == 3 and r.n_rows == 3


def test_l_diversity_audit_planted(spark):
    import mapreduce6240project_spark.plans.curation_ext as m

    # nation 1 bucket 0 has two segments (l=2); nation 2 has one (l=1)
    rows = [
        (1, 1, "AUTO", 100.00),
        (2, 1, "BIKE", 150.00),
        (3, 2, "AUTO", 100.00),
        (4, 2, "AUTO", 120.00),
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _customers(spark, rows)):
        out = {r.l: r.n_groups for r in m.q_l_diversity_audit(spark, SF).collect()}
    assert out == {2: 1, 1: 1}


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type", "value"
    )


def test_dp_contribution_bound_planted(spark):
    import mapreduce6240project_spark.plans.curation_ext as m

    rows = [(i, "2024-01-01 00:00:00", 0, "view", 1.0) for i in range(10)] + [
        (100 + i, "2024-01-01 00:00:00", 1, "view", 1.0) for i in range(3)
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        r = m.q_dp_contribution_bound(spark, SF).collect()[0]
    assert r.n_users == 2 and r.total_events == 13
    assert r.clipped_total == 8 + 3 and r.users_clipped == 1
    assert r.max_contribution == 10
    assert r.kept_mass_pm == 11 * 10000 // 13


def test_oof_target_encode_planted(spark):
    import mapreduce6240project_spark.plans.engineering as m

    # type 'x': fold 0 (user 0) two events at 1.00; fold 1 (user 1) one
    # event at 4.00.  OOF mean for fold 0 = 400c/1 = 4e6 micro; for
    # fold 1 = 200c/2 = 1e6 micro.
    rows = [
        (1, "2024-01-01 00:00:00", 0, "x", 1.00),
        (2, "2024-01-01 00:00:00", 0, "x", 1.00),
        (3, "2024-01-01 00:00:00", 1, "x", 4.00),
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        out = {(r.event_type, r.fold): r for r in m.q_oof_target_encode(spark, SF).collect()}
    assert out[("x", 0)].n_oof == 1 and out[("x", 0)].oof_mean_micro == 4_000_000
    assert out[("x", 1)].n_oof == 2 and out[("x", 1)].oof_mean_micro == 1_000_000


def test_encoding_advisor_planted(spark):
    import mapreduce6240project_spark.plans.engineering as m

    # order 10: flags A,A,B (2 runs); order 20: B,B (1 run -> partition
    # boundary conservatively starts a run).  linestatus constant 'O'
    # -> one run per order = 2 runs over 5 rows -> dict_rle.
    li = spark.createDataFrame(
        [
            (10, 1, "A", "O", 1.0),
            (10, 2, "A", "O", 2.0),
            (10, 3, "B", "O", 3.0),
            (20, 1, "B", "O", 4.0),
            (20, 2, "B", "O", 5.0),
        ],
        "l_orderkey long, l_linenumber long, l_returnflag string, "
        "l_linestatus string, l_quantity double",
    )
    with mock.patch.object(m, "load_table", lambda s, d, n: li):
        out = {r.column_name: r for r in m.q_encoding_advisor(spark, SF).collect()}
    rf = out["l_returnflag"]
    assert rf.n_rows == 5 and rf.n_distinct == 2 and rf.n_runs == 3
    assert rf.advice == "dict"  # 3*2 > 5
    ls = out["l_linestatus"]
    assert ls.n_runs == 2 and ls.advice == "dict_rle"
    qt = out["l_quantity"]
    assert qt.n_distinct == 5 and qt.n_runs == 5 and qt.advice == "dict"


def test_feature_hash_collision_audit_planted(spark):
    import mapreduce6240project_spark.plans.text_corpus as m

    docs = spark.createDataFrame(
        [(1, "Alpha  beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    with mock.patch.object(m, "load_table", lambda s, d, n: docs):
        r = m.q_feature_hash_collision_audit(spark, SF).collect()[0]
    toks = {"alpha", "beta", "gamma"}

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 1024

    buckets = [bucket(t) for t in toks]
    assert r.n_tokens == 3
    assert r.buckets_used == len(set(buckets))
    # the planted tokens land in 3 distinct buckets (verified above via
    # the same md5 arithmetic both engines use)
    assert len(set(buckets)) == 3
    assert r.max_load == 1 and r.collided_tokens == 0 and r.collision_pm == 0


# -- constraint-validation audits (round-5 second batch) --------------------


def test_pk_uniqueness_audit_planted(spark):
    import mapreduce6240project_spark.plans.engineering as m

    tables = {
        "orders": spark.createDataFrame(
            [(1, 1, "O", 10.0), (2, 1, "O", 20.0)],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double",
        ),
        "customer": spark.createDataFrame(
            [(1,), (1,), (2,)], "c_custkey long"
        ),
        "events": spark.createDataFrame([(7,)], "event_id long"),
        "lineitem": spark.createDataFrame(
            [(1, 1), (1, 1), (1, 1), (1, 2)],
            "l_orderkey long, l_linenumber long",
        ),
    }
    with mock.patch.object(
        m, "load_table", lambda s, d, n: tables[n]
    ):
        out = {
            r.candidate_key: r
            for r in m.q_pk_uniqueness_audit(spark, SF).collect()
        }
    assert out["orders.o_orderkey"].dup_rows == 0
    assert out["orders.o_orderkey"].max_multiplicity == 1
    c = out["customer.c_custkey"]
    assert c.n_rows == 3 and c.n_keys == 2 and c.dup_rows == 1
    li = out["lineitem.(l_orderkey,l_linenumber)"]
    assert li.n_rows == 4 and li.n_keys == 2
    assert li.dup_rows == 2 and li.max_multiplicity == 3


def test_value_set_conformance_planted(spark):
    import mapreduce6240project_spark.plans.engineering as m

    tables = {
        "orders": spark.createDataFrame(
            [("F", "2-HIGH"), ("X", "2-HIGH"), ("O", "bogus")],
            "o_orderstatus string, o_orderpriority string",
        ),
        "lineitem": spark.createDataFrame(
            [("A", "F"), ("N", "O")],
            "l_returnflag string, l_linestatus string",
        ),
        "events": spark.createDataFrame(
            [("click",), ("error",), ("error",), ("view",)],
            "event_type string",
        ),
    }
    with mock.patch.object(m, "load_table", lambda s, d, n: tables[n]):
        out = {
            r.column_name: r
            for r in m.q_value_set_conformance(spark, SF).collect()
        }
    assert out["orders.o_orderstatus"].n_violations == 1  # 'X'
    assert out["orders.o_orderpriority"].n_violations == 1  # 'bogus'
    assert out["lineitem.l_returnflag"].n_violations == 0
    e = out["events.event_type"]
    assert e.n_rows == 4 and e.n_violations == 2  # both 'error' rows
    assert e.n_observed == 3 and e.violation_pm == 5000


def test_cross_field_consistency_planted(spark):
    import mapreduce6240project_spark.plans.engineering as m

    # order 1: one clean line whose recomputed cents match exactly.
    # order 2: NO lineitems (has_lineitems violation).
    # order 3: one line but total off by 10 cents (> 1-cent/line tol).
    tables = {
        "orders": spark.createDataFrame(
            [(1, 100.0), (2, 50.0), (3, 10.0)],
            "o_orderkey long, o_totalprice double",
        ),
        "lineitem": spark.createDataFrame(
            [
                (1, 1.0, 100.0, 0.0, 0.0),
                (3, 2.0, 10.10, 0.0, 0.0),
            ],
            "l_orderkey long, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double",
        ),
        "events": spark.createDataFrame(
            [(1.0,), (-2.0,), (None,)], "value double"
        ),
    }
    with mock.patch.object(m, "load_table", lambda s, d, n: tables[n]):
        out = {
            r.rule: r
            for r in m.q_cross_field_consistency(spark, SF).collect()
        }
    assert out["orders.has_lineitems"].n_violations == 1  # order 2
    recon = out["orders.total_matches_lineitem_sum"]
    assert recon.n_checked == 2 and recon.n_violations == 1  # order 3
    ev = out["events.value_positive"]
    assert ev.n_checked == 3 and ev.n_violations == 2  # -2.0 and NULL
    assert out["lineitem.discount_in_unit_range"].n_violations == 0
    assert out["lineitem.quantity_at_least_1"].n_checked == 2


def test_cogroup_ks_by_type_planted(spark):
    import mapreduce6240project_spark.plans.stats_drift as m

    # type 'x': treatment (even users) values {1.00, 2.00}, control
    # (odd) values {2.00, 3.00}.  CDF steps at cents 100/200/300:
    # |ca*nb - cb*na| = |1*2-0*2|=2, |2*2-1*2|=2, |2*2-2*2|=0
    # -> D_int=2, ks = 2*1e6 // 4 = 500000.
    rows = [
        (0, "x", 1.00),
        (2, "x", 2.00),
        (1, "x", 2.00),
        (3, "x", 3.00),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    with mock.patch.object(m, "load_table", lambda s, d, n: ev):
        out = {r.event_type: r for r in m.q_cogroup_ks_by_type(spark, SF).collect()}
    x = out["x"]
    assert x.n_treat == 2 and x.n_ctrl == 2
    assert x.ks_micro == 500_000


def test_cogroup_ks_single_sided_type_emits_nothing(spark):
    import mapreduce6240project_spark.plans.stats_drift as m

    # type 'y' has only even-user rows -> no control sample -> no row
    rows = [(0, "y", 1.00), (2, "y", 2.00)]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    with mock.patch.object(m, "load_table", lambda s, d, n: ev):
        out = m.q_cogroup_ks_by_type(spark, SF).collect()
    assert out == []
