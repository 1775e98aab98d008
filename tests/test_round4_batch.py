"""Planted-data semantics for the round-4 batch (experimentation,
attribution, layout audit, LM quality)."""

from __future__ import annotations

import math

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr(
        "event_id",
        "CAST(ts AS TIMESTAMP) AS ts",
        "user_id",
        "event_type",
        "value",
    )


def test_diff_in_diff_planted(spark):
    import mapreduce6240project_spark.plans.stats_drift as m

    # treat (even uid): pre 100c -> post 300c (+200); ctrl: 100c -> 150c
    # (+50); DiD = +150 cents.  min=01-01, max=01-20 -> mid ~ 01-10.
    rows = [
        (1, "2024-01-01 00:00:00", 0, "purchase", 1.00),
        (2, "2024-01-20 00:00:00", 0, "purchase", 3.00),
        (3, "2024-01-01 00:00:00", 1, "purchase", 1.00),
        (4, "2024-01-20 00:00:00", 1, "purchase", 1.50),
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        r = m.q_diff_in_diff(spark, SF).collect()[0]
    assert r.mean_treat_pre_cents == 100
    assert r.mean_treat_post_cents == 300
    assert r.mean_ctrl_pre_cents == 100
    assert r.mean_ctrl_post_cents == 150
    assert r.did_cents == 150
    assert r.n_purchases == 4


def test_cuped_perfect_covariate_cancels_lift(spark):
    import mapreduce6240project_spark.plans.stats_drift as m

    # y = 2x for every user -> theta = exactly 2e6 micro; the raw lift
    # (200 cents) is fully explained by the pre-period covariate gap, so
    # the CUPED-adjusted lift is exactly zero.
    rows = []
    eid = 0
    for uid, x in ((0, 2.00), (2, 4.00), (1, 1.00), (3, 3.00)):
        rows.append((eid, "2024-01-01 00:00:00", uid, "view", x))
        eid += 1
        rows.append((eid, "2024-01-20 00:00:00", uid, "view", 2 * x))
        eid += 1
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        r = m.q_cuped_adjusted_lift(spark, SF).collect()[0]
    assert r.n_users == 4 and r.n_treat == 2 and r.n_ctrl == 2
    assert r.theta_micro == 2_000_000
    assert r.raw_lift_micro == 200 * 1_000_000
    assert r.cuped_lift_micro == 0


def test_nelson_aalen_planted(spark):
    import mapreduce6240project_spark.plans.stats_drift as m

    # users 0,1: signup day0 -> purchase day2; user 2: censored day5.
    rows = [
        (1, "2024-01-01 00:00:00", 0, "signup", 0.0),
        (2, "2024-01-03 00:00:00", 0, "purchase", 1.0),
        (3, "2024-01-01 00:00:00", 1, "signup", 0.0),
        (4, "2024-01-03 00:00:00", 1, "purchase", 1.0),
        (5, "2024-01-01 00:00:00", 2, "signup", 0.0),
        (6, "2024-01-06 00:00:00", 2, "view", 0.0),
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        got = {r.day: r for r in m.q_nelson_aalen_hazard(spark, SF).collect()}
    assert set(got) == {2, 5}
    assert got[2].d_events == 2 and got[2].n_at_risk == 3
    assert got[2].hazard_step_micro == 2_000_000 // 3
    assert got[5].d_events == 0 and got[5].n_at_risk == 1
    assert got[5].cum_hazard_micro == 2_000_000 // 3  # flat after day 2


def test_time_decay_planted(spark):
    import mapreduce6240project_spark.plans.behavior as m

    # view 10 min before purchase (weight 1e6), click 20 min before
    # (weight 5e5): credits split 2:1 with truncating division.
    rows = [
        (1, "2024-01-01 00:40:00", 7, "click", 0.0),
        (2, "2024-01-01 00:50:00", 7, "view", 0.0),
        (3, "2024-01-01 01:00:00", 7, "purchase", 9.0),
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        got = {
            r.event_type: r
            for r in m.q_time_decay_attribution(spark, SF).collect()
        }
    assert got["view"].credit_micro == (1_000_000 * 1_000_000) // 1_500_000
    assert got["click"].credit_micro == (500_000 * 1_000_000) // 1_500_000
    assert got["view"].n_touches == 1 and got["click"].n_touches == 1


def test_markov_removal_planted(spark):
    import mapreduce6240project_spark.plans.behavior as m

    # single journey start -> view -> purchase: conversion 1.0; removing
    # 'view' severs the only path (effect = full conversion), removing
    # any untouched channel changes nothing.
    rows = [
        (1, "2024-01-01 00:00:00", 7, "view", 0.0),
        (2, "2024-01-01 00:10:00", 7, "purchase", 1.0),
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        got = {
            r.scenario: r for r in m.q_markov_removal(spark, SF).collect()
        }
    assert got["full"].conv_micro == 1_000_000
    assert got["no_view"].conv_micro == 0
    assert got["no_view"].removal_effect_micro == 1_000_000
    assert got["no_click"].conv_micro == 1_000_000
    assert got["no_click"].removal_effect_micro == 0


def test_zonemap_real_data_invariants(spark):
    rows = REGISTRY["zonemap_pruning_audit"].fn(spark, SF).collect()
    assert len(rows) == 8
    sel_sum = 0
    for r in rows:
        assert r.files_total == rows[0].files_total
        assert r.files_total_clustered == rows[0].files_total_clustered
        assert 0 <= r.pruned_natural <= r.files_total
        assert 0 <= r.pruned_clustered <= r.files_total_clustered
        sel_sum += r.rows_selected
    # the 8 half-open slices exactly partition [min, max+1)
    from mapreduce6240project_spark.sources.tables import load_table

    assert sel_sum == load_table(spark, SF, "lineitem").count()
    # date-range-clustered files prune (proportionally) at least as well
    # as ingest-ordered ones on date predicates
    nat = sum(r.pruned_natural for r in rows) / (8 * rows[0].files_total)
    clu = sum(r.pruned_clustered for r in rows) / (
        8 * rows[0].files_total_clustered
    )
    assert clu >= nat


def test_ndcg_real_data_invariants(spark):
    r = REGISTRY["ndcg_at10"].fn(spark, SF).collect()[0]
    assert 0 <= r.ndcg_permyriad <= 10000
    assert r.idcg_micro >= 1_000_000  # at least one relevant in ideal
    assert r.dcg_micro <= r.idcg_micro


def test_bigram_perplexity_planted(spark):
    import mapreduce6240project_spark.plans.text_corpus as m

    docs = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y")], "doc_id long, text string"
    )
    with mock.patch.object(m, "load_table", lambda s, d, n: docs):
        got = {
            r.doc_id: r
            for r in m.q_bigram_perplexity_docs(spark, SF).collect()
        }
    # corpus: c(x)=3, c(y)=3, V=2; c(x,y)=3, c(y,x)=1
    nll_xy = math.floor(-math.log(4 / 5) * 1_000_000 + 0.5)
    nll_yx = math.floor(-math.log(2 / 5) * 1_000_000 + 0.5)
    assert got[1].n_bigrams == 3
    assert got[1].nll_micro_mean == (2 * nll_xy + nll_yx) // 3
    assert got[2].n_bigrams == 1
    assert got[2].nll_micro_mean == nll_xy


def test_quantile_regression_grid_planted(spark):
    import mapreduce6240project_spark.plans.stats_drift as m

    rows = [
        (i, "2024-01-01 00:00:00", 1, "view", i / 100.0)
        for i in range(1, 101)
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        got = {
            r.tau_permyriad: r
            for r in m.q_quantile_regression_grid(spark, SF).collect()
        }
    # cents 1..100, candidates at every 5th order statistic: the pinball
    # argmin over that grid is the nearest ventile to each tau
    assert got[2500].best_q_cents == 25
    assert got[5000].best_q_cents == 50
    assert got[9000].best_q_cents == 90


def test_conformal_real_data_invariants(spark):
    rows = REGISTRY["conformal_coverage_audit"].fn(spark, SF).collect()
    assert len(rows) >= 3
    for r in rows:
        assert r.halfwidth_cents >= 0
        assert 0 <= r.coverage_permyriad <= 10000
        # split-conformal at alpha=0.1 should land near 90% coverage;
        # allow finite-sample slack on tiny per-type groups
        assert r.coverage_permyriad >= 7500


def test_hits_planted(spark):
    import mapreduce6240project_spark.plans.graph_ext as m

    orders = spark.createDataFrame(
        [(100, 1), (101, 1), (102, 2)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [(100, 10), (100, 11), (101, 12), (102, 10)],
        "l_orderkey long, l_partkey long",
    )
    tables = {"orders": orders, "lineitem": li}
    with mock.patch.object(m, "load_table", lambda s, d, n: tables[n]):
        got = {r.partkey: r for r in m.q_hits_authorities(spark, SF).collect()}
    # c1 -> {10,11,12}, c2 -> {10}: after one full HITS round part 10
    # (bought by both) normalizes to 1e6, parts 11/12 to 2/3
    assert got[10].authority_micro == 1_000_000
    assert got[11].authority_micro == (1_000_000 * 1_000_000) // 1_500_000
    assert got[12].authority_micro == got[11].authority_micro
    assert got[10].degree == 2


def test_shard_rebalance_real_data(spark):
    r = REGISTRY["shard_rebalance_audit"].fn(spark, SF).collect()[0]
    # modulo moves ~16/17 of keys, rendezvous ~1/17
    assert r.moved_mod_permyriad > 8000
    assert r.moved_rendezvous_permyriad < 2000
    assert r.moved_rendezvous < r.moved_mod


def test_brier_planted_single_user(spark):
    import mapreduce6240project_spark.plans.behavior as m

    rows = [
        (1, "2024-01-01 00:00:00", 1, "purchase", 1.0),
        (2, "2024-01-01 01:00:00", 1, "view", 0.0),
        (3, "2024-01-20 00:00:00", 1, "purchase", 2.0),
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        got = m.q_brier_reliability_bins(spark, SF).collect()
    assert len(got) == 1
    r = got[0]
    # p = 1/2 in micro, outcome = purchased in second half
    assert r.bin == 5
    assert r.mean_p_micro == 500_000
    assert r.rate_permyriad == 10000
    assert r.brier_micro2_mean == 500_000 * 500_000


def test_log_rank_identical_arms_zero(spark):
    import mapreduce6240project_spark.plans.stats_drift as m

    # mirrored arms (same event/censor days) -> O1 == E1 -> chi2 == 0
    rows = [
        (1, "2024-01-01 00:00:00", 0, "signup", 0.0),
        (2, "2024-01-03 00:00:00", 0, "purchase", 1.0),
        (3, "2024-01-01 00:00:00", 1, "signup", 0.0),
        (4, "2024-01-03 00:00:00", 1, "purchase", 1.0),
        (5, "2024-01-01 00:00:00", 2, "signup", 0.0),
        (6, "2024-01-06 00:00:00", 2, "view", 0.0),
        (7, "2024-01-01 00:00:00", 3, "signup", 0.0),
        (8, "2024-01-06 00:00:00", 3, "view", 0.0),
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        r = m.q_log_rank_test(spark, SF).collect()[0]
    assert r.o1_events == 1
    assert r.e1_micro == 1_000_000
    assert r.chi2_micro == 0
    # day-2 hypergeometric variance: (1e12*2*2*2*2)//(4*4*3)
    assert r.v_micro2 == (10**12 * 16) // 48


def test_qini_real_data_invariants(spark):
    rows = sorted(
        REGISTRY["qini_uplift_deciles"].fn(spark, SF).collect(),
        key=lambda r: r.decile,
    )
    assert 1 <= len(rows) <= 10
    last = rows[-1]
    # cumulative counts are monotone and end at the full population
    prev_nt = prev_nc = 0
    for r in rows:
        assert r.n_treat_cum >= prev_nt and r.n_ctrl_cum >= prev_nc
        prev_nt, prev_nc = r.n_treat_cum, r.n_ctrl_cum
        assert 0 <= r.y_treat_cum <= r.n_treat_cum
        assert 0 <= r.y_ctrl_cum <= r.n_ctrl_cum
    # parity arms on symmetric data: final qini should be small relative
    # to the population (no real treatment effect planted)
    assert abs(last.qini_micro) <= 1_000_000 * last.n_treat_cum


def test_stratified_ate_planted_effect(spark):
    import mapreduce6240project_spark.plans.stats_drift as m

    # all users same propensity (one stratum after quintile split is
    # degenerate: 5 strata over 10 users, 2 per stratum -- one treated,
    # one control per stratum by construction); treated users purchase
    # in the post half, controls do not -> ATE = +10000 everywhere.
    rows = []
    eid = 0
    for uid in range(10):
        rows.append((eid, "2024-01-01 00:00:00", uid, "view", 0.0))
        eid += 1
        if uid % 2 == 0:
            rows.append((eid, "2024-01-20 00:00:00", uid, "purchase", 1.0))
            eid += 1
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        got = m.q_stratified_ate(spark, SF).collect()
    assert len(got) == 5
    for r in got:
        assert r.n_treat + r.n_ctrl == 2
        if r.n_treat > 0 and r.n_ctrl > 0:
            assert r.rate_treat_permyriad == 10000
            assert r.rate_ctrl_permyriad == 0
            assert r.ate_permyriad == 10000


def test_markov_edge_cases(spark):
    import mapreduce6240project_spark.plans.behavior as m

    # self-loop cycle with no purchase: conversion 0 in every scenario,
    # all removal effects exactly 0 (never negative -- removal without
    # renormalization can only lose mass)
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 7, "view", 0.0) for i in range(5)
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        got = {r.scenario: r for r in m.q_markov_removal(spark, SF).collect()}
    assert all(r.conv_micro == 0 for r in got.values())
    assert all(r.removal_effect_micro == 0 for r in got.values())

    # purchase-first journey: START -> purchase directly, conversion 1.0
    # in every scenario that keeps the purchase state
    rows = [(1, "2024-01-01 00:00:00", 7, "purchase", 1.0)]
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        got = {r.scenario: r for r in m.q_markov_removal(spark, SF).collect()}
    assert got["full"].conv_micro == 1_000_000
    for scen, r in got.items():
        assert r.removal_effect_micro == 0, scen


def test_markov_removal_never_negative_real(spark):
    rows = REGISTRY["markov_removal_attribution"].fn(
        spark, SF
    ).collect()
    for r in rows:
        assert r.removal_effect_micro >= 0
        assert 0 <= r.conv_micro <= 1_000_000


def test_power_mde_planted(spark):
    import mapreduce6240project_spark.plans.stats_drift as m

    # 4 purchases, cents {100, 200, 100, 200} -> var = (4*60000*100 -
    # 360000)//12 ... computed directly below; sqrt path exact.
    rows = [
        (1, "2024-01-01 00:00:00", 0, "purchase", 1.00),
        (2, "2024-01-02 00:00:00", 2, "purchase", 2.00),
        (3, "2024-01-03 00:00:00", 1, "purchase", 1.00),
        (4, "2024-01-04 00:00:00", 3, "purchase", 2.00),
    ]
    with mock.patch.object(m, "load_table", lambda s, d, n: _events(spark, rows)):
        r = m.q_power_mde_audit(spark, SF).collect()[0]
    assert r.n_treat == 2 and r.n_ctrl == 2
    sx, sxx, n = 600, 100_000, 4
    var = (n * sxx - sx * sx) // (n * (n - 1))
    assert r.pooled_var_cents2 == var
    se2 = (var * 4) // 4
    s_micro = math.floor(math.sqrt(se2) * 1_000_000 + 0.5)
    assert r.mde_micro_cents == (2_801_585 * s_micro) // 1_000_000
