"""Semantic invariants for wave 104 (Spearman rank correlation,
txlog GDPR delete / skipping audit round-trips)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_spearman_matches_scipy_free_bruteforce(spark):
    """Tie-corrected Spearman = Pearson over average ranks, computed
    in pure Python (no scipy in the container) and micro-quantized the
    same way."""
    import math

    rows = (
        load_table(spark, SF, "lineitem")
        .filter(
            F.col("l_returnflag").isNotNull()
            & F.col("l_discount").isNotNull()
            & F.col("l_quantity").isNotNull()
        )
        .select(
            "l_returnflag",
            F.expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").alias("d"),
            F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("q"),
        )
        .collect()
    )
    by_rf: dict[str, list] = {}
    for r in rows:
        by_rf.setdefault(r.l_returnflag, []).append((r.d, r.q))

    def avg_double_ranks(vals):
        # dr = 2 * average rank; ties share the average of their span
        order = sorted(set(vals))
        less = {}
        eq = {}
        run = 0
        from collections import Counter

        cnt = Counter(vals)
        for v in order:
            less[v] = run
            eq[v] = cnt[v]
            run += cnt[v]
        return {v: 2 * less[v] + eq[v] + 1 for v in order}

    want = {}
    for rf, pairs in by_rf.items():
        xs = avg_double_ranks([p[0] for p in pairs])
        ys = avg_double_ranks([p[1] for p in pairs])
        n = len(pairs)
        sx = sum(xs[p[0]] for p in pairs)
        sy = sum(ys[p[1]] for p in pairs)
        sxy = sum(xs[p[0]] * ys[p[1]] for p in pairs)
        sxx = sum(xs[p[0]] ** 2 for p in pairs)
        syy = sum(ys[p[1]] ** 2 for p in pairs)
        varx, vary = n * sxx - sx * sx, n * syy - sy * sy
        if varx * vary <= 0:
            want[rf] = (n, 0)
        else:
            rho = (n * sxy - sx * sy) / math.sqrt(float(varx) * float(vary))
            want[rf] = (n, math.floor(rho * 1000000 + 0.5))

    got = {
        r.l_returnflag: (r.n_rows, r.spearman_micro)
        for r in REGISTRY["spearman_discount_qty"].fn(spark, SF).collect()
    }
    assert got == want
    # sanity: a rank correlation lives in [-1, 1] micro
    for _, (_, s) in got.items():
        assert -1000000 <= s <= 1000000


def test_txlog_roundtrip_versions_disagree_only_where_expected(spark):
    """txlog_gdpr_delete: version 1 must differ from version 0 exactly
    by the erased users' contribution."""
    rows = REGISTRY["txlog_gdpr_delete"].fn(spark, SF).collect()
    v0 = {r.event_type: (r.n_events, r.sum_cents) for r in rows if r.version == 0}
    v1 = {r.event_type: (r.n_events, r.sum_cents) for r in rows if r.version == 1}
    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            "user_id",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        )
    )
    erased = (
        ev.filter(F.col("user_id") % 10 == 0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
        .collect()
    )
    for r in erased:
        n0, s0 = v0[r.event_type]
        n1, s1 = v1.get(r.event_type, (0, 0))
        assert n0 - n1 == r.n
        assert s0 - s1 == r.s


def test_ljung_box_matches_bruteforce(spark):
    """Pure-Python Ljung-Box replay over the daily cents series."""
    import math
    from collections import defaultdict

    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            F.date_trunc("day", "ts").alias("d"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .collect()
    )
    daily = defaultdict(int)
    for r in ev:
        daily[r.d] += r.c
    d0 = min(daily)
    series = {(d - d0).days: c for d, c in daily.items()}
    n = len(series)
    m = sum(series.values()) // n
    y = {t: c - m for t, c in series.items()}
    acov0 = sum(v * v for v in y.values())
    s_int = 0
    for k in range(1, 11):
        acov = sum(
            y[t] * y[t + k] for t in y if t + k in y
        )
        rho = math.floor(acov / acov0 * 1000000 + 0.5)
        s_int += (rho * rho) // (n - k)
    q_micro = n * (n + 2) * s_int // 1000000
    row = REGISTRY["ljung_box_daily"].fn(spark, SF).first()
    assert row.n_days == n
    assert row.q_micro == q_micro
    assert row.whitenoise_rejected == (q_micro > 18_307_038)


def test_brown_forsythe_matches_bruteforce(spark):
    """Pure-Python Brown-Forsythe replay with the same quantization."""
    import math
    from collections import defaultdict

    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .collect()
    )
    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(r.c)
    zbars, stats = {}, {}
    for g, vals in groups.items():
        vals.sort()
        # the kernel picks the first value whose cumulative count
        # satisfies cum*2 >= n+1, i.e. position ceil((n+1)/2)
        med = vals[(len(vals) + 2) // 2 - 1]
        z = [abs(v - med) for v in vals]
        n, s1, s2 = len(z), sum(z), sum(v * v for v in z)
        stats[g] = (n, s1, s2)
        zbars[g] = s1 * 1000000 // n
    nn = sum(n for n, _, _ in stats.values())
    k = len(stats)
    gbar = sum(s1 for _, s1, _ in stats.values()) * 1000000 // nn
    ssb = sum(n * (zbars[g] - gbar) ** 2 for g, (n, _, _) in stats.items())
    ssw = sum(
        s2 * 10**12 - 2 * zbars[g] * s1 * 10**6 + n * zbars[g] ** 2
        for g, (n, s1, s2) in stats.items()
    )
    want = math.floor(
        float(nn - k) * float(ssb) / (float(k - 1) * float(ssw)) * 1000000
        + 0.5
    )
    row = REGISTRY["brown_forsythe_types"].fn(spark, SF).first()
    assert (row.n_total, row.k_groups, row.f_micro) == (nn, k, want)
