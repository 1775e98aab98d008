"""Semantic invariants for wave 33 (k-center selection, qsketch
rollup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.vectors import kcenter_select
from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_kcenter_greedy_replay(spark):
    rows = sorted(
        REGISTRY["kcenter_select_8"].fn(spark, SF).collect(),
        key=lambda r: r.round,
    )
    data = {
        r.vec_id: r.embedding
        for r in load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    import math

    q = {
        vid: [int(math.floor(float(x) * 1_000_000 + 0.5)) for x in v]
        for vid, v in data.items()
    }
    mult, inc, mod = 1103515245, 12345, 2147483648

    def pri(vid):
        return ((vid % mod) * mult + inc) % mod

    first = min(q, key=lambda v: (pri(v), v))
    assert (rows[0].round, rows[0].vec_id, rows[0].radius_sq) == (1, first, 0)

    def d(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    mind = {vid: d(qv, q[first]) for vid, qv in q.items()}
    for r_row in rows[1:]:
        # tie-break: highest mind, then lowest id
        top = max(mind.values())
        best = min(v for v in mind if mind[v] == top)
        assert (r_row.vec_id, r_row.radius_sq) == (best, top), r_row
        mind = {v: min(mv, d(q[v], q[best])) for v, mv in mind.items()}
    # radii are non-increasing (greedy coverage shrinks)
    radii = [r.radius_sq for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_kcenter_small_and_duplicate_inputs(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    rows = sorted(kcenter_select(df, k=5).collect(), key=lambda r: r.round)
    # stops once every point is at distance 0 from the chosen set
    assert len(rows) == 2
    assert rows[1].radius_sq == 1_000_000_000_000  # (1e6)^2


def test_qsketch_rollup_merge_property(spark):
    rows = REGISTRY["qsketch_grain_rollup"].fn(spark, SF).collect()
    days = {r.grain_key for r in rows} - {"all"}
    assert days and any(r.grain_key == "all" for r in rows)
    # per grain: p50 <= p90, totals consistent across labels
    by_key = {}
    for r in rows:
        by_key.setdefault(r.grain_key, {})[r.label] = r
    for key, d in by_key.items():
        assert set(d) == {"p50", "p90"}
        assert d["p50"].est_micros <= d["p90"].est_micros
        assert d["p50"].n_total == d["p90"].n_total
    # the all-grain total equals the sum of day totals (count merge)
    assert by_key["all"]["p50"].n_total == sum(
        by_key[k]["p50"].n_total for k in days
    )
    # sketch error bound: estimate within 1/8 relative of the exact
    # quantile (bucket relative width 1/16, midpoint reporting)
    ev = load_table(spark, SF, "events").filter(F.col("value") >= 0)
    exact = ev.selectExpr(
        "percentile(CAST(floor(value * 1000000 + 0.5) AS BIGINT), 0.5) AS p50"
    ).collect()[0].p50
    est = by_key["all"]["p50"].est_micros
    assert abs(est - exact) <= max(exact, 1) * 0.125
