"""Semantic invariants for wave 78 (fixed-width ingest, bag set-ops,
interleave schedule)."""

from __future__ import annotations

from unittest import mock

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_fixed_width_is_lossless(spark):
    """The round-trip aggregate must equal the direct aggregate."""
    from pyspark.sql import functions as F

    from mapreduce6240project_spark.sources.tables import load_table

    got = {
        r.o_orderstatus: (r.n_orders, r.total_c)
        for r in REGISTRY["fixed_width_roundtrip"].fn(spark, SF).collect()
    }
    direct = {
        r.o_orderstatus: (r.n, r.c)
        for r in load_table(spark, SF, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            ).alias("c"),
        )
        .collect()
    }
    assert got == direct


def test_except_all_multiplicity(spark):
    import mapreduce6240project_spark.plans.engineering as w78

    # cust 1: 3 open, 1 fulfilled -> survives twice; cust 2: 1 open,
    # 2 fulfilled -> eliminated; cust 3: fulfilled only -> absent.
    orders = spark.createDataFrame(
        [
            (1, "O"), (1, "O"), (1, "O"), (1, "F"),
            (2, "O"), (2, "F"), (2, "F"),
            (3, "F"),
        ],
        "o_custkey long, o_orderstatus string",
    )
    with mock.patch.object(w78, "load_table", lambda s, d, n: orders):
        out = {
            r.o_custkey: r.n_surviving
            for r in w78.q_orders_except_all(spark, SF).collect()
        }
    assert out == {1: 2}


def test_interleave_positions_unique_and_balanced(spark):
    rows = REGISTRY["interleave_schedule"].fn(spark, SF).collect()
    assert len(rows) == 500
    positions = [r.pos for r in rows]
    assert len(set(positions)) == len(positions)
    # any window of n_sources consecutive positions (within the range
    # where every source still has docs) holds n_sources distinct sources
    n_sources = len({r.source for r in rows})
    by_pos = {r.pos: r.source for r in rows}
    per_source = {}
    for r in rows:
        per_source[r.source] = per_source.get(r.source, 0) + 1
    full_rounds = min(per_source.values())
    for start in range(0, min(full_rounds * n_sources, 60), n_sources):
        window = {by_pos[p] for p in range(start, start + n_sources)}
        assert len(window) == n_sources
