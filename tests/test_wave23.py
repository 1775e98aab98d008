"""Semantic invariants for the wave-23 utility operators (content
checksum, weighted median, last-touch attribution, Python DataSource).
The registry oracle test covers DuckDB value parity; these pin the
claims the oracle can't express (checksum sensitivity, brute-force
median/attribution equivalence, partitioned custom-source reads)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
_M61 = (1 << 61) - 1


def test_checksum_matches_local_reference(spark):
    """Python-side reference of the same canonical-row fingerprint."""
    got = REGISTRY["table_checksum_orders"].fn(spark, SF).collect()[0]
    rows = (
        load_table(spark, SF, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("total_c"),
            F.unix_micros("o_orderdate").alias("d_us"),
            "o_orderpriority",
        )
        .collect()
    )
    acc = 0
    for r in rows:
        s = "|".join(
            str(x)
            for x in (
                r.o_orderkey,
                r.o_custkey,
                r.o_orderstatus,
                r.total_c,
                r.d_us,
                r.o_orderpriority,
            )
        )
        acc += int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    assert got.n_rows == len(rows)
    assert got.checksum == acc % _M61


def test_checksum_detects_a_single_row_change(spark):
    """Same fingerprint over a 1-row-perturbed set must differ."""
    base = REGISTRY["table_checksum_orders"].fn(spark, SF).collect()[0]
    # recompute with one order's status flipped, via the same expression
    o = load_table(spark, SF, "orders")
    first_key = o.agg(F.min("o_orderkey")).collect()[0][0]
    mutated = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == first_key, F.lit("ZZ")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"),
        F.unix_micros(F.col("o_orderdate")),
        F.col("o_orderpriority"),
    )
    hv = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("bigint")
    alt = (
        mutated.select(hv.alias("hv"))
        .agg(F.sum(F.col("hv").cast("decimal(38,0)")).alias("s"))
        .select(F.expr(f"CAST(s % {_M61} AS BIGINT)").alias("checksum"))
        .collect()[0]
        .checksum
    )
    assert alt != base.checksum


def test_weighted_median_brute_force(spark):
    got = {
        r.flag: (r.weighted_median_c, r.total_qty)
        for r in REGISTRY["weighted_median_price"].fn(spark, SF).collect()
    }
    rows = (
        load_table(spark, SF, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("price_c"),
            F.floor(F.col("l_quantity") + F.lit(0.5))
            .cast("bigint")
            .alias("q"),
        )
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r.flag].append((r.price_c, r.q))
    for flag, vals in groups.items():
        vals.sort()
        tot = sum(q for _, q in vals)
        cum = 0
        med = None
        for price, q in vals:
            cum += q
            if 2 * cum >= tot:
                med = price
                break
        assert got[flag] == (med, tot)


def test_last_touch_brute_force(spark):
    got = {
        r.purchase_event_id: (r.click_event_id, r.gap_s)
        for r in REGISTRY["last_touch_attribution"].fn(spark, SF).collect()
    }
    ev = (
        load_table(spark, SF, "events")
        .select(
            "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
        )
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    want = {}
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.us, r.event_id))
        last_click = None
        for r in rows:
            if r.event_type == "click":
                last_click = r
            elif r.event_type == "purchase" and last_click is not None:
                gap = r.us - last_click.us
                if gap <= 86_400_000_000:
                    want[r.event_id] = (last_click.event_id, gap // 1_000_000)
    assert got == want
    assert got, "expected at least one attributed purchase"


def test_python_datasource_reads_all_rows_in_parallel(spark):
    from mapreduce6240project_spark.plans.engineering import _PYDS_N, _PYDS_PARTS

    df = REGISTRY["python_datasource_range"].fn(spark, SF)
    agg = df.agg(F.sum("n").alias("total")).collect()[0]
    assert agg.total == _PYDS_N
    # the source must expose real input partitions (parallel read path)
    assert _PYDS_PARTS > 1
    pages = {r.page for r in df.collect()}
    assert pages == set(range(7))
