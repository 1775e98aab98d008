"""Bloom filter: no false negatives; FP rate within reason."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.sketch import (
    bloom_might_contain,
    bloom_semi_filter,
    build_bloom,
    cms_build,
    cms_estimate,
    cms_oracle_sql,
    hll_distinct,
    hll_oracle_sql,
)
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_no_false_negatives(spark):
    c = load_table(spark, SF, "customer")
    o = load_table(spark, SF, "orders")
    exact = o.join(c, o.o_custkey == c.c_custkey, "left_semi")
    probable = bloom_semi_filter(o, c, "o_custkey", "c_custkey")
    # every exact member must pass the bloom (superset property)
    missed = exact.join(probable, "o_orderkey", "left_anti").count()
    assert missed == 0
    assert probable.count() >= exact.count()


def test_false_positive_rate_reasonable(spark):
    c = load_table(spark, SF, "customer")  # 150 keys, m=8192, k=4 -> tiny FP
    bitmap = build_bloom(c, "c_custkey", m=8192, k=4)
    probes = spark.range(10_000, 20_000).withColumnRenamed("id", "key")
    fp = probes.filter(bloom_might_contain(bitmap, "key", m=8192, k=4)).count()
    assert fp < 100  # ~1% of 10k at worst for this load factor


def test_membership_expression_is_narrow(spark):
    c = load_table(spark, SF, "customer")
    bitmap = build_bloom(c, "c_custkey")
    o = load_table(spark, SF, "orders")
    probed = o.filter(bloom_might_contain(bitmap, "o_custkey"))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # probe is a pure filter over the scan


# ---------------------------------------------------------------------------
# Portable HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_estimate_within_error_bound(spark):
    # standard error of plain HLL is ~1.04/sqrt(m); allow 5 sigma
    n = 5000
    keys = spark.range(n).withColumnRenamed("id", "k")
    est = hll_distinct(keys, "k", b=8).collect()[0].n_approx
    sigma = 1.04 / (256**0.5)
    assert abs(est - n) / n < 5 * sigma


def test_hll_matches_duckdb_oracle(spark, duck):
    got = hll_distinct(load_table(spark, SF, "events"), "user_id").collect()[0].n_approx
    want = duck.sql(hll_oracle_sql("events", "user_id")).fetchone()[0]
    assert got == want


def test_hll_ignores_nulls_and_duplicates(spark):
    from pyspark.sql import functions as F

    base = spark.range(1000).select(
        F.when(F.col("id") < 100, F.col("id") % 10).alias("k")  # nulls for id>=100
    )
    est = hll_distinct(base, "k").collect()[0].n_approx
    assert est == 10  # linear-counting regime is exact-ish at tiny cardinality


def test_hll_single_register_exchange(spark):
    regs = hll_distinct(load_table(spark, SF, "events"), "user_id")
    plan = regs._jdf.queryExecution().executedPlan().toString()
    # exactly the two agg exchanges (register table, then 1-row final);
    # no join, no sort, nothing proportional to input size crosses the wire
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan


def test_hll_empty_and_all_null_estimate_zero(spark, duck):
    empty = spark.range(0).withColumnRenamed("id", "k")
    assert hll_distinct(empty, "k").collect()[0].n_approx == 0
    allnull = spark.range(100).select(F.lit(None).cast("string").alias("k"))
    assert hll_distinct(allnull, "k").collect()[0].n_approx == 0
    duck.sql("CREATE OR REPLACE VIEW _hll_empty AS SELECT CAST(NULL AS VARCHAR) AS k WHERE false")
    assert duck.sql(hll_oracle_sql("_hll_empty", "k")).fetchone()[0] == 0


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    # 26 distinct keys into 4x1024 counters: collisions are unlikely, so
    # estimates should be exact; the >= invariant must hold regardless
    occ = spark.createDataFrame(
        [(chr(97 + i % 26),) for i in range(2600)], ["k"]
    )
    sk = cms_build(occ, "k")
    exact = occ.groupBy("k").count().withColumnRenamed("count", "n_exact")
    est = cms_estimate(sk, exact, "k").collect()
    assert len(est) == 26
    for r in est:
        assert r.n_cms >= r.n_exact
        assert r.n_cms == r.n_exact  # no collisions at this load factor


def test_cms_build_bounded_rows_and_single_exchange(spark):
    docs = load_table(spark, SF, "documents")
    occ = docs.select(F.explode_outer(F.split(F.lower("text"), " ")).alias("t"))
    sk = cms_build(occ, "t", w=64, d=4)
    assert sk.count() <= 64 * 4  # sketch size independent of vocabulary
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # one partial-agg shuffle, d*w rows


def test_cms_matches_duckdb_oracle_on_custom_relation(spark, duck):
    occ = spark.createDataFrame([("x",)] * 5 + [("y",)] * 3 + [(None,)], ["k"])
    sk = cms_build(occ, "k")
    cand = spark.createDataFrame([("x", 5), ("y", 3)], ["k", "n_exact"])
    got = {r.k: r.n_cms for r in cms_estimate(sk, cand, "k").collect()}
    sql = cms_oracle_sql(
        "SELECT * FROM (VALUES ('x'),('x'),('x'),('x'),('x'),('y'),('y'),('y'),"
        "(CAST(NULL AS VARCHAR))) AS t(k)",
        "k",
        topk=2,
    )
    want = {r[0]: r[2] for r in duck.sql(sql).fetchall()}
    assert got == want == {"x": 5, "y": 3}


def test_quantile_sketch_accuracy_and_merge(spark):
    from pyspark.sql import functions as F

    from mapreduce6240project_spark.operators.sketch import (
        quantile_sketch,
        quantile_sketch_estimate,
    )
    from mapreduce6240project_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    est = {
        r.label: r.est_micros
        for r in quantile_sketch_estimate(
            quantile_sketch(ev, "value"), {"p50": 0.5, "p90": 0.9, "p99": 0.99}
        ).collect()
    }
    exact = {
        label: ev.agg(
            F.percentile(
                F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint"), q
            )
        ).first()[0]
        for label, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
    }
    for label, e in est.items():
        x = exact[label]
        assert abs(e - x) <= max(0.0725 * x, 1), (label, e, x)  # <= bucket rel err

    # merge property: sketch(A) + sketch(B) == sketch(A union B)
    a = ev.filter("event_id % 2 = 0")
    b = ev.filter("event_id % 2 = 1")
    merged = (
        quantile_sketch(a, "value")
        .unionByName(quantile_sketch(b, "value"))
        .groupBy("bid")
        .agg(F.sum("n").alias("n"))
    )
    whole = quantile_sketch(ev, "value")
    got = {r.bid: r.n for r in merged.collect()}
    want = {r.bid: r.n for r in whole.collect()}
    assert got == want
