"""Bloom filter: no false negatives; FP rate within reason."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.sketch import (
    bloom_might_contain,
    bloom_semi_filter,
    build_bloom,
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
