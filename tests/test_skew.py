"""Skew operators: salted results must equal their unsalted twins."""

from __future__ import annotations

from mapreduce6240project_spark.operators.skew import (
    salted_broadcast_join,
    salted_count,
    salted_sum,
)
from mapreduce6240project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_salted_count_equals_plain(spark):
    ev = load_table(spark, SF, "events")
    plain = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    salted = {r.event_type: r.n
              for r in salted_count(ev, "event_type", id_cols=["event_id"]).collect()}
    assert plain == salted


def test_salted_sum_equals_plain(spark):
    ev = load_table(spark, SF, "events")
    import pyspark.sql.functions as F
    plain = {r.user_id: r.s for r in
             ev.groupBy("user_id").agg(F.round(F.sum("value"), 4).alias("s")).collect()}
    salted = {r.user_id: r.sum_value
              for r in salted_sum(ev, "user_id", "value", id_cols=["event_id"]).collect()}
    assert plain == salted


def test_salted_broadcast_join_equals_plain(spark):
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = o.join(c, "o_custkey").count()
    salted = salted_broadcast_join(o, c, "o_custkey", n_salts=8).count()
    assert plain == salted
