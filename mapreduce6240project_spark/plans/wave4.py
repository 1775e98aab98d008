"""Round-3 coverage wave: physical data layout (bucketed co-located
joins, partition-pruned scans) and an ORC source round-trip.

These are the write-side half of the 100 TB story: the other queries
show plans that *minimize* shuffles at read time; these show the
layouts that *eliminate* them -- bucketing pays a fact table's join
shuffle once at write time, directory partitioning turns a categorical
filter into directory pruning.  Plan shapes (zero Exchange under the
bucketed join, PartitionFilters on the pruned scan) are pinned in
tests/test_plans.py.

Money columns are summed in cent units (exact integers, associative)
so Spark's partial aggregation and DuckDB's serial sum agree bit-for-
bit -- the same fixed-point convention as the cluster-cost queries.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.layout import (
    bucketed_merge_join,
    read_partition,
    write_bucketed_table,
    write_partitioned,
)
from mapreduce6240project_spark.sources.tables import load_table

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


@_register(
    "bucketed_join_revenue",
    f"""
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum({_CENTS}) AS BIGINT) AS revenue_cents
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment""",
    ref="extension: shuffle-free equi-join via matched bucketing "
    "(HBase region co-location, kmeans.java:130-139, done Spark-native)",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two tables bucketed on the join key: the sort-merge join
    reads bucket i of each side in task i -- no Exchange anywhere in
    the plan (asserted in tests/test_plans.py)."""
    base = tempfile.mkdtemp(prefix="sparkgraft_bucketed_")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    write_bucketed_table(cust, "bkt_customer", "c_custkey", 8, f"{base}/cust")
    write_bucketed_table(orders, "bkt_orders", "c_custkey", 8, f"{base}/ord")
    joined = bucketed_merge_join(spark, "bkt_customer", "bkt_orders", "c_custkey")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"), F.sum(cents).alias("revenue_cents")
    )


@_register(
    "partitioned_scan_clicks",
    """
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_start,
       count(*) AS n,
       CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_micros
FROM events WHERE event_type = 'click'
GROUP BY hour_start""",
    ref="extension: categorical directory partitioning; the filter "
    "prunes directories, not rows (HBase column-family locality analog)",
)
def q_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lay events out partitioned by event_type, then aggregate one
    type: the predicate becomes a PartitionFilter -- non-click
    directories are never listed, let alone read."""
    out = tempfile.mkdtemp(prefix="sparkgraft_parts_")
    write_partitioned(load_table(spark, sf_dir, "events"), out, "event_type")
    clicks = read_partition(spark, out, "event_type", "click")
    micros = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    hour = (F.floor(F.col("ts").cast("long") / 3600) * 3600).cast("bigint")
    return clicks.groupBy(hour.alias("hour_start")).agg(
        F.count("*").alias("n"), F.sum(micros).alias("value_micros")
    )


@_register(
    "orc_roundtrip",
    f"""
SELECT o_orderstatus, count(*) AS n,
       CAST(sum({_CENTS}) AS BIGINT) AS total_cents
FROM orders GROUP BY o_orderstatus""",
    ref="S1/S5 analog: columnar ORC sink + source round-trip "
    "(second columnar format beside parquet)",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders as ORC, read it back, aggregate: exercises the
    second native columnar format end-to-end (schema preservation,
    predicate pushdown support comes free from the ORC reader)."""
    out = tempfile.mkdtemp(prefix="sparkgraft_orc_")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(cents).alias("total_cents")
    )
