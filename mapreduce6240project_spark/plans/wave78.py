"""Round-3 coverage wave 78: fixed-width ingest, bag set-ops, and the
training-mix interleave schedule.

- ``fixed_width_roundtrip``: the legacy mainframe-style source -- orders
  rendered as fixed-width text records (zero-padded key, one-char
  status, 14-digit cent amount, ISO date at fixed offsets), written
  through the text sink, read back and parsed with pure ``substring`` +
  cast expressions, then aggregated.  The oracle aggregates the source
  table directly: a lossless round-trip must reproduce it.  Render and
  parse are both map-only, codegen-friendly expression chains -- no
  UDFs.
- ``orders_except_all``: multiset (bag) set-difference coverage --
  ``EXCEPT ALL`` between the open-order and fulfilled-order customer
  key bags: a customer with 5 open and 2 fulfilled orders survives 3
  times.  Spark's ``exceptAll`` and DuckDB's ``EXCEPT ALL`` share
  semantics; the result is re-aggregated per customer so the output is
  order-insensitive.  (``acctbal_except`` covers the DISTINCT variant;
  this is the bag variant the reference's set ops lack.)
- ``interleave_schedule``: the deterministic round-robin data-mixing
  schedule a multi-source training run consumes -- per-source rank
  (window partitioned BY SOURCE, so it scales with per-source
  parallelism), source index from the tiny sorted source dimension
  (broadcast), position = (rank-1) * n_sources + source_index.
  Consecutive positions cycle through sources, the standard
  interleaving that keeps any batch window source-balanced.

Scale: all map-only or source-partitioned windows; the only global
object is the source dimension (a handful of rows, broadcast).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "fixed_width_roundtrip",
    """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_c
FROM orders GROUP BY 1""",
    ref="S1/S5 analogue: fixed-width text record sink + source "
    "round-trip -- substring-offset parsing, no delimiters; oracle is "
    "the direct aggregate (round-trip must be lossless)",
)
def q_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    # layout: [0:12) orderkey zero-padded | [12:13) status |
    #         [13:27) cents zero-padded   | [27:37) ISO date
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.col("o_orderstatus"),
        F.lpad(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").cast(
                "string"
            ),
            14,
            "0",
        ),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd"),
    )
    out = tempfile.mkdtemp(prefix="sparkgraft_fw_")
    o.select(line.alias("value")).write.mode("overwrite").text(out)
    back = spark.read.text(out).select(
        F.substring("value", 1, 12).cast("bigint").alias("o_orderkey"),
        F.substring("value", 13, 1).alias("o_orderstatus"),
        F.substring("value", 14, 14).cast("bigint").alias("cents"),
        F.substring("value", 28, 10).alias("o_orderdate"),
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("bigint").alias("total_c"),
    )


@_register(
    "orders_except_all",
    """
WITH diff AS (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_surviving
FROM diff GROUP BY 1""",
    ref="extension: bag-semantics EXCEPT ALL over customer order "
    "multisets (multiplicity-aware; DISTINCT variant is "
    "acctbal_except)",
)
def q_orders_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        open_keys.exceptAll(done_keys)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_surviving"))
    )


@_register(
    "interleave_schedule",
    """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
  FROM documents
), src AS (
  SELECT source,
         row_number() OVER (ORDER BY source) - 1 AS src_idx,
         count(*) OVER () AS n_sources
  FROM (SELECT DISTINCT source FROM documents)
)
SELECT r.doc_id, r.source,
       CAST((r.rk - 1) * s.n_sources + s.src_idx AS BIGINT) AS pos
FROM ranked r JOIN src s ON r.source = s.source""",
    ref="extension: deterministic round-robin source interleave for "
    "multi-source training mixes -- source-partitioned ranks + "
    "broadcast source dimension",
)
def q_interleave_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ranked = docs.withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("source").orderBy("doc_id")),
    )
    src = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (F.row_number().over(Window.orderBy("source")) - 1).alias(
                "src_idx"
            ),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n_sources"),
        )
    )
    return ranked.join(F.broadcast(src), "source").select(
        "doc_id",
        "source",
        ((F.col("rk") - 1) * F.col("n_sources") + F.col("src_idx"))
        .cast("bigint")
        .alias("pos"),
    )
