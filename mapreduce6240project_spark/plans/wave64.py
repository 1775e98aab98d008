"""Round-3 coverage wave 64: deletion impact and schema evolution.

- ``gdpr_delete_impact``: the right-to-be-forgotten impact report --
  given a subject set (user/customer keys = 0 mod 97), how many rows
  each table loses, including the two-hop cascade (customer -> orders
  -> lineitem).  The query every deletion pipeline runs BEFORE
  executing, and the shape is all semi-join counts -- no data moves.
- ``schema_evolution_roundtrip``: parquet schema evolution -- two file
  generations (v1 without ``lang``, v2 with it) written to one dataset,
  read back with ``mergeSchema``; the query proves the merged read
  reconciles (v1 rows surface with NULL lang, totals add up).  The
  lakehouse capability that lets a 100 TB table grow columns without
  rewriting history.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_MOD = 97


@_register(
    "gdpr_delete_impact",
    f"""
SELECT 'customer' AS table_name,
       CAST((SELECT count(*) FROM customer WHERE c_custkey % {_MOD} = 0)
            AS BIGINT) AS n_rows
UNION ALL
SELECT 'orders',
       CAST((SELECT count(*) FROM orders WHERE o_custkey % {_MOD} = 0)
            AS BIGINT)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT count(*) FROM lineitem l
             WHERE EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey
                             AND o.o_custkey % {_MOD} = 0)) AS BIGINT)
UNION ALL
SELECT 'events',
       CAST((SELECT count(*) FROM events WHERE user_id % {_MOD} = 0)
            AS BIGINT)""",
    ref="extension: GDPR deletion impact report -- subject-keyed "
    "semi-join counts incl. the customer -> orders -> lineitem cascade; "
    "runs before any delete executes",
)
def q_gdpr_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    doomed_orders = orders.filter(F.col("o_custkey") % _MOD == 0).select(
        "o_orderkey"
    )
    counts = [
        ("customer", cust.filter(F.col("c_custkey") % _MOD == 0)),
        ("orders", orders.filter(F.col("o_custkey") % _MOD == 0)),
        (
            "lineitem",
            li.join(
                doomed_orders, li.l_orderkey == doomed_orders.o_orderkey,
                "left_semi",
            ),
        ),
        ("events", ev.filter(F.col("user_id") % _MOD == 0)),
    ]
    outs = [
        df.agg(F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n_rows"))
        for name, df in counts
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@_register(
    "schema_evolution_roundtrip",
    """
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_v1_null_lang,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_v2_with_lang
FROM documents""",
    ref="extension: parquet schema evolution -- v1 files (no lang) + v2 "
    "files (with lang) in one dataset, mergeSchema read; the oracle is "
    "the reconciliation spec (v1 rows NULL out the new column)",
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="sparkgraft_evo_")
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source").write.mode(
        "overwrite"
    ).parquet(f"{out}/gen=v1")
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", "lang"
    ).write.mode("overwrite").parquet(f"{out}/gen=v2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/gen=v1", f"{out}/gen=v2"
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("lang").isNull().cast("bigint")).alias("n_v1_null_lang"),
        F.sum(F.col("lang").isNotNull().cast("bigint")).alias("n_v2_with_lang"),
    )
