"""Round-3 coverage wave 61: graph mixing and supply-chain reach.

- ``degree_assortativity``: degree-degree Pearson correlation over the
  similarity graph's symmetrized edges -- the mixing coefficient that
  says whether hubs attach to hubs (assortative, r > 0) or to leaves
  (disassortative, r < 0).  Both engines' ``corr`` aggregate is the
  same closed-form over sums, rounded to 4 digits (the established
  float-aggregate convention, cf. corr_by_returnflag).
- ``supplier_order_reach``: two-hop reach -- for each supplier, the
  number of distinct orders containing at least one part that supplier
  ships.  The blast-radius query of supply-chain analytics (a supplier
  failure touches these orders).  distinct (supplier, part) x distinct
  (part, order) joined on the part key, then a distinct count per
  supplier; every stage keyed and partial-aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.plans.wave5 import _SIMGRAPH_PAIRS_CTE
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "degree_assortativity",
    _SIMGRAPH_PAIRS_CTE
    + """
, und AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
),
deg AS (SELECT u, count(*) AS d FROM und GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       round(corr(du.d, dv.d), 4) AS assortativity
FROM und e JOIN deg du ON du.u = e.u JOIN deg dv ON dv.u = e.v""",
    ref="extension: degree assortativity (degree-degree Pearson over "
    "symmetrized edges) -- graph mixing coefficient; corr is the "
    "closed-form sum aggregate on both engines",
)
def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.graph import simgraph_pairs

    pairs = simgraph_pairs(spark, sf_dir)
    und = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("u").alias("eu"), F.col("d").alias("du"))
    dv = deg.select(F.col("u").alias("ev"), F.col("d").alias("dv"))
    e = und.join(du, und.u == du.eu).join(dv, und.v == dv.ev)
    return e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.round(F.corr("du", "dv"), 4).alias("assortativity"),
    )


@_register(
    "supplier_order_reach",
    """
WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
po AS (SELECT DISTINCT l_partkey, l_orderkey FROM lineitem)
SELECT sp.l_suppkey,
       CAST(count(DISTINCT po.l_orderkey) AS BIGINT) AS n_orders_reached
FROM sp JOIN po ON sp.l_partkey = po.l_partkey
GROUP BY 1""",
    ref="extension: supply-chain two-hop blast radius -- distinct "
    "(supplier, part) x (part, order) on the part key, distinct order "
    "count per supplier; all stages keyed",
)
def q_supplier_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sp = li.select("l_suppkey", "l_partkey").distinct()
    po = li.select("l_partkey", "l_orderkey").distinct()
    return (
        sp.join(po, "l_partkey")
        .groupBy("l_suppkey")
        .agg(F.count_distinct("l_orderkey").cast("bigint").alias("n_orders_reached"))
    )
