"""Round-3 coverage wave 28: graph ML primitives over the co-purchase
graph.

The graph: parts are nodes, an edge connects two parts that appear in
at least TWO common orders (the support-filtered market-basket
projection -- a single co-occurrence is coincidence, and the raw
projection is quadratically dense).  Unlike the
similarity graph -- whose planted duplicate clusters are CLIQUES, so
every common-neighbor pair is already adjacent and link prediction is
vacuously empty -- the co-purchase projection has genuine open
wedges.

- ``adamic_adar_topk``: link prediction -- Adamic-Adar scores
  ``sum_z 1/ln(deg z)`` over common neighbors ``z`` of non-adjacent
  part pairs, top 20.  The two-hop candidate join is keyed on the
  shared neighbor (bounded by sum-of-degree-squares, the same budget
  as triangle counting), existing edges are removed with an anti-join,
  and the per-neighbor contributions are micro-floored BEFORE summing
  so the cross-engine aggregate is order-free (every z on a candidate
  pair has degree >= 2, so ``ln(deg)`` never vanishes).
- ``random_walks_k3``: deterministic 3-step random walks from every
  node -- the node2vec-style corpus generator, made replayable by
  drawing each step from the md5 hash of (current node, step) modulo
  the node's degree over its id-sorted adjacency list.  Each step is
  one join keyed on the current node; the walk table never exceeds one
  row per start node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.hashing import hash60
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

#: co-purchase edge replay: ends after ``edges`` so consumers append
_NEIGHBOR_CAP = 32

_COPURCHASE_EDGES_CTE = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
cp AS (
  SELECT a.l_partkey AS id_a, b.l_partkey AS id_b,
         CAST(count(*) AS BIGINT) AS sup
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
sym AS (
  SELECT id_a AS u, id_b AS v, sup FROM cp
  UNION ALL
  SELECT id_b AS u, id_a AS v, sup FROM cp
),
edges AS (
  SELECT u, v FROM (
    SELECT u, v,
           row_number() OVER (PARTITION BY u ORDER BY sup DESC, v) AS nrk
    FROM sym
  ) WHERE nrk <= {_NEIGHBOR_CAP}
)"""


def _copurchase_edges_with_pairs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(capped symmetric edges, uncapped canonical a<b pairs)."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = op.alias("a")
    b = op.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("pb")
    ).alias("b")
    # support >= 2: a single co-occurrence is coincidence, and the raw
    # projection is quadratically dense (1.2M edges over 20k parts at
    # sf0.1 -> sum-of-deg^2 ~ 3e8 two-hop rows); the support filter is
    # the standard sparsifier and leaves the graph signal-bearing
    # (~3.5k edges).  At higher density scale the threshold with it.
    cp = (
        a.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("pb"))
        .groupBy(F.col("l_partkey").alias("id_a"), F.col("pb").alias("id_b"))
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= 2)
    )
    sym = cp.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v"), "sup"
    ).unionByName(
        cp.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"), "sup")
    )
    # deterministic top-K adjacency cap: support filtering alone stops
    # sparsifying once density grows (every coincidence pair gains
    # copies), but a per-node neighbor cap bounds sum-of-deg^2 at
    # N*K^2 REGARDLESS of density -- the production answer for
    # two-hop operators on skewed graphs.  Ordered by (support desc,
    # id) so the kept edges are the strongest and the cut is stable.
    w_cap = Window.partitionBy("u").orderBy(F.col("sup").desc(), "v")
    capped = (
        sym.withColumn("nrk", F.row_number().over(w_cap))
        .filter(F.col("nrk") <= _NEIGHBOR_CAP)
        .select("u", "v")
    )
    return capped, cp.select("id_a", "id_b")


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _copurchase_edges_with_pairs(spark, sf_dir)[0]


@_register(
    "adamic_adar_topk",
    _COPURCHASE_EDGES_CTE
    + """,
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
hops AS (
  SELECT e1.u AS a, e2.v AS b, e1.v AS z
  FROM edges e1 JOIN edges e2 ON e1.v = e2.u
  WHERE e1.u < e2.v
),
scored AS (
  SELECT a, b,
         CAST(sum(CAST(floor(1000000.0 / ln(CAST(d AS DOUBLE)) + 0.5) AS BIGINT)) AS BIGINT) AS aa_micro,
         CAST(count(*) AS BIGINT) AS n_common
  FROM hops JOIN deg ON hops.z = deg.u
  GROUP BY a, b
),
new_links AS (
  -- exclude edges of the UNCAPPED support-filtered graph: the top-K
  -- cap can cut a real edge from one side's list, and a directed
  -- check against capped edges would resurface it as a "prediction"
  SELECT s.a, s.b, s.aa_micro, s.n_common
  FROM scored s
  WHERE NOT EXISTS (SELECT 1 FROM cp p
                    WHERE p.id_a = s.a AND p.id_b = s.b)
)
SELECT a, b, aa_micro, n_common FROM new_links
ORDER BY aa_micro DESC, a, b LIMIT 20""",
    ref="extension: Adamic-Adar link prediction on the co-purchase "
    "graph -- two-hop common-neighbor join (degree-squared bounded), "
    "anti-join against existing edges, per-neighbor 1/ln(deg) "
    "micro-floored before the order-free sum, deterministic top-20",
)
def q_adamic_adar_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no persist: the support-filtered edge set is a few thousand rows
    # and recomputation is cheaper than pinning executor cache for the
    # session lifetime (these query fns return lazy frames, so there is
    # no safe point to unpersist)
    edges, cp = _copurchase_edges_with_pairs(spark, sf_dir)
    deg = edges.groupBy("u").agg(F.count("*").alias("d"))
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("z"))
    e2 = edges.select(F.col("u").alias("z2"), F.col("v").alias("b"))
    hops = e1.join(e2, e1.z == e2.z2).filter(F.col("a") < F.col("b"))
    contrib = F.floor(
        F.lit(1000000.0) / F.log(F.col("d").cast("double")) + F.lit(0.5)
    ).cast("bigint")
    scored = (
        hops.join(deg, hops.z == deg.u)
        .groupBy("a", "b")
        .agg(
            F.sum(contrib).alias("aa_micro"),
            F.count("*").alias("n_common"),
        )
    )
    # anti-join against the UNCAPPED pair set (see oracle comment)
    existing = cp.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    new_links = scored.join(existing, ["a", "b"], "left_anti")
    return new_links.orderBy(F.col("aa_micro").desc(), "a", "b").limit(20)


@_register(
    "random_walks_k3",
    _COPURCHASE_EDGES_CTE
    + """,
nb AS (
  SELECT u, v,
         row_number() OVER (PARTITION BY u ORDER BY v) AS rk,
         count(*) OVER (PARTITION BY u) AS deg
  FROM edges
),
s1 AS (
  SELECT u AS start, v AS n1 FROM nb
  WHERE rk = ('0x' || substr(md5(u || ':1'), 1, 15))::BIGINT % deg + 1
),
s2 AS (
  SELECT s1.start, s1.n1, nb.v AS n2 FROM s1 JOIN nb ON nb.u = s1.n1
  WHERE nb.rk = ('0x' || substr(md5(s1.n1 || ':2'), 1, 15))::BIGINT
                % nb.deg + 1
),
s3 AS (
  SELECT s2.start, s2.n1, s2.n2, nb.v AS n3 FROM s2 JOIN nb ON nb.u = s2.n2
  WHERE nb.rk = ('0x' || substr(md5(s2.n2 || ':3'), 1, 15))::BIGINT
                % nb.deg + 1
)
SELECT start, n1, n2, n3 FROM s3""",
    ref="extension: deterministic random-walk corpus (node2vec-style) "
    "over the co-purchase graph -- each step drawn from md5(current "
    "node, step) mod degree over the id-sorted adjacency; one "
    "current-node-keyed join per step",
)
def q_random_walks_k3(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf_dir)
    w = Window.partitionBy("u").orderBy("v")
    nb = edges.select(
        "u",
        "v",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("u")).alias("deg"),
    )

    def pick(step: int) -> F.Column:
        h = hash60(F.concat(F.col("u").cast("string"), F.lit(f":{step}")))
        return h % F.col("deg") + 1

    walk = nb.filter(F.col("rk") == pick(1)).select(
        F.col("u").alias("start"), F.col("v").alias("n1")
    )
    step2 = nb.filter(F.col("rk") == pick(2)).select(
        F.col("u").alias("c2"), F.col("v").alias("n2")
    )
    walk = walk.join(step2, walk.n1 == step2.c2).select("start", "n1", "n2")
    step3 = nb.filter(F.col("rk") == pick(3)).select(
        F.col("u").alias("c3"), F.col("v").alias("n3")
    )
    walk = walk.join(step3, walk.n2 == step3.c3).select(
        "start", "n1", "n2", "n3"
    )
    return walk
