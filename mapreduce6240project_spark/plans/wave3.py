"""Round-2 coverage wave: embedding k-means (Lloyd's), cosine range
search, and the remaining classic relational shapes the engine should
answer (conditional-aggregate ratios, correlated-average subqueries,
HAVING-filtered join-backs, disjunctive predicate pushdown, scalar
subquery + anti join).

Every query except the iterative k-means loop carries a full DuckDB
oracle; the k-means *assignment step* is deterministic (LCG centroid
draw, first-min argmin) so the whole step replays in ANSI SQL the same
way the IVF index does in plans/extensions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.numeric import stable_sum_micros
from mapreduce6240project_spark.operators import vectors as V
from mapreduce6240project_spark.plans.extensions import _query_vec
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# embedding k-means + range search
# ---------------------------------------------------------------------------

# SQL mirror of operators.vectors: the same LCG centroid draw as the IVF
# oracle (lowest ((id % 2^31) * 1103515245 + 12345) % 2^31, ties ->
# lowest id), squared-L2 per (vector, centroid), first-min argmin via
# row_number ordered by (distance, cell).
_KMEANS_ASSIGN_CTE = """
WITH ranked AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv,
         ((vec_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS h
  FROM embeddings
),
cents AS (
  SELECT cv, row_number() OVER (ORDER BY h, vec_id) - 1 AS cell
  FROM ranked ORDER BY h, vec_id LIMIT 8
),
vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
dists AS (
  SELECT v.vec_id, c.cell,
         list_sum(list_transform(list_zip(v.ev, c.cv),
                                 s -> power(s[1] - s[2], 2))) AS d
  FROM vecs v CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cell, d,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
  FROM dists
)"""


@_register(
    "kmeans_assign_embeddings",
    # inertia sums per-row distances in 6-decimal fixed point: integer
    # sums are associative, so the total is identical under any
    # partial-aggregation order (a raw double sum rounded to 4 digits
    # can flip its last digit with partition count).
    _KMEANS_ASSIGN_CTE
    + """
SELECT CAST(cell AS INT) AS cluster, count(*) AS n_vectors,
       round(sum(CAST(floor(d * 1000000 + 0.5) AS BIGINT)) / 1000000.0, 4) AS inertia
FROM assign WHERE rn = 1 GROUP BY cell""",
    ref="extension: Lloyd assignment step (literal-centroid squared-L2 argmin)",
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = V.initial_centroids(emb, k=8)
    micro = F.floor(F.col("sq_dist") * 1000000 + F.lit(0.5)).cast("bigint")
    return (
        V.kmeans_assign(emb, cents)
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.sum(micro) / 1000000.0, 4).alias("inertia"),
        )
    )


@_register(
    "kmeans_embeddings",
    None,  # rows-only: float centroid means compound across iterations
    # (sum-order-sensitive), unlike the discrete medoid trajectory that
    # lets kmedoids_k3 unroll into an exact SQL replay
    ref="extension: full Lloyd's k-means over the embedding corpus",
)
def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    res = V.kmeans_embeddings(emb, k=8, max_iter=10, tol=1e-3)
    return V.kmeans_summary(res)


@_register(
    "embedding_range_search",
    """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT vec_id,
         list_dot_product(CAST(embedding AS DOUBLE[]), qv)
         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
            * sqrt(list_dot_product(qv, qv))) AS sim_raw
  FROM embeddings, q
)
SELECT vec_id, round(sim_raw, 4) AS sim FROM sims WHERE sim_raw >= 0.25""",
    ref="extension: threshold (radius) similarity search, narrow filter",
)
def q_embedding_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return V.cosine_range_search(emb, _query_vec(spark, sf_dir), threshold=0.25)


# ---------------------------------------------------------------------------
# relational shapes: Q14 / Q17 / Q18 / Q19 / Q22 patterns
# ---------------------------------------------------------------------------


@_register(
    "promo_revenue_ratio",
    """
SELECT round(100.0 * sum(CAST(floor((CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END) * 1000000 + 0.5) AS BIGINT)) / 1000000.0, 4)
         AS promo_revenue,
       round(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 1000000 + 0.5) AS BIGINT)) / 1000000.0, 4) AS total_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'""",
    ref="conditional-aggregate ratio (TPC-H Q14 shape); broadcast dim join",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.floor(
                        F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0) * 1000000
                        + F.lit(0.5)
                    ).cast("bigint")
                )
                / 1000000.0,
                4,
            ).alias("promo_revenue"),
            stable_sum_micros(rev).alias("total_revenue"),
        )
    )


@_register(
    "small_qty_revenue",
    """
SELECT round(sum(CAST(floor((l.l_extendedprice) * 1000000 + 0.5) AS BIGINT)) / 1000000.0 / 7.0, 4) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_cap
      FROM lineitem GROUP BY l_partkey) t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4' AND l.l_quantity < t.qty_cap""",
    ref="correlated-average subquery (TPC-H Q17 shape) as agg + re-join",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    caps = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        li.join(
            F.broadcast(p.filter(F.col("p_brand") == "Brand#4")),
            li.l_partkey == p.p_partkey,
        )
        .join(caps.withColumnRenamed("l_partkey", "_ck"), li.l_partkey == F.col("_ck"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.round(
                F.sum(
                    F.floor(F.col("l_extendedprice") * 1000000 + F.lit(0.5)).cast(
                        "bigint"
                    )
                )
                / 1000000.0
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


@_register(
    "large_orders",
    """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       round(sum(l.l_quantity), 4) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice""",
    ref="HAVING-filtered semi join-back (TPC-H Q18 shape)",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
    )


@_register(
    "disjunctive_parts_revenue",
    """
SELECT round(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 1000000 + 0.5) AS BIGINT)) / 1000000.0, 4) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 21)
   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#16' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 40)""",
    ref="disjunctive multi-attribute predicate (TPC-H Q19 shape)",
)
def q_disjunctive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    ) | (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#16")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 40)
    )
    return j.filter(cond).agg(
        stable_sum_micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


@_register(
    "idle_rich_customers",
    """
WITH cutoff AS (
  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment, count(*) AS n_custs,
       round(sum(CAST(floor((c.c_acctbal) * 1000000 + 0.5) AS BIGINT)) / 1000000.0, 4) AS total_acctbal
FROM customer c, cutoff
WHERE c.c_acctbal > cutoff.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c.c_mktsegment""",
    ref="scalar subquery + anti join (TPC-H Q22 shape)",
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cutoff = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            stable_sum_micros("c_acctbal").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# round-3 curation wave: per-source caps, deterministic training shards,
# corpus-statistics quality scoring
# ---------------------------------------------------------------------------

#: SQL fragment: normalized text (mirror of operators.dedup.normalize_text)
_NORM3 = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
#: SQL fragment: the LCG draw shared with operators.sampling.seed_hash
_LCG = "((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648"


@_register(
    "source_cap_50",
    f"""
SELECT doc_id, source, source_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY {_LCG}, doc_id)
           AS source_rank
  FROM documents) WHERE source_rank <= 50""",
    ref="extension: per-source document cap (web-curation domain quota)",
)
def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.curation import source_cap

    docs = load_table(spark, sf_dir, "documents")
    return source_cap(docs, max_per_source=50).select(
        "doc_id", "source", "source_rank"
    )


@_register(
    "training_shards",
    f"""
SELECT doc_id, CAST(h % 16 AS INT) AS shard,
       row_number() OVER (
         PARTITION BY h % 16
         ORDER BY ((h % 2147483648) * 1103515245 + 12345) % 2147483648, doc_id)
         AS pos
FROM (SELECT doc_id, {_LCG} AS h FROM documents)""",
    ref="extension: deterministic shuffle + sharding for training output",
)
def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.curation import training_shards

    return training_shards(load_table(spark, sf_dir, "documents"), n_shards=16)


@_register(
    "token_frequency_score",
    f"""
WITH tok AS (SELECT doc_id, unnest(string_split({_NORM3}, ' ')) AS t FROM documents),
freqs AS (SELECT t, count(*) AS freq FROM tok GROUP BY t)
SELECT doc_id, count(*) AS n_tokens,
       round(sum(freq)::DOUBLE / count(*), 4) AS mean_token_freq,
       round(sum(CASE WHEN freq <= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4)
         AS rare_ratio
FROM tok JOIN freqs USING (t) GROUP BY doc_id""",
    ref="extension: corpus-frequency quality proxy (integer-exact unigram score)",
)
def q_token_frequency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.textstats import token_frequency_score

    return token_frequency_score(load_table(spark, sf_dir, "documents"))
