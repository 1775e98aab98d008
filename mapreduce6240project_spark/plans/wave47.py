"""Round-3 coverage wave 47: retrieval/dedup cross-validation metrics.

- ``minhash_recall_audit``: LSH candidate recall against the exact
  Jaccard ground truth at the same threshold -- (n_exact, n_lsh,
  n_common, recall_permyriad).  The oracle asserts COMPLETE recall
  (n_lsh == n_exact): MinHash bands at 64 hashes / 16 bands have
  near-1 collision probability above J=0.5, and the planted-duplicate
  tests pin it; a band-recall regression turns this driver row red,
  which is exactly what an audit row is for.
- ``rank_footrule_sparse_dense``: Spearman-footrule distance between
  the BM25 top-50 and the dense-cosine top-50 over their shared
  documents -- the integer rank-agreement metric that tells a RAG
  pipeline how complementary (or redundant) its two retrievers are
  before fusing them.  Reuses the rrf query's ranking CTEs verbatim so
  the three retrieval queries can never drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators import dedup as D
from mapreduce6240project_spark.operators import retrieval as R
from mapreduce6240project_spark.plans.extensions import _ngram_jaccard_sql
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.plans.wave5 import _QUERY_TERMS, _RRF_SQL
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "minhash_recall_audit",
    f"""
WITH n AS (SELECT count(*) AS n FROM ({_ngram_jaccard_sql(0.5)}))
SELECT CAST(n AS BIGINT) AS n_exact, CAST(n AS BIGINT) AS n_lsh,
       CAST(n AS BIGINT) AS n_common,
       CAST(10000 AS BIGINT) AS recall_permyriad
FROM n""",
    ref="extension: MinHash-LSH recall audit vs exact Jaccard ground "
    "truth; the oracle pins complete band recall, so any recall "
    "regression fails the driver row",
)
def q_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lsh = D.jaccard_verified_pairs(
        docs, D.minhash_candidate_pairs(docs), threshold=0.5
    ).select("id_a", "id_b")
    exact = D.ngram_jaccard_pairs(docs, threshold=0.5).select("id_a", "id_b")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    n_common = lsh.join(exact, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).alias("n_common")
    )
    return (
        n_exact.crossJoin(F.broadcast(n_lsh))
        .crossJoin(F.broadcast(n_common))
        .select(
            "n_exact",
            "n_lsh",
            "n_common",
            F.expr(
                "CASE WHEN n_exact = 0 THEN 10000"
                " ELSE n_common * 10000 div n_exact END"
            )
            .cast("bigint")
            .alias("recall_permyriad"),
        )
    )


_FOOTRULE_SQL = (
    _RRF_SQL.split(",\nfused AS (")[0]
    + """
SELECT CAST(count(*) AS BIGINT) AS n_shared,
       CAST(sum(abs(rank_a - rank_b)) AS BIGINT) AS footrule
FROM bm_rank a JOIN dense_rank_ b USING (doc_id)"""
)


@_register(
    "rank_footrule_sparse_dense",
    _FOOTRULE_SQL,
    ref="extension: Spearman-footrule rank distance between BM25 and "
    "dense-cosine top-50 (shared docs) -- integer retriever-agreement "
    "metric; ranking CTEs shared verbatim with rrf_fuse_topk",
)
def q_rank_footrule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators import similarity as S
    from mapreduce6240project_spark.plans.extensions import _query_vec

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    sparse = R.bm25_topk(docs, list(_QUERY_TERMS), k=50).withColumn(
        "rank_a",
        F.row_number().over(Window.orderBy(F.desc("score_micros"), "doc_id")),
    )
    dense = (
        S.cosine_topk(emb, _query_vec(spark, sf_dir), k=50)
        .withColumnRenamed("vec_id", "doc_id")
        .withColumn(
            "rank_b",
            F.row_number().over(Window.orderBy(F.desc("sim"), "doc_id")),
        )
    )
    shared = sparse.select("doc_id", "rank_a").join(
        dense.select("doc_id", "rank_b"), "doc_id"
    )
    return shared.agg(
        F.count(F.lit(1)).alias("n_shared"),
        F.sum(F.abs(F.col("rank_a") - F.col("rank_b")))
        .cast("bigint")
        .alias("footrule"),
    )
