"""Round-3 coverage wave 56: index-health and retrieval-effectiveness
metrics.

- ``ivf_cell_balance``: cell-size balance of the IVF index -- min, max
  and mean cell occupancy plus an integer imbalance ratio.  Cell skew is
  the IVF failure mode at scale (one hot cell turns probes into scans);
  this is the health gauge maintained alongside the index.
- ``retrieval_mrr_at10``: retrieval effectiveness against the label
  ground truth -- the query vector's label defines relevance, documents
  are ranked by exact cosine, and the query reports the rank of the
  first relevant hit, MRR in truncating permyriad (10000 // rank), and
  precision@10.  The standard IR eval loop as one registered query.
  The global ranking window is the eval protocol, sized for an eval
  sample; at corpus scale the same metric runs over the retriever's
  top-k candidates (TakeOrdered), not the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.extensions import _ivf_cells_sql
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "ivf_cell_balance",
    _ivf_cells_sql()
    + """
, cs AS (SELECT cell, count(*) AS n FROM af GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(n) AS BIGINT) AS n_vecs,
       CAST(min(n) AS BIGINT) AS min_cell,
       CAST(max(n) AS BIGINT) AS max_cell,
       CAST(max(n) * 10000 // (sum(n) // count(*)) AS BIGINT)
         AS imbalance_permyriad
FROM cs""",
    ref="extension: IVF cell-balance health gauge -- occupancy extremes "
    "+ integer max/mean imbalance ratio; the skew monitor for the "
    "bucketed-ANN scale path",
)
def q_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import ivf_assign

    cells = ivf_assign(load_table(spark, sf_dir, "embeddings"))
    cs = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    return cs.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n").cast("bigint").alias("n_vecs"),
        F.min("n").cast("bigint").alias("min_cell"),
        F.max("n").cast("bigint").alias("max_cell"),
        F.expr("max(n) * 10000 div (sum(n) div count(*))")
        .cast("bigint")
        .alias("imbalance_permyriad"),
    )


@_register(
    "retrieval_mrr_at10",
    """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv, label AS qlabel
           FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT e.vec_id, e.label,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                  CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(q.qv, q.qv))) AS s,
         q.qlabel
  FROM embeddings e, q WHERE e.vec_id <> 0
),
rk AS (
  SELECT label, qlabel,
         row_number() OVER (ORDER BY s DESC, vec_id) AS rank
  FROM sims
)
SELECT CAST(min(CASE WHEN label = qlabel THEN rank END) AS BIGINT)
         AS first_rel_rank,
       CAST(10000 // min(CASE WHEN label = qlabel THEN rank END) AS BIGINT)
         AS mrr_permyriad,
       CAST(sum(CASE WHEN rank <= 10 AND label = qlabel THEN 1 ELSE 0 END)
            AS BIGINT) AS rel_in_top10
FROM rk""",
    ref="extension: retrieval MRR / precision@10 against label ground "
    "truth -- exact cosine ranking (query vector excluded), integer "
    "reciprocal rank",
)
def q_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import cosine
    from mapreduce6240project_spark.plans.extensions import _query_vec

    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("label").first()
    qlabel = qrow.label
    qv = _query_vec(spark, sf_dir)
    q = F.array(*[F.lit(float(x)) for x in qv])
    sims = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", "label", cosine("embedding", q).alias("s")
    )
    rk = sims.select(
        "label",
        F.expr("row_number() OVER (ORDER BY s DESC, vec_id)").alias("rank"),
    )
    return rk.agg(
        F.min(F.when(F.col("label") == qlabel, F.col("rank")))
        .cast("bigint")
        .alias("first_rel_rank"),
        F.expr(
            f"10000 div min(CASE WHEN label = {qlabel} THEN rank END)"
        )
        .cast("bigint")
        .alias("mrr_permyriad"),
        F.sum(
            F.when((F.col("rank") <= 10) & (F.col("label") == qlabel), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("rel_in_top10"),
    )
