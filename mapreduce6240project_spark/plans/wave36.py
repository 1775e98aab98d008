"""Round-3 coverage wave 36: positional phrase retrieval and two
embedding-index audits.

- ``phrase_match_docs``: exact phrase query through the positional
  inverted-index shape -- postings filtered to the phrase's three terms
  FIRST, then reassembled by (doc, pos - i) equi-joins.  On a prebuilt
  term-sharded index this touches three posting lists instead of every
  document byte.
- ``matryoshka_recall16``: recall@10 of cosine top-k computed over only
  the first 16 of 64 dimensions vs the exact full-width top-k -- the
  audit behind shipping a truncated-dimension first-pass retriever at
  1/4 the arithmetic.
- ``knn_graph_top3``: the approximate kNN graph (top-3 same-IVF-cell
  neighbors per vector) -- substrate for graph-based dedup clustering;
  within-cell self-join keeps pair work O(N^1.5) with sqrt(N) balanced
  k-means cells, and WindowGroupLimit bounds per-source state to k rows.

Reference parity note: the reference has no retrieval/vector surface;
these belong to the LLM-data-pipeline extension mandated alongside
SURVEY.md section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce6240project_spark.operators.retrieval import phrase_match
from mapreduce6240project_spark.operators.similarity import knn_graph, matryoshka_recall
from mapreduce6240project_spark.plans.extensions import _ivf_cells_sql, _query_vec
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_PHRASE = "big order scan"


@_register(
    "phrase_match_docs",
    f"""
WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
m AS (
  SELECT doc_id
  FROM t, unnest(generate_series(1, len(w) - 2)) a(i)
  WHERE w[i] = 'big' AND w[i + 1] = 'order' AND w[i + 2] = 'scan'
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
FROM m GROUP BY 1""",
    ref="extension: positional-index phrase query -- term-filtered "
    "postings reassembled by (doc, pos - i) equi-joins; index shape, "
    "not scan shape",
)
def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    return phrase_match(load_table(spark, sf_dir, "documents"), _PHRASE)


@_register(
    "matryoshka_recall16",
    """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT e.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                  CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(q.qv, q.qv))) AS s_full,
         list_dot_product(list_slice(CAST(e.embedding AS DOUBLE[]), 1, 16),
                          list_slice(q.qv, 1, 16))
         / (sqrt(list_dot_product(list_slice(CAST(e.embedding AS DOUBLE[]), 1, 16),
                                  list_slice(CAST(e.embedding AS DOUBLE[]), 1, 16)))
            * sqrt(list_dot_product(list_slice(q.qv, 1, 16),
                                    list_slice(q.qv, 1, 16)))) AS s_pre
  FROM embeddings e, q
),
tf AS (SELECT vec_id FROM (
  SELECT vec_id, row_number() OVER (ORDER BY s_full DESC, vec_id) AS rn FROM s)
  WHERE rn <= 10),
tp AS (SELECT vec_id FROM (
  SELECT vec_id, row_number() OVER (ORDER BY s_pre DESC, vec_id) AS rn FROM s)
  WHERE rn <= 10)
SELECT CAST(10 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_overlap,
       CAST(100 * count(*) // 10 AS BIGINT) AS recall_pct
FROM tf JOIN tp USING (vec_id)""",
    ref="extension: truncated-dimension (matryoshka) retrieval audit -- "
    "two TakeOrderedAndProject top-k rankings + k-row overlap join",
)
def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return matryoshka_recall(emb, _query_vec(spark, sf_dir), prefix_dims=16, k=10)


@_register(
    "knn_graph_top3",
    _ivf_cells_sql()
    + """
, un AS (
  SELECT vec_id,
         list_transform(ev, v -> v / sqrt(list_dot_product(ev, ev))) AS uv
  FROM vecs
),
sims AS (
  SELECT a.vec_id AS src, b.vec_id AS nbr,
         list_dot_product(ua.uv, ub.uv) AS s
  FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id <> b.vec_id
  JOIN un ua ON ua.vec_id = a.vec_id
  JOIN un ub ON ub.vec_id = b.vec_id
),
rk AS (
  SELECT src, nbr, s,
         row_number() OVER (PARTITION BY src ORDER BY s DESC, nbr) AS rank
  FROM sims
)
SELECT src, CAST(rank AS BIGINT) AS rank, nbr, round(s, 4) AS cos_sim
FROM rk WHERE rank <= 3""",
    ref="extension: approximate kNN graph via IVF-bucketed self-join "
    "(O(N^1.5) pair work with sqrt(N) k-means cells) + WindowGroupLimit "
    "rank<=k per source",
)
def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn_graph(load_table(spark, sf_dir, "embeddings"), k=3)
