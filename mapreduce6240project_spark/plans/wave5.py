"""Round-3 coverage wave: retrieval (BM25, reciprocal-rank fusion),
exact similarity join via prefix filtering, graph triangle counting,
corpus-trained char-LM quality scoring, Z-order layout keys, and
decayed rolling features.

Everything here is LLM-pipeline extension surface (the reference's
analytics stop at group-by aggregation, Analysis.java); each query has
a full DuckDB oracle.  Float work follows the repo's fixed-point
convention: quantize to integer micros *before* any reorderable sum,
so Spark partial aggregation and DuckDB serial execution agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators import dedup as D
from mapreduce6240project_spark.operators import retrieval as R
from mapreduce6240project_spark.operators.graph import triangle_count
from mapreduce6240project_spark.operators.textstats import charlm_doc_logprob
from mapreduce6240project_spark.operators.windows import decayed_rolling_value
from mapreduce6240project_spark.plans.extensions import _ngram_jaccard_sql
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.layout import zorder_key, zorder_key_sql
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# -- BM25 ------------------------------------------------------------------

_QUERY_TERMS = ("join", "filter", "scan")

#: Literals are embedded via repr() of the *Python-computed* doubles, so
#: DuckDB's correctly-rounded literal parse reproduces the exact IEEE
#: values Spark folds into codegen (repr round-trips by construction).
_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
),
stats AS (SELECT count(*) AS nd, sum(len(w)) AS nt FROM toks),
ex AS (
  SELECT doc_id, dl, t AS term FROM (
    SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM toks
  ) WHERE t IN ('join', 'filter', 'scan')
),
hits AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM ex GROUP BY 1, 2, 3
),
dfq AS (SELECT term, count(*) AS df_t FROM hits GROUP BY term)
SELECT doc_id,
       CAST(sum(CAST(floor(
         ln(1.0 + (nd - df_t + 0.5) / (df_t + 0.5))
         * CAST(tf AS DOUBLE) * {R.K1 + 1.0!r}
         / (CAST(tf AS DOUBLE)
            + {R.K1!r} * ({1.0 - R.B!r}
                          + {R.B!r} * CAST(dl AS DOUBLE)
                            / (CAST(nt AS DOUBLE) / nd)))
         * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS score_micros
FROM hits JOIN dfq USING (term), stats
GROUP BY doc_id
ORDER BY score_micros DESC, doc_id LIMIT 10"""


@_register(
    "bm25_top_docs",
    _BM25_SQL,
    ref="extension: BM25 sparse retrieval (Lucene idf variant); "
    "df table is vocabulary-sized -> broadcast",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.bm25_topk(
        load_table(spark, sf_dir, "documents"), list(_QUERY_TERMS), k=10
    )


# -- reciprocal-rank fusion ------------------------------------------------

_RRF_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
),
stats AS (SELECT count(*) AS nd, sum(len(w)) AS nt FROM toks),
ex AS (
  SELECT doc_id, dl, t AS term FROM (
    SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM toks
  ) WHERE t IN ('join', 'filter', 'scan')
),
hits AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM ex GROUP BY 1, 2, 3
),
dfq AS (SELECT term, count(*) AS df_t FROM hits GROUP BY term),
bm AS (
  SELECT doc_id,
         CAST(sum(CAST(floor(
           ln(1.0 + (nd - df_t + 0.5) / (df_t + 0.5))
           * CAST(tf AS DOUBLE) * {R.K1 + 1.0!r}
           / (CAST(tf AS DOUBLE)
              + {R.K1!r} * ({1.0 - R.B!r}
                            + {R.B!r} * CAST(dl AS DOUBLE)
                              / (CAST(nt AS DOUBLE) / nd)))
           * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS score_micros
  FROM hits JOIN dfq USING (term), stats
  GROUP BY doc_id ORDER BY score_micros DESC, doc_id LIMIT 50
),
bm_rank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score_micros DESC, doc_id) AS rank_a
  FROM bm
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT vec_id,
         list_dot_product(CAST(embedding AS DOUBLE[]), qv)
         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
            * sqrt(list_dot_product(qv, qv))) AS sim_raw
  FROM embeddings, q
),
dense AS (
  SELECT vec_id AS doc_id, sim_raw FROM sims
  ORDER BY sim_raw DESC, vec_id LIMIT 50
),
dense_rank_ AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY sim_raw DESC, doc_id) AS rank_b
  FROM dense
),
fused AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, a.rank_a, b.rank_b
  FROM bm_rank a FULL OUTER JOIN dense_rank_ b ON a.doc_id = b.doc_id
)
SELECT doc_id,
       CAST(floor((coalesce(1.0 / (60.0 + rank_a), 0.0)
                   + coalesce(1.0 / (60.0 + rank_b), 0.0))
                  * 1000000 + 0.5) AS BIGINT) AS rrf_micros,
       rank_a, rank_b
FROM fused
ORDER BY rrf_micros DESC, doc_id LIMIT 10"""


@_register(
    "rrf_fuse_topk",
    _RRF_SQL,
    ref="extension: reciprocal-rank fusion of sparse (BM25) and dense "
    "(cosine) rankings -- the hybrid-retrieval merge for RAG pipelines; "
    "both inputs are top-k-bounded, so the fusion broadcasts",
)
def q_rrf_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators import similarity as S
    from mapreduce6240project_spark.plans.extensions import _query_vec

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    sparse = R.bm25_topk(docs, list(_QUERY_TERMS), k=50).withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("score_micros"), "doc_id")),
    )
    dense = (
        S.cosine_topk(emb, _query_vec(spark, sf_dir), k=50)
        .withColumnRenamed("vec_id", "doc_id")
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("sim"), "doc_id"))
        )
    )
    fused = R.rrf_fuse(sparse, dense)
    return fused.orderBy(F.desc("rrf_micros"), "doc_id").limit(10)


# -- prefix-filtered exact similarity join ---------------------------------

@_register(
    "jaccard_prefix_pairs",
    _ngram_jaccard_sql(0.5),
    ref="extension: exact shingle-Jaccard similarity join via prefix "
    "filtering (SSJoin/PPJoin); the oracle is the *unfiltered* exact "
    "join -- identical output proves the prefix prunes only non-pairs",
)
def q_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.jaccard_prefix_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5
    )


# -- triangle counting on the similarity graph -----------------------------

#: shared sim-graph edge replay (jaccard >= 0.1 pairs over word
#: trigram shingles); ends after the ``pairs`` CTE so consumers append
#: further CTEs (leading comma) or the final SELECT.
_SIMGRAPH_PAIRS_CTE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(w) >= 3 THEN list_transform(
                    generate_series(1, len(w) - 2),
                    i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                  ELSE [concat_ws(' ', w)] END) AS s
    FROM (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents)
  )
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.1
)"""

_TRIANGLE_SQL = _SIMGRAPH_PAIRS_CTE + """
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM pairs e1
JOIN pairs e2 ON e2.id_a = e1.id_b
JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b"""


@_register(
    "triangle_count_simgraph",
    _TRIANGLE_SQL,
    ref="extension: degree-oriented triangle counting (Suri & "
    "Vassilvitskii) on the near-dup similarity graph; wedge work is "
    "bounded by oriented out-degree, skew-safe on power-law graphs",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.graph import simgraph_pairs

    return triangle_count(simgraph_pairs(spark, sf_dir))


# -- corpus-trained char-trigram LM quality score --------------------------

_CHARLM_SQL = f"""
WITH s AS (SELECT doc_id, {_NORM} AS nt FROM documents),
tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(nt) - 1),
                               i -> substr(nt, i, 3))) AS g
  FROM s WHERE length(nt) >= 3
),
c3 AS (SELECT g, count(*) AS n3 FROM tri GROUP BY g),
c2 AS (SELECT substr(g, 1, 2) AS p, sum(n3) AS n2 FROM c3 GROUP BY p),
model AS (
  SELECT g,
         CAST(floor(ln(CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE)) * 1000000
                    + 0.5) AS BIGINT) AS lp
  FROM c3 JOIN c2 ON substr(g, 1, 2) = p
),
dt AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tri,
       CAST(sum(c * lp) AS BIGINT) AS logprob_micros
FROM dt JOIN model USING (g)
GROUP BY doc_id"""


@_register(
    "charlm_quality",
    _CHARLM_SQL,
    ref="extension: corpus-trained char-trigram LM logprob (KenLM-style "
    "perplexity-proxy quality filter); model is charset^3-bounded -> "
    "broadcast",
)
def q_charlm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return charlm_doc_logprob(load_table(spark, sf_dir, "documents"))


# -- Z-order layout key + rectangle query ----------------------------------

_ZKEY_SQL = zorder_key_sql(
    "o_custkey", "CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)"
)

_ZORDER_SQL = f"""
SELECT o_orderkey, CAST({_ZKEY_SQL} AS BIGINT) AS zkey
FROM orders
WHERE o_custkey BETWEEN 100 AND 200
  AND o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate < TIMESTAMP '1995-01-01'"""


@_register(
    "zorder_rectangle",
    _ZORDER_SQL,
    ref="extension: Morton/Z-order interleave key (Delta OPTIMIZE "
    "ZORDER analog); files sorted by zkey have narrow min/max on BOTH "
    "dims, so either predicate of the rectangle prunes at scan time",
)
def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The key is pure codegen arithmetic; at scale it feeds
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` ahead of
    the write (see tests/test_plans.py for the pruning assertion)."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.floor(
        F.unix_timestamp("o_orderdate").cast("double") / 86400
    ).cast("bigint")
    return (
        orders.filter(
            (F.col("o_custkey").between(100, 200))
            & (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            zorder_key(F.col("o_custkey"), day).alias("zkey"),
        )
    )


# -- decayed rolling feature ----------------------------------------------

_EWMA_SQL = """
WITH fr AS (
  SELECT event_id, user_id,
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS frame
  FROM events
)
SELECT event_id, user_id,
       CAST(list_sum(list_transform(range(1, len(frame) + 1),
         j -> CAST(floor(frame[j] * pow(0.9, CAST(len(frame) - j AS DOUBLE))
                         * 1000000 + 0.5) AS BIGINT))) AS BIGINT)
         AS decayed_micros
FROM fr"""


@_register(
    "user_value_ewma",
    _EWMA_SQL,
    ref="extension: per-key exponentially-decayed rolling feature over "
    "a bounded 8-row frame (recency-weighted engagement); bounded "
    "state, one shuffle on the key",
)
def q_user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decayed_rolling_value(load_table(spark, sf_dir, "events"))


# -- graph metrics on the similarity graph ---------------------------------

_DEGREE_HIST_SQL = _SIMGRAPH_PAIRS_CTE + """,
und AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
deg AS (SELECT u, count(*) AS degree FROM und GROUP BY u)
SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_nodes
FROM deg GROUP BY degree"""


@_register(
    "degree_histogram_simgraph",
    _DEGREE_HIST_SQL,
    ref="extension: degree distribution of the near-dup graph; two "
    "skinny shuffles, output bounded by max degree",
)
def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.graph import (
        degree_histogram,
        simgraph_pairs,
    )

    return degree_histogram(simgraph_pairs(spark, sf_dir))


_GCC_SQL = _SIMGRAPH_PAIRS_CTE + """,
und AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
deg AS (SELECT u, count(*) AS degree FROM und GROUP BY u),
wed AS (SELECT CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM pairs e1
  JOIN pairs e2 ON e2.id_a = e1.id_b
  JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
)
SELECT n_triangles, n_wedges,
       CASE WHEN n_wedges > 0
            THEN CAST(floor(3.0 * n_triangles / n_wedges * 1000000 + 0.5) AS BIGINT)
            ELSE NULL END AS gcc_micros
FROM tri, wed"""


@_register(
    "clustering_coefficient",
    _GCC_SQL,
    ref="extension: global clustering coefficient (3*triangles/wedges); "
    "exact bigint numerator and denominator, one engine-identical "
    "double division",
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.graph import (
        global_clustering,
        simgraph_pairs,
    )

    return global_clustering(simgraph_pairs(spark, sf_dir))
