"""retrieval scoring (BM25, fusion, re-ranking, late interaction) and index-quality/recall audit curves.

Consolidated from the round-3 coverage waves (round-4 verdict item
7: thematic domain modules instead of flat wave numbering).  Each
section below is the original wave body verbatim; registry names,
oracles and semantics are unchanged (guarded by the registry
snapshot test and the full sf0.01 mirror).

* wave 5: Round-3 coverage wave: retrieval (BM25, reciprocal-rank fusion),
* wave 14: Round-3 coverage wave 14: two-stage retrieval re-ranking and
* wave 31: Round-3 coverage wave 31: index building, budgeted selection, and
* wave 40: Round-3 coverage wave 40: index-quality curves -- the audits that
* wave 47: Round-3 coverage wave 47: retrieval/dedup cross-validation metrics.
* wave 48: Round-3 coverage wave 48: int8 retrieval audit and a join-strategy
* wave 52: Round-3 coverage wave 52: late-interaction retrieval scoring and
* wave 56: Round-3 coverage wave 56: index-health and retrieval-effectiveness
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
from pyspark.sql import DataFrame, SparkSession
from mapreduce6240project_spark.operators.dedup import tokens
from mapreduce6240project_spark.operators.retrieval import bm25_topk
from mapreduce6240project_spark.operators.sampling import _INC, _MOD, _MULT
from mapreduce6240project_spark.functions.hashing import hash60_sql
from functools import reduce
from mapreduce6240project_spark.operators import similarity as S
from mapreduce6240project_spark.operators.sketch import (
    QSKETCH_BID_SQL,
    QSKETCH_REP_SQL,
    quantile_sketch,
    quantile_sketch_estimate,
)
from mapreduce6240project_spark.plans.extensions import _ivf_cells_sql, _query_vec
from mapreduce6240project_spark.plans.extensions import _ivf_cells_sql

# =========================================================================
# wave 5
# Round-3 coverage wave: retrieval (BM25, reciprocal-rank fusion),
# exact similarity join via prefix filtering, graph triangle counting,
# corpus-trained char-LM quality scoring, Z-order layout keys, and
# decayed rolling features.
#
# Everything here is LLM-pipeline extension surface (the reference's
# analytics stop at group-by aggregation, Analysis.java); each query has
# a full DuckDB oracle.  Float work follows the repo's fixed-point
# convention: quantize to integer micros *before* any reorderable sum,
# so Spark partial aggregation and DuckDB serial execution agree
# bit-for-bit.
# =========================================================================

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


# =========================================================================
# wave 14
# Round-3 coverage wave 14: two-stage retrieval re-ranking and
# contrastive negative sampling.
#
# - ``rerank_top_docs``: the standard retrieval cascade -- a cheap
#   recall stage (BM25 top-20) followed by an expensive precision stage
#   over the candidates only.  The re-ranker here is a deterministic
#   term-proximity scorer (distinct-term coverage, then earliest-position
#   bonus) standing in for a cross-encoder: the *shape* is the point --
#   the second stage touches 20 rows, never the corpus, so an arbitrarily
#   costly scorer stays O(k) at any corpus size.
# - ``contrastive_negatives``: deterministic random negatives per anchor
#   document (the sampling step of contrastive embedding training).
#   Each anchor derives its negative ids from the same LCG used by the
#   engine's sampling family (integer arithmetic, oracle-replayable,
#   re-run stable); one equi-join materializes the negatives' metadata.
#   No N x N candidate generation anywhere -- 3N derived rows, one
#   data-sized shuffle.
#
# Reference parity note: the reference has no retrieval or training-prep
# surface; this wave belongs to the LLM-data-pipeline extension mandated
# alongside SURVEY.md section 2.
# =========================================================================

RERANK_CANDIDATES = 20
RERANK_K = 5

N_NEGATIVES = 3
#: per-slot stride decorrelates the j-th negative from the (j+1)-th
NEG_STEP = 2654435761  # Knuth multiplicative constant, < 2^32

_RERANK_ORACLE = f"""
WITH cand AS (
  {_BM25_SQL.replace("LIMIT 10", f"LIMIT {RERANK_CANDIDATES}")}
),
dtoks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
  FROM documents
),
scored AS (
  SELECT c.doc_id,
         {" + ".join(
             f"(CASE WHEN coalesce(list_position(w, '{t}'), 0) > 0 THEN 1 ELSE 0 END)"
             for t in _QUERY_TERMS
         )} AS present,
         {" + ".join(
             f"(CASE WHEN coalesce(list_position(w, '{t}'), 0) > 0"
             f" THEN 10000 // list_position(w, '{t}') ELSE 0 END)"
             for t in _QUERY_TERMS
         )} AS prox
  FROM cand c JOIN dtoks USING (doc_id)
)
SELECT doc_id, CAST(present * 1000000 + prox AS BIGINT) AS rerank_score
FROM scored
ORDER BY rerank_score DESC, doc_id LIMIT {RERANK_K}"""


def _proximity_score() -> F.Column:
    """1e6 * (#distinct query terms present) + sum(10000 div first_pos):
    pure integer arithmetic over 1-based first-occurrence positions
    (``array_position`` returns 0 when absent in Spark; the oracle
    coalesces DuckDB's NULL to the same 0)."""
    score = F.lit(0).cast("bigint")
    present = F.lit(0).cast("bigint")
    for t in _QUERY_TERMS:
        pos = F.array_position(F.col("toks"), t)
        present = present + F.when(pos > 0, 1).otherwise(0)
        # floor(10000 / pos) on positive ints == integer division; pos is
        # evaluated once per term, not re-scanned inside a SQL string
        score = score + F.when(
            pos > 0, F.floor(F.lit(10000) / pos).cast("bigint")
        ).otherwise(0)
    return (present * 1000000 + score).alias("rerank_score")


@_register(
    "rerank_top_docs",
    _RERANK_ORACLE,
    ref="extension: two-stage retrieval (BM25 recall -> candidate-only "
    "precision re-rank); stage 2 is O(candidates), not O(corpus)",
)
def q_rerank_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cand = bm25_topk(docs, list(_QUERY_TERMS), k=RERANK_CANDIDATES).select("doc_id")
    # broadcast the k-row candidate set into the doc scan: the corpus is
    # filtered before any re-rank work happens
    hydrated = docs.join(F.broadcast(cand), "doc_id").select(
        "doc_id", tokens("text").alias("toks")
    )
    return (
        hydrated.select("doc_id", _proximity_score())
        .orderBy(F.desc("rerank_score"), "doc_id")
        .limit(RERANK_K)
    )


@_register(
    "contrastive_negatives",
    f"""
WITH n AS (SELECT count(*) AS nd FROM documents),
negs AS (
  SELECT a.doc_id AS anchor_id, j.j AS slot,
         ((a.doc_id % {_MOD}) * {_MULT} + {_INC} + j.j * {NEG_STEP}) % {_MOD} % n.nd
           AS raw_neg
  FROM documents a, (SELECT unnest(range({N_NEGATIVES})) AS j) j, n
),
fixed AS (
  SELECT anchor_id, slot,
         CASE WHEN raw_neg = anchor_id
              THEN (raw_neg + 1) % (SELECT nd FROM n)
              ELSE raw_neg END AS neg_id
  FROM negs
)
SELECT f.anchor_id, CAST(f.slot AS INT) AS slot, f.neg_id,
       d.source AS neg_source
FROM fixed f JOIN documents d ON d.doc_id = f.neg_id""",
    ref="extension: deterministic contrastive negative sampling (LCG per "
    "(anchor, slot), self-collision remapped, one equi-join for "
    "metadata; no NxN candidate stage)",
)
def q_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row aggregate, not an eager .count():
    # the eager scalar cost an extra full documents pass per invocation
    # (r9 verdict item 3); modular arithmetic works identically on the
    # joined-in column.
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    slots = F.array(*[F.lit(j) for j in range(N_NEGATIVES)])
    anchors = docs.select(
        F.col("doc_id").alias("anchor_id"), F.explode(slots).alias("slot")
    ).crossJoin(F.broadcast(n))
    raw = (
        (F.col("anchor_id") % _MOD) * _MULT
        + _INC
        + F.col("slot").cast("bigint") * NEG_STEP
    ) % _MOD % F.col("nd")
    negs = anchors.select(
        "anchor_id",
        "slot",
        F.when(raw == F.col("anchor_id"), (raw + 1) % F.col("nd"))
        .otherwise(raw)
        .alias("neg_id"),
    )
    meta = docs.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")
    )
    return negs.join(meta, "neg_id").select(
        "anchor_id", "slot", "neg_id", "neg_source"
    )


# =========================================================================
# wave 31
# Round-3 coverage wave 31: index building, budgeted selection, and
# graph core decomposition.
#
# - ``inverted_index_top100``: posting-list build over the documents
#   table -- the physical structure of sparse retrieval.  The posting
#   cap is applied with a rank window BEFORE any list aggregates, so no
#   aggregation buffer ever holds a stopword's full posting list (the
#   unbounded-``collect_list`` trap at corpus scale).
# - ``token_budget_docs``: per-language document admission under a TOKEN
#   budget (how training mixtures are really specified), via a
#   hash-ordered running-sum window -- admit while the running total
#   before the document is under budget.
# - ``kcore3_copurchase``: 3-core of the support-filtered co-purchase
#   graph by iterated peel to fixpoint.  The Spark loop runs to true
#   convergence with early exit; the oracle unrolls 16 peel rounds as
#   chained CTEs (measured fixpoint at sf0.01: 10 rounds; extra rounds
#   are no-ops on a converged core, so the unroll is safe slack, and the
#   engine's fixpoint semantics stay scale-independent).
#
# Reference parity note: kcore reuses Cluster.java's iterate-to-
# convergence control flow (SURVEY.md section 2.9) on a graph operator;
# the other two extend the LLM-pipeline curation surface (SURVEY.md
# section 2 extensions).
# =========================================================================

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_MIN_DF = 5
_POSTING_CAP = 20
_TOP_TERMS = 100

_INVERTED_INDEX_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT token AS term, doc_id
  FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS token
        FROM documents)
),
stats AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM pairs GROUP BY term),
capped AS (
  SELECT term,
         array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
  FROM (SELECT term, doc_id,
               row_number() OVER (PARTITION BY term ORDER BY doc_id) AS prk
        FROM pairs)
  WHERE prk <= {_POSTING_CAP}
  GROUP BY term
)
SELECT term, df, postings
FROM stats JOIN capped USING (term)
WHERE df >= {_MIN_DF}
ORDER BY df DESC, term LIMIT {_TOP_TERMS}"""


@_register(
    "inverted_index_top100",
    _INVERTED_INDEX_SQL,
    ref="extension: inverted-index posting-list build (sparse retrieval "
    "physical structure); rank-window posting cap bounds group state "
    "before any list aggregate -- no stopword-sized buffer at corpus "
    "scale; df from a partial-aggregated count on the same term key",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.retrieval import inverted_index

    return inverted_index(
        load_table(spark, sf_dir, "documents"),
        min_df=_MIN_DF,
        posting_cap=_POSTING_CAP,
        top_terms=_TOP_TERMS,
    )


_BUDGET_TOKENS = 2000

_TOKEN_BUDGET_SQL = f"""
WITH t AS (
  SELECT lang, doc_id,
         CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tok,
         {hash60_sql("CAST(doc_id AS VARCHAR)")} AS pri
  FROM documents
),
c AS (
  SELECT lang, doc_id, n_tok,
         CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY pri, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum_tok
  FROM t
)
SELECT lang, doc_id, n_tok, cum_tok
FROM c WHERE cum_tok - n_tok < {_BUDGET_TOKENS}"""


@_register(
    "token_budget_docs",
    _TOKEN_BUDGET_SQL,
    ref="extension: token-budgeted per-language corpus selection "
    "(training mixtures are token budgets, not row budgets); "
    "hash-ordered running-sum window, one accumulator per stratum",
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.sampling import token_budget_sample

    return token_budget_sample(
        load_table(spark, sf_dir, "documents"), budget_tokens=_BUDGET_TOKENS
    )


_KCORE_K = 3
_KCORE_UNROLL = 16


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    """Unrolled iterated-peel: round ``i`` keeps the edges of ``s{i-1}``
    whose BOTH endpoints still have degree >= k.  Rounds past the
    fixpoint are identity transforms, so unrolling more rounds than the
    measured peel depth (10 at sf0.01) only costs oracle time.  Every
    CTE is MATERIALIZED: each round references its predecessor three
    times, so DuckDB's default inlining would expand the chain
    exponentially (3^rounds scans of lineitem)."""
    parts = [
        """
WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
cp AS MATERIALIZED (
  SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
s0 AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM cp
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM cp
)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
k{i} AS MATERIALIZED (
  SELECT u FROM (SELECT u, count(*) AS d FROM s{i - 1} GROUP BY u)
  WHERE d >= {k}),
s{i} AS MATERIALIZED (
  SELECT s.u, s.v FROM s{i - 1} s
  JOIN k{i} a ON s.u = a.u JOIN k{i} b ON s.v = b.u)"""
        )
    parts.append(
        f"""
SELECT u AS node, CAST(count(*) AS BIGINT) AS core_deg
FROM s{rounds} GROUP BY u"""
    )
    return "".join(parts)


@_register(
    "kcore3_copurchase",
    _kcore_oracle_sql(_KCORE_K, _KCORE_UNROLL),
    ref="extension: k-core decomposition of the co-purchase graph "
    "(iterated peel to fixpoint; Cluster.java:310-386's converge-loop "
    "control flow on a graph operator) -- per-round degree count + two "
    "semi-joins, monotonically shrinking state, localCheckpoint "
    "lineage truncation",
)
def q_kcore3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.graph import kcore
    from mapreduce6240project_spark.plans.graph_ext import _copurchase_edges_with_pairs

    _, cp = _copurchase_edges_with_pairs(spark, sf_dir)
    return kcore(cp, k=_KCORE_K)


# =========================================================================
# wave 40
# Round-3 coverage wave 40: index-quality curves -- the audits that
# turn "approximate" operators into *trusted* operators.
#
# - ``ivf_recall_curve``: recall@10 of the IVF index at n_probe in
#   {1, 2, 4} -- the probe-count knob is THE latency/recall dial at
#   100 TB, and this query measures the curve the dial moves along.  One
#   shared cell assignment; per-probe branches differ only in the probed
#   cell set.
# - ``qsketch_error_audit``: the mergeable log-bucket quantile sketch's
#   estimates vs the exact interpolated quantiles, with the relative
#   error in exact integer per-myriad -- verifying the sketch honors its
#   <=1/16 relative-error contract before it replaces exact sorting at
#   scale.
# =========================================================================

_PROBES = (1, 2, 4)

_SIM = (
    "list_dot_product(v.ev, qv) / (sqrt(list_dot_product(v.ev, v.ev)) "
    "* sqrt(list_dot_product(qv, qv)))"
)


def _recall_curve_sql() -> str:
    parts = [
        _ivf_cells_sql(),
        """
, qi AS (SELECT unnest(q) AS x, unnest(generate_series(1, len(q))) AS d
       FROM iv WHERE vec_id = 0),
pd AS (SELECT c.cell, sum((c.cx - t.x) * (c.cx - t.x)) AS dist
       FROM c2 c JOIN qi t ON c.d = t.d GROUP BY 1),
pr AS (SELECT cell, row_number() OVER (ORDER BY dist, cell) AS rn FROM pd),
esims AS (
  SELECT v.vec_id, """
        + _SIM.replace("v.ev", "v.ev")
        + """ AS sim_raw
  FROM vecs v, q
),
exact AS (SELECT vec_id FROM (
  SELECT vec_id, row_number() OVER (ORDER BY sim_raw DESC, vec_id) AS rn
  FROM esims) WHERE rn <= 10)""",
    ]
    for p in _PROBES:
        parts.append(
            f""",
asims{p} AS (
  SELECT a.vec_id, {_SIM} AS sim_raw
  FROM af a JOIN vecs v USING (vec_id), q
  WHERE a.cell IN (SELECT cell FROM pr WHERE rn <= {p})
),
approx{p} AS (SELECT vec_id FROM (
  SELECT vec_id, row_number() OVER (ORDER BY sim_raw DESC, vec_id) AS rn
  FROM asims{p}) WHERE rn <= 10),
r{p} AS (
  SELECT {p} AS n_probe, 10 AS k, CAST(count(*) AS BIGINT) AS hits,
         round(count(*) / 10.0, 4) AS recall
  FROM exact JOIN approx{p} USING (vec_id))"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM r{p}" for p in _PROBES)
    parts.append(f"\n{union} ORDER BY n_probe")
    return "".join(parts)


@_register(
    "ivf_recall_curve",
    _recall_curve_sql(),
    ref="extension: IVF recall@10 vs n_probe curve (1/2/4) -- the "
    "latency/recall dial measured as a first-class query; one shared "
    "cell assignment, per-probe branches prune to the probed cells",
)
def q_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    branches = [
        S.ann_recall(emb, qv, k=10, n_probe=p).select(
            F.lit(p).alias("n_probe"), "k", "hits", "recall"
        )
        for p in _PROBES
    ]
    return reduce(lambda a, b: a.unionByName(b), branches).orderBy("n_probe")


_QLABELS = (("p50", 0.5, 5000), ("p90", 0.9, 9000), ("p99", 0.99, 9900))


def _qsketch_audit_sql() -> str:
    bid = QSKETCH_BID_SQL.format(m="m")
    rep = QSKETCH_REP_SQL.format(b="bid")
    labels = ", ".join(f"'{l}'" for l, _, _ in _QLABELS)
    q10ks = ", ".join(str(t) for _, _, t in _QLABELS)
    exacts = " UNION ALL ".join(
        f"SELECT '{l}' AS label, CAST(floor(round(quantile_cont(value, {q}), 4)"
        f" * 10000 + 0.5) AS BIGINT) AS exact_e4 FROM events"
        for l, q, _ in _QLABELS
    )
    return f"""
WITH mm AS (
  SELECT CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS m FROM events
),
b AS (
  SELECT {bid} AS bid, count(*) AS n FROM mm WHERE m >= 0 GROUP BY 1
),
c AS (
  SELECT bid, n, sum(n) OVER (ORDER BY bid) AS cum, sum(n) OVER () AS total
  FROM b
),
q AS (SELECT unnest([{labels}]) AS label, unnest([{q10ks}]) AS q10k),
sel AS (
  SELECT label, min(bid) AS bid
  FROM c, q WHERE cum >= (q10k * total + 9999) // 10000 GROUP BY label
),
est AS (SELECT label, CAST(({rep}) // 100 AS BIGINT) AS est_e4 FROM sel),
ex AS ({exacts})
SELECT e.label, e.est_e4, x.exact_e4,
       CAST(abs(e.est_e4 - x.exact_e4) * 10000 // x.exact_e4 AS BIGINT)
         AS err_permyriad
FROM est e JOIN ex x USING (label)"""


@_register(
    "qsketch_error_audit",
    _qsketch_audit_sql(),
    ref="extension: quantile-sketch error audit -- sketch estimates vs "
    "exact interpolated quantiles, relative error in integer per-myriad; "
    "validates the <=1/16 relative-error contract",
)
def q_qsketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = quantile_sketch(ev, "value")
    est = quantile_sketch_estimate(
        sk, {l: q for l, q, _ in _QLABELS}
    ).select("label", F.expr("est_micros div 100").cast("long").alias("est_e4"))
    exact = ev.agg(
        *[
            F.expr(
                f"CAST(floor(round(percentile(value, {q}), 4) * 10000 + 0.5)"
                " AS BIGINT)"
            ).alias(l)
            for l, q, _ in _QLABELS
        ]
    )
    n = len(_QLABELS)
    stack_args = ", ".join(f"'{l}', {l}" for l, _, _ in _QLABELS)
    exact_long = exact.selectExpr(
        f"stack({n}, {stack_args}) AS (label, exact_e4)"
    )
    return est.join(F.broadcast(exact_long), "label").select(
        "label",
        "est_e4",
        "exact_e4",
        F.expr("abs(est_e4 - exact_e4) * 10000 div exact_e4")
        .cast("long")
        .alias("err_permyriad"),
    )


# =========================================================================
# wave 47
# Round-3 coverage wave 47: retrieval/dedup cross-validation metrics.
#
# - ``minhash_recall_audit``: LSH candidate recall against the exact
#   Jaccard ground truth at the same threshold -- (n_exact, n_lsh,
#   n_common, recall_permyriad).  The oracle asserts COMPLETE recall
#   (n_lsh == n_exact): MinHash bands at 64 hashes / 16 bands have
#   near-1 collision probability above J=0.5, and the planted-duplicate
#   tests pin it; a band-recall regression turns this driver row red,
#   which is exactly what an audit row is for.
# - ``rank_footrule_sparse_dense``: Spearman-footrule distance between
#   the BM25 top-50 and the dense-cosine top-50 over their shared
#   documents -- the integer rank-agreement metric that tells a RAG
#   pipeline how complementary (or redundant) its two retrievers are
#   before fusing them.  Reuses the rrf query's ranking CTEs verbatim so
#   the three retrieval queries can never drift apart.
# =========================================================================

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


# =========================================================================
# wave 48
# Round-3 coverage wave 48: int8 retrieval audit and a join-strategy
# advisor.
#
# - ``int8_recall_audit``: recall@10 of top-k retrieval over the int8-
#   quantized vectors (integer dot products) vs the exact float dot-
#   product top-k -- completes the compression-audit family (matryoshka
#   = fewer dims, PQ = coded subspaces, int8 = narrower arithmetic).
#   Quantization is the exact expression ``floor(x * 127 / max|x| +
#   0.5)`` on both engines, so the integer scores replay bit-for-bit.
# - ``join_strategy_advisor``: the broadcast-vs-shuffle decision a
#   cost-based optimizer makes, materialized as a query -- per candidate
#   dimension table, exact row count, estimated bytes from literal row
#   widths, and the recommended strategy at a 10 MB broadcast threshold.
#   The advisor pattern: statistics in, physical-plan decision out.
# =========================================================================

_ROW_WIDTH = {"customer": 144, "supplier": 120, "part": 128}
_BROADCAST_BYTES = 10 * 1024 * 1024


@_register(
    "int8_recall_audit",
    """
WITH ev AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS ma
  FROM embeddings
),
qv AS (
  SELECT list_transform(v, x -> CAST(floor(x * 127 / ma + 0.5) AS BIGINT)) AS q
  FROM ev WHERE vec_id = 0
),
iq AS (
  SELECT vec_id,
         CASE WHEN ma = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
              ELSE list_transform(v, x -> CAST(floor(x * 127 / ma + 0.5)
                                              AS BIGINT)) END AS iv
  FROM ev
),
iscore AS (
  SELECT vec_id, list_dot_product(iv, q) AS s FROM iq, qv
),
itop AS (SELECT vec_id FROM (
  SELECT vec_id, row_number() OVER (ORDER BY s DESC, vec_id) AS rn FROM iscore)
  WHERE rn <= 10),
fq AS (SELECT v AS q FROM ev WHERE vec_id = 0),
fscore AS (SELECT vec_id, list_dot_product(v, q) AS s FROM ev, fq),
ftop AS (SELECT vec_id FROM (
  SELECT vec_id, row_number() OVER (ORDER BY s DESC, vec_id) AS rn FROM fscore)
  WHERE rn <= 10)
SELECT CAST(10 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_overlap,
       CAST(100 * count(*) // 10 AS BIGINT) AS recall_pct
FROM itop JOIN ftop USING (vec_id)""",
    ref="extension: int8-quantized retrieval recall audit vs exact "
    "float dot top-k -- integer scores, bit-exact quantization on both "
    "engines",
)
def q_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    xs = [float(x) for x in row.embedding]
    ma = max(abs(x) for x in xs)
    import math

    qlit = [int(math.floor(x * 127 / ma + 0.5)) for x in xs]

    iq = quantize_embeddings(emb).select("vec_id", "qvec")
    qarr = F.array(*[F.lit(v) for v in qlit])
    iscore = iq.select(
        "vec_id",
        F.aggregate(
            F.zip_with(F.col("qvec"), qarr, lambda a, b: a.cast("long") * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("s"),
    )
    itop = iscore.orderBy(F.desc("s"), "vec_id").limit(10).select("vec_id")

    ev = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    flit = F.array(*[F.lit(x) for x in xs])
    fscore = ev.select(
        "vec_id",
        F.aggregate(
            F.zip_with(F.col("v"), flit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("s"),
    )
    ftop = fscore.orderBy(F.desc("s"), "vec_id").limit(10).select("vec_id")
    return itop.join(ftop, "vec_id").agg(
        F.lit(10).cast("long").alias("k"),
        F.count(F.lit(1)).alias("n_overlap"),
        F.expr("100 * count(1) div 10").cast("long").alias("recall_pct"),
    )


def _advisor_sql() -> str:
    branches = " UNION ALL ".join(
        f"""
SELECT '{t}' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) * {w} AS BIGINT) AS est_bytes,
       CASE WHEN count(*) * {w} < {_BROADCAST_BYTES}
            THEN 'broadcast' ELSE 'shuffle' END AS strategy
FROM {t}"""
        for t, w in sorted(_ROW_WIDTH.items())
    )
    return branches


@_register(
    "join_strategy_advisor",
    _advisor_sql(),
    ref="extension: CBO-style broadcast-vs-shuffle advisor -- exact row "
    "counts x literal row widths against the 10 MB broadcast threshold; "
    "statistics in, physical-plan decision out",
)
def q_join_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for t, w in sorted(_ROW_WIDTH.items()):
        df = load_table(spark, sf_dir, t)
        outs.append(
            df.agg(
                F.lit(t).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) * w).cast("bigint").alias("est_bytes"),
                F.when(
                    F.count(F.lit(1)) * w < _BROADCAST_BYTES, F.lit("broadcast")
                )
                .otherwise(F.lit("shuffle"))
                .alias("strategy"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# =========================================================================
# wave 52
# Round-3 coverage wave 52: late-interaction retrieval scoring and
# closed-form trend estimation.
#
# - ``label_maxsim_rank``: ColBERT-style MaxSim scoring at the group
#   grain -- each label is a bag of vectors, scored by the MAXIMUM
#   member cosine against the query; the late-interaction relaxation of
#   mean-pooled retrieval (one strong member match beats a diluted
#   average).  One narrow cosine pass + a label-keyed max aggregate.
# - ``segment_trend_slope``: per-segment ordinary-least-squares slope of
#   daily revenue over time from the closed-form sums
#   ``(n*Sdy - Sd*Sy) / (n*Sdd - Sd*Sd)`` -- all exact integer cents and
#   day indices, reported as truncating cents/day with the numerator and
#   denominator exposed.  The distributed-regression shape: sufficient
#   statistics per group, no per-point state.
# =========================================================================

@_register(
    "label_maxsim_rank",
    """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
           WHERE vec_id = 0),
sims AS (
  SELECT label,
         list_dot_product(CAST(embedding AS DOUBLE[]), qv)
         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])))
            * sqrt(list_dot_product(qv, qv))) AS s
  FROM embeddings, q
  WHERE embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
),
mx AS (SELECT label, round(max(s), 4) AS max_sim
       FROM sims WHERE s IS NOT NULL GROUP BY 1)
SELECT label, max_sim,
       CAST(row_number() OVER (ORDER BY max_sim DESC, label) AS BIGINT) AS rk
FROM mx""",
    ref="extension: MaxSim late-interaction scoring per label group -- "
    "one cosine pass, label-keyed max, deterministic rank",
)
def q_label_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import cosine
    from mapreduce6240project_spark.plans.extensions import _query_vec

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    q = F.array(*[F.lit(float(x)) for x in qv])
    mx = (
        emb.select("label", cosine("embedding", q).alias("s"))
        # undefined cosine rows can't contribute a max-sim, and a label
        # whose EVERY member is undefined has no defined score at all:
        # drop the rows (not just rely on max() skipping NULL) so the
        # label set matches the oracle's filtered scan
        .filter(F.col("s").isNotNull())
        .groupBy("label")
        .agg(F.round(F.max("s"), 4).alias("max_sim"))
    )
    return mx.select(
        "label",
        "max_sim",
        F.expr("row_number() OVER (ORDER BY max_sim DESC, label)")
        .cast("bigint")
        .alias("rk"),
    )


@_register(
    "segment_trend_slope",
    """
WITH daily AS (
  SELECT c.c_mktsegment AS seg,
         CAST(o.o_orderdate AS DATE)
           - (SELECT min(CAST(o_orderdate AS DATE)) FROM orders) AS d,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
s AS (
  SELECT seg, count(*) AS n, sum(d) AS sd, sum(y) AS sy,
         sum(d * y) AS sdy, sum(d * d) AS sdd
  FROM daily GROUP BY 1
)
-- HUGEINT products: n * sdy overflowed BIGINT at the 10x stress run
-- (SCALE.md); the Spark twin computes in DECIMAL(38,0)
SELECT seg AS c_mktsegment,
       -- exposed as DOUBLE on both engines: exact below 2^53 and
       -- identically rounded above (pandas stringifies both as float64)
       CAST(CAST(n AS HUGEINT) * sdy - CAST(sd AS HUGEINT) * sy AS DOUBLE) AS num,
       CAST(CAST(n AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd AS DOUBLE) AS den,
       -- truncate toward zero (DuckDB // floors; Spark div truncates --
       -- a negative slope would diverge by one without the sign split)
       CAST(CASE WHEN CAST(n AS HUGEINT) * sdy - CAST(sd AS HUGEINT) * sy < 0
                 THEN -((-(CAST(n AS HUGEINT) * sdy - CAST(sd AS HUGEINT) * sy))
                        // (CAST(n AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd))
                 ELSE (CAST(n AS HUGEINT) * sdy - CAST(sd AS HUGEINT) * sy)
                      // (CAST(n AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd) END
            AS BIGINT) AS slope_cents_per_day
FROM s""",
    ref="extension: per-segment OLS trend slope from closed-form "
    "sufficient statistics -- exact integer cents/day-index sums, one "
    "(seg, day) aggregate + one seg aggregate",
)
def q_segment_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    mind = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("mind")
    )
    daily = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .crossJoin(F.broadcast(mind))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.datediff(F.col("o_orderdate").cast("date"), F.col("mind")).alias(
                "d"
            ),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            ).alias("y")
        )
    )
    # DECIMAL(38,0) sufficient statistics: the bigint form overflowed on
    # the n * sdy product at the 10x stress run (ARITHMETIC_OVERFLOW,
    # recorded in SCALE.md) -- decimal keeps the closed form exact to
    # 38 digits and `div` still truncates toward zero
    s = daily.groupBy("seg").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("d").cast("decimal(38,0)").alias("sd"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * y")).alias("sdy"),
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d")).alias("sdd"),
    )
    return s.select(
        F.col("seg").alias("c_mktsegment"),
        F.expr("CAST(n * sdy - sd * sy AS DOUBLE)").alias("num"),
        F.expr("CAST(n * sdd - sd * sd AS DOUBLE)").alias("den"),
        F.expr("(n * sdy - sd * sy) div (n * sdd - sd * sd)")
        .cast("bigint")
        .alias("slope_cents_per_day"),
    )


# =========================================================================
# wave 56
# Round-3 coverage wave 56: index-health and retrieval-effectiveness
# metrics.
#
# - ``ivf_cell_balance``: cell-size balance of the IVF index -- min, max
#   and mean cell occupancy plus an integer imbalance ratio.  Cell skew is
#   the IVF failure mode at scale (one hot cell turns probes into scans);
#   this is the health gauge maintained alongside the index.
# - ``retrieval_mrr_at10``: retrieval effectiveness against the label
#   ground truth -- the query vector's label defines relevance, documents
#   are ranked by exact cosine, and the query reports the rank of the
#   first relevant hit, MRR in truncating permyriad (10000 // rank), and
#   precision@10.  The standard IR eval loop as one registered query.
#   The global ranking window is the eval protocol, sized for an eval
#   sample; at corpus scale the same metric runs over the retriever's
#   top-k candidates (TakeOrdered), not the full corpus.
# =========================================================================

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
    AND e.embedding IS NOT NULL
    AND len(list_filter(e.embedding, x -> x IS NULL)) = 0
),
rk AS (
  SELECT label, qlabel,
         row_number() OVER (ORDER BY s DESC, vec_id) AS rank
  FROM sims WHERE s IS NOT NULL
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
    ).filter(F.col("s").isNotNull())  # undefined sims are unrankable
    # rank-free formulation (plan-lint fix): the unpartitioned
    # row_number window pulled every similarity through one task.  The
    # first relevant rank equals 1 + the count of rows ordered strictly
    # before the BEST relevant row (a 1-row struct-max broadcast), and
    # precision@10 counts relevant rows in the TakeOrdered top-10 --
    # exact under the same (s DESC, vec_id) total order the oracle
    # ranks by, with no global sort.
    best = sims.filter(F.col("label") == qlabel).agg(
        F.max(F.struct(F.col("s"), (-F.col("vec_id")).alias("nv"))).alias(
            "b"
        )
    )
    before = (
        sims.crossJoin(F.broadcast(best))
        .agg(
            F.max(F.col("b")).alias("b"),
            F.count(
                F.when(
                    (F.col("s") > F.col("b.s"))
                    | (
                        (F.col("s") == F.col("b.s"))
                        & (F.col("vec_id") < -F.col("b.nv"))
                    ),
                    1,
                )
            ).alias("n_before"),
        )
        .select(
            F.when(
                F.col("b").isNotNull(), F.col("n_before") + 1
            )
            .cast("bigint")
            .alias("first_rel_rank")
        )
    )
    top10_rel = (
        sims.orderBy(F.col("s").desc(), "vec_id")
        .limit(10)
        .agg(
            F.sum(
                F.when(F.col("label") == qlabel, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("rel_in_top10")
        )
    )
    return before.crossJoin(F.broadcast(top10_rel)).select(
        "first_rel_rank",
        F.expr("10000 div first_rel_rank").cast("bigint").alias(
            "mrr_permyriad"
        ),
        "rel_in_top10",
    )


# round-4: NDCG@10 companion to retrieval_mrr_at10.  The 1/log2(r+1)
# gain weights are pre-quantized micro-unit literals (round(1e6 /
# log2(r+1)) for r = 1..10) embedded identically in both engines, so
# DCG, ideal DCG and their permyriad ratio are pure integer math -- no
# cross-engine log calls anywhere.
_DCG_W = {
    1: 1000000, 2: 630930, 3: 500000, 4: 430677, 5: 386853,
    6: 356207, 7: 333333, 8: 315465, 9: 301030, 10: 289065,
}
_DCG_CASE = (
    "CASE rank " + " ".join(f"WHEN {r} THEN {w}" for r, w in _DCG_W.items())
    + " END"
)
_IDCG_CUM = {
    r: sum(_DCG_W[i] for i in range(1, r + 1)) for r in range(1, 11)
}
_IDCG_CASE = (
    "CASE least(n_rel, 10) "
    + " ".join(f"WHEN {r} THEN {c}" for r, c in _IDCG_CUM.items())
    + " END"
)


@_register(
    "ndcg_at10",
    f"""
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
    AND e.embedding IS NOT NULL
    AND len(list_filter(e.embedding, x -> x IS NULL)) = 0
),
rk AS (
  SELECT label, qlabel,
         row_number() OVER (ORDER BY s DESC, vec_id) AS rank
  FROM sims WHERE s IS NOT NULL
),
agg AS (
  SELECT
    CAST(sum(CASE WHEN rank <= 10 AND label = qlabel
             THEN {_DCG_CASE} ELSE 0 END) AS BIGINT) AS dcg_micro,
    CAST(count(*) FILTER (WHERE label = qlabel) AS BIGINT) AS n_rel
  FROM rk
)
SELECT dcg_micro, n_rel,
       CAST({_IDCG_CASE} AS BIGINT) AS idcg_micro,
       CAST((10000 * dcg_micro) // {_IDCG_CASE} AS BIGINT)
         AS ndcg_permyriad
FROM agg""",
    ref="extension: NDCG@10 against label ground truth -- exact cosine "
    "ranking, pre-quantized integer micro gain weights (identical "
    "literals both engines), integer permyriad ratio",
)
def q_ndcg_at10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import cosine
    from mapreduce6240project_spark.plans.extensions import _query_vec

    emb = load_table(spark, sf_dir, "embeddings")
    qlabel = emb.filter(F.col("vec_id") == 0).select("label").first().label
    qv = _query_vec(spark, sf_dir)
    q = F.array(*[F.lit(float(x)) for x in qv])
    sims = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", "label", cosine("embedding", q).alias("s")
    ).filter(F.col("s").isNotNull())  # undefined sims are unrankable
    # plan-lint fix: DCG weights only exist for ranks <= 10, so rank
    # inside the TakeOrdered top-10 (a 10-row frame bounded by the
    # limit) instead of an unpartitioned row_number over every
    # similarity; n_rel is a separate plain aggregate.  Same total
    # order, value-identical to the oracle's global ranking.
    top10 = sims.orderBy(F.col("s").desc(), "vec_id").limit(10)
    rk = top10.select(
        "label",
        F.expr("row_number() OVER (ORDER BY s DESC, vec_id)").alias("rank"),
    )
    dcg = rk.agg(
        F.sum(
            F.expr(
                f"CASE WHEN rank <= 10 AND label = {qlabel}"
                f" THEN {_DCG_CASE} ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("dcg_micro")
    )
    nrel = sims.agg(
        F.count(F.when(F.col("label") == qlabel, 1))
        .cast("bigint")
        .alias("n_rel")
    )
    agg = dcg.crossJoin(F.broadcast(nrel))
    return agg.select(
        "dcg_micro",
        "n_rel",
        F.expr(_IDCG_CASE).cast("bigint").alias("idcg_micro"),
        F.expr(f"(10000 * dcg_micro) div ({_IDCG_CASE})")
        .cast("bigint")
        .alias("ndcg_permyriad"),
    )


# =========================================================================
# round 7: query-likelihood retrieval (the LM counterpart to BM25)
#
# ``query_likelihood_topk``: Dirichlet-smoothed query likelihood (Zhai
# & Lafferty 2001) -- score(d) = sum_t ln((tf + mu*ctf_t/NT)/(dl+mu)).
# Absent terms still contribute through the smoothed collection prior,
# so EVERY document is scored: the scoring grid is docs x |terms| (an
# explode of the literal term array), while the corpus-wide explode is
# filtered to query-term hits before its shuffle.  Each term's
# contribution is micro-floored before the per-doc integer sum; the
# collection stats are exact integers folded identically on both
# sides (mu*ctf computed before the /NT division in both engines).
# =========================================================================

_QL_TERMS = ("table", "window", "stream")
_QL_MU = 2000.0


@_register(
    "query_likelihood_topk",
    f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w
  FROM documents WHERE text IS NOT NULL
),
stats AS (SELECT CAST(sum(len(w)) AS BIGINT) AS nt FROM toks),
ex AS (
  SELECT doc_id, t AS term
  FROM (SELECT doc_id, unnest(w) AS t FROM toks)
  WHERE t IN ('table', 'window', 'stream')
),
ctf AS (SELECT term, CAST(count(*) AS BIGINT) AS ctf FROM ex GROUP BY term),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM ex GROUP BY 1, 2
),
dl AS (SELECT doc_id, len(w) AS dl FROM toks),
grid AS (
  SELECT d.doc_id, d.dl, c.term, c.ctf, coalesce(t.tf, 0) AS tf
  FROM dl d CROSS JOIN ctf c
  LEFT JOIN tf t ON t.doc_id = d.doc_id AND t.term = c.term
)
SELECT doc_id,
  CAST(sum(CAST(floor(
    ln((CAST(tf AS DOUBLE) + (2000.0 * ctf) / nt)
       / (CAST(dl AS DOUBLE) + 2000.0)) * 1000000 + 0.5) AS BIGINT))
    AS BIGINT) AS score_micros
FROM grid, stats
GROUP BY doc_id
ORDER BY score_micros DESC, doc_id LIMIT 10""",
    ref="extension: Dirichlet query-likelihood retrieval (LM scoring "
    "with collection-prior smoothing; grid = docs x |terms|, corpus "
    "explode filtered to hits pre-shuffle)",
)
def q_query_likelihood_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.query_likelihood_topk(
        load_table(spark, sf_dir, "documents"),
        list(_QL_TERMS),
        k=10,
        mu=_QL_MU,
    )


# =========================================================================
# wave 96: MAP@10 -- completes the retrieval-eval triad (MRR gives the
# first hit, NDCG the graded ranking, MAP the full precision profile).
# Average precision is computed in exact integer arithmetic: at each
# relevant rank k the precision term floor(hits_at_k * 1e6 / k) is an
# integer (quantized per term, so the sum is order-free), and AP is the
# truncating division by min(n_rel, 10).  The ranking reuses the NDCG
# shape: rank INSIDE the TakeOrdered top-10 (limit-bounded window), the
# relevant-total as a plain aggregate.
# =========================================================================


@_register(
    "map_at10",
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
    AND e.embedding IS NOT NULL
    AND len(list_filter(e.embedding, x -> x IS NULL)) = 0
),
rk AS (
  SELECT label, qlabel,
         row_number() OVER (ORDER BY s DESC, vec_id) AS rank
  FROM sims WHERE s IS NOT NULL
),
hits AS (
  SELECT rank,
         count(*) FILTER (WHERE label = qlabel)
           OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS h,
         CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel
  FROM rk WHERE rank <= 10
),
nrel AS (SELECT CAST(count(*) FILTER (WHERE label = qlabel) AS BIGINT)
                  AS n_rel FROM rk),
ap AS (
  SELECT CAST(sum(CASE WHEN rel = 1 THEN h * 1000000 // rank
                       ELSE 0 END) AS BIGINT) AS ap_sum_micro,
         CAST(sum(rel) AS BIGINT) AS hits10
  FROM hits
)
SELECT ap.hits10, nrel.n_rel,
       CAST(ap.ap_sum_micro // least(nrel.n_rel, 10) AS BIGINT)
         AS ap_micro
FROM ap CROSS JOIN nrel""",
    ref="extension: MAP@10 against label ground truth -- exact integer "
    "precision terms, truncating-div average; completes MRR/NDCG/MAP",
)
def q_map_at10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import cosine
    from mapreduce6240project_spark.plans.extensions import _query_vec

    emb = load_table(spark, sf_dir, "embeddings")
    qlabel = emb.filter(F.col("vec_id") == 0).select("label").first().label
    qv = _query_vec(spark, sf_dir)
    q = F.array(*[F.lit(float(x)) for x in qv])
    sims = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", "label", cosine("embedding", q).alias("s"))
        .filter(F.col("s").isNotNull())
    )
    top10 = sims.orderBy(F.col("s").desc(), "vec_id").limit(10)
    hits = top10.select(
        F.expr("row_number() OVER (ORDER BY s DESC, vec_id)").alias("rank"),
        F.when(F.col("label") == qlabel, 1).otherwise(0).alias("rel"),
    ).select(
        "rank",
        "rel",
        F.expr(
            "sum(rel) OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW)"
        ).alias("h"),
    )
    ap = hits.agg(
        F.sum(
            F.when(
                F.col("rel") == 1,
                F.expr("h * 1000000 div rank"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("ap_sum_micro"),
        F.sum("rel").cast("bigint").alias("hits10"),
    )
    nrel = sims.agg(
        F.count(F.when(F.col("label") == qlabel, 1))
        .cast("bigint")
        .alias("n_rel")
    )
    return ap.crossJoin(F.broadcast(nrel)).select(
        "hits10",
        "n_rel",
        F.expr("ap_sum_micro div least(n_rel, 10)")
        .cast("bigint")
        .alias("ap_micro"),
    )


# =========================================================================
# wave 105: pseudo-relevance feedback (RM3-style query expansion)
#
# ``rm3_expansion_top10``: the classic two-pass retrieval loop -- BM25
# on the original query, mine the top-3 feedback documents' most
# frequent non-query terms, re-rank with the expanded weighted query
# (original terms weight 2, expansion terms weight 1).  Per-term BM25
# contributions are micro-quantized BEFORE the integer weighting and
# the per-document sum (the module convention), and both cut points
# (feedback docs, expansion terms) break ties deterministically, so
# the full pipeline hash-replays in DuckDB.
#
# 100 TB: two explode+partial-agg passes with broadcast df tables; the
# expansion term list is a <=8-row broadcast.  (operators/retrieval.py
# rm3_expansion_topk)
# =========================================================================

_RM3_CONTRIB = (
    "CAST(floor(ln(1.0 + (nd - df_t + 0.5) / (df_t + 0.5))"
    f" * CAST(tf AS DOUBLE) * {R.K1 + 1.0!r}"
    f" / (CAST(tf AS DOUBLE) + {R.K1!r} * ({1.0 - R.B!r}"
    f" + {R.B!r} * CAST(dl AS DOUBLE) / (CAST(nt AS DOUBLE) / nd)))"
    " * 1000000 + 0.5) AS BIGINT)"
)


@_register(
    "rm3_expansion_top10",
    f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
),
stats AS (SELECT count(*) AS nd, sum(len(w)) AS nt FROM toks),
ex AS (
  SELECT doc_id, dl, t AS term FROM (
    SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM toks
  )
),
h1 AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM ex
  WHERE term IN ('join', 'filter', 'scan') GROUP BY 1, 2, 3
),
df1 AS (SELECT term, count(*) AS df_t FROM h1 GROUP BY term),
s1 AS (
  SELECT doc_id, CAST(sum({_RM3_CONTRIB}) AS BIGINT) AS score
  FROM h1 JOIN df1 USING (term), stats GROUP BY doc_id
),
fb AS (SELECT doc_id FROM s1 ORDER BY score DESC, doc_id LIMIT 3),
exp_t AS (
  SELECT term, CAST(1 AS BIGINT) AS wgt FROM (
    SELECT ex.term, count(*) AS tf_sum
    FROM ex JOIN fb USING (doc_id)
    WHERE ex.term NOT IN ('join', 'filter', 'scan')
    GROUP BY ex.term ORDER BY tf_sum DESC, ex.term LIMIT 5
  )
),
qterms AS (
  SELECT 'join' AS term, CAST(2 AS BIGINT) AS wgt
  UNION ALL SELECT 'filter', 2 UNION ALL SELECT 'scan', 2
  UNION ALL SELECT term, wgt FROM exp_t
),
h2 AS (
  SELECT ex.doc_id, ex.dl, ex.term, count(*) AS tf
  FROM ex JOIN qterms USING (term) GROUP BY 1, 2, 3
),
df2 AS (SELECT term, count(*) AS df_t FROM h2 GROUP BY term),
s2 AS (
  SELECT h2.doc_id,
         CAST(sum(qterms.wgt * {_RM3_CONTRIB}) AS BIGINT) AS rm3_micros
  FROM h2 JOIN df2 USING (term) JOIN qterms USING (term), stats
  GROUP BY h2.doc_id
)
SELECT doc_id, rm3_micros FROM s2
ORDER BY rm3_micros DESC, doc_id LIMIT 10""",
    ref="extension: RM3-style pseudo-relevance feedback -- BM25 pass, "
    "top-3 feedback docs, top-5 expansion terms, weighted re-rank; "
    "contributions micro-quantized before the weighted sum "
    "(operators/retrieval.py rm3_expansion_topk)",
)
def q_rm3_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.rm3_expansion_topk(
        load_table(spark, sf_dir, "documents"), list(_QUERY_TERMS), k=10
    )
