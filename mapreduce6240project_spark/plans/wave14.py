"""Round-3 coverage wave 14: two-stage retrieval re-ranking and
contrastive negative sampling.

- ``rerank_top_docs``: the standard retrieval cascade -- a cheap
  recall stage (BM25 top-20) followed by an expensive precision stage
  over the candidates only.  The re-ranker here is a deterministic
  term-proximity scorer (distinct-term coverage, then earliest-position
  bonus) standing in for a cross-encoder: the *shape* is the point --
  the second stage touches 20 rows, never the corpus, so an arbitrarily
  costly scorer stays O(k) at any corpus size.
- ``contrastive_negatives``: deterministic random negatives per anchor
  document (the sampling step of contrastive embedding training).
  Each anchor derives its negative ids from the same LCG used by the
  engine's sampling family (integer arithmetic, oracle-replayable,
  re-run stable); one equi-join materializes the negatives' metadata.
  No N x N candidate generation anywhere -- 3N derived rows, one
  data-sized shuffle.

Reference parity note: the reference has no retrieval or training-prep
surface; this wave belongs to the LLM-data-pipeline extension mandated
alongside SURVEY.md section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.dedup import tokens
from mapreduce6240project_spark.operators.retrieval import bm25_topk
from mapreduce6240project_spark.operators.sampling import _INC, _MOD, _MULT
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.plans.wave5 import _BM25_SQL, _QUERY_TERMS
from mapreduce6240project_spark.sources.tables import load_table

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
    nd = docs.count()  # one scalar aggregate, folded into literals
    slots = F.array(*[F.lit(j) for j in range(N_NEGATIVES)])
    anchors = docs.select(
        F.col("doc_id").alias("anchor_id"), F.explode(slots).alias("slot")
    )
    raw = (
        (F.col("anchor_id") % _MOD) * _MULT
        + _INC
        + F.col("slot").cast("bigint") * NEG_STEP
    ) % _MOD % nd
    negs = anchors.select(
        "anchor_id",
        "slot",
        F.when(raw == F.col("anchor_id"), (raw + 1) % nd)
        .otherwise(raw)
        .alias("neg_id"),
    )
    meta = docs.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")
    )
    return negs.join(meta, "neg_id").select(
        "anchor_id", "slot", "neg_id", "neg_source"
    )
