"""Round-3 coverage wave 31: index building, budgeted selection, and
graph core decomposition.

- ``inverted_index_top100``: posting-list build over the documents
  table -- the physical structure of sparse retrieval.  The posting
  cap is applied with a rank window BEFORE any list aggregates, so no
  aggregation buffer ever holds a stopword's full posting list (the
  unbounded-``collect_list`` trap at corpus scale).
- ``token_budget_docs``: per-language document admission under a TOKEN
  budget (how training mixtures are really specified), via a
  hash-ordered running-sum window -- admit while the running total
  before the document is under budget.
- ``kcore3_copurchase``: 3-core of the support-filtered co-purchase
  graph by iterated peel to fixpoint.  The Spark loop runs to true
  convergence with early exit; the oracle unrolls 16 peel rounds as
  chained CTEs (measured fixpoint at sf0.01: 10 rounds; extra rounds
  are no-ops on a converged core, so the unroll is safe slack, and the
  engine's fixpoint semantics stay scale-independent).

Reference parity note: kcore reuses Cluster.java's iterate-to-
convergence control flow (SURVEY.md section 2.9) on a graph operator;
the other two extend the LLM-pipeline curation surface (SURVEY.md
section 2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce6240project_spark.functions.hashing import hash60_sql
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

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
    from mapreduce6240project_spark.plans.wave28 import _copurchase_edges_with_pairs

    _, cp = _copurchase_edges_with_pairs(spark, sf_dir)
    return kcore(cp, k=_KCORE_K)
