"""Round-3 coverage wave 12: graph traversal with a SQL-replayable
oracle, and tokenizer-prep vocabulary coverage.

- ``bfs_hops_simgraph``: bounded-depth breadth-first search over the
  near-dup similarity graph (shortest hop count from a source doc).
  Iterative frontier expansion on Spark; the oracle replays it with a
  recursive CTE -- upgrading "iterative graph algorithm" from a
  rows-only check to a full value-hash match.
- ``vocab_oov_rate``: out-of-vocabulary rate per language against a
  frequency-built top-k vocabulary -- the go/no-go metric computed
  before freezing a tokenizer on a new corpus.  Two-stage plan: build
  the vocab with a distributed top-k (per-partition heads, k-row driver
  merge, no global sort), broadcast it, measure coverage in one pass.

Reference parity note: the reference has no graph or tokenizer
surface; this wave belongs to the LLM-data-pipeline extension mandated
alongside SURVEY.md section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.extensions import _NORM
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.plans.wave5 import _SIMGRAPH_PAIRS_CTE
from mapreduce6240project_spark.sources.tables import load_table

#: BFS source document and depth cap.  Fixed so the query (and its
#: oracle) are deterministic; depth-capped BFS has a fixed round count
#: at any scale.
BFS_SOURCE = 0
BFS_MAX_HOPS = 3

#: Vocabulary size for the coverage metric.  The synthetic corpus has a
#: small closed vocabulary, so a small k keeps the OOV rate non-trivial;
#: at real scale the same plan runs with k = 32000 unchanged.
VOCAB_K = 10

_BFS_ORACLE = (
    _SIMGRAPH_PAIRS_CTE.replace("WITH sh AS", "WITH RECURSIVE sh AS", 1)
    + f"""
, und AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL
  SELECT id_b AS s, id_a AS d FROM pairs
),
walk(node, hops) AS (
  SELECT CAST({BFS_SOURCE} AS BIGINT) AS node, 0 AS hops
  UNION ALL
  SELECT u.d AS node, w.hops + 1 AS hops
  FROM walk w JOIN und u ON u.s = w.node
  WHERE w.hops < {BFS_MAX_HOPS}
)
SELECT node AS doc_id, CAST(min(hops) AS INT) AS hops
FROM walk GROUP BY node"""
)


@_register(
    "bfs_hops_simgraph",
    _BFS_ORACLE,
    ref="extension: bounded-depth BFS (shortest hops from a source) on "
    "the near-dup similarity graph; frontier-expansion joins with "
    "localCheckpoint lineage truncation, oracle is a recursive CTE",
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.graph import bfs_hops, simgraph_pairs

    return bfs_hops(
        simgraph_pairs(spark, sf_dir), source=BFS_SOURCE, max_hops=BFS_MAX_HOPS
    ).select(F.col("node").alias("doc_id"), "hops")


@_register(
    "vocab_oov_rate",
    f"""
WITH tok AS (
  SELECT lang, unnest(string_split({_NORM}, ' ')) AS token FROM documents
),
vocab AS (
  SELECT token FROM (
    SELECT token, count(*) AS n FROM tok GROUP BY token
    ORDER BY n DESC, token LIMIT {VOCAB_K}
  )
)
SELECT lang,
       count(*) AS n_tokens,
       floor(10000.0 * count(CASE WHEN token NOT IN (SELECT token FROM vocab)
                                  THEN 1 END) / count(*) + 0.5) / 10000.0
         AS oov_rate
FROM tok GROUP BY lang""",
    ref="extension: tokenizer vocabulary coverage (per-language OOV rate "
    "vs a frequency top-k vocab); distributed top-k then broadcast "
    "membership join, one corpus pass",
)
def q_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import tokens
    from mapreduce6240project_spark.operators.textstats import vocab_topk

    docs = load_table(spark, sf_dir, "documents")
    vocab = vocab_topk(docs, k=VOCAB_K).select(
        F.col("token").alias("v_token"), F.lit(1).alias("in_vocab")
    )
    tok = docs.select("lang", F.explode(tokens("text")).alias("token"))
    return (
        tok.join(F.broadcast(vocab), tok.token == vocab.v_token, "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.floor(
                    10000.0
                    * F.count(F.when(F.col("in_vocab").isNull(), 1))
                    / F.count("*")
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("oov_rate"),
        )
    )
