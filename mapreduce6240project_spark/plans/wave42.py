"""Round-3 coverage wave 42: tokenizer-efficiency and graph-extent
diagnostics.

- ``tokenizer_fertility``: subword-per-word fertility ratio per language
  (BPE-ish pre-tokenizer subwords / whitespace words, truncating fixed
  point) -- THE standard tokenizer-evaluation metric: languages with
  fertility far above 1 pay proportionally more sequence length per
  word, which drives both training cost and context-budget planning.
- ``graph_diameter_sweep``: double-sweep BFS diameter estimate of the
  similarity graph -- BFS from a fixed source, re-BFS from the farthest
  reached node; the second sweep's eccentricity is the classic
  lower-bound diameter estimate.  Bounded depth keeps both the engine
  loop and the recursive-CTE oracle finite; ties resolve to the lowest
  node id so the sweep is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.plans.wave5 import _SIMGRAPH_PAIRS_CTE
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_SWEEP_SOURCE = 0
_SWEEP_HOPS = 4


@_register(
    "tokenizer_fertility",
    rf"""
SELECT lang,
       CAST(sum(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')))
            AS BIGINT) AS n_subwords,
       CAST(sum(len(string_split({_NORM}, ' '))) AS BIGINT) AS n_words,
       CAST(sum(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')))
            * 1000000 // sum(len(string_split({_NORM}, ' ')))
            AS BIGINT) AS fertility_micro
FROM documents
GROUP BY lang""",
    ref="extension: per-language tokenizer fertility (subwords per "
    "whitespace word, truncating fixed point) -- one narrow corpus "
    "pass, language-keyed aggregate",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import normalize_text
    from mapreduce6240project_spark.operators.textstats import bpe_ish_token_count

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        bpe_ish_token_count("text").alias("sub"),
        F.size(F.split(normalize_text("text"), " ")).alias("wrd"),
    )
    return per_doc.groupBy("lang").agg(
        F.sum("sub").cast("bigint").alias("n_subwords"),
        F.sum("wrd").cast("bigint").alias("n_words"),
        F.expr("sum(sub) * 1000000 div sum(wrd)").cast("bigint").alias(
            "fertility_micro"
        ),
    )


_DIAMETER_ORACLE = (
    _SIMGRAPH_PAIRS_CTE.replace("WITH sh AS", "WITH RECURSIVE sh AS", 1)
    + f"""
, und AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL
  SELECT id_b AS s, id_a AS d FROM pairs
),
walk1(node, hops) AS (
  SELECT CAST({_SWEEP_SOURCE} AS BIGINT) AS node, 0 AS hops
  UNION ALL
  SELECT u.d, w.hops + 1 FROM walk1 w JOIN und u ON u.s = w.node
  WHERE w.hops < {_SWEEP_HOPS}
),
d1 AS (SELECT node, min(hops) AS hops FROM walk1 GROUP BY node),
far AS (
  SELECT node FROM d1 ORDER BY hops DESC, node LIMIT 1
),
walk2(node, hops) AS (
  SELECT node, 0 AS hops FROM far
  UNION ALL
  SELECT u.d, w.hops + 1 FROM walk2 w JOIN und u ON u.s = w.node
  WHERE w.hops < {_SWEEP_HOPS}
),
d2 AS (SELECT node, min(hops) AS hops FROM walk2 GROUP BY node)
SELECT (SELECT node FROM far) AS far_node,
       CAST(max(hops) AS BIGINT) AS diameter_est,
       CAST(count(*) AS BIGINT) AS n_reached
FROM d2"""
)


@_register(
    "graph_diameter_sweep",
    _DIAMETER_ORACLE,
    ref="extension: double-sweep BFS diameter estimate -- two bounded "
    "frontier expansions; the 1-row farthest-node handoff is the same "
    "bounded driver state as the kmedoids medoid list",
)
def q_graph_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.graph import bfs_hops, simgraph_pairs

    pairs = simgraph_pairs(spark, sf_dir).persist()
    d1 = bfs_hops(pairs, source=_SWEEP_SOURCE, max_hops=_SWEEP_HOPS)
    far = (
        d1.orderBy(F.desc("hops"), "node").limit(1).collect()[0].node
    )  # 1-row driver scalar
    d2 = bfs_hops(pairs, source=far, max_hops=_SWEEP_HOPS)
    out = d2.agg(
        F.lit(far).cast("bigint").alias("far_node"),
        F.max("hops").cast("bigint").alias("diameter_est"),
        F.count(F.lit(1)).alias("n_reached"),
    )
    pairs.unpersist()
    return out
