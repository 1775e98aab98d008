"""Round-3 coverage wave 38: personalized PageRank and association
rules.

- ``ppr_seeded``: topic-sensitive PageRank on the document-similarity
  graph with restart mass confined to the seed set (doc_id % 10 == 0)
  -- the seed-relative relevance ranking behind recommendation and
  seed-expanded retrieval.  Exact bigint fixed-point arithmetic, same
  discipline as ``pagerank_simgraph``; the oracle replays three
  unrolled iterations on the identical edge CTE (imported from wave2,
  so the two rank queries can never drift onto different graphs).
- ``assoc_rules_top``: directed market-basket rules A -> B with exact
  integer support / confidence / lift over order-level counts --
  the step after ``copurchase_pairs`` frequent-pair mining.  Composed
  lift (conf_micro * N // c(B)) keeps every intermediate bigint-safe
  at any order count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce6240project_spark.operators.analytics import association_rules
from mapreduce6240project_spark.operators.graph import (
    personalized_pagerank_quantized,
)
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.plans.wave2 import SIMGRAPH_EDGES_CTE
from mapreduce6240project_spark.sources.tables import load_table

_PPR_ITER = """
it{k} AS (
  SELECT e.v AS node,
         CASE WHEN e.v % 10 = 0 THEN (SELECT tele FROM p2) ELSE 0 END
         + (sum(p.pr // d.outdeg) * 85) // 100 AS pr
  FROM edges e JOIN it{prev} p ON p.node = e.u JOIN deg d ON d.u = e.u
  GROUP BY e.v
)"""

_PPR_ORACLE = (
    SIMGRAPH_EDGES_CTE
    + """,
params AS (SELECT count(*) AS ns FROM deg WHERE u % 10 = 0),
p2 AS (SELECT 1000000000000 // ns AS init,
              (1000000000000 * 15 // 100) // ns AS tele FROM params),
it0 AS (
  SELECT u AS node,
         CASE WHEN u % 10 = 0 THEN (SELECT init FROM p2) ELSE 0 END AS pr
  FROM deg
)"""
    + "".join("," + _PPR_ITER.format(k=k, prev=k - 1) for k in (1, 2, 3))
    + """
SELECT node, CAST(pr AS BIGINT) AS pr FROM it3"""
)


@_register(
    "ppr_seeded",
    _PPR_ORACLE,
    ref="extension: personalized PageRank (integer-quantized, seed set "
    "doc_id%10==0) on the near-dup similarity graph -- per-iteration "
    "join+agg with a CASE teleport, node-sized state",
)
def q_ppr_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.1).select("id_a", "id_b")
    return personalized_pagerank_quantized(pairs, seed_mod=10, n_iter=3)


@_register(
    "assoc_rules_top",
    """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
item AS (SELECT l_partkey, count(*) AS c_item FROM op GROUP BY 1),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 3
)
SELECT part_a, part_b, support,
       CAST(support * 1000000 // ia.c_item AS BIGINT) AS conf_micro,
       CAST((support * 1000000 // ia.c_item) * n.n_orders // ib.c_item
            AS BIGINT) AS lift_micro
FROM pairs
JOIN item ia ON ia.l_partkey = part_a
JOIN item ib ON ib.l_partkey = part_b, n
ORDER BY conf_micro DESC, part_a, part_b LIMIT 20""",
    ref="extension: association rules with exact integer "
    "support/confidence/lift over order-level counts; basket-bounded "
    "pair expansion, item counts broadcast",
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return association_rules(
        load_table(spark, sf_dir, "lineitem"), min_support=3, k=20
    )
