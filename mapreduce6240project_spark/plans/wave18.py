"""Round-3 coverage wave 18: fuzzy string joins and duplicate-cluster
shape statistics.

- ``typo_pairs``: blocked edit-distance self-join over part names --
  candidate pairs share a blocking key (the name's last token), and
  only candidates pay the Levenshtein kernel.  The standard entity-
  resolution shape: an all-pairs N^2 edit-distance scan is impossible
  at scale, a block-local one is routine (work is sum of block-size^2,
  bounded by the blocking key's fan-out, and the kernel runs inside
  whole-stage codegen).
- ``dup_component_sizes``: histogram of duplicate-cluster sizes from
  the transitive near-dup graph (how big do duplicate families get --
  the number that tells you whether dedup will delete 1% or 40% of the
  corpus).  Components come from the same label-propagation operator
  the survivor query uses; singleton documents count as size-1
  clusters via a left anti-ish coalesce, and the oracle replays the
  components with the recursive reach CTE.

Reference parity note: entity resolution and cluster-shape audits are
engine extensions alongside SURVEY.md section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.parity import _jaccard_pairs_cte
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

TYPO_MAX_DIST = 3


@_register(
    "typo_pairs",
    f"""
WITH names AS (
  SELECT DISTINCT p_name AS name,
         split_part(p_name, ' ', -1) AS block
  FROM part
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM names a JOIN names b
  ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) BETWEEN 1 AND {TYPO_MAX_DIST}""",
    ref="extension: blocked edit-distance self-join (entity resolution "
    "shape: block key bounds candidate pairs, Levenshtein only on "
    "candidates)",
)
def q_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = part.select(
        F.col("p_name").alias("name"),
        F.element_at(F.split("p_name", " "), -1).alias("block"),
    ).distinct()
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .filter(dist.between(1, TYPO_MAX_DIST))
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            dist.cast("bigint").alias("dist"),
        )
    )


#: shared recursive replay of ``graph.dup_components`` at threshold
#: 0.5: exact pair graph -> reach facts -> per-doc min-label component
#: (singletons label themselves).  wave19 appends its own CTEs.
DUP_COMPONENTS_CTE = (
    "WITH RECURSIVE "
    + _jaccard_pairs_cte("documents", 0.5).lstrip()
    + """,
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, l) AS (
  SELECT u, v FROM edges WHERE v < u
  UNION
  SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v WHERE r.l < e.u
),
comp AS (
  SELECT d.doc_id,
         coalesce((SELECT min(l) FROM reach r WHERE r.u = d.doc_id),
                  d.doc_id) AS component
  FROM documents d
)"""
)


@_register(
    "dup_component_sizes",
    DUP_COMPONENTS_CTE
    + """,
fam AS (
  SELECT component, count(*) AS csize FROM comp GROUP BY component
)
SELECT csize AS component_size, count(*) AS n_components
FROM fam GROUP BY csize""",
    ref="extension: duplicate-cluster size histogram over the transitive "
    "near-dup components (label propagation; singletons are size-1)",
)
def q_dup_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.graph import dup_components

    docs = load_table(spark, sf_dir, "documents")
    comp = dup_components(docs, threshold=0.5)
    sizes = comp.groupBy("component").agg(F.count("*").alias("csize"))
    return sizes.groupBy(F.col("csize").alias("component_size")).agg(
        F.count("*").alias("n_components")
    )
