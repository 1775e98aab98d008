"""Round-3 coverage wave 19: quality-based canonical selection.

``dup_best_survivors``: pick the CANONICAL document per duplicate
cluster by quality, not by id.  Min-id survivor selection (what plain
dedup does) keeps whichever near-duplicate happened to be crawled
first; production corpora keep the *best* copy -- highest quality
score, id as the tiebreak.  Composition of three existing operators:
transitive components over the exact near-dup graph, the quality
scorer, and a per-component top-1 window whose partition key is the
component (cluster-sized partitions, not corpus-sized).

The oracle replays components with the recursive reach CTE and reuses
the registered quality oracle verbatim, so the two selection inputs
are bit-identical to their standalone queries.

Reference parity note: canonical-copy selection is an LLM-pipeline
extension alongside SURVEY.md section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY, _register
from mapreduce6240project_spark.plans.wave18 import DUP_COMPONENTS_CTE
from mapreduce6240project_spark.sources.tables import load_table

#: the standalone quality query's oracle, reused verbatim (extensions
#: registers before this module, enforced by plans/__init__ order)
_QUALITY_SQL = REGISTRY["text_quality"].oracle


@_register(
    "dup_best_survivors",
    DUP_COMPONENTS_CTE
    + f""",
q AS (
  {_QUALITY_SQL}
),
ranked AS (
  SELECT c.component, c.doc_id, q.quality,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY q.quality DESC, c.doc_id) AS rk
  FROM comp c JOIN q ON q.doc_id = c.doc_id
)
SELECT component, doc_id AS survivor_id, quality
FROM ranked WHERE rk = 1""",
    ref="extension: canonical-copy selection per duplicate cluster "
    "(keep highest quality, not lowest id); composes components + "
    "quality scorer + cluster-partitioned top-1 window",
)
def q_dup_best_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.graph import dup_components
    from mapreduce6240project_spark.operators.textstats import quality_score

    docs = load_table(spark, sf_dir, "documents")
    comp = dup_components(docs, threshold=0.5)
    quality = quality_score(docs).select("doc_id", "quality")
    w = Window.partitionBy("component").orderBy(F.desc("quality"), "doc_id")
    return (
        comp.join(quality, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("component", F.col("doc_id").alias("survivor_id"), "quality")
    )
