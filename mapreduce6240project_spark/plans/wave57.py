"""Round-3 coverage wave 57: production dedup job shapes.

- ``incremental_dedup_new``: the most common production dedup job --
  a NEW batch (odd doc ids) deduplicated against the already-ingested
  corpus (even ids) AND within itself: a new document survives when its
  fingerprint is absent from the seen corpus and it is the lowest id
  for that fingerprint inside the batch.  One anti-join against the
  seen fingerprint set + one in-batch group-min; at scale the seen set
  is the fingerprint index, not the corpus.
- ``doc_survivor_remap``: the reference-rewrite table dedup emits for
  downstream consumers -- for every non-canonical duplicate, the
  surviving canonical doc id (min id per exact fingerprint).  Joins,
  citations, and index entries pointing at dropped docs are rewritten
  through this map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.dedup import normalize_text
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@_register(
    "incremental_dedup_new",
    f"""
WITH fp AS (
  SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents
),
seen AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 2 = 0),
batch AS (SELECT * FROM fp WHERE doc_id % 2 = 1),
fresh AS (
  SELECT b.doc_id, b.fingerprint FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.fingerprint = b.fingerprint)
)
SELECT fingerprint, CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_batch_copies
FROM fresh GROUP BY fingerprint""",
    ref="extension: incremental dedup of a new batch vs the seen "
    "corpus -- fingerprint anti-join + in-batch keep-lowest; the seen "
    "side is index-sized at scale",
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", F.md5(normalize_text("text")).alias("fingerprint")
    )
    seen = fp.filter(F.col("doc_id") % 2 == 0).select("fingerprint").distinct()
    batch = fp.filter(F.col("doc_id") % 2 == 1)
    fresh = batch.join(seen, "fingerprint", "left_anti")
    return fresh.groupBy("fingerprint").agg(
        F.min("doc_id").cast("bigint").alias("doc_id"),
        F.count(F.lit(1)).alias("n_batch_copies"),
    )


def _remap_sql() -> str:
    from mapreduce6240project_spark.plans.parity import _jaccard_pairs_cte

    return (
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
)
SELECT u AS doc_id, CAST(min(l) AS BIGINT) AS canonical_id
FROM reach GROUP BY u"""
    )


@_register(
    "doc_survivor_remap",
    _remap_sql(),
    ref="extension: dedup reference-rewrite map over near-dup "
    "components (dropped doc -> min-id canonical of its J>=0.5 "
    "component) -- the table downstream joins are rewritten through; "
    "edges are the LSH-verified pairs (recall pinned by "
    "minhash_recall_audit), components via label propagation",
)
def q_survivor_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators import dedup as D
    from mapreduce6240project_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_verified_pairs(
        docs, D.minhash_candidate_pairs(docs), threshold=0.5
    ).select("id_a", "id_b")
    cc = connected_components(pairs)
    return (
        cc.filter(F.col("node") != F.col("component"))
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").cast("bigint").alias("canonical_id"),
        )
    )
