"""Round-3 coverage wave 13: slowly-changing-dimension history and
corpus boilerplate detection.

- ``scd2_user_state``: SCD type-2 history build from an event log --
  per user, collapse consecutive duplicate states (lag), then derive
  validity intervals (lead); the current version's ``valid_to_us`` is
  NULL.  The warehouse-side sibling of ``scd_upsert`` (type 1 /
  latest-wins): type 2 keeps every version with its validity window.
  One shuffle on the history key; both windows share the same
  (user_id, ts) partitioning so Catalyst plans a single sort+exchange.
- ``boilerplate_chunks``: C4-style boilerplate detection -- token
  chunks recurring across >= 2 distinct documents of the same source
  (nav bars, license footers).  Shares the chunking stage with
  paragraph dedup (``dedup.doc_chunks``); the shuffle key is the
  (source, chunk-hash) pair, carrying digests, not text.

Reference parity note: the reference has no history-tracking or
boilerplate surface; this wave belongs to the LLM-data-pipeline
extension mandated alongside SURVEY.md section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

#: A chunk is boilerplate when it recurs in at least this many distinct
#: documents of one source.
BOILERPLATE_MIN_DOCS = 2
#: chunk granularity -- interpolated into BOTH the Spark call and the
#: oracle SQL so the two sides can never silently diverge
BOILERPLATE_CHUNK_TOKENS = 10


@_register(
    "scd2_user_state",
    """
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS us, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS prev_state,
         event_id
  FROM events
),
changes AS (
  SELECT user_id, us, event_type, event_id FROM ordered
  WHERE prev_state IS NULL OR prev_state <> event_type
)
SELECT user_id, event_type AS state, us AS valid_from_us,
       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         AS valid_to_us
FROM changes""",
    ref="extension: SCD type-2 history build (consecutive-duplicate "
    "collapse via lag, validity intervals via lead; type-1 sibling is "
    "scd_upsert)",
)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_type", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    changes = (
        ev.withColumn("prev_state", F.lag("event_type").over(w))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("event_type"))
        )
        .drop("prev_state")
    )
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w2).alias("valid_to_us"),
    )


@_register(
    "boilerplate_chunks",
    rf"""
WITH norm AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
  FROM documents
),
toks AS (
  SELECT doc_id, source, unnest(tk) AS tok,
         unnest(generate_series(1, len(tk))) - 1 AS pos
  FROM norm
),
chunks AS (
  SELECT doc_id, source, CAST(floor(pos / {BOILERPLATE_CHUNK_TOKENS}) AS INT) AS cpos,
         string_agg(tok, ' ' ORDER BY pos) AS chunk
  FROM toks GROUP BY doc_id, source, CAST(floor(pos / {BOILERPLATE_CHUNK_TOKENS}) AS INT)
)
SELECT source, chunk, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM chunks
GROUP BY source, chunk
HAVING count(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}""",
    ref="extension: C4-style boilerplate detection (chunks recurring in "
    ">= 2 distinct docs per source); shares dedup.doc_chunks with "
    "paragraph dedup",
)
def q_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import doc_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = doc_chunks(docs, chunk_tokens=BOILERPLATE_CHUNK_TOKENS).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return (
        chunks.groupBy("source", "chunk")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
    )
