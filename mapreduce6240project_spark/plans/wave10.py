"""Round-3 coverage wave 10: embedding-index validation and semantic
deduplication.

- ``semantic_dedup``: SemDeDup-style pruning (cluster embeddings into
  IVF k-means cells, drop every vector with a lower-id within-cell
  neighbor above the cosine threshold).  The LLM-curation counterpart
  of the text-side MinHash/SimHash dedup family, operating purely in
  embedding space.
- ``ann_recall_at10``: measured recall@10 of the IVF approximate top-k
  against the exact brute-force top-k -- the validation query you run
  on a sample before trusting an approximate index at full scale.
  Registered as a first-class query so the driver's oracle replays the
  whole IVF pipeline *and* its quality metric.

Both oracles reuse the unrolled integer-k-means CTE chain
(``_ivf_cells_sql``) that makes the IVF pipeline bit-exact in ANSI SQL.

Reference parity note: the reference has no vector surface; this wave
belongs to the LLM-data-pipeline extension mandated alongside SURVEY.md
section 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators import similarity as S
from mapreduce6240project_spark.plans.extensions import _ivf_cells_sql, _query_vec
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "semantic_dedup",
    _ivf_cells_sql()
    + """
, un AS (
  SELECT vec_id,
         list_transform(ev, v -> v / sqrt(list_dot_product(ev, ev))) AS uv
  FROM vecs
),
dominated AS (
  SELECT DISTINCT b.vec_id
  FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN un ua ON ua.vec_id = a.vec_id
  JOIN un ub ON ub.vec_id = b.vec_id
  WHERE round(list_dot_product(ua.uv, ub.uv), 4) >= 0.35
)
SELECT e.vec_id, e.label
FROM embeddings e
WHERE e.vec_id NOT IN (SELECT vec_id FROM dominated)""",
    ref="extension: SemDeDup-style semantic dedup (IVF cells + within-cell "
    "cosine pruning, keep-lowest-id); embedding-space counterpart of the "
    "MinHash/SimHash text dedup family",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb, threshold=0.35).select("vec_id", "label")


@_register(
    "ann_recall_at10",
    _ivf_cells_sql()
    + """
, qi AS (SELECT unnest(q) AS x, unnest(generate_series(1, len(q))) AS d
       FROM iv WHERE vec_id = 0),
pd AS (SELECT c.cell, sum((c.cx - t.x) * (c.cx - t.x)) AS dist
       FROM c2 c JOIN qi t ON c.d = t.d GROUP BY 1),
probe AS (SELECT cell FROM (
       SELECT cell, row_number() OVER (ORDER BY dist, cell) AS rn FROM pd)
       WHERE rn <= 4),
asims AS (
  SELECT a.vec_id,
         list_dot_product(v.ev, qv)
         / (sqrt(list_dot_product(v.ev, v.ev)) * sqrt(list_dot_product(qv, qv))) AS sim_raw
  FROM af a JOIN vecs v USING (vec_id), q
  WHERE a.cell IN (SELECT cell FROM probe)
),
approx AS (SELECT vec_id FROM (
  SELECT vec_id, row_number() OVER (ORDER BY sim_raw DESC, vec_id) AS rn
  FROM asims) WHERE rn <= 10),
esims AS (
  SELECT v.vec_id,
         list_dot_product(v.ev, qv)
         / (sqrt(list_dot_product(v.ev, v.ev)) * sqrt(list_dot_product(qv, qv))) AS sim_raw
  FROM vecs v, q
),
exact AS (SELECT vec_id FROM (
  SELECT vec_id, row_number() OVER (ORDER BY sim_raw DESC, vec_id) AS rn
  FROM esims) WHERE rn <= 10)
SELECT 10 AS k, CAST(count(*) AS BIGINT) AS hits,
       round(count(*) / 10.0, 4) AS recall
FROM exact JOIN approx USING (vec_id)""",
    ref="extension: recall@10 of the IVF index vs the exact top-k -- "
    "index-quality validation as a first-class, oracle-replayed query",
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ann_recall(emb, _query_vec(spark, sf_dir), k=10, n_probe=4)


@_register(
    "dedup_paragraphs",
    r"""
WITH norm AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(tk) AS tok,
         unnest(generate_series(1, len(tk))) - 1 AS pos
  FROM norm
),
chunks AS (
  SELECT doc_id, CAST(floor(pos / 10) AS INT) AS cpos,
         string_agg(tok, ' ' ORDER BY pos) AS chunk
  FROM toks GROUP BY doc_id, CAST(floor(pos / 10) AS INT)
),
kept AS (
  SELECT doc_id, cpos, chunk,
         row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, cpos) AS rk
  FROM chunks
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_chunks,
       string_agg(chunk, ' ' ORDER BY cpos) AS dedup_text
FROM kept WHERE rk = 1 GROUP BY doc_id""",
    ref="extension: C4/Dolma paragraph-granular dedup with document "
    "reassembly (span-level survivor selection, not whole-doc): "
    "operators/dedup.py dedup_paragraphs",
)
def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import dedup_paragraphs

    return dedup_paragraphs(load_table(spark, sf_dir, "documents"))


@_register(
    "impute_props_k",
    """
WITH parsed AS (
  SELECT event_id, event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
),
stats AS (
  SELECT event_type,
         CAST(sum(k) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
           AS mean_micros
  FROM parsed WHERE k >= 10 GROUP BY event_type
)
SELECT p.event_id,
       CASE WHEN p.k < 10 THEN s.mean_micros ELSE p.k * 1000000 END
         AS k_micros_filled,
       p.k < 10 AS was_imputed
FROM parsed p JOIN stats s ON p.event_type = s.event_type""",
    ref="extension: missing-value imputation by per-group mean.  The "
    "'missing' mask is deterministic (k < 10 stands in for NULL; the "
    "driver corpus has no real nulls) and the imputed mean is exact "
    "integer micros (sum*1e6 div count -- associative, replayable), "
    "joined back as a broadcast of the tiny per-type stats table",
)
def q_impute_props_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    stats = (
        parsed.filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.expr("sum(k) * 1000000 div count(*)").alias("mean_micros")
        )
    )
    return (
        parsed.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            F.when(F.col("k") < 10, F.col("mean_micros"))
            .otherwise(F.col("k") * 1000000)
            .alias("k_micros_filled"),
            (F.col("k") < 10).alias("was_imputed"),
        )
    )


@_register(
    "streaming_enrich_static",
    """
SELECT e.event_id, f.first_seen_us
FROM events e
JOIN (SELECT user_id, min(epoch_us(ts)) AS first_seen_us
      FROM events GROUP BY user_id) f USING (user_id)""",
    ref="extension: stream-static broadcast enrichment (stateless join of "
    "the event stream against a batch-computed profile dim; batch twin is "
    "the oracle): streaming/jobs.py streaming_enrich_static",
)
def q_streaming_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.streaming import streaming_enrich_static

    return streaming_enrich_static(spark, sf_dir)
