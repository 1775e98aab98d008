"""Round-3 coverage wave 93: vocabulary growth, discount response,
class rebalancing.

- ``heaps_law_curve``: Heaps'-law vocabulary growth -- distinct token
  types vs cumulative token count at doc-order checkpoints (every 100
  docs).  Natural corpora grow types ~ tokens^beta with beta ~ 0.5-0.6;
  a flattening curve means the corpus has gone repetitive (the growth-
  over-time companion to ``zipf_slope_tokens``).  NO sequential scan:
  each type reduces to its FIRST doc (one min per token), each
  checkpoint's type count is "tokens whose first doc <= cutoff" and
  its token count is a prefix sum of per-doc lengths -- two bounded
  aggregations over the checkpoint grid.
- ``discount_qty_response``: quantity response by discount band -- the
  demand-elasticity proxy table (does a deeper discount move more
  units?): per integer discount percent, line count, exact mean
  quantity (milli units) and revenue.  Map-only banding (the discount
  domain is bounded), one shuffle.
- ``balanced_downsample_labels``: deterministic class rebalancing --
  every label downsampled to the minority class size by keeping the
  lowest-``hash60`` vec_ids (re-run stable, the property training
  splits need; the classification analogue of
  ``mixture_resample_docs``).  One rank per label over the hash, the
  cap broadcast from the tiny per-label count table.

Scale: Heaps reduces tokens to first-occurrence rows before any
cumulative step; banding is map-only; rebalancing is one label-
partitioned rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_STEP = 100


@_register(
    "heaps_law_curve",
    f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS t
  FROM documents WHERE {_NORM} <> ''
), first_doc AS (
  SELECT t, min(doc_id) AS fd FROM tok GROUP BY t
), doc_len AS (
  SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id
), cuts AS (
  -- greatest(max, step): one checkpoint even when max(doc_id) < step,
  -- matching Spark's guarded sequence (round-3 advice)
  SELECT unnest(generate_series({_STEP},
           (SELECT greatest(CAST(max(doc_id) AS BIGINT), {_STEP})
            FROM documents),
           {_STEP})) AS cutoff
)
SELECT CAST(c.cutoff AS BIGINT) AS cutoff_doc,
       COALESCE((SELECT CAST(sum(n_tok) AS BIGINT) FROM doc_len
                 WHERE doc_id <= c.cutoff), 0) AS n_tokens,
       COALESCE((SELECT CAST(count(*) AS BIGINT) FROM first_doc
                 WHERE fd <= c.cutoff), 0) AS n_types
FROM cuts c""",
    ref="extension: Heaps'-law vocabulary growth at doc checkpoints -- "
    "per-type first-doc reduction + prefix sums, no sequential scan; "
    "growth companion to zipf_slope_tokens",
)
def q_heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", normalize_text("text").alias("nm"))
        .filter(F.col("nm") != "")
        .select("doc_id", F.explode(F.split("nm", " ")).alias("t"))
    )
    first_doc = tok.groupBy("t").agg(F.min("doc_id").alias("fd"))
    doc_len = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    # greatest(mx, step) guards sequence() (which THROWS when stop <
    # start under a positive step) and pins one checkpoint on tiny /
    # offset doc_id spaces (round-3 advice)
    cuts = (
        docs.agg(F.max("doc_id").cast("bigint").alias("mx"))
        .select(
            F.explode(
                F.sequence(
                    F.lit(_STEP).cast("bigint"),
                    F.greatest(F.col("mx"), F.lit(_STEP).cast("bigint")),
                    F.lit(_STEP).cast("bigint"),
                )
            ).alias("cutoff")
        )
    )
    # both "counts below cutoff" reduce via a conditional-join-free
    # broadcast of the tiny checkpoint grid
    types_at = (
        first_doc.crossJoin(F.broadcast(cuts))
        .filter(F.col("fd") <= F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    )
    tokens_at = (
        doc_len.crossJoin(F.broadcast(cuts))
        .filter(F.col("doc_id") <= F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.sum("n_tok").cast("bigint").alias("n_tokens"))
    )
    # left-join the checkpoint grid so a cutoff with zero docs or zero
    # first-seen types below it still emits a row (coalesced to 0),
    # matching the oracle's correlated-subquery-per-cutoff shape
    return (
        cuts.join(tokens_at, "cutoff", "left")
        .join(types_at, "cutoff", "left")
        .select(
            F.col("cutoff").cast("bigint").alias("cutoff_doc"),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("n_types", F.lit(0)).cast("bigint").alias("n_types"),
        )
    )


@_register(
    "discount_qty_response",
    """
WITH b AS (
  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct,
         l_quantity,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
              AS BIGINT) AS rev_c
  FROM lineitem
)
SELECT disc_pct,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(floor(l_quantity * 1000 + 0.5) AS BIGINT))
            // count(*) AS BIGINT) AS avg_qty_milli,
       CAST(sum(rev_c) AS BIGINT) AS revenue_c
FROM b GROUP BY disc_pct""",
    ref="extension: quantity response by integer discount percent -- "
    "demand-elasticity proxy table; map-only banding over the bounded "
    "discount domain",
)
def q_discount_qty_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").alias(
            "disc_pct"
        ),
        F.expr("CAST(floor(l_quantity * 1000 + 0.5) AS BIGINT)").alias(
            "q_milli"
        ),
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
            " AS BIGINT)"
        ).alias("rev_c"),
    )
    return b.groupBy("disc_pct").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.expr("sum(q_milli) div count(*)")
        .cast("bigint")
        .alias("avg_qty_milli"),
        F.sum("rev_c").cast("bigint").alias("revenue_c"),
    )


@_register(
    "balanced_downsample_labels",
    """
WITH h AS (
  SELECT label,
         ('0x' || substr(md5('bal:' || CAST(vec_id AS VARCHAR)), 1, 15))
           ::BIGINT AS hv
  FROM embeddings
), ranked AS (
  SELECT label, row_number() OVER (PARTITION BY label ORDER BY hv) AS r,
         count(*) OVER (PARTITION BY label) AS n_before
  FROM h
), cap AS (
  SELECT min(n_before) AS n_min FROM (SELECT DISTINCT label, n_before
                                      FROM ranked)
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(max(n_before) AS BIGINT) AS n_before,
       CAST(count(*) AS BIGINT) AS n_after
FROM ranked, cap WHERE r <= cap.n_min
GROUP BY label""",
    ref="extension: deterministic downsample-to-minority class "
    "rebalance (lowest-hash60 keep per label) -- re-run-stable splits; "
    "classification analogue of mixture_resample_docs",
)
def q_balanced_downsample_labels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mapreduce6240project_spark.functions.hashing import hash60

    emb = load_table(spark, sf_dir, "embeddings")
    h = emb.select(
        "label",
        hash60(
            F.concat(F.lit("bal:"), F.col("vec_id").cast("string"))
        ).alias("hv"),
    )
    ranked = h.select(
        "label",
        F.row_number()
        .over(Window.partitionBy("label").orderBy("hv"))
        .alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("label")).alias(
            "n_before"
        ),
    )
    cap = (
        ranked.select("label", "n_before")
        .distinct()
        .agg(F.min("n_before").alias("n_min"))
    )
    return (
        ranked.crossJoin(F.broadcast(cap))
        .filter(F.col("r") <= F.col("n_min"))
        .groupBy("label")
        .agg(
            F.max("n_before").cast("bigint").alias("n_before"),
            F.count(F.lit(1)).cast("bigint").alias("n_after"),
        )
        .select(F.col("label").cast("bigint").alias("label"), "n_before",
                "n_after")
    )
