"""Round-3 coverage wave 91: uncertainty sampling, label-noise audit,
exact grouped quartiles.

- ``active_learning_margin``: margin-based uncertainty sampling -- the
  20 vectors whose top-2 label-centroid cosines are closest (smallest
  margin = the examples a labeling budget should buy first).  Exact
  fixed-point centroids (``label_centroid_affinity`` machinery) are
  broadcast; each vector computes k cosines in one pass (micro-
  quantized double, identical both engines), a dense_rank-free top-2
  via per-(vec) window, margin = cos1 - cos2 in exact micro units,
  then TakeOrdered 20 with vec_id tie-break.
- ``lang_label_conflicts``: label-noise audit -- normalized texts that
  appear under MORE THAN ONE ``lang`` label: duplicate content with
  inconsistent labels poisons any classifier trained on it (the
  labeling analogue of ``decontaminate_train``).  One fingerprint
  group-by; reports each conflicting fingerprint's doc count and
  distinct-label count.
- ``value_quartiles_by_type``: exact p25/p50/p75 of event value per
  event type from the bounded cents histogram -- the EXACT counterpart
  of ``qsketch_value_quantiles`` (sketched), the same exact-vs-sketch
  pairing as ks/psi drift.  Quartile = smallest cent value whose
  cumulative count reaches ceil(q*n) (type-7-free integer definition,
  identical both engines); cumulative windows run per type over the
  histogram, never the raw rows.

Scale: centroids are k x d literals against a map-only cosine pass;
conflicts are one fingerprint shuffle; quartiles reduce to the
bounded per-type histogram first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@_register(
    "active_learning_margin",
    """
WITH comp AS (
  SELECT e.vec_id, e.label, CAST(t.i AS INT) - 1 AS pos,
         CAST(floor(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE)
                    * 1000000) AS BIGINT) AS q
  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
), cent AS (
  SELECT label AS c_label, pos, CAST(sum(q) // count(*) AS BIGINT) AS c
  FROM comp GROUP BY 1, 2
), cosv AS (
  SELECT comp.vec_id, cent.c_label,
         CAST(floor(CAST(sum(CAST(comp.q AS HUGEINT) * cent.c) AS DOUBLE)
                    / sqrt(CAST(sum(CAST(comp.q AS HUGEINT) * comp.q)
                                AS DOUBLE)
                           * CAST(sum(CAST(cent.c AS HUGEINT) * cent.c)
                                  AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS cos_micro
  FROM comp JOIN cent ON comp.pos = cent.pos
  GROUP BY 1, 2
), ranked AS (
  SELECT vec_id, cos_micro,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos_micro DESC, c_label) AS r
  FROM cosv
), margin AS (
  SELECT vec_id,
         max(CASE WHEN r = 1 THEN cos_micro END)
           - max(CASE WHEN r = 2 THEN cos_micro END) AS margin_micro
  FROM ranked WHERE r <= 2 GROUP BY vec_id
)
SELECT vec_id, CAST(margin_micro AS BIGINT) AS margin_micro
FROM margin ORDER BY margin_micro, vec_id LIMIT 20""",
    ref="extension: margin-based uncertainty sampling -- smallest gap "
    "between the top-2 label-centroid cosines picks the 20 vectors a "
    "labeling budget should buy first; label_centroid_affinity "
    "machinery, TakeOrdered tail",
)
def q_active_learning_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        "label",
        "pos",
        F.expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)").alias(
            "q"
        ),
    )
    cent = comp.groupBy(F.col("label").alias("c_label"), "pos").agg(
        F.expr("CAST(sum(q) div count(*) AS BIGINT)").alias("c")
    )
    dec = lambda s: F.expr(s).cast("decimal(38,0)")  # noqa: E731
    cosv = (
        comp.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "c_label")
        .agg(
            F.sum(dec("q") * dec("c")).alias("dot"),
            F.sum(dec("q") * dec("q")).alias("nq"),
            F.sum(dec("c") * dec("c")).alias("nc"),
        )
        .select(
            "vec_id",
            "c_label",
            F.expr(
                "CAST(floor(CAST(dot AS DOUBLE)"
                " / sqrt(CAST(nq AS DOUBLE) * CAST(nc AS DOUBLE))"
                " * 1000000 + 0.5) AS BIGINT)"
            ).alias("cos_micro"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_micro"), F.col("c_label")
    )
    ranked = cosv.select(
        "vec_id", "cos_micro", F.row_number().over(w).alias("r")
    ).filter(F.col("r") <= 2)
    margin = ranked.groupBy("vec_id").agg(
        (
            F.max(F.when(F.col("r") == 1, F.col("cos_micro")))
            - F.max(F.when(F.col("r") == 2, F.col("cos_micro")))
        )
        .cast("bigint")
        .alias("margin_micro")
    )
    return margin.orderBy("margin_micro", "vec_id").limit(20)


@_register(
    "lang_label_conflicts",
    f"""
WITH fp AS (
  SELECT md5({_NORM}) AS fp, lang FROM documents
)
SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_labels
FROM fp GROUP BY fp HAVING count(DISTINCT lang) > 1""",
    ref="extension: label-noise audit -- identical normalized text "
    "under more than one lang label (fingerprint group-by); the "
    "labeling analogue of decontaminate_train",
)
def q_lang_label_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        F.md5(normalize_text("text")).alias("fp"), "lang"
    )
    return (
        fp.groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("lang").cast("bigint").alias("n_labels"),
        )
        .filter(F.col("n_labels") > 1)
    )


@_register(
    "value_quartiles_by_type",
    """
WITH h AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c,
         count(*) AS n
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, v_c,
         sum(n) OVER (PARTITION BY event_type ORDER BY v_c) AS cn,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM h
)
SELECT event_type,
       CAST(max(total) AS BIGINT) AS n_events,
       CAST(min(CASE WHEN cn * 4 >= total THEN v_c END) AS BIGINT)
         AS p25_c,
       CAST(min(CASE WHEN cn * 2 >= total THEN v_c END) AS BIGINT)
         AS p50_c,
       CAST(min(CASE WHEN cn * 4 >= total * 3 THEN v_c END) AS BIGINT)
         AS p75_c
FROM cum GROUP BY event_type""",
    ref="extension: exact per-type value quartiles from the bounded "
    "cents histogram (smallest value reaching the cumulative cut) -- "
    "the exact counterpart of qsketch_value_quantiles",
)
def q_value_quartiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select(
            "event_type",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
        )
        .groupBy("event_type", "v_c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    cum = h.select(
        "event_type",
        "v_c",
        F.sum("n").over(wc).alias("cn"),
        F.sum("n").over(wt).alias("total"),
    )
    return cum.groupBy("event_type").agg(
        F.max("total").cast("bigint").alias("n_events"),
        F.min(F.when(F.col("cn") * 4 >= F.col("total"), F.col("v_c")))
        .cast("bigint")
        .alias("p25_c"),
        F.min(F.when(F.col("cn") * 2 >= F.col("total"), F.col("v_c")))
        .cast("bigint")
        .alias("p50_c"),
        F.min(F.when(F.col("cn") * 4 >= F.col("total") * 3, F.col("v_c")))
        .cast("bigint")
        .alias("p75_c"),
    )
