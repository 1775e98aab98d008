"""Round-3 coverage wave 25: percentile ranks, collocations, and the
left-outer streaming join.

- ``doc_size_pct_rank``: per-stratum percentile rank as an EXACT
  integer -- ``((rn-1)*1e6) div (n-1)`` micro-units from the shared
  range-exchange rank helper (operators.ranking), so the score is
  identical across engines and scales with no per-lang window funnel.
  The quantile-normalization primitive for curation pipelines.
- ``bigram_pmi_top20``: collocation mining -- pointwise mutual
  information of corpus bigrams (count >= 5), marginals from the
  unigram table.  One token explode feeds both count tables; the PMI
  expression is written identically in both engines (same IEEE op
  order) and micro-floored before the deterministic top-20.
- ``streaming_left_join``: watermarked stream-stream LEFT OUTER
  interval join -- the null-padded unmatched-click rows only exist
  once the watermark proves no match can arrive, which is exactly the
  semantics a batch engine gets for free and a streaming engine has to
  earn with state eviction.  Output restricted to settled clicks (2 h
  before max event time); the batch left join under the same cutoff is
  the value-hash oracle.

Reference parity note: extends SURVEY.md section 2.11 (streaming) with
outer-join state semantics and the text-analytics family with
collocation scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.ranking import stratum_order_stats
from mapreduce6240project_spark.plans.extensions import _NORM
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "doc_size_pct_rank",
    """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
           AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN n > 1 THEN ((rn - 1) * 1000000) // (n - 1)
            ELSE 0 END AS pct_micro
FROM ranked""",
    ref="extension: exact integer percentile rank per stratum "
    "(quantile-normalization primitive); rank via the shared "
    "range-exchange + pid-offsets helper, no per-lang window funnel",
)
def q_doc_size_pct_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    ranked = stratum_order_stats(
        docs, strata=["lang"], order=["n_chars", "doc_id"]
    )
    pct = F.when(
        F.col("n") > 1,
        F.expr("((rn - 1) * 1000000) div (n - 1)"),
    ).otherwise(F.lit(0).cast("bigint"))
    return ranked.select("doc_id", "lang", pct.alias("pct_micro"))


@_register(
    "bigram_pmi_top20",
    f"""
WITH toks AS (
  SELECT string_split({_NORM}, ' ') AS w FROM documents
),
uni AS (
  SELECT unnest(w) AS tok FROM toks
),
uni_counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok
),
n1 AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni_counts),
bg AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> struct_pack(a := w[i], b := w[i + 1])))
         AS p
  FROM toks WHERE len(w) >= 2
),
bg_counts AS (
  SELECT p.a AS wa, p.b AS wb, CAST(count(*) AS BIGINT) AS cab
  FROM bg GROUP BY 1, 2
),
n2 AS (SELECT CAST(sum(cab) AS BIGINT) AS t FROM bg_counts),
scored AS (
  SELECT wa, wb, cab,
         CAST(floor(ln((CAST(cab AS DOUBLE) * n1.t * n1.t)
                       / (CAST(n2.t AS DOUBLE) * ca.c * cb.c))
                    * 1000000 + 0.5) AS BIGINT) AS pmi_micro
  FROM bg_counts
  JOIN uni_counts ca ON bg_counts.wa = ca.tok
  JOIN uni_counts cb ON bg_counts.wb = cb.tok, n1, n2
  WHERE cab >= 5
)
SELECT wa, wb, cab, pmi_micro FROM scored
ORDER BY pmi_micro DESC, wa, wb LIMIT 20""",
    ref="extension: collocation mining via pointwise mutual information "
    "(bigram vs unigram marginals, identical IEEE expression order in "
    "both engines, micro-floored, deterministic top-20)",
)
def q_bigram_pmi_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        tokens("text").alias("w")
    )
    uni = docs.select(F.explode("w").alias("tok"))
    uni_counts = uni.groupBy("tok").agg(F.count("*").alias("c"))
    n1 = uni_counts.agg(F.sum("c").alias("t1"))
    pairs = docs.filter(F.size("w") >= 2).select(
        F.explode(
            F.expr(
                "transform(slice(w, 1, size(w) - 1),"
                " (x, i) -> struct(x AS a, element_at(w, i + 2) AS b))"
            )
        ).alias("p")
    )
    bg_counts = pairs.groupBy(
        F.col("p.a").alias("wa"), F.col("p.b").alias("wb")
    ).agg(F.count("*").alias("cab"))
    n2 = bg_counts.agg(F.sum("cab").alias("t2"))
    ca = uni_counts.select(F.col("tok").alias("wa"), F.col("c").alias("c_a"))
    cb = uni_counts.select(F.col("tok").alias("wb"), F.col("c").alias("c_b"))
    scored = (
        bg_counts.filter(F.col("cab") >= 5)
        .join(ca, "wa")
        .join(cb, "wb")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "wa",
            "wb",
            "cab",
            F.floor(
                F.log(
                    (F.col("cab").cast("double") * F.col("t1") * F.col("t1"))
                    / (F.col("t2").cast("double") * F.col("c_a") * F.col("c_b"))
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("pmi_micro"),
        )
    )
    return scored.orderBy(F.col("pmi_micro").desc(), "wa", "wb").limit(20)


@_register(
    "streaming_left_join",
    """
WITH clicks AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
),
cutoff AS (
  SELECT min(m) - 7200000000 AS cut
  FROM (SELECT max(epoch_us(ts)) AS m FROM events
        WHERE event_type IN ('click', 'purchase') GROUP BY event_type)
)
SELECT c.click_id,
       CAST(coalesce(p.purchase_id, -1) AS BIGINT) AS purchase_id
FROM clicks c
LEFT JOIN purchases p
  ON c.user_id = p.user_id
 AND p.p_us >= c.c_us AND p.p_us <= c.c_us + 600000000, cutoff
WHERE c.c_us <= cutoff.cut""",
    ref="extension: watermarked stream-stream LEFT OUTER interval join "
    "(null-padded rows emitted on state eviction); batch left join "
    "under the settled-clicks cutoff is the value-hash oracle",
)
def q_streaming_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.streaming import (
        streaming_click_purchase_left,
    )

    return streaming_click_purchase_left(spark, sf_dir)
