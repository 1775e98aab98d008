"""Round-3 coverage wave 53: cross-source quantile normalization.

``quantile_normalize_doclen``: batch-effect correction for corpus
mixing -- each document's token count is ranked WITHIN its source
(integer percent-rank in permyriad), then mapped onto the GLOBAL
distribution by looking the rank up in the mergeable log-bucket
quantile sketch.  After normalization every source contributes the
same length distribution, which is the point of quantile normalization
(sources with systematically shorter docs stop being under-weighted by
length-based curation rules).

Scale shape: the per-source rank is a source-partitioned window (hash-
balanced); the global distribution is the ~512-row quantile sketch --
never a global sort -- and the rank->value lookup is a banded join
against the BROADCAST cumulative bucket table.  Every step is integer
arithmetic (permyriad ranks, ceil-div targets, bucket midpoints), so
the whole mapping replays bit-for-bit in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.sketch import (
    QSKETCH_BID_SQL,
    QSKETCH_REP_SQL,
)
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _qnorm_sql() -> str:
    bid = QSKETCH_BID_SQL.format(m="m")
    rep = QSKETCH_REP_SQL.format(b="bid")
    return f"""
WITH scores AS (
  SELECT doc_id, source,
         CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS score
  FROM documents
),
ranked AS (
  SELECT doc_id, source, score,
         CAST((row_number() OVER (PARTITION BY source
                                  ORDER BY score, doc_id) - 1) * 10000
              // greatest(count(*) OVER (PARTITION BY source) - 1, 1)
              AS BIGINT) AS pr10k
  FROM scores
),
mm AS (SELECT score * 1000000 AS m FROM scores),
b AS (SELECT {bid} AS bid, count(*) AS n FROM mm GROUP BY 1),
c AS (
  SELECT bid, n, sum(n) OVER (ORDER BY bid) AS cum,
         coalesce(sum(n) OVER (ORDER BY bid ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS prev_cum,
         sum(n) OVER () AS total
  FROM b
)
SELECT r.doc_id, r.source, r.pr10k,
       CAST({rep} AS BIGINT) AS norm_micros
FROM ranked r JOIN c
  ON greatest((r.pr10k * c.total + 9999) // 10000, 1) > c.prev_cum
 AND greatest((r.pr10k * c.total + 9999) // 10000, 1) <= c.cum"""


@_register(
    "quantile_normalize_doclen",
    _qnorm_sql(),
    ref="extension: cross-source quantile normalization -- per-source "
    "integer percent-rank mapped through the ~512-row mergeable "
    "quantile sketch (broadcast banded join), no global sort",
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import normalize_text
    from mapreduce6240project_spark.operators.sketch import quantile_sketch

    docs = load_table(spark, sf_dir, "documents")
    scores = docs.select(
        "doc_id",
        "source",
        F.size(F.split(normalize_text("text"), " ")).cast("bigint").alias("score"),
    )
    ranked = scores.select(
        "doc_id",
        "source",
        F.expr(
            "CAST((row_number() OVER (PARTITION BY source ORDER BY score,"
            " doc_id) - 1) * 10000"
            " div greatest(count(*) OVER (PARTITION BY source) - 1, 1)"
            " AS BIGINT)"
        ).alias("pr10k"),
    )
    # quantile_sketch micro-quantizes internally (m = floor(v*1e6+0.5)),
    # exact for integer scores -- the oracle's mm = score * 1e6 twin
    sk = quantile_sketch(scores, "score")
    c = sk.select(
        "bid",
        "n",
        F.expr("sum(n) OVER (ORDER BY bid)").alias("cum"),
        F.expr(
            "coalesce(sum(n) OVER (ORDER BY bid ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND 1 PRECEDING), 0)"
        ).alias("prev_cum"),
        F.expr("sum(n) OVER ()").alias("total"),
    )
    target = "greatest((pr10k * total + 9999) div 10000, 1)"
    joined = ranked.join(
        F.broadcast(c),
        F.expr(f"{target} > prev_cum AND {target} <= cum"),
    )
    return joined.selectExpr(
        "doc_id",
        "source",
        "pr10k",
        f"CAST({QSKETCH_REP_SQL.format(b='bid')} AS BIGINT) AS norm_micros",
    )
