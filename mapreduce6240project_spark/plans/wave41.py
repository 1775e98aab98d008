"""Round-3 coverage wave 41: decayed trending and an embedding-label
separability audit.

- ``trending_event_types``: exponentially time-decayed counts per event
  type (decay 0.9/day) -- the "trending now" ranking.  The decay curve
  is a 64-row table of Python-precomputed integer literals embedded in
  BOTH the Spark plan and the SQL oracle, so neither engine calls
  pow()/exp() and libm last-ulp differences cannot flip a value.
- ``label_scatter_ratio``: Fisher-style between/within scatter over the
  labeled embeddings in exact milli-quantized integer arithmetic -- the
  audit that says whether the label column separates in embedding space
  before it is trusted for stratified sampling or contrastive mining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce6240project_spark.operators.analytics import (
    DECAY_MICRO,
    trending_scores,
)
from mapreduce6240project_spark.operators.vectors import label_scatter_ratio
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_AGES = ", ".join(str(a) for a in range(len(DECAY_MICRO)))
_DECAYS = ", ".join(str(d) for d in DECAY_MICRO)


@_register(
    "trending_event_types",
    f"""
WITH by_day AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
mx AS (SELECT max(day) AS maxd FROM by_day),
decay AS (SELECT unnest([{_AGES}]) AS age, unnest([{_DECAYS}]) AS decay_micro)
SELECT b.event_type, CAST(sum(b.n * d.decay_micro) AS BIGINT) AS score_micro
FROM by_day b, mx
JOIN decay d ON d.age = least(mx.maxd - b.day, {len(DECAY_MICRO) - 1})
GROUP BY 1
ORDER BY score_micro DESC, event_type""",
    ref="extension: exponentially decayed trending scores -- (type, day) "
    "counts joined to a 64-row literal integer decay table; no libm on "
    "either engine",
)
def q_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trending_scores(load_table(spark, sf_dir, "events"))


@_register(
    "label_scatter_ratio",
    """
WITH q AS (
  SELECT e.label AS lbl, CAST(t.i AS INT) - 1 AS d,
         CAST(floor(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE) * 1000
                    + 0.5) AS BIGINT) AS qx
  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
),
ls AS (SELECT lbl, d, sum(qx) AS s, count(*) AS n FROM q GROUP BY 1, 2),
lm AS (SELECT lbl, d, s // n AS mu_l, n FROM ls),
gm AS (SELECT d, sum(s) // sum(n) AS mu_g FROM ls GROUP BY 1),
w AS (
  SELECT CAST(sum((q.qx - lm.mu_l) * (q.qx - lm.mu_l)) AS BIGINT) AS within
  FROM q JOIN lm ON q.lbl = lm.lbl AND q.d = lm.d
),
b AS (
  SELECT CAST(sum(lm.n * (lm.mu_l - gm.mu_g) * (lm.mu_l - gm.mu_g)) AS BIGINT)
           AS between
  FROM lm JOIN gm ON lm.d = gm.d
),
nl AS (SELECT CAST(count(DISTINCT label) AS BIGINT) AS n_labels FROM embeddings)
SELECT nl.n_labels, b.between, w.within,
       CAST(b.between // greatest(w.within // 1000000, 1) AS BIGINT) AS ratio_micro
FROM nl, b, w""",
    ref="extension: Fisher between/within scatter of labeled embeddings "
    "in exact milli-quantized integer arithmetic -- (label x dim) mean "
    "table, two explode passes, d-bounded aggregates",
)
def q_label_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_scatter_ratio(load_table(spark, sf_dir, "embeddings"))
