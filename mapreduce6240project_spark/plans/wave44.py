"""Round-3 coverage wave 44: RANGE-frame time windows and containment
(asymmetric overlap) joins.

- ``value_moving_avg_30m``: per-user trailing 30-minute moving average
  via a RANGE window frame over event-time micros -- the frame variant
  ROWS cannot express (peers at the same timestamp are all in-frame, so
  the result is tie-insensitive and deterministic).  Integer cents with
  truncating division replay exactly in SQL.
- ``containment_pairs``: excerpt-duplicate detection -- ordered doc
  pairs where >= 80% of the smaller document's shingles appear in the
  other (|A∩B| / |A|, the asymmetric containment coefficient).  Jaccard
  misses a short quote inside a long document (the union term swamps
  it); containment is the standard fix, and the permyriad threshold is
  exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_WIN_MICROS = 30 * 60 * 1_000_000


@_register(
    "value_moving_avg_30m",
    f"""
SELECT event_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
            // count(*) OVER w AS BIGINT) AS avg_cents
FROM (SELECT event_id, user_id, epoch_us(ts) AS tmic, value FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY tmic
             RANGE BETWEEN {_WIN_MICROS} PRECEDING AND CURRENT ROW)""",
    ref="extension: trailing 30-minute RANGE-frame moving average per "
    "user -- event-time peers share the frame (tie-insensitive); "
    "integer cents, truncating division",
)
def q_moving_avg_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("tmic"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return ev.select(
        "event_id",
        F.expr(
            f"sum(cents) OVER (PARTITION BY user_id ORDER BY tmic "
            f"RANGE BETWEEN {_WIN_MICROS} PRECEDING AND CURRENT ROW) div "
            f"count(*) OVER (PARTITION BY user_id ORDER BY tmic "
            f"RANGE BETWEEN {_WIN_MICROS} PRECEDING AND CURRENT ROW)"
        )
        .cast("bigint")
        .alias("avg_cents"),
    )


@_register(
    "containment_pairs",
    f"""
WITH sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(w) >= 3 THEN list_transform(
                    generate_series(1, len(w) - 2),
                    i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                  ELSE [concat_ws(' ', w)] END) AS s
    FROM (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents)
  )
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_sub, b.doc_id AS id_sup, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT id_sub, id_sup, CAST(n_inter AS BIGINT) AS n_inter,
       CAST(sz.n_sh AS BIGINT) AS n_sub,
       CAST(n_inter * 10000 // sz.n_sh AS BIGINT) AS cont_permyriad
FROM inter JOIN sizes sz ON sz.doc_id = id_sub
WHERE n_inter * 10000 // sz.n_sh >= 8000""",
    ref="extension: asymmetric containment join (|A∩B|/|A| >= 0.8, "
    "integer permyriad) -- catches excerpt/quote duplicates Jaccard's "
    "union term swamps; shared-shingle equi-join, never all-pairs",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one-sided prefix filtering (operators/dedup.py): identical output
    # to this oracle's naive shared-shingle spec, but candidate work is
    # capped at the rare end of the vocabulary -- the unfiltered join
    # measured 6.6x per 10x rows (SCALE.md wave-44 note)
    from mapreduce6240project_spark.operators.dedup import containment_prefix_pairs

    return containment_prefix_pairs(
        load_table(spark, sf_dir, "documents"), threshold_permyriad=8000
    )
