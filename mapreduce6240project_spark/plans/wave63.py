"""Round-3 coverage wave 63: long-run behavior and mergeable integrity.

- ``markov_stationary_events``: the long-run event-type distribution --
  transition probabilities from consecutive per-user events in 6-decimal
  fixed point, then three unrolled power-iteration steps from the
  uniform start, all truncating integer arithmetic (the k x k matrix is
  event-type-bounded, so the iteration is a broadcast-sized join chain;
  same doctrine as the PageRank/PCA iterations).
- ``corpus_merkle_roots``: two-level mergeable content integrity -- a
  per-source 61-bit checksum (sum of 60-bit row hashes mod 2^61-1, the
  table_checksum convention) plus the corpus root, which equals the
  modular sum of the source sums: shard checksums roll up without
  rescanning, the property a distributed integrity check needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.hashing import hash60, hash60_sql
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_M61 = (1 << 61) - 1
_ITERS = 3

_TRANS_CTE = """
WITH o AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
t AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS dst
  FROM o
),
c AS (SELECT src, dst, count(*) AS n FROM t WHERE dst IS NOT NULL
      GROUP BY 1, 2),
cs AS (SELECT src, sum(n) AS ns FROM c GROUP BY 1),
p AS (
  SELECT c.src, c.dst, c.n * 1000000 // cs.ns AS p_micro
  FROM c JOIN cs ON c.src = cs.src
),
types AS (SELECT DISTINCT src AS ty FROM c),
nt AS (SELECT count(*) AS k FROM types),
v0 AS (SELECT ty, 1000000 // (SELECT k FROM nt) AS v FROM types)"""


def _stationary_sql() -> str:
    parts = [_TRANS_CTE]
    for r in range(1, _ITERS + 1):
        parts.append(
            f""",
v{r} AS (
  SELECT p.dst AS ty, CAST(sum(v.v * p.p_micro) // 1000000 AS BIGINT) AS v
  FROM p JOIN v{r - 1} v ON v.ty = p.src GROUP BY 1
)"""
        )
    parts.append(
        f"""
SELECT ty AS event_type, CAST(v AS BIGINT) AS stationary_micro
FROM v{_ITERS}"""
    )
    return "".join(parts)


@_register(
    "markov_stationary_events",
    _stationary_sql(),
    ref="extension: Markov stationary distribution of event types -- "
    "fixed-point transition matrix + 3 unrolled integer power steps; "
    "k x k broadcast-sized iteration",
)
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    t = ev.select(
        F.col("event_type").alias("src"),
        F.expr(
            "lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)"
        ).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = t.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    cs = c.groupBy("src").agg(F.sum("n").alias("ns"))
    p = (
        c.join(cs, "src")
        .select("src", "dst", F.expr("n * 1000000 div ns").alias("p_micro"))
        .persist()
    )
    types = c.select(F.col("src").alias("ty")).distinct()
    k = types.count()  # event-type-bounded driver scalar
    v = types.select("ty", F.lit(1_000_000 // k).alias("v"))
    for _ in range(_ITERS):
        v = (
            p.join(F.broadcast(v), p.src == v.ty)
            .groupBy(F.col("dst").alias("ty2"))
            .agg(F.expr("CAST(sum(v * p_micro) div 1000000 AS BIGINT)").alias("v"))
            .withColumnRenamed("ty2", "ty")
        )
    out = v.select(
        F.col("ty").alias("event_type"),
        F.col("v").cast("bigint").alias("stationary_micro"),
    )
    p.unpersist()
    return out


@_register(
    "corpus_merkle_roots",
    f"""
WITH h AS (
  SELECT source,
         {hash60_sql("doc_id || '|' || " + _NORM)} AS hv
  FROM documents
),
per AS (
  SELECT source, count(*) AS n, sum(hv) AS s FROM h GROUP BY 1
)
SELECT source AS scope, CAST(n AS BIGINT) AS n_docs,
       CAST(s % {_M61} AS BIGINT) AS checksum
FROM per
UNION ALL
SELECT '<root>' AS scope, CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(sum(s) % {_M61} AS BIGINT) AS checksum
FROM per""",
    ref="extension: two-level mergeable Merkle checksums -- per-source "
    "61-bit modular row-hash sums whose modular total IS the corpus "
    "root (shards roll up without rescanning)",
)
def q_merkle_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    hv = hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit("|"), normalize_text("text"))
    )
    per = docs.select("source", hv.alias("hv")).groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("hv").cast("decimal(38,0)")).alias("s"),
    )
    per_out = per.select(
        F.col("source").alias("scope"),
        F.col("n").cast("bigint").alias("n_docs"),
        F.expr(f"CAST(s % {_M61} AS BIGINT)").alias("checksum"),
    )
    root = per.agg(
        F.lit("<root>").alias("scope"),
        F.sum("n").cast("bigint").alias("n_docs"),
        F.expr(f"CAST(sum(s) % {_M61} AS BIGINT)").alias("checksum"),
    )
    return per_out.unionByName(root)
