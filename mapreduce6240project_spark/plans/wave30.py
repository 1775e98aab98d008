"""Round-3 coverage wave 30: multi-pass mining + weighted sampling.

- ``frequent_triples``: A-Priori second pass -- frequent part triples
  built from the candidate lattice: pairs are counted first, only
  baskets' items that survive in SOME frequent pair expand into
  triples (the classic candidate-pruning shape: counting work is
  bounded by the frequent-pair support, never by basket-cube volume).
  Support is RELATIVE -- ``max(3, n_orders div 50000)`` -- as in the
  textbook formulation, so the lattice keeps pruning as co-occurrence
  counts inflate with data volume.  Deterministic top-20.
- ``weighted_sample_orders_es``: Efraimidis-Spirakis weighted k-sample
  WITHOUT replacement -- each order draws key ``u^(1/w)``; the k
  largest keys are the sample.  Made deterministic and replayable by
  deriving ``u`` from the engine's 60-bit md5 hash (``(h+1)/2^60``),
  and compared in the equivalent log domain ``ln(u)/w`` (monotone, no
  pow), micro-floored only in the OUTPUT; the top-k itself orders on
  the exact double key with an id tie-break.  This is the production
  weighted sampler (one scan + TakeOrderedAndProject, no global sort),
  complementing the repo's split/temperature/mixture samplers.

Reference parity note: extends R-family sampling (SURVEY.md section
2.6) and the market-basket family (wave 22/28).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.hashing import hash60, hash60_sql
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

#: relative support: max(3, n_orders div 50000) -- fixed-absolute
#: support stops pruning once density grows (measured 28 s at the 10x
#: stress scale with support=3; relative support keeps "frequent" rare)
_TRIPLE_SUPPORT_MIN = 3
_TRIPLE_SUPPORT_DIV = 50000
_ES_K = 50
_TWO60 = float(1 << 60)


@_register(
    "frequent_triples",
    f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sup AS (
  SELECT greatest({_TRIPLE_SUPPORT_MIN},
                  count(DISTINCT l_orderkey) // {_TRIPLE_SUPPORT_DIV})
           AS tau
  FROM op
),
pair_counts AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
fp AS (SELECT pa, pb FROM pair_counts, sup WHERE n >= tau),
-- candidate triples: a frequent pair (pa, pb) extended by a third
-- item from the same basket, counted only when it lands above both
cand AS (
  SELECT fp.pa AS p1, fp.pb AS p2, c.l_partkey AS p3,
         a.l_orderkey AS ok
  FROM fp
  JOIN op a ON a.l_partkey = fp.pa
  JOIN op b ON b.l_orderkey = a.l_orderkey AND b.l_partkey = fp.pb
  JOIN op c ON c.l_orderkey = a.l_orderkey AND c.l_partkey > fp.pb
),
tri AS (
  SELECT p1, p2, p3, CAST(count(*) AS BIGINT) AS n_orders
  FROM cand GROUP BY 1, 2, 3
  HAVING count(*) >= (SELECT tau FROM sup)
)
SELECT p1, p2, p3, n_orders FROM tri
ORDER BY n_orders DESC, p1, p2, p3 LIMIT 20""",
    ref="extension: A-Priori frequent triples -- pair pass prunes the "
    "candidate lattice, triple counting bounded by frequent-pair "
    "support (never basket-cube volume); relative support keeps the "
    "lattice pruned at any density; deterministic top-20",
)
def q_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = op.alias("a")
    b = op.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("pb")
    ).alias("b")
    tau = op.agg(
        F.greatest(
            F.lit(_TRIPLE_SUPPORT_MIN),
            F.expr(f"count(DISTINCT l_orderkey) div {_TRIPLE_SUPPORT_DIV}"),
        ).alias("tau")
    )
    pair_counts = (
        a.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("pb"))
        .groupBy(F.col("l_partkey").alias("pa"), "pb")
        .agg(F.count("*").alias("n"))
    )
    fp = (
        pair_counts.crossJoin(F.broadcast(tau))
        .filter(F.col("n") >= F.col("tau"))
        .select("pa", "pb")
    )
    oa = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    ob = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    oc = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p3"))
    cand = (
        fp.join(oa, "pa")
        .join(ob, ["ok", "pb"])
        .join(oc, "ok")
        .filter(F.col("p3") > F.col("pb"))
    )
    tri = (
        cand.groupBy(
            F.col("pa").alias("p1"), F.col("pb").alias("p2"), "p3"
        )
        .agg(F.count("*").alias("n_orders"))
        .crossJoin(F.broadcast(tau))
        .filter(F.col("n_orders") >= F.col("tau"))
        .select("p1", "p2", "p3", "n_orders")
    )
    return tri.orderBy(
        F.col("n_orders").desc(), "p1", "p2", "p3"
    ).limit(20)


@_register(
    "weighted_sample_orders_es",
    f"""
WITH w AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w_c,
         ({hash60_sql("CAST(o_orderkey AS VARCHAR)")} + 1)
           / CAST({_TWO60!r} AS DOUBLE) AS u
  FROM orders WHERE o_totalprice > 0
),
keyed AS (
  SELECT o_orderkey, w_c, ln(u) / w_c AS logkey FROM w
)
SELECT o_orderkey, w_c,
       CAST(floor(logkey * 1000000000 + 0.5) AS BIGINT) AS logkey_nano
FROM keyed
ORDER BY logkey DESC, o_orderkey LIMIT {_ES_K}""",
    ref="extension: Efraimidis-Spirakis weighted k-sample without "
    "replacement (key u^(1/w), compared in the monotone log domain); "
    "u derived from the 60-bit md5 hash so the draw is deterministic "
    "and replayable; one scan + TakeOrderedAndProject",
)
def q_weighted_sample_orders_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    w_c = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    u = (hash60(F.col("o_orderkey").cast("string")) + 1) / F.lit(_TWO60)
    keyed = o.select(
        "o_orderkey",
        w_c.alias("w_c"),
        (F.log(u) / F.col("w_c")).alias("logkey"),
    )
    return (
        keyed.orderBy(F.col("logkey").desc(), "o_orderkey")
        .limit(_ES_K)
        .select(
            "o_orderkey",
            "w_c",
            F.floor(F.col("logkey") * 1000000000 + F.lit(0.5))
            .cast("bigint")
            .alias("logkey_nano"),
        )
    )
