"""Third-wave coverage: training-data curation (repetition profiling,
PII redaction, decontamination, deterministic splits, corpus bigrams)
plus the remaining relational shapes (anti/semi joins, left-outer
profiles, corr/covar aggregates, ntile deciles, value histograms,
funnel analytics).

Registered into the shared REGISTRY (imported by plans/__init__).
Every query here carries a full DuckDB oracle; float outputs are
rounded to 4 digits on both sides, money sums use exact integer cents
(see functions.numeric), and the train/val/test draw is pure LCG
integer arithmetic so the identical assignment replays in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators import curation as C
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

#: SQL fragment: normalized text (mirror of operators.dedup.normalize_text)
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _norm_of(alias: str) -> str:
    return f"trim(regexp_replace(lower({alias}.text), '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# curation: repetition / redaction / decontamination / split / bigrams
# ---------------------------------------------------------------------------


@_register(
    "doc_repetition",
    f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS tok
  FROM documents WHERE {_NORM} <> ''
),
pt AS (SELECT doc_id, tok, count(*) AS n FROM tok GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       count(*) AS n_distinct,
       round(CAST(sum(n) - count(*) AS DOUBLE) / sum(n), 4) AS dup_ratio,
       round(CAST(max(n) AS DOUBLE) / sum(n), 4) AS top_tok_share
FROM pt GROUP BY doc_id""",
    ref="extension: within-doc repetition profile (Gopher-rule ratios)",
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")) != ""
    )
    return C.repetition_stats(docs)


@_register(
    "redact_pii",
    f"""
SELECT doc_id,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{C.EMAIL_RE}', '<EMAIL>', 'g'),
             '{C.LONG_DIGITS_RE}', '<NUM>', 'g'),
             '{C.PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5,
       CAST(len(regexp_extract_all(text, '{C.EMAIL_RE}'))
          + len(regexp_extract_all(
                regexp_replace(text, '{C.EMAIL_RE}', '<EMAIL>', 'g'),
                '{C.LONG_DIGITS_RE}'))
          + len(regexp_extract_all(
                regexp_replace(regexp_replace(text,
                    '{C.EMAIL_RE}', '<EMAIL>', 'g'),
                    '{C.LONG_DIGITS_RE}', '<NUM>', 'g'),
                '{C.PHONE_RE}')) AS INT) AS n_redactions
FROM documents""",
    ref="extension: PII redaction (regex masking; RE2-safe patterns)",
)
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = C.redact_pii(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", F.md5("redacted_text").alias("redacted_md5"), "n_redactions"
    )


@_register(
    "decontaminate_train",
    f"""
SELECT t.doc_id, t.source FROM documents t
WHERE t.source <> 'src0' AND NOT EXISTS (
  SELECT 1 FROM documents e
  WHERE e.source = 'src0' AND md5({_norm_of('e')}) = md5({_norm_of('t')}))""",
    ref="extension: eval-set decontamination (broadcast LEFT ANTI on fingerprints)",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    surviving = C.decontaminate(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
    )
    return surviving.select("doc_id", "source")


@_register(
    "split_counts",
    """
SELECT split, lang, count(*) AS n FROM (
  SELECT lang,
    CASE WHEN ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 % 10 < 8
         THEN 'train'
         WHEN ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 % 10 < 9
         THEN 'val' ELSE 'test' END AS split
  FROM documents
) GROUP BY 1, 2""",
    ref="extension: deterministic train/val/test split (LCG bucket of id)",
)
def q_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = C.assign_split(load_table(spark, sf_dir, "documents"))
    return out.groupBy("split", "lang").agg(F.count("*").alias("n"))


@_register(
    "bigram_top20",
    f"""
WITH bg AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM (SELECT string_split({_NORM}, ' ') AS w FROM documents)
  WHERE len(w) >= 2
)
SELECT bigram, count(*) AS n FROM bg GROUP BY 1
ORDER BY n DESC, bigram LIMIT 20""",
    ref="extension: corpus bigram top-k (posexplode + lead window + top-k)",
)
def q_bigram_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.bigram_topk(load_table(spark, sf_dir, "documents"), k=20)


# ---------------------------------------------------------------------------
# relational: anti / semi / left-outer / corr / ntile / histogram / funnel
# ---------------------------------------------------------------------------


@_register(
    "customers_no_orders",
    """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1""",
    ref="extension: LEFT ANTI join (TPC-H Q22 shape); absent from reference (SURVEY 2.4)",
)
def q_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@_register(
    "discount_suppliers_semi",
    """
SELECT n_name, count(*) AS n_suppliers
FROM supplier s JOIN nation ON n_nationkey = s_nationkey
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_discount > 0.09)
GROUP BY 1""",
    ref="extension: LEFT SEMI join (EXISTS shape); absent from reference (SURVEY 2.4)",
)
def q_discount_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    deep = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_discount") > 0.09
    ).select("l_suppkey")
    return (
        supp.join(deep, supp.s_suppkey == deep.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_suppliers"))
    )


@_register(
    "customer_order_profile",
    """
SELECT c_custkey, count(o_orderkey) AS n_orders,
       COALESCE(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     AS BIGINT), 0) AS spent_cents
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY 1""",
    ref="extension: LEFT OUTER join + null-safe aggregate; absent from reference (SURVEY 2.4)",
)
def q_customer_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("spent_cents"),
        )
    )


@_register(
    "corr_by_returnflag",
    """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
       round(stddev_samp(l_quantity), 4) AS std_qty,
       count(*) AS n
FROM lineitem GROUP BY 1""",
    ref="extension: correlation/covariance aggregates; reference has only sum/count (SURVEY 2.5)",
)
def q_corr_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qp"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.count("*").alias("n"),
    )


@_register(
    "acctbal_deciles",
    """
SELECT c_mktsegment, decile, count(*) AS n,
       min(c_acctbal) AS lo, max(c_acctbal) AS hi
FROM (SELECT c_mktsegment, c_acctbal,
             ntile(10) OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer)
GROUP BY 1, 2""",
    ref="extension: ntile decile bucketing (window rank family; SURVEY 2.6 R4)",
)
def q_acctbal_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Partitioned ntile: the window shuffles by segment and sorts within,
    # so parallelism is bounded by segment count.  For a global decile at
    # 100 TB the scale path is repartitionByRange + per-partition ranks
    # offset by a counted prefix sum (see operators/grouped.pack_chunks).
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        load_table(spark, sf_dir, "customer")
        .withColumn("decile", F.ntile(10).over(w))
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count("*").alias("n"),
            F.min("c_acctbal").alias("lo"),
            F.max("c_acctbal").alias("hi"),
        )
    )


@_register(
    "value_histogram",
    """
SELECT CAST(round(value * 100, 0) AS BIGINT) // 500 AS bin, count(*) AS n
FROM events GROUP BY 1""",
    ref="extension: fixed-width histogram in exact integer cents (width_bucket shape)",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.expr("CAST(round(value * 100, 0) AS BIGINT) DIV 500").alias("bin")
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# LSH ANN + streaming dedup / stream-stream join
# ---------------------------------------------------------------------------

# The whole LSH index is deterministic integer->double arithmetic, so
# the oracle rebuilds the identical hyperplanes (same LCG sequence as
# operators.sampling), recomputes every signature bit-for-bit
# (list_dot_product sums in index order, matching the engine's in-order
# aggregate fold), and replays bucket lookup + exact re-rank.
_LSH_TOPK_ORACLE = """
WITH idx AS (SELECT unnest(generate_series(0, 4 * 6 * 64 - 1)) AS i),
comp AS (
  SELECT i // 64 AS plane, i % 64 AS d,
         ((i % 2147483648) * 1103515245 + 12345) % 2147483648
           / 2147483648.0 * 2 - 1 AS val
  FROM idx
),
planes AS (SELECT plane, list(val ORDER BY d) AS pv FROM comp GROUP BY plane),
vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
bits AS (
  SELECT v.vec_id, p.plane // 6 AS tbl, p.plane % 6 AS bit,
         CASE WHEN list_dot_product(v.ev, p.pv) >= 0 THEN 1 ELSE 0 END AS b
  FROM vecs v CROSS JOIN planes p
),
sigs AS (
  SELECT vec_id, tbl, CAST(sum(b * (1 << bit)) AS BIGINT) AS sig
  FROM bits GROUP BY 1, 2
),
qsig AS (SELECT tbl, sig FROM sigs WHERE vec_id = 0),
cand AS (
  SELECT DISTINCT s.vec_id
  FROM sigs s JOIN qsig q ON s.tbl = q.tbl AND s.sig = q.sig
),
q AS (SELECT ev AS qv FROM vecs WHERE vec_id = 0),
sims AS (
  SELECT c.vec_id,
         list_dot_product(v.ev, qv)
         / (sqrt(list_dot_product(v.ev, v.ev)) * sqrt(list_dot_product(qv, qv)))
           AS sim_raw
  FROM cand c JOIN vecs v USING (vec_id), q
)
SELECT vec_id, round(sim_raw, 4) AS sim
FROM sims ORDER BY sim_raw DESC, vec_id LIMIT 10"""


@_register(
    "ann_lsh_topk",
    _LSH_TOPK_ORACLE,
    ref="extension: signed-random-projection LSH ANN (bucketed scale path beside IVF)",
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import ann_lsh_topk

    return ann_lsh_topk(load_table(spark, sf_dir, "embeddings"), query_id=0, k=10)


@_register(
    "streaming_dedup",
    """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1""",
    ref="extension: streaming dropDuplicates state (first event per user/type)",
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.streaming import streaming_dedup_counts

    return streaming_dedup_counts(spark, sf_dir)


@_register(
    "streaming_join_pairs",
    """
SELECT c.event_id AS click_id, p.event_id AS purchase_id
FROM events c JOIN events p
  ON c.event_type = 'click' AND p.event_type = 'purchase'
 AND c.user_id = p.user_id
 AND epoch_us(p.ts) >= epoch_us(c.ts)
 AND epoch_us(p.ts) <= epoch_us(c.ts) + 600000000""",
    ref="extension: watermarked stream-stream interval join (batch twin is the oracle)",
)
def q_streaming_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.streaming import streaming_click_purchase_pairs

    return streaming_click_purchase_pairs(spark, sf_dir)


@_register(
    "event_funnel",
    """
WITH peru AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c_us,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
  FROM events GROUP BY 1
)
SELECT count(CASE WHEN c_us IS NOT NULL THEN 1 END) AS click_users,
       count(CASE WHEN c_us IS NOT NULL AND p_us IS NOT NULL
                       AND p_us > c_us THEN 1 END) AS converted_users
FROM peru""",
    ref="extension: funnel conversion (two-stage min-aggregate; SURVEY 2.11 events surface)",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    peru = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "click", F.unix_micros("ts"))
        ).alias("c_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("p_us"),
    )
    return peru.agg(
        F.count(F.when(F.col("c_us").isNotNull(), 1)).alias("click_users"),
        F.count(
            F.when(
                F.col("c_us").isNotNull()
                & F.col("p_us").isNotNull()
                & (F.col("p_us") > F.col("c_us")),
                1,
            )
        ).alias("converted_users"),
    )


# ---------------------------------------------------------------------------
# PageRank over the document-similarity graph
# ---------------------------------------------------------------------------

# Integer-quantized PageRank (operators.graph.pagerank_quantized): ranks
# are bigint micro-probabilities and every division is integral, so the
# three unrolled iterations below reproduce the engine's result exactly
# -- no float summation order to disagree on.  The edge set is the
# n-gram Jaccard pair graph (same CTE as the dedup_ngram_jaccard
# oracle), symmetrized.
# Shared CTE: the symmetrized n-gram-Jaccard similarity graph (same
# pair predicate as the dedup_ngram_jaccard oracle), ending in
# ``edges(u, v)`` / ``deg(u, outdeg)`` -- imported by the PPR oracle in
# wave38 so both rank queries run on the identical edge set.
SIMGRAPH_EDGES_CTE = f"""
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
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.1
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b AS u, id_a AS v FROM pairs
),
deg AS (SELECT u, count(*) AS outdeg FROM edges GROUP BY 1)"""

_PAGERANK_ORACLE = SIMGRAPH_EDGES_CTE + """,
params AS (
  SELECT count(*) AS nn,
         1000000000000 // count(*) AS init,
         (1000000000000 * 15 // 100) // count(*) AS tele
  FROM deg
),
it0 AS (SELECT u AS node, (SELECT init FROM params) AS pr FROM deg),
it1 AS (
  SELECT e.v AS node,
         (SELECT tele FROM params) + (sum(p.pr // d.outdeg) * 85) // 100 AS pr
  FROM edges e JOIN it0 p ON p.node = e.u JOIN deg d ON d.u = e.u
  GROUP BY e.v
),
it2 AS (
  SELECT e.v AS node,
         (SELECT tele FROM params) + (sum(p.pr // d.outdeg) * 85) // 100 AS pr
  FROM edges e JOIN it1 p ON p.node = e.u JOIN deg d ON d.u = e.u
  GROUP BY e.v
),
it3 AS (
  SELECT e.v AS node,
         (SELECT tele FROM params) + (sum(p.pr // d.outdeg) * 85) // 100 AS pr
  FROM edges e JOIN it2 p ON p.node = e.u JOIN deg d ON d.u = e.u
  GROUP BY e.v
)
SELECT node, CAST(pr AS BIGINT) AS pr FROM it3"""


@_register(
    "pagerank_simgraph",
    _PAGERANK_ORACLE,
    ref="extension: iterative PageRank (integer-quantized) on the near-dup similarity graph",
)
def q_pagerank_simgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.graph import (
        pagerank_quantized,
        simgraph_pairs,
    )

    return pagerank_quantized(simgraph_pairs(spark, sf_dir), n_iter=3)


@_register(
    "embedding_quantize",
    """
SELECT vec_id,
       CAST(CASE WHEN ma = 0 THEN 0 ELSE
         list_sum(list_transform(ev, x -> CAST(floor(x * 127 / ma + 0.5) AS BIGINT)))
       END AS BIGINT) AS qsum,
       floor(ma / 127 * 10000 + 0.5) / 10000.0 AS scale
FROM (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev,
         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS ma
  FROM embeddings
)""",
    ref="extension: int8 embedding quantization (map-only storage compression)",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import quantize_embeddings

    out = quantize_embeddings(load_table(spark, sf_dir, "embeddings"))
    # checksum the quantized array (stable scalar) instead of comparing
    # array string formats across engines
    return out.select(
        "vec_id",
        F.aggregate(
            "qvec", F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ).alias("qsum"),
        "scale",
    )
