"""training-data curation: splits, sampling, privacy, example preparation, label QA.

Consolidated from the round-3 coverage waves (round-4 verdict item
7: thematic domain modules instead of flat wave numbering).  Each
section below is the original wave body verbatim; registry names,
oracles and semantics are unchanged (guarded by the registry
snapshot test and the full sf0.01 mirror).

* wave 2: Third-wave coverage: training-data curation (repetition profiling,
* wave 21: Round-3 coverage wave 21: ML feature-engineering primitives.
* wave 24: Round-3 coverage wave 24: curation splits + time-series statistics.
* wave 30: Round-3 coverage wave 30: multi-pass mining + weighted sampling.
* wave 46: Round-3 coverage wave 46: ML-pipeline split/QA utilities.
* wave 55: Round-3 coverage wave 55: privacy engineering.
* wave 85: Round-3 coverage wave 85: group-aware folds, event-time disorder
* wave 91: Round-3 coverage wave 91: uncertainty sampling, label-noise audit,
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from mapreduce6240project_spark.operators import curation as C
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from mapreduce6240project_spark.plans.extensions import _NORM
from mapreduce6240project_spark.operators.ranking import stratum_order_stats
from mapreduce6240project_spark.functions.hashing import hash60, hash60_sql

# =========================================================================
# wave 2
# Third-wave coverage: training-data curation (repetition profiling,
# PII redaction, decontamination, deterministic splits, corpus bigrams)
# plus the remaining relational shapes (anti/semi joins, left-outer
# profiles, corr/covar aggregates, ntile deciles, value histograms,
# funnel analytics).
#
# Registered into the shared REGISTRY (imported by plans/__init__).
# Every query here carries a full DuckDB oracle; float outputs are
# rounded to 4 digits on both sides, money sums use exact integer cents
# (see functions.numeric), and the train/val/test draw is pure LCG
# integer arithmetic so the identical assignment replays in ANSI SQL.
# =========================================================================

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
vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
         WHERE embedding IS NOT NULL
           AND len(list_filter(embedding, x -> x IS NULL)) = 0),
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
FROM sims WHERE sim_raw IS NOT NULL
ORDER BY sim_raw DESC, vec_id LIMIT 10"""


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
       CAST(CASE
         -- a NULL element makes the checksum undefined: DuckDB's
         -- list_sum would SKIP the null while Spark's fold propagates
         -- it, so the NULL must be explicit for cross-engine parity
         WHEN ev IS NULL OR len(list_filter(ev, x -> x IS NULL)) > 0
           THEN NULL
         WHEN ma = 0 THEN 0 ELSE
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


# =========================================================================
# wave 21
# Round-3 coverage wave 21: ML feature-engineering primitives.
#
# - ``feature_hashing``: the hashing trick -- tokens map straight to a
#   fixed 2^k-bucket sparse vector with no vocabulary pass, the
#   featurizer of choice when the vocab is unbounded (URLs, user agents,
#   n-grams).  Buckets come from the engine's SQL-replayable md5 hash
#   family, and each document's sparse vector is summarized as an
#   integer checksum (sum of bucket*count) plus nnz, so the oracle
#   hash-checks the whole vector without comparing array formats.
# - ``target_encode_loo``: leave-one-out target (mean) encoding of a
#   categorical column -- each event's category is replaced by the mean
#   target of OTHER events in the category, the standard
#   leakage-avoiding encoder for supervised training.  One aggregate
#   per category broadcast back; LOO is computed row-side as
#   ``(sum - own) / (n - 1)`` from exact integer micros, so no
#   second pass and no float drift.
#
# Reference parity note: feature engineering is an LLM/ML-pipeline
# extension alongside SURVEY.md section 2.
# =========================================================================

HASH_BITS = 10  # 1024 feature buckets
_HASH_MOD = 1 << HASH_BITS


@_register(
    "feature_hashing",
    f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS token FROM documents
),
bucketed AS (
  SELECT doc_id,
         ('0x' || substr(md5(token), 1, 15))::BIGINT % {_HASH_MOD} AS bucket
  FROM tok
),
vec AS (
  SELECT doc_id, bucket, count(*) AS n FROM bucketed GROUP BY doc_id, bucket
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS nnz,
       CAST(sum(bucket * n) AS BIGINT) AS vec_checksum
FROM vec GROUP BY doc_id""",
    ref="extension: hashing-trick featurization (md5 -> 2^k buckets, no "
    "vocabulary pass); sparse vector verified via integer checksum",
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("bigint")
        % _HASH_MOD
    )
    vec = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n"))
    )
    return vec.groupBy("doc_id").agg(
        F.count("*").alias("nnz"),
        F.sum(F.col("bucket") * F.col("n")).alias("vec_checksum"),
    )


@_register(
    "target_encode_loo",
    """
WITH ev AS (
  SELECT event_id, event_type,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vmic
  FROM events
),
stats AS (
  SELECT event_type, count(*) AS n, sum(vmic) AS s
  FROM ev GROUP BY event_type
)
SELECT e.event_id,
       CASE WHEN st.n > 1
            THEN floor((st.s - e.vmic) / 1000000.0 / (st.n - 1) * 10000 + 0.5)
                 / 10000.0
       END AS loo_mean_value
FROM ev e JOIN stats st USING (event_type)""",
    ref="extension: leave-one-out target encoding ((sum - own)/(n - 1) "
    "from exact integer micros; category stats broadcast back, no "
    "leakage of the row's own target)",
)
def q_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint").alias("vmic"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("vmic").alias("s")
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        # floor(x*1e4 + 0.5) is identical IEEE arithmetic in both
        # engines; engine round() implementations differ at
        # representation boundaries (same convention as quality_score)
        F.when(
            F.col("n") > 1,
            F.floor(
                (F.col("s") - F.col("vmic")) / 1000000.0 / (F.col("n") - 1) * 10000
                + F.lit(0.5)
            )
            / 10000.0,
        ).alias("loo_mean_value"),
    )


# =========================================================================
# wave 24
# Round-3 coverage wave 24: curation splits + time-series statistics.
#
# - ``exact_split_strata``: exact-proportion stratified train/val/test
#   split -- per language stratum, rows are ordered by md5(doc_id) (a
#   deterministic pseudo-random order both engines replay) and cut at
#   exact 80/10/10 integer thresholds (``rn*10 <= n*8`` etc., no float
#   proportions).  Unlike the hash splits (``split_counts``), this
#   guarantees the exact per-stratum counts a curriculum requires.
# - ``nucleus_docs_90``: top-p (nucleus) selection per language -- the
#   smallest prefix of documents (by size desc, id-tiebroken) covering
#   90% of the stratum's total character mass, the mass-coverage
#   counterpart of percentile cuts.  All-integer: cumulative sums and
#   the 10*cum >= 9*total threshold never touch a float.
# - ``cusum_max_deviation``: CUSUM change-point score per event type
#   over the daily value series.  The classic drift statistic
#   ``max_t |sum_{i<=t}(x_i - mean)|`` is computed EXACTLY by scaling
#   with the day count: ``sum(D*x_i - T)`` over integer micros (D days,
#   T total), so no mean division ever happens.  One (type, day)
#   aggregate, one ordered window per type.
# - ``acf1_daily_value``: lag-1 autocorrelation of the daily value
#   series per event type -- Pearson over (x_t, x_{t-1}) pairs from the
#   five integer power sums, products widened to DECIMAL(38)/HUGEINT --
#   exact out to 38-digit magnitudes (far past realistic cent-scale
#   series) before one final double ratio.
#
# Reference parity note: extends the windows/order-statistics families
# (SURVEY.md sections 2.6, 2.11) with exact split/selection curation ops
# and drift statistics for monitoring pipelines.
# =========================================================================

@_register(
    "exact_split_strata",
    """
WITH ranked AS (
  SELECT lang,
         row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
),
tagged AS (
  SELECT lang,
         CASE WHEN rn * 10 <= n * 8 THEN 'train'
              WHEN rn * 10 <= n * 9 THEN 'val'
              ELSE 'test' END AS split
  FROM ranked
)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs
FROM tagged GROUP BY lang, split""",
    ref="extension: exact-proportion stratified split (md5 order + "
    "integer 80/10/10 thresholds per stratum; guarantees exact counts, "
    "unlike hash splits)",
)
def q_exact_split_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-stratum rank WITHOUT a per-lang window partition (a handful
    # of langs over 100 TB = one executor per stratum): the shared
    # range-exchange + pid-offsets helper (operators.ranking).
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    ranked = stratum_order_stats(
        docs, strata=["lang"], order=["h", "doc_id"]
    ).select("lang", "rn", "n")
    split = (
        F.when(F.col("rn") * 10 <= F.col("n") * 8, "train")
        .when(F.col("rn") * 10 <= F.col("n") * 9, "val")
        .otherwise("test")
    )
    return ranked.select("lang", split.alias("split")).groupBy(
        "lang", "split"
    ).agg(F.count("*").alias("n_docs"))


@_register(
    "nucleus_docs_90",
    """
WITH cum AS (
  SELECT lang, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         sum(n_chars) OVER (PARTITION BY lang) AS tw
  FROM documents
),
sel AS (
  SELECT lang, n_chars,
         CASE WHEN (cw - n_chars) * 10 < tw * 9 THEN 1 ELSE 0 END AS keep
  FROM cum
)
SELECT lang,
       CAST(sum(keep) AS BIGINT) AS n_selected,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_selected
FROM sel GROUP BY lang""",
    ref="extension: top-p (nucleus) mass-coverage selection per stratum "
    "-- smallest size-desc prefix covering 90% of character mass; "
    "all-integer cumulative threshold, deterministic tie-break",
)
def q_nucleus_docs_90(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same stratum-scalable shape as exact_split_strata: the per-lang
    # size-desc cumulative sum via the shared range-exchange helper.
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        "n_chars",
        (-F.col("n_chars")).alias("neg_chars"),
    )
    cum = stratum_order_stats(
        docs,
        strata=["lang"],
        order=["neg_chars", "doc_id"],
        weight="n_chars",
    ).select("lang", "n_chars", "cw", "tw")
    # a doc is kept iff the mass BEFORE it is still under the 90% bar
    # (the prefix is minimal: the first doc crossing the bar is kept,
    # everything after is not)
    keep = F.when(
        (F.col("cw") - F.col("n_chars")) * 10 < F.col("tw") * 9, 1
    ).otherwise(0)
    return cum.select("lang", "n_chars", keep.alias("keep")).groupBy(
        "lang"
    ).agg(
        F.sum("keep").alias("n_selected"),
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("keep") == 1, F.col("n_chars")).otherwise(0)).alias(
            "chars_selected"
        ),
    )


@_register(
    "cusum_max_deviation",
    """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_no,
         CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS x
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS d,
         CAST(sum(x) AS BIGINT) AS t
  FROM daily GROUP BY event_type
),
cusum AS (
  SELECT daily.event_type, day_no,
         sum(d * x - t) OVER (PARTITION BY daily.event_type ORDER BY day_no
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS c
  FROM daily JOIN stats ON daily.event_type = stats.event_type
)
SELECT event_type,
       CAST(max(abs(c)) AS BIGINT) AS max_abs_cusum_scaled,
       CAST(min(CASE WHEN rnk = 1 THEN day_no END) AS BIGINT) AS peak_day
FROM (
  SELECT event_type, day_no, c,
         rank() OVER (PARTITION BY event_type ORDER BY abs(c) DESC, day_no)
           AS rnk
  FROM cusum
) GROUP BY event_type""",
    ref="extension: CUSUM change-point statistic per series -- "
    "max_t |sum(x_i - mean)| computed EXACTLY as sum(D*x_i - T) in "
    "scaled integer micros (no mean division); one daily aggregate + "
    "one ordered window per series",
)
def q_cusum_max_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_no"),
    ).agg(
        F.sum(
            F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
        ).alias("x")
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("d"), F.sum("x").alias("t")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day_no",
        F.sum(F.col("d") * F.col("x") - F.col("t")).over(w_cum).alias("c"),
    )
    ranked = cusum.select(
        "event_type",
        "day_no",
        "c",
        F.rank()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.abs(F.col("c")).desc(), "day_no"
            )
        )
        .alias("rnk"),
    )
    return ranked.groupBy("event_type").agg(
        F.max(F.abs(F.col("c"))).alias("max_abs_cusum_scaled"),
        F.min(F.when(F.col("rnk") == 1, F.col("day_no"))).alias("peak_day"),
    )


@_register(
    "acf1_daily_value",
    """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_no,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, x,
         lag(x) OVER (PARTITION BY event_type ORDER BY day_no) AS xp
  FROM daily
),
sums AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(xp) AS HUGEINT) AS sy,
         sum(CAST(x AS HUGEINT) * xp) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(xp AS HUGEINT) * xp) AS syy
  FROM lagged WHERE xp IS NOT NULL GROUP BY event_type
)
SELECT event_type,
       floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) * 10000 + 0.5)
         / 10000.0 AS acf1,
       n AS n_pairs
FROM sums""",
    ref="extension: lag-1 autocorrelation per series -- Pearson over "
    "(x_t, x_{t-1}) from five integer power sums widened to "
    "DECIMAL(38)/HUGEINT (exact to 38-digit magnitudes), one final "
    "double ratio",
)
def q_acf1_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_no"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias(
            "x"
        )
    )
    lagged = daily.select(
        "event_type",
        "x",
        F.lag("x").over(
            Window.partitionBy("event_type").orderBy("day_no")
        ).alias("xp"),
    ).filter(F.col("xp").isNotNull())
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = lagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("xp")).alias("sy"),
        F.sum(dec("x") * dec("xp")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("xp") * dec("xp")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return sums.select(
        "event_type",
        (F.floor(num / den * 10000 + F.lit(0.5)) / 10000.0).alias("acf1"),
        F.col("n").alias("n_pairs"),
    )


# =========================================================================
# wave 30
# Round-3 coverage wave 30: multi-pass mining + weighted sampling.
#
# - ``frequent_triples``: A-Priori second pass -- frequent part triples
#   built from the candidate lattice: pairs are counted first, only
#   baskets' items that survive in SOME frequent pair expand into
#   triples (the classic candidate-pruning shape: counting work is
#   bounded by the frequent-pair support, never by basket-cube volume).
#   Support is RELATIVE -- ``max(3, n_orders div 50000)`` -- as in the
#   textbook formulation, so the lattice keeps pruning as co-occurrence
#   counts inflate with data volume.  Deterministic top-20.
# - ``weighted_sample_orders_es``: Efraimidis-Spirakis weighted k-sample
#   WITHOUT replacement -- each order draws key ``u^(1/w)``; the k
#   largest keys are the sample.  Made deterministic and replayable by
#   deriving ``u`` from the engine's 60-bit md5 hash (``(h+1)/2^60``),
#   and compared in the equivalent log domain ``ln(u)/w`` (monotone, no
#   pow), micro-floored only in the OUTPUT; the top-k itself orders on
#   the exact double key with an id tie-break.  This is the production
#   weighted sampler (one scan + TakeOrderedAndProject, no global sort),
#   complementing the repo's split/temperature/mixture samplers.
#
# Reference parity note: extends R-family sampling (SURVEY.md section
# 2.6) and the market-basket family (wave 22/28).
# =========================================================================

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


# =========================================================================
# wave 46
# Round-3 coverage wave 46: ML-pipeline split/QA utilities.
#
# - ``kfold5_assign``: stratified 5-fold cross-validation assignment --
#   rank within each (mktsegment) stratum by a deterministic LCG draw,
#   fold = rank % 5, reported as per-(stratum, fold) counts.  The
#   counts prove near-perfect balance (the property k-fold exists for)
#   while keeping the result stratum-bounded.
# - ``lang_confusion_matrix``: the marker-based language identifier's
#   full confusion matrix against the labeled ``lang`` column -- the
#   diagnostic behind the single-number ``lang_id_accuracy``; per
#   (true_lang, pred_lang) counts.
# - ``events_throttle_1h``: time-scoped dedup / rate limiting -- keep an
#   event only if the same (user, type) has not fired within the
#   preceding hour (lag window per key).  The feed-semantics dedup where
#   suppression EXPIRES, unlike fingerprint dedup; note the kept set is
#   defined against the raw stream (a kept-only cascade would need an
#   iterative pass), the standard throttling-audit semantics.
# =========================================================================

_LCG = "((c_custkey % 2147483648) * 1103515245 + 12345) % 2147483648"


@_register(
    "kfold5_assign",
    f"""
WITH ranked AS (
  SELECT c_mktsegment,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY {_LCG}, c_custkey) AS rk
  FROM customer
)
SELECT c_mktsegment, CAST((rk - 1) % 5 AS BIGINT) AS fold,
       CAST(count(*) AS BIGINT) AS n
FROM ranked GROUP BY 1, 2""",
    ref="extension: stratified 5-fold CV assignment -- LCG-ranked "
    "round-robin within each stratum; per-(stratum, fold) counts prove "
    "balance",
)
def q_kfold5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    ranked = cust.select(
        "c_mktsegment",
        F.expr(
            f"row_number() OVER (PARTITION BY c_mktsegment ORDER BY {_LCG},"
            " c_custkey)"
        ).alias("rk"),
    )
    return (
        ranked.select(
            "c_mktsegment", F.expr("(rk - 1) % 5").cast("bigint").alias("fold")
        )
        .groupBy("c_mktsegment", "fold")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _confusion_sql() -> str:
    # Reuses the exact scoring/argmax SQL the verified lang_id oracle
    # runs, so the matrix can never drift from the classifier.
    from mapreduce6240project_spark.plans.extensions import _marker_hits_sql

    return f"""
WITH scored AS (
  SELECT lang AS true_lang,
    CASE WHEN greatest(s_en, s_es, s_fr, s_de) <= 0 THEN 'unknown'
         WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
         WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
         WHEN s_fr >= s_de THEN 'fr'
         ELSE 'de' END AS pred_lang
  FROM (
    SELECT lang,
      {_marker_hits_sql(("the", "and", "of", "to", "is"))} AS s_en,
      {_marker_hits_sql(("el", "la", "los", "que", "es"))} AS s_es,
      {_marker_hits_sql(("le", "la", "les", "et", "est"))} AS s_fr,
      {_marker_hits_sql(("der", "die", "das", "und", "ist"))} AS s_de
    FROM documents
  )
)
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
FROM scored GROUP BY 1, 2"""


@_register(
    "lang_confusion_matrix",
    _confusion_sql(),
    ref="extension: language-ID confusion matrix (marker-hit argmax vs "
    "labeled lang) -- the per-pair diagnostic behind lang_id_accuracy; "
    "oracle reuses the verified lang_id scoring SQL verbatim",
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.textstats import lang_id

    docs = load_table(spark, sf_dir, "documents")
    pred = lang_id(docs)  # (doc_id, pred_lang)
    truth = docs.select("doc_id", F.col("lang").alias("true_lang"))
    return (
        truth.join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "events_throttle_1h",
    """
WITH g AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS prev_us
  FROM events WHERE ts IS NOT NULL
)
SELECT user_id, event_type,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 3600000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM g GROUP BY 1, 2""",
    ref="extension: time-scoped dedup / rate limiting (suppress repeats "
    "of (user, type) within 1 h via a lag window); suppression expires, "
    "unlike fingerprint dedup",
)
def q_events_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts events cannot be throttled: no arrival order (dirty-events
    # contract; Spark sorted the NULL first, DuckDB last, flipping which
    # occurrence was "kept")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
        )
    )
    g = ev.select(
        "user_id",
        "event_type",
        "us",
        F.expr(
            "lag(us) OVER (PARTITION BY user_id, event_type"
            " ORDER BY us, event_id)"
        ).alias("prev_us"),
    )
    return g.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(
            F.when(
                F.col("prev_us").isNull()
                | (F.col("us") - F.col("prev_us") > 3_600_000_000),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_kept"),
    )


# =========================================================================
# wave 55
# Round-3 coverage wave 55: privacy engineering.
#
# - ``k_anonymity_audit``: k-anonymity / l-diversity profiling of the
#   quasi-identifier pair (nation, market segment) -- per group: size,
#   distinct sensitive values (account-balance band), and whether the
#   group passes k=5.  The re-identification-risk query run before any
#   customer-grain data release.
# - ``randomized_response_segments``: local differential privacy by
#   randomized response -- each customer reports their true segment with
#   p = 3/4, otherwise a hash-drawn uniform segment; the query returns
#   true counts (for calibration), the noisy reported counts, and the
#   debiased estimate est = (20*reported - n) / 15 in sign-split
#   truncating milli units.  The whole mechanism is hash60-driven, so
#   both engines draw the identical noise and the estimator replays
#   exactly.
# =========================================================================

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@_register(
    "k_anonymity_audit",
    """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
            AS BIGINT) AS l_diversity,
       CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS k5_ok
FROM customer
GROUP BY 1, 2""",
    ref="extension: k-anonymity / l-diversity audit over the "
    "(nation, segment) quasi-identifier -- group sizes + distinct "
    "sensitive bands + k=5 flag",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(
            F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)")
        ).alias("l_diversity"),
        F.when(F.count(F.lit(1)) >= 5, 1).otherwise(0).alias("k5_ok"),
    )


def _rr_sql() -> str:
    segs = ", ".join(f"'{s}'" for s in _SEGMENTS)
    u = f"{hash60_sql('CAST(c_custkey AS VARCHAR)')} % 100"
    draw = hash60_sql("'x:' || CAST(c_custkey AS VARCHAR)") + " % 5"
    return f"""
WITH rr AS (
  SELECT c_mktsegment AS true_seg,
         CASE WHEN {u} < 75 THEN c_mktsegment
              ELSE ([{segs}])[CAST({draw} AS INT) + 1] END AS rep_seg
  FROM customer
),
t AS (SELECT true_seg AS seg, count(*) AS n_true FROM rr GROUP BY 1),
r AS (SELECT rep_seg AS seg, count(*) AS n_reported FROM rr GROUP BY 1),
n AS (SELECT count(*) AS n FROM rr)
SELECT t.seg AS c_mktsegment, CAST(t.n_true AS BIGINT) AS n_true,
       CAST(coalesce(r.n_reported, 0) AS BIGINT) AS n_reported,
       CAST(CASE WHEN 20 * coalesce(r.n_reported, 0) - n.n < 0
                 THEN -((-(20 * coalesce(r.n_reported, 0) - n.n)) * 1000 // 15)
                 ELSE (20 * coalesce(r.n_reported, 0) - n.n) * 1000 // 15 END
            AS BIGINT) AS est_milli
FROM t LEFT JOIN r ON t.seg = r.seg, n"""


@_register(
    "randomized_response_segments",
    _rr_sql(),
    ref="extension: local-DP randomized response (p=3/4 truth, hash60 "
    "noise draw) with the exact debiased estimator (20*rep - n)/15 in "
    "sign-split truncating milli units",
)
def q_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    u = hash60(F.col("c_custkey").cast("string")) % 100
    draw = (hash60(F.concat(F.lit("x:"), F.col("c_custkey").cast("string"))) % 5).cast(
        "int"
    )
    seg_arr = F.array(*[F.lit(s) for s in _SEGMENTS])
    rr = cust.select(
        F.col("c_mktsegment").alias("true_seg"),
        F.when(u < 75, F.col("c_mktsegment"))
        .otherwise(F.element_at(seg_arr, draw + 1))
        .alias("rep_seg"),
    )
    t = rr.groupBy(F.col("true_seg").alias("seg")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    r = rr.groupBy(F.col("rep_seg").alias("seg")).agg(
        F.count(F.lit(1)).alias("n_reported")
    )
    n = rr.agg(F.count(F.lit(1)).alias("n"))
    return (
        t.join(r, "seg", "left")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("seg").alias("c_mktsegment"),
            F.col("n_true").cast("bigint").alias("n_true"),
            F.coalesce("n_reported", F.lit(0)).cast("bigint").alias("n_reported"),
            F.expr(
                "(20 * coalesce(n_reported, 0) - n) * 1000 div 15"
            )
            .cast("bigint")
            .alias("est_milli"),
        )
    )


# =========================================================================
# wave 85
# Round-3 coverage wave 85: group-aware folds, event-time disorder
# profile, Kaplan-Meier survival.
#
# - ``group_kfold_sources``: group-aware k-fold assignment -- every doc
#   from a source lands in the SAME fold (``hash60(source) mod 5``), the
#   split that prevents near-duplicate leakage across folds when
#   duplicates cluster within a source.  The row-level variant is
#   ``kfold5_assign``; this is the GroupKFold counterpart.  Map-only,
#   replayable, and re-run stable (the properties that matter for
#   training splits).
# - ``out_of_order_lag``: event-time disorder profile -- for each event,
#   how far behind the per-user running-max event time it arrived
#   (arrival order = ``event_id``), bucketed into a bounded minutes-lag
#   histogram.  This is THE statistic that sizes a streaming watermark:
#   the p99 of this table is your allowed-lateness setting; everything
#   above it is the data a watermark would drop (cf. the
#   ``streaming_*`` jobs and test_streaming_late).  One user-partitioned
#   ordered window + a bounded histogram aggregation.
# - ``km_repurchase_survival``: Kaplan-Meier product-limit estimate of
#   time-to-repurchase with right-censoring -- consecutive purchase gaps
#   per user are event spells, the tail from each user's last purchase
#   to the corpus end is a CENSORED spell (ignoring censoring biases the
#   curve optimistic; this is the correct estimator).  Day-grain spells
#   reduce to a bounded duration histogram; the risk set is a reverse
#   cumulative window and the log-survival curve is a forward cumulative
#   sum of micro-nat-quantized ``ln((n-d)/n)`` terms (deterministic
#   integers, the ``zipf_slope_tokens`` convention) -- both windows run
#   over the ~30-row duration table.
#
# Scale: hash-split and lag are map-only/window-narrow; KM shrinks to a
# calendar-bounded histogram before any sequential math.
# =========================================================================

@_register(
    "group_kfold_sources",
    """
WITH f AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(source), 1, 15))::BIGINT % 5 AS fold
  FROM documents
)
SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM f GROUP BY fold""",
    ref="extension: GroupKFold by source (hash60(source) mod 5) -- "
    "leakage-safe splits when near-dups cluster within a source; "
    "row-level variant is kfold5_assign",
)
def q_group_kfold_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.functions.hashing import hash60

    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "doc_id", "source", (hash60(F.col("source")) % 5).alias("fold")
    )
    return f.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
    )


@_register(
    "out_of_order_lag",
    """
WITH lagged AS (
  SELECT epoch_us(max(ts) OVER (PARTITION BY user_id ORDER BY event_id))
           - epoch_us(ts) AS lag_us
  FROM events
)
SELECT CAST(lag_us // 60000000 AS BIGINT) AS lag_min,
       CAST(count(*) AS BIGINT) AS n_events
FROM lagged GROUP BY 1""",
    ref="extension: event-time disorder histogram (running-max event "
    "time minus event time over arrival order, minute buckets) -- the "
    "watermark-sizing statistic for the streaming jobs",
)
def q_out_of_order_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lagged = ev.select(
        (F.unix_micros(F.max("ts").over(w)) - F.unix_micros(F.col("ts")))
        .alias("lag_us")
    )
    return (
        lagged.select(F.expr("lag_us div 60000000").alias("lag_min"))
        .groupBy("lag_min")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(F.col("lag_min").cast("bigint").alias("lag_min"), "n_events")
    )


@_register(
    "km_repurchase_survival",
    """
WITH p AS (
  SELECT user_id, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events WHERE event_type = 'purchase'
), endt AS (
  SELECT max(ts) AS t_end FROM events
), spells AS (
  SELECT CASE WHEN nxt IS NOT NULL
              THEN (epoch_us(nxt) - epoch_us(ts)) // 86400000000
              ELSE (epoch_us((SELECT t_end FROM endt)) - epoch_us(ts))
                   // 86400000000 END AS dur_d,
         CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS is_event
  FROM p
), h AS (
  SELECT dur_d, sum(is_event) AS d, count(*) - sum(is_event) AS c
  FROM spells GROUP BY dur_d
), risk AS (
  SELECT dur_d, d,
         sum(d + c) OVER (ORDER BY dur_d DESC) AS n_risk
  FROM h
), curve AS (
  SELECT dur_d, d, n_risk,
         sum(CASE WHEN d > 0 AND n_risk = d THEN -99000000
                  WHEN d > 0 THEN CAST(floor(
               ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) ELSE 0 END)
           OVER (ORDER BY dur_d) AS log_surv_micro
  FROM risk
)
SELECT CAST(dur_d AS BIGINT) AS dur_d,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       CAST(log_surv_micro AS BIGINT) AS log_surv_micro
FROM curve WHERE d > 0""",
    ref="extension: Kaplan-Meier time-to-repurchase with right "
    "censoring at corpus end -- day-grain spell histogram, reverse "
    "cumulative risk set, micro-nat-quantized product-limit curve",
)
def q_km_repurchase_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = purch.select(
        F.unix_micros("ts").alias("t_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("nxt_us"),
    )
    t_end = ev.agg(F.unix_micros(F.max("ts")).alias("end_us"))
    spells = p.crossJoin(F.broadcast(t_end)).select(
        F.expr(
            "CASE WHEN nxt_us IS NOT NULL"
            " THEN (nxt_us - t_us) div 86400000000"
            " ELSE (end_us - t_us) div 86400000000 END"
        ).alias("dur_d"),
        F.when(F.col("nxt_us").isNotNull(), 1).otherwise(0).alias(
            "is_event"
        ),
    )
    h = spells.groupBy("dur_d").agg(
        F.sum("is_event").alias("d"),
        (F.count(F.lit(1)) - F.sum("is_event")).alias("c"),
    )
    # both cumulative scans run over the bounded duration histogram
    w_risk = Window.orderBy(F.desc("dur_d")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = h.select(
        "dur_d", "d", F.sum(F.col("d") + F.col("c")).over(w_risk).alias(
            "n_risk"
        )
    )
    w_curve = Window.orderBy("dur_d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # n_risk == d would be ln(0): survival hits exactly zero; use a
    # deterministic -99 nat sentinel (e^-99 ~ 0) in both engines
    term = F.expr(
        "CASE WHEN d > 0 AND n_risk = d THEN -99000000"
        " WHEN d > 0 THEN CAST(floor("
        "ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))"
        " * 1000000 + 0.5) AS BIGINT) ELSE 0 END"
    )
    curve = risk.select(
        "dur_d",
        "d",
        "n_risk",
        F.sum(term).over(w_curve).alias("log_surv_micro"),
    )
    return curve.filter(F.col("d") > 0).select(
        F.col("dur_d").cast("bigint").alias("dur_d"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.col("log_surv_micro").cast("bigint").alias("log_surv_micro"),
    )


# =========================================================================
# wave 91
# Round-3 coverage wave 91: uncertainty sampling, label-noise audit,
# exact grouped quartiles.
#
# - ``active_learning_margin``: margin-based uncertainty sampling -- the
#   20 vectors whose top-2 label-centroid cosines are closest (smallest
#   margin = the examples a labeling budget should buy first).  Exact
#   fixed-point centroids (``label_centroid_affinity`` machinery) are
#   broadcast; each vector computes k cosines in one pass (micro-
#   quantized double, identical both engines), a dense_rank-free top-2
#   via per-(vec) window, margin = cos1 - cos2 in exact micro units,
#   then TakeOrdered 20 with vec_id tie-break.
# - ``lang_label_conflicts``: label-noise audit -- normalized texts that
#   appear under MORE THAN ONE ``lang`` label: duplicate content with
#   inconsistent labels poisons any classifier trained on it (the
#   labeling analogue of ``decontaminate_train``).  One fingerprint
#   group-by; reports each conflicting fingerprint's doc count and
#   distinct-label count.
# - ``value_quartiles_by_type``: exact p25/p50/p75 of event value per
#   event type from the bounded cents histogram -- the EXACT counterpart
#   of ``qsketch_value_quantiles`` (sketched), the same exact-vs-sketch
#   pairing as ks/psi drift.  Quartile = smallest cent value whose
#   cumulative count reaches ceil(q*n) (type-7-free integer definition,
#   identical both engines); cumulative windows run per type over the
#   histogram, never the raw rows.
#
# Scale: centroids are k x d literals against a map-only cosine pass;
# conflicts are one fingerprint shuffle; quartiles reduce to the
# bounded per-type histogram first.
# =========================================================================

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


# =========================================================================
# round 5: privacy-risk audits -- the release-gating numbers a
# training-data pipeline computes before shipping a dataset.
#
# - ``k_anonymity_risk_summary``: one-row release gate over a
#   three-attribute quasi-identifier tuple
#   (nation, market segment, account-balance bucket): the minimum k,
#   how many groups and rows sit below the k=5 re-identification
#   threshold.  One hash aggregate; the QI bucket is a pure projection.
# - ``l_diversity_audit``: distinct-sensitive-value histogram over the
#   coarser (nation, balance-bucket) groups with market segment as the
#   sensitive attribute -- groups with l=1 leak the attribute even
#   when k is large.  groupBy + count distinct, both keyed and linear.
# - ``dp_contribution_bound``: the bounded-contribution precondition of
#   every user-level DP release: per-user event counts clipped at C=8,
#   reporting total vs clipped mass, how many users were clipped, and
#   the max raw contribution (the unbounded sensitivity).  Per-user
#   aggregate then one global fold -- the clip is `least(n, C)`, exact.
#
# 100 TB shape: all three are single hash aggregates over projections
# (QI tuples / user ids); no joins, no windows, output enum-bounded.
# =========================================================================

_KA_BUCKET = 200_000  # acctbal cents per QI bucket (~2000 currency units)
_DP_CAP = 8


@_register(
    "k_anonymity_risk_summary",
    f"""
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) // {_KA_BUCKET}
           AS bal_bucket
  FROM customer
), g AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket, count(*) AS k
  FROM qi GROUP BY 1, 2, 3
)
SELECT CAST(min(k) AS BIGINT) AS k_min,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (WHERE k < 5) AS BIGINT) AS groups_below_5,
       CAST(coalesce(sum(k) FILTER (WHERE k < 5), 0) AS BIGINT)
         AS rows_below_5,
       CAST(sum(k) AS BIGINT) AS n_rows
FROM g""",
    ref="extension: k-anonymity release-gate summary over the finer (nation, segment, "
    "balance-bucket) quasi-identifier -- min group size and mass below "
    "the k=5 re-identification threshold; release gate for dataset "
    "publication",
)
def q_k_anonymity_risk_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    qi = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            f"CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) div {_KA_BUCKET}"
        ).alias("bal_bucket"),
    )
    g = qi.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("k")
    )
    return g.agg(
        F.min("k").cast("bigint").alias("k_min"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.count(F.when(F.col("k") < 5, 1)).cast("bigint").alias(
            "groups_below_5"
        ),
        F.coalesce(F.sum(F.when(F.col("k") < 5, F.col("k"))), F.lit(0))
        .cast("bigint")
        .alias("rows_below_5"),
        F.sum("k").cast("bigint").alias("n_rows"),
    )


@_register(
    "l_diversity_audit",
    f"""
WITH qi AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) // {_KA_BUCKET}
           AS bal_bucket,
         c_mktsegment
  FROM customer
), g AS (
  SELECT c_nationkey, bal_bucket,
         count(DISTINCT c_mktsegment) AS l
  FROM qi GROUP BY 1, 2
)
SELECT CAST(l AS BIGINT) AS l, CAST(count(*) AS BIGINT) AS n_groups
FROM g GROUP BY l""",
    ref="extension: l-diversity audit -- distinct-sensitive-value "
    "(market segment) histogram over (nation, balance-bucket) groups; "
    "l=1 groups leak the attribute regardless of k",
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    qi = c.select(
        "c_nationkey",
        F.expr(
            f"CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) div {_KA_BUCKET}"
        ).alias("bal_bucket"),
        "c_mktsegment",
    )
    g = qi.groupBy("c_nationkey", "bal_bucket").agg(
        F.countDistinct("c_mktsegment").alias("l")
    )
    return g.groupBy("l").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups")
    ).select(F.col("l").cast("bigint").alias("l"), "n_groups")


@_register(
    "dp_contribution_bound",
    f"""
WITH per_user AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n) AS BIGINT) AS total_events,
       CAST(sum(least(n, {_DP_CAP})) AS BIGINT) AS clipped_total,
       CAST(count(*) FILTER (WHERE n > {_DP_CAP}) AS BIGINT)
         AS users_clipped,
       CAST(max(n) AS BIGINT) AS max_contribution,
       CAST(sum(least(n, {_DP_CAP})) * 10000 // sum(n) AS BIGINT)
         AS kept_mass_pm
FROM per_user""",
    ref="extension: differential-privacy contribution bounding audit "
    "-- per-user event counts clipped at C=8, raw vs clipped mass and "
    "the unbounded max contribution (the sensitivity a DP release "
    "must cap)",
)
def q_dp_contribution_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    clip = F.least(F.col("n"), F.lit(_DP_CAP))
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("total_events"),
        F.sum(clip).cast("bigint").alias("clipped_total"),
        F.count(F.when(F.col("n") > _DP_CAP, 1)).cast("bigint").alias(
            "users_clipped"
        ),
        F.max("n").cast("bigint").alias("max_contribution"),
        F.expr(
            f"CAST(sum(least(n, {_DP_CAP})) * 10000 div sum(n) AS BIGINT)"
        ).alias("kept_mass_pm"),
    )


# =========================================================================
# round 7: DSIR data selection (Xie et al. 2023, NeurIPS) -- importance
# resampling with hashed n-gram features.
#
# ``dsir_select_top100``: score every raw document by its estimated
# log importance weight ln(p_target/p_raw) under bag-of-hashed-unigram
# models (1024 buckets, add-one smoothing; the target domain proxy is
# the English slice).  Per-BUCKET weight: ONE ln of an exactly-
# representable integer ratio, micro-floored to an int; per-DOC score:
# the INTEGER sum of its tokens' bucket weights, so accumulation order
# can never flip the hash.  Plan: one explode feeds the bucket-count
# aggregation (map-side combinable, 1024 rows out); the per-token
# re-join against those 1024 weights is a broadcast; the per-doc sum
# is one shuffle on doc_id.  At 100 TB: the model is O(buckets), the
# data passes are two map-side-heavy aggregations -- no all-pairs, no
# driver materialization beyond the 1024-row weight table.
# =========================================================================


@_register(
    "dsir_select_top100",
    f"""
WITH toks AS (
  SELECT doc_id, lang,
         {hash60_sql("unnest(string_split(" + _NORM + ", ' '))")} % 1024
           AS b
  FROM documents WHERE text IS NOT NULL
),
counts AS (
  SELECT b,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS ct,
         CAST(count(*) AS BIGINT) AS cr
  FROM toks GROUP BY b
),
tot AS (
  SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr
  FROM counts
),
w AS (
  SELECT b,
         CAST(floor(ln(CAST((ct + 1) * (tr + 1024) AS DOUBLE)
                       / ((cr + 1) * (tt + 1024))) * 1000000 + 0.5)
              AS BIGINT) AS lam_micro
  FROM counts, tot
)
SELECT t.doc_id, CAST(sum(w.lam_micro) AS BIGINT) AS score_micro
FROM toks t JOIN w USING (b)
GROUP BY t.doc_id
ORDER BY score_micro DESC, t.doc_id LIMIT 100""",
    ref="extension: DSIR importance resampling (hashed-unigram "
    "log-likelihood-ratio selection toward a target domain)",
)
def q_dsir_select_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.functions.hashing import hash60
    from mapreduce6240project_spark.operators.dedup import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "lang", tokens("text").alias("w"))
    )
    toks = docs.select(
        "doc_id", "lang", F.explode("w").alias("tok")
    ).select(
        "doc_id",
        "lang",
        F.pmod(hash60(F.col("tok")), F.lit(1024)).alias("b"),
    )
    counts = toks.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    tot = counts.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    lam = F.floor(
        F.log(
            ((F.col("ct") + 1) * (F.col("tr") + 1024)).cast("double")
            / ((F.col("cr") + 1) * (F.col("tt") + 1024))
        )
        * 1000000
        + 0.5
    ).cast("bigint")
    w = counts.crossJoin(F.broadcast(tot)).select("b", lam.alias("lam_micro"))
    scored = (
        toks.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(F.sum("lam_micro").cast("bigint").alias("score_micro"))
    )
    return scored.orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    ).limit(100)


# =========================================================================
# round 7: t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) -- the
# third classical disclosure-risk audit next to k-anonymity_audit and
# l_diversity_audit.
#
# ``t_closeness_audit``: per quasi-identifier group (nation, segment),
# the Earth Mover's Distance between the group's distribution over an
# ORDERED sensitive attribute (account-balance band 0..4) and the
# global distribution; for ordered categories with unit ground
# distance, EMD = sum_k |P_g(<=k) - P(<=k)| / (m-1).  Every cumulative
# is an exact integer count and each |...| term is the integer cross
# product |cumg*n - cum*n_g| (exact while n_g * n < 2^63 / 1e6 -- fine
# up to ~10^8-row groups against a 10^9-row table; beyond that the
# cross products move to DECIMAL(38)), so the ONE division at the end
# is the only IEEE op and the micro-floored t is hash-exact.  Plan:
# two group-by passes (group x band dense grid via explode, global
# bands broadcast at 5 rows), one window cumsum per group -- no
# all-pairs, no driver loop.
# =========================================================================


@_register(
    "t_closeness_audit",
    """
WITH c AS (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         least(greatest(CAST(floor((c_acctbal + 1000.0) / 2200.0) AS INT),
                        0), 4) AS band
  FROM customer WHERE c_acctbal IS NOT NULL
),
gcnt AS (
  SELECT nk, seg, band, CAST(count(*) AS BIGINT) AS cnt
  FROM c GROUP BY 1, 2, 3
),
gtot AS (
  SELECT nk, seg, CAST(count(*) AS BIGINT) AS n_g FROM c GROUP BY 1, 2
),
grid0 AS (
  SELECT nk, seg, n_g, unnest(generate_series(0, 4)) AS band FROM gtot
),
grid AS (
  SELECT g.nk, g.seg, g.n_g, g.band, coalesce(x.cnt, 0) AS cnt
  FROM grid0 g LEFT JOIN gcnt x USING (nk, seg, band)
),
gcum AS (
  SELECT nk, seg, n_g, band,
         sum(cnt) OVER (PARTITION BY nk, seg ORDER BY band) AS cumg
  FROM grid
),
gband AS (
  SELECT band, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY band
),
globcum AS (
  SELECT t.band,
         sum(coalesce(g.cnt, 0)) OVER (ORDER BY t.band) AS cum,
         (SELECT count(*) FROM c) AS n
  FROM range(5) t(band) LEFT JOIN gband g ON g.band = t.band
)
SELECT nk, seg, n_g, t_micro,
       CAST(t_micro > 200000 AS INT) AS t_violation
FROM (
  SELECT k.nk, k.seg, k.n_g,
         CAST(floor(CAST(sum(abs(k.cumg * gc.n - gc.cum * k.n_g))
                         AS DOUBLE) * 1000000
                    / (k.n_g * max(gc.n) * 4) + 0.5) AS BIGINT)
           AS t_micro
  FROM gcum k JOIN globcum gc ON k.band = gc.band
  WHERE k.band <= 3
  GROUP BY k.nk, k.seg, k.n_g
)""",
    ref="extension: t-closeness disclosure-risk audit (ordered-EMD "
    "between per-QI-group and global sensitive distributions, "
    "integer cross products, one IEEE division)",
)
def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull()
    )
    band = F.least(
        F.greatest(
            F.floor((F.col("c_acctbal") + 1000.0) / 2200.0).cast("int"),
            F.lit(0),
        ),
        F.lit(4),
    )
    c = cust.select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        band.alias("band"),
    )
    gcnt = c.groupBy("nk", "seg", "band").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    gtot = c.groupBy("nk", "seg").agg(F.count(F.lit(1)).alias("n_g"))
    grid = gtot.select(
        "nk",
        "seg",
        "n_g",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("band"),
    ).join(gcnt, ["nk", "seg", "band"], "left").fillna({"cnt": 0})
    wg = (
        Window.partitionBy("nk", "seg")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gcum = grid.select(
        "nk", "seg", "n_g", "band", F.sum("cnt").over(wg).alias("cumg")
    )
    glob = (
        c.groupBy("band")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(
            c.agg(F.count(F.lit(1)).alias("n")).crossJoin(
                # dense 5-band axis so missing global bands still carry
                # their cumulative forward
                c.sparkSession.range(5).select(
                    F.col("id").cast("int").alias("band")
                )
            ).select("band", "n"),
            ["band"],
            "right",
        )
        .fillna({"cnt": 0})
    )
    wglob = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, 0
    )
    globcum = glob.select(
        "band", F.sum("cnt").over(wglob).alias("cum"), "n"
    )
    joined = gcum.join(F.broadcast(globcum), "band").filter(
        F.col("band") <= 3
    )
    num = F.sum(
        F.abs(F.col("cumg") * F.col("n") - F.col("cum") * F.col("n_g"))
    )
    out = joined.groupBy("nk", "seg", "n_g").agg(
        num.alias("_num"), F.first("n").alias("_n")
    )
    t_expr = F.floor(
        F.col("_num").cast("double")
        * 1000000
        / (F.col("n_g") * F.col("_n") * 4)
        + 0.5
    ).cast("bigint")
    return out.select(
        "nk",
        "seg",
        "n_g",
        t_expr.alias("t_micro"),
        (t_expr > 200000).cast("int").alias("t_violation"),
    )


# =========================================================================
# wave 94: calibrated-noise DP release
#
# ``dp_laplace_counts``: the continuous-noise counterpart to
# ``randomized_response_segments`` -- a per-event-type count release
# under the Laplace mechanism (epsilon = 1, count sensitivity 1), with
# the noise draw made REPLAYABLE: u comes from the shared glibc-
# constant LCG seeded by the md5-based 60-bit hash of the type name
# (hash60 -- both engines render md5 identically), then Laplace
# inverse-CDF.  The mid-point offset (s + 0.5)/2^31 keeps u strictly
# inside (0, 1) so ln never sees 0.  The ln is the one float op,
# computed once per type row and micro-quantized.  Seeding by key
# hash, not by a rank window, keeps the plan one hash aggregate plus
# narrow projections -- no global sort anywhere -- and a release
# cost independent of data size, exactly as the mechanism requires.
# =========================================================================


@_register(
    "dp_laplace_counts",
    """
WITH c AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_type IS NOT NULL GROUP BY 1
),
d AS (
  SELECT event_type, n,
         ((('0x' || substr(md5(event_type), 1, 15))::BIGINT % 2147483648)
          * 1103515245 + 12345) % 2147483648 AS s
  FROM c
),
u AS (SELECT event_type, n, (s + 0.5) / 2147483648.0 AS uv FROM d)
SELECT event_type, n,
       CAST(floor((CASE WHEN uv < 0.5 THEN ln(2.0 * uv)
                        ELSE -ln(2.0 * (1.0 - uv)) END)
                  * 1000000 + 0.5) AS BIGINT) AS noise_micro,
       n * 1000000
         + CAST(floor((CASE WHEN uv < 0.5 THEN ln(2.0 * uv)
                            ELSE -ln(2.0 * (1.0 - uv)) END)
                      * 1000000 + 0.5) AS BIGINT) AS released_micro
FROM u""",
    ref="extension: Laplace-mechanism DP count release (epsilon=1, "
    "sensitivity 1) with replayable LCG inverse-CDF noise -- the "
    "continuous-noise sibling of randomized_response_segments",
)
def q_dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.functions.hashing import hash60

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    h = hash60(F.col("event_type"))
    d = c.select(
        "event_type",
        "n",
        (((h % 2147483648) * 1103515245 + 12345) % 2147483648).alias("s"),
    )
    uv = (F.col("s") + 0.5) / 2147483648.0
    noise = F.floor(
        F.when(uv < 0.5, F.log(2.0 * uv)).otherwise(
            -F.log(2.0 * (F.lit(1.0) - uv))
        )
        * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    return d.select(
        "event_type",
        "n",
        noise.alias("noise_micro"),
        (F.col("n") * 1000000 + noise).alias("released_micro"),
    )


# =========================================================================
# wave 97: cross-split near-duplicate leakage audit
#
# ``split_leakage_audit``: composes the exact stratified splitter with
# the exact n-gram Jaccard near-dup join to answer the question every
# train/eval split must answer BEFORE training: how many near-duplicate
# pairs (Jaccard >= 0.5) STRADDLE a split boundary?  A cross train/test
# near-dup is leakage the per-doc dedup gate cannot see (both copies
# survive dedup if they differ slightly).  Output is the pair count per
# unordered split pair -- the diagonal (within-split) rows are the
# benign baseline the off-diagonal rows are judged against.  100 TB:
# the same shared-shingle join budget as dedup_ngram_jaccard plus a
# broadcast-size split map join.
# =========================================================================


@_register(
    "split_leakage_audit",
    """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
),
splits AS (
  SELECT doc_id,
         CASE WHEN rn * 10 <= n * 8 THEN 'train'
              WHEN rn * 10 <= n * 9 THEN 'val'
              ELSE 'test' END AS split
  FROM ranked
),
sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(w) >= 3 THEN list_transform(
                    generate_series(1, len(w) - 2),
                    i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                  ELSE [concat_ws(' ', w)] END) AS s
    FROM (SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text),
                                                  '\\s+', ' ', 'g')), ' ')
                   AS w
          FROM documents)
  )
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(CAST(n_inter AS DOUBLE)
              / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
)
SELECT least(s1.split, s2.split) AS split_a,
       greatest(s1.split, s2.split) AS split_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(CASE WHEN least(s1.split, s2.split)
                      <> greatest(s1.split, s2.split)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_leak
FROM pairs
JOIN splits s1 ON s1.doc_id = pairs.id_a
JOIN splits s2 ON s2.doc_id = pairs.id_b
GROUP BY 1, 2""",
    ref="extension: cross-split near-dup leakage audit -- composes the "
    "exact stratified splitter with the Jaccard>=0.5 near-dup join; "
    "off-diagonal pairs are train/eval contamination per-doc dedup "
    "misses",
)
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import ngram_jaccard_pairs
    from mapreduce6240project_spark.operators.ranking import stratum_order_stats

    docs = load_table(spark, sf_dir, "documents")
    ranked = stratum_order_stats(
        docs.select(
            "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("h")
        ),
        strata=["lang"],
        order=["h", "doc_id"],
    ).select("doc_id", "rn", "n")
    splits = ranked.select(
        "doc_id",
        F.when(F.col("rn") * 10 <= F.col("n") * 8, "train")
        .when(F.col("rn") * 10 <= F.col("n") * 9, "val")
        .otherwise("test")
        .alias("split"),
    )
    # hashed shared-shingle exact join: measured 1.8x per 10x rows vs
    # 10.5x for the prefix-filtered variant on this dup-heavy corpus
    # (the per-candidate array-intersect verify dominates there) --
    # pick the generator by measurement, both emit identical pairs
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select("id_a", "id_b")
    s1 = splits.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("sp_a")
    )
    s2 = splits.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("sp_b")
    )
    lo = F.least(F.col("sp_a"), F.col("sp_b"))
    hi = F.greatest(F.col("sp_a"), F.col("sp_b"))
    return (
        pairs.join(s1, "id_a")
        .join(s2, "id_b")
        .groupBy(lo.alias("split_a"), hi.alias("split_b"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_a",
            "split_b",
            "n_pairs",
            F.when(F.col("split_a") != F.col("split_b"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_leak"),
        )
    )


# =========================================================================
# wave 100: mixture reweighting diagnostics
#
# ``mixture_ess_audit``: when a corpus is resampled toward temperature-
# 0.75 source weights (the ``temperature_resample_langs`` scheme), the
# effective sample size ESS = (sum w)^2 / sum w^2 of the importance
# ratios says how much of the corpus the reweighting actually keeps --
# the diagnostic that catches a mixture spec quietly collapsing onto
# one source.  Per-source ratios r_s = target_share / natural_share
# involve one pow(0.75) each; both the temperature weight AND the
# ratio are micro-quantized per source (tens of rows) BEFORE any sum
# -- the normalizer z is an integer sum of integer qw, so neither
# engine's aggregation order can wobble it (r7 ADVICE) -- and ESS is
# exact given the quantized ratios.  100 TB: one count aggregate,
# |sources|-row algebra.
# =========================================================================


@_register(
    "mixture_ess_audit",
    """
WITH cnt AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n
  FROM documents WHERE source IS NOT NULL GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cnt),
pw AS (
  SELECT source, n,
         CAST(floor(power(n * 1.0 / tot.nn, 0.75) * 1000000 + 0.5) AS BIGINT)
           AS qw
  FROM cnt CROSS JOIN tot
),
zt AS (SELECT CAST(sum(qw) AS BIGINT) AS z FROM pw),
r AS (
  SELECT source, n,
         CAST(floor((qw * 1.0 / zt.z) / (n * 1.0 / tot.nn) * 1000000 + 0.5)
              AS BIGINT) AS r_micro
  FROM pw CROSS JOIN zt CROSS JOIN tot
),
mom AS (
  SELECT CAST(sum(n * r_micro) AS BIGINT) AS s1,
         CAST(sum(n * r_micro * r_micro) AS BIGINT) AS s2,
         CAST(min(r_micro) AS BIGINT) AS min_r_micro,
         CAST(max(r_micro) AS BIGINT) AS max_r_micro,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM r
)
SELECT tot.nn AS n_docs, mom.n_sources, mom.min_r_micro, mom.max_r_micro,
       CAST(floor(mom.s1 * 1.0 * mom.s1 / (mom.s2 * 1.0 * tot.nn)
                  * 10000 + 0.5) AS BIGINT) AS ess_permyriad
FROM mom CROSS JOIN tot""",
    ref="extension: effective-sample-size audit of temperature-0.75 "
    "source reweighting -- (sum w)^2/sum w^2 over micro-quantized "
    "importance ratios; catches mixture collapse before training",
)
def q_mixture_ess_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
    )
    cnt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(F.sum("n").alias("nn"))
    # ADVICE r7: the temperature weight is micro-quantized BEFORE the
    # normalizer sum (integer addition is order-free; a raw DOUBLE sum
    # under partial aggregation is not), matching the sibling
    # temperature_resample_langs convention.
    pw = cnt.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        "nn",
        F.floor(
            F.pow(F.col("n") * 1.0 / F.col("nn"), 0.75) * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("qw"),
    )
    zt = pw.agg(F.sum("qw").cast("bigint").alias("z"))
    r = pw.crossJoin(F.broadcast(zt)).select(
        "source",
        "n",
        "nn",
        F.floor(
            (F.col("qw") * 1.0 / F.col("z"))
            / (F.col("n") * 1.0 / F.col("nn"))
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("r_micro"),
    )
    mom = r.agg(
        F.sum(F.col("n") * F.col("r_micro")).alias("s1"),
        F.sum(
            F.col("n") * F.col("r_micro") * F.col("r_micro")
        ).alias("s2"),
        F.min("r_micro").alias("min_r_micro"),
        F.max("r_micro").alias("max_r_micro"),
        F.count(F.lit(1)).alias("n_sources"),
        F.max("nn").alias("nn"),
    )
    return mom.select(
        F.col("nn").alias("n_docs"),
        "n_sources",
        "min_r_micro",
        "max_r_micro",
        F.floor(
            F.col("s1") * 1.0 * F.col("s1")
            / (F.col("s2") * 1.0 * F.col("nn"))
            * 10000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("ess_permyriad"),
    )


# =========================================================================
# wave 100: optimal stratified-sampling design
#
# ``neyman_allocation``: how should a 1000-doc annotation/eval budget
# be split across sources?  Neyman allocation (n_h proportional to
# N_h * S_h) minimizes the estimator variance for a fixed budget --
# the design step uniform or proportional sampling silently gets
# wrong when strata variances differ.  Stratum standard deviations
# come from exact integer moment sums (n*sum(y^2) - sum(y)^2, y =
# n_chars); the one sqrt per stratum row is micro-quantized; the
# integer budget is apportioned EXACTLY by largest remainder, with
# the rank computed as a bounded |sources|^2 self-join comparison --
# no window, no float ties, sum(alloc) == budget by construction.
# =========================================================================

_NEYMAN_BUDGET = 1000


@_register(
    "neyman_allocation",
    f"""
WITH st AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s1,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1
),
w AS (
  SELECT source, n,
         CAST(CASE WHEN n < 2 THEN 0
              ELSE floor(n * sqrt((n * s2 - s1 * s1) * 1.0
                                  / (n * (n - 1)))
                         * 1000000 + 0.5) END AS BIGINT) AS w_micro
  FROM st
),
tw AS (SELECT CAST(sum(w_micro) AS BIGINT) AS wt FROM w),
base AS (
  SELECT w.source, w.n, w.w_micro,
         CAST({_NEYMAN_BUDGET} * w.w_micro // tw.wt AS BIGINT) AS floor_a,
         CAST({_NEYMAN_BUDGET} * w.w_micro % tw.wt AS BIGINT) AS rem
  FROM w CROSS JOIN tw
),
short AS (
  SELECT CAST({_NEYMAN_BUDGET} - sum(floor_a) AS BIGINT) AS k FROM base
),
rk AS (
  SELECT b.source, b.n, b.w_micro, b.floor_a,
         CAST(1 + (SELECT count(*) FROM base o
                   WHERE o.rem > b.rem
                      OR (o.rem = b.rem AND o.source < b.source))
              AS BIGINT) AS r
  FROM base b
)
SELECT rk.source, rk.n AS n_docs, rk.w_micro,
       CAST(rk.floor_a + CASE WHEN rk.r <= short.k THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM rk CROSS JOIN short""",
    ref="extension: Neyman-optimal stratified sample allocation with "
    "exact largest-remainder apportionment -- integer moment sums, "
    "windowless remainder ranking, sum(alloc) == budget",
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("n_chars").isNotNull()
    )
    st = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("s2"),
    )
    w = st.select(
        "source",
        "n",
        F.when(F.col("n") < 2, 0)
        .otherwise(
            F.floor(
                F.col("n")
                * F.sqrt(
                    (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
                    * 1.0
                    / (F.col("n") * (F.col("n") - 1))
                )
                * 1000000
                + F.lit(0.5)
            )
        )
        .cast("bigint")
        .alias("w_micro"),
    )
    tw = w.agg(F.sum("w_micro").alias("wt"))
    base = w.crossJoin(F.broadcast(tw)).select(
        "source",
        "n",
        "w_micro",
        F.expr(f"{_NEYMAN_BUDGET} * w_micro div wt").cast("bigint").alias(
            "floor_a"
        ),
        (F.lit(_NEYMAN_BUDGET) * F.col("w_micro") % F.col("wt"))
        .cast("bigint")
        .alias("rem"),
    )
    short = base.agg(
        (F.lit(_NEYMAN_BUDGET) - F.sum("floor_a"))
        .cast("bigint")
        .alias("k")
    )
    o = base.select(
        F.col("source").alias("o_source"), F.col("rem").alias("o_rem")
    )
    rk = (
        base.join(
            F.broadcast(o),
            (F.col("o_rem") > F.col("rem"))
            | (
                (F.col("o_rem") == F.col("rem"))
                & (F.col("o_source") < F.col("source"))
            ),
            "left",
        )
        .groupBy("source", "n", "w_micro", "floor_a")
        .agg((1 + F.count(F.col("o_source"))).cast("bigint").alias("r"))
    )
    return rk.crossJoin(F.broadcast(short)).select(
        "source",
        F.col("n").alias("n_docs"),
        "w_micro",
        (
            F.col("floor_a")
            + F.when(F.col("r") <= F.col("k"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
    )


# =========================================================================
# wave 101: training-order shuffle quality
#
# ``epoch_shuffle_quality``: a training run reshuffles the corpus each
# epoch by a keyed hash; if the permutation is weak, examples keep
# their neighbors and gradient noise decorrelates poorly.  This audit
# orders docs by the shared LCG keyed on (doc_id, epoch) for epochs 1
# and 2 and counts ADJACENT PAIRS preserved between the two orders
# (expected ~2/N under a uniform permutation, so the permyriad should
# be ~0 for any real corpus).  Adjacency is recovered with the
# rank+1 self-join on the pid-parallel rank -- no global window; the
# pair sets are |N| rows and the overlap is one equi-join on the
# canonical (lo, hi) pair key.
# =========================================================================


def _epoch_perm_sql(epoch: int) -> str:
    # md5-based key, NOT the affine LCG: an affine map of doc_id has a
    # constant key stride, so sorting by it preserves ~all adjacency
    # (this audit itself flagged it at 9979 permyriad) -- exactly the
    # weak-shuffle failure mode the op exists to catch
    return (
        f"('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{epoch}'),"
        " 1, 15))::BIGINT"
    )


@_register(
    "epoch_shuffle_quality",
    f"""
WITH d AS (SELECT doc_id FROM documents),
e1 AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY {_epoch_perm_sql(1)}, doc_id) AS r
  FROM d
),
e2 AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY {_epoch_perm_sql(2)}, doc_id) AS r
  FROM d
),
p1 AS (
  SELECT least(a.doc_id, b.doc_id) AS lo,
         greatest(a.doc_id, b.doc_id) AS hi
  FROM e1 a JOIN e1 b ON b.r = a.r + 1
),
p2 AS (
  SELECT least(a.doc_id, b.doc_id) AS lo,
         greatest(a.doc_id, b.doc_id) AS hi
  FROM e2 a JOIN e2 b ON b.r = a.r + 1
),
ov AS (SELECT CAST(count(*) AS BIGINT) AS n_preserved
       FROM p1 JOIN p2 USING (lo, hi)),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d)
SELECT n.n_docs, ov.n_preserved,
       CAST(ov.n_preserved * 10000 // (n.n_docs - 1) AS BIGINT)
         AS preserved_permyriad
FROM ov CROSS JOIN n""",
    ref="extension: epoch-to-epoch shuffle quality -- adjacent pairs "
    "preserved between two keyed-LCG epoch permutations; near-zero "
    "permyriad certifies the reshuffle actually decorrelates order",
)
def q_epoch_shuffle_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.ranking import stratum_order_stats

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def pairs(epoch: int):
        from mapreduce6240project_spark.functions.hashing import hash60

        key = hash60(
            F.concat(F.col("doc_id").cast("string"), F.lit(f":{epoch}"))
        ).alias("k")
        ranked = stratum_order_stats(
            d.select("doc_id", key), strata=[], order=["k", "doc_id"]
        ).select("doc_id", F.col("rn").alias("r"))
        nxt = ranked.select(
            (F.col("r") - 1).alias("r"), F.col("doc_id").alias("doc_b")
        )
        return ranked.join(nxt, "r").select(
            F.least(F.col("doc_id"), F.col("doc_b")).alias("lo"),
            F.greatest(F.col("doc_id"), F.col("doc_b")).alias("hi"),
        )

    ov = pairs(1).join(pairs(2), ["lo", "hi"]).agg(
        F.count(F.lit(1)).alias("n_preserved")
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return ov.crossJoin(F.broadcast(n)).select(
        "n_docs",
        "n_preserved",
        F.expr("n_preserved * 10000 div (n_docs - 1)")
        .cast("bigint")
        .alias("preserved_permyriad"),
    )


# =========================================================================
# wave 103: token-budget waterfilling across sources
#
# ``token_budget_waterfill``: the mixture solver ``neyman_allocation``
# and ``mixture_ess_audit`` both stop short of -- given a total token
# budget (60% of the corpus here), give every source an EQUAL share,
# except that no source can supply more than it has; the surplus from
# small sources redistributes to the rest (max-min fair / waterfilling
# allocation, the standard answer when target mixture weights hit
# supply limits).  Exact integer algebra end to end: sources sorted
# ascending by supply, the classic prefix condition
# ``n_i <= (B - cum_{i-1}) div (k - i + 1)`` identifies the fully-
# served ("capped") prefix -- once it fails it fails for every larger
# source, so the capped set is computable per row; the water level is
# one integer division over the uncapped count and the remainder goes
# to the smallest uncapped sources one token each, so
# ``sum(alloc) == B`` by construction.  Ranks are windowless
# |sources|^2 broadcast self-join counts (neyman_allocation
# convention).  100 TB: one hash aggregate over documents, then
# |sources|-row algebra.
# =========================================================================

_WF_PCT = 60


@_register(
    "token_budget_waterfill",
    f"""
WITH cnt AS (
  SELECT source, CAST(sum(len(string_split({_NORM}, ' '))) AS BIGINT) AS n
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
  GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) * {_WF_PCT} // 100 AS BIGINT) AS b
  FROM cnt
),
rk AS (
  SELECT c.source, c.n,
         CAST(1 + (SELECT count(*) FROM cnt o
                   WHERE o.n < c.n OR (o.n = c.n AND o.source < c.source))
              AS BIGINT) AS i,
         CAST(c.n + (SELECT coalesce(sum(o.n), 0) FROM cnt o
                     WHERE o.n < c.n OR (o.n = c.n AND o.source < c.source))
              AS BIGINT) AS cum
  FROM cnt c
),
cap AS (
  SELECT rk.source, rk.n, rk.i, rk.cum,
         CASE WHEN rk.n <= (tot.b - (rk.cum - rk.n)) // (tot.k - rk.i + 1)
              THEN 1 ELSE 0 END AS capped
  FROM rk CROSS JOIN tot
),
lvl AS (
  SELECT CAST(sum(capped) AS BIGINT) AS m,
         CAST(sum(n * capped) AS BIGINT) AS cum_m
  FROM cap
),
wl AS (
  SELECT CASE WHEN tot.k > lvl.m
              THEN (tot.b - lvl.cum_m) // (tot.k - lvl.m) ELSE 0 END AS level,
         CASE WHEN tot.k > lvl.m
              THEN (tot.b - lvl.cum_m) % (tot.k - lvl.m) ELSE 0 END AS rem,
         lvl.m AS m
  FROM tot CROSS JOIN lvl
)
SELECT cap.source, cap.n AS supply_tok,
       CAST(CASE WHEN cap.capped = 1 THEN cap.n
            ELSE wl.level + CASE WHEN cap.i - wl.m <= wl.rem
                                 THEN 1 ELSE 0 END END AS BIGINT) AS alloc_tok,
       CAST(cap.capped AS BIGINT) AS capped
FROM cap CROSS JOIN wl""",
    ref="extension: max-min fair (waterfilling) token-budget allocation "
    "across sources -- exact integer prefix condition, windowless "
    "|sources|^2 ranks, largest-remainder level split, "
    "sum(alloc) == budget by construction",
)
def q_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("text").isNotNull()
    )
    cnt = docs.groupBy("source").agg(
        F.sum(F.size(tokens("text"))).cast("bigint").alias("n")
    )
    tot = cnt.agg(
        F.sum("n").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.expr(f"CAST(sum(n) * {_WF_PCT} div 100 AS BIGINT)").alias("b"),
    )
    o = cnt.select(F.col("source").alias("o_src"), F.col("n").alias("o_n"))
    rk = (
        cnt.join(
            F.broadcast(o),
            (F.col("o_n") < F.col("n"))
            | ((F.col("o_n") == F.col("n")) & (F.col("o_src") < F.col("source"))),
            "left",
        )
        .groupBy("source", "n")
        .agg(
            (1 + F.count("o_src")).cast("bigint").alias("i"),
            (F.col("n") + F.coalesce(F.sum("o_n"), F.lit(0)))
            .cast("bigint")
            .alias("cum"),
        )
    )
    cap = rk.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        "i",
        F.when(
            F.col("n")
            <= F.expr("(b - (cum - n)) div (k - i + 1)"),
            1,
        )
        .otherwise(0)
        .alias("capped"),
    )
    lvl = cap.agg(
        F.sum("capped").cast("bigint").alias("m"),
        F.sum(F.col("n") * F.col("capped")).cast("bigint").alias("cum_m"),
    )
    wl = lvl.crossJoin(F.broadcast(tot)).select(
        F.expr(
            "CASE WHEN k > m THEN (b - cum_m) div (k - m) ELSE 0 END"
        ).alias("level"),
        F.expr(
            "CASE WHEN k > m THEN (b - cum_m) % (k - m) ELSE 0 END"
        ).alias("rem"),
        "m",
    )
    return cap.crossJoin(F.broadcast(wl)).select(
        "source",
        F.col("n").alias("supply_tok"),
        F.when(F.col("capped") == 1, F.col("n"))
        .otherwise(
            F.col("level")
            + F.when(F.col("i") - F.col("m") <= F.col("rem"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_tok"),
        F.col("capped").cast("bigint").alias("capped"),
    )
