"""Round-3 coverage wave 6: data-quality auditing, reconciliation,
robust outliers, unpivot/melt, Python UDTF lateral expansion, linear
gap interpolation, and inter-arrival analytics.

All extension surface (the reference's analytics stop at group-by
aggregation, Analysis.java:75-130); every query here has a full DuckDB
oracle.  Fixed-point discipline as elsewhere: any float that feeds a
reorderable sum is micro-quantized first; medians run in doubled
integer cents so interpolated midpoints stay integer-valued.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators import quality as Q
from mapreduce6240project_spark.operators.textstats import chunk_documents_udtf
from mapreduce6240project_spark.operators.windows import (
    inter_event_gaps,
    interpolate_linear_grid,
)
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

# -- unpivot / melt --------------------------------------------------------


@_register(
    "unpivot_part_metrics",
    """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE) FROM part""",
    ref="extension: wide->long unpivot (DataFrame.unpivot); map-only, no shuffle",
)
def q_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# -- full-outer reconciliation ---------------------------------------------


@_register(
    "full_outer_recon",
    """
WITH agg AS (
  SELECT o_custkey, count(*) AS n_orders,
         CAST(sum(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c.c_custkey, a.o_custkey, a.n_orders, a.cents
  FROM customer c FULL OUTER JOIN agg a ON c.c_custkey = a.o_custkey
)
SELECT CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'both'
            WHEN o_custkey IS NULL THEN 'customer_only'
            ELSE 'orders_only' END AS presence,
       count(*) AS n_keys,
       CAST(sum(coalesce(n_orders, 0)) AS BIGINT) AS n_orders,
       CAST(sum(coalesce(cents, 0)) AS BIGINT) AS total_cents
FROM j GROUP BY 1""",
    ref="extension: dataset reconciliation via full-outer join "
    "(master vs fact rollup); shuffle-on-key, dimension side broadcastable",
)
def q_full_outer_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    cents = F.floor(F.col("o_totalprice").cast("double") * 100 + F.lit(0.5)).cast(
        "bigint"
    )
    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(cents).alias("cents"))
    )
    j = cust.join(agg, cust.c_custkey == agg.o_custkey, "full_outer")
    presence = (
        F.when(F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull(), "both")
        .when(F.col("o_custkey").isNull(), "customer_only")
        .otherwise("orders_only")
    )
    return j.groupBy(presence.alias("presence")).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.coalesce("n_orders", F.lit(0))).alias("n_orders"),
        F.sum(F.coalesce("cents", F.lit(0))).alias("total_cents"),
    )


# -- data-quality audit ----------------------------------------------------

_DQ_SQL = """
SELECT 'orders' AS table_name, '*' AS column_name, 'n_rows' AS metric,
       CAST(count(*) AS BIGINT) AS value FROM orders
UNION ALL SELECT 'orders', 'o_custkey', 'n_null',
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL SELECT 'orders', 'o_custkey', 'n_distinct',
       CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
UNION ALL SELECT 'orders', 'o_totalprice', 'n_null',
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL SELECT 'orders', 'o_totalprice', 'n_distinct',
       CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM orders
UNION ALL SELECT 'orders', 'o_orderstatus', 'n_null',
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL SELECT 'orders', 'o_orderstatus', 'n_distinct',
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders
UNION ALL SELECT 'lineitem', '*', 'n_rows', CAST(count(*) AS BIGINT) FROM lineitem
UNION ALL SELECT 'lineitem', 'l_orderkey', 'n_null',
       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
UNION ALL SELECT 'lineitem', 'l_orderkey', 'n_distinct',
       CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem
UNION ALL SELECT 'lineitem', 'l_quantity', 'n_null',
       CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
UNION ALL SELECT 'lineitem', 'l_quantity', 'n_distinct',
       CAST(count(DISTINCT l_quantity) AS BIGINT) FROM lineitem
UNION ALL SELECT 'lineitem->orders', 'l_orderkey', 'fk_violations',
       CAST((SELECT count(*) FROM lineitem l LEFT JOIN orders o
             ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT)
UNION ALL SELECT 'orders->customer', 'o_custkey', 'fk_violations',
       CAST((SELECT count(*) FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS BIGINT)"""


@_register(
    "dq_audit",
    _DQ_SQL,
    ref="extension: data-quality audit -- one aggregate scan per table "
    "profiles every column (nulls, exact distincts); FK checks are "
    "left-anti joins",
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    return (
        Q.column_profile(
            orders, "orders", ["o_custkey", "o_totalprice", "o_orderstatus"]
        )
        .unionByName(
            Q.column_profile(lineitem, "lineitem", ["l_orderkey", "l_quantity"])
        )
        .unionByName(
            Q.referential_violations(
                lineitem, orders, "l_orderkey", "o_orderkey", "lineitem->orders"
            )
        )
        .unionByName(
            Q.referential_violations(
                orders, customer, "o_custkey", "c_custkey", "orders->customer"
            )
        )
    )


# -- robust (median/MAD) outliers ------------------------------------------


@_register(
    "mad_outlier_prices",
    """
WITH c AS (
  SELECT o_orderpriority AS grp,
         CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
m AS (
  SELECT grp, 2 * quantile_cont(CAST(cents AS DOUBLE), 0.5) AS med2
  FROM c GROUP BY grp
),
d AS (
  SELECT c.grp, abs(2 * CAST(cents AS DOUBLE) - med2) AS dev2
  FROM c JOIN m USING (grp)
),
md AS (SELECT grp, 2 * quantile_cont(dev2, 0.5) AS mad4 FROM d GROUP BY grp)
SELECT d.grp AS o_orderpriority, count(*) AS n,
       CAST(sum(CASE WHEN 2 * dev2 > 3 * mad4 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(mad4 AS BIGINT) AS mad4
FROM d JOIN md USING (grp) GROUP BY d.grp, md.mad4""",
    ref="extension: robust per-group outlier detection (median + MAD in "
    "doubled fixed-point, engine-exact); exact percentile per group",
)
def q_mad_outlier_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return Q.mad_outliers(orders, "o_orderpriority", "o_totalprice", fence=3)


# -- Python UDTF lateral expansion -----------------------------------------


@_register(
    "udtf_chunk_docs",
    """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
n AS (
  SELECT doc_id, ws, len(ws) AS nw,
         CAST(1 + CASE WHEN len(ws) > 30 THEN ceil((len(ws) - 30) / 20.0)
                       ELSE 0 END AS INT) AS nc
  FROM w
),
g AS (SELECT doc_id, ws, unnest(range(nc)) AS j FROM n)
SELECT doc_id, CAST(j AS INT) AS chunk_idx,
       CAST(len(list_slice(ws, j * 20 + 1, j * 20 + 30)) AS INT) AS n_words,
       array_to_string(list_slice(ws, j * 20 + 1, j * 20 + 30), ' ') AS chunk
FROM g""",
    ref="extension: Spark 4 Python UDTF via LATERAL join (overlapping "
    "RAG chunk windows); JVM-side sequence+slice+explode is the scale "
    "path, the UDTF covers the API surface",
)
def q_udtf_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents_udtf(docs)


# -- linear gap interpolation ----------------------------------------------

_INTERP_SQL = """
WITH ev AS (
  SELECT user_id, ts, value FROM events WHERE ts < TIMESTAMP '2024-01-02'
),
b AS (
  SELECT user_id,
         date_trunc('minute', min(ts)) + INTERVAL 1 MINUTE AS s,
         date_trunc('minute', max(ts)) AS e
  FROM ev GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(s, e, INTERVAL 1 MINUTE)) AS ts
  FROM b WHERE s <= e
),
u AS (
  SELECT user_id, epoch_us(ts) AS tus, value AS v, 'a' AS tag FROM ev
  UNION ALL
  SELECT user_id, epoch_us(ts), NULL, 'b' FROM grid
),
w AS (
  SELECT user_id, tus, tag,
    last_value(CASE WHEN tag = 'a' THEN v END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY tus, tag
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN tag = 'a' THEN tus END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY tus, tag
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
    first_value(CASE WHEN tag = 'a' THEN v END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY tus, tag
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN tag = 'a' THEN tus END IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY tus, tag
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM u
)
SELECT user_id, count(*) AS n_points,
       CAST(sum(CAST(floor(
         (pv + (nv - pv) * ((tus - pt) / CAST(nt - pt AS DOUBLE)))
         * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_micros
FROM w
WHERE tag = 'b' AND pv IS NOT NULL AND nv IS NOT NULL AND nt > pt
GROUP BY user_id"""


@_register(
    "interp_linear_minute",
    _INTERP_SQL,
    ref="extension: linear interpolation onto a dense minute grid "
    "(gapfill + interpolate); union + one window pass, no range join",
)
def q_interp_linear_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-02").cast("timestamp")
    )
    return interpolate_linear_grid(ev)


# -- inter-arrival gap histogram -------------------------------------------


@_register(
    "inter_event_gaps",
    """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT CASE WHEN gap_us < 1000000 THEN 'lt_1s'
            WHEN gap_us < 60000000 THEN '1s_60s'
            WHEN gap_us < 600000000 THEN '1m_10m'
            WHEN gap_us < 3600000000 THEN '10m_1h'
            ELSE 'ge_1h' END AS bucket,
       count(*) AS n, CAST(sum(gap_us) AS BIGINT) AS total_us
FROM g WHERE gap_us IS NOT NULL GROUP BY 1""",
    ref="extension: per-key inter-arrival gap histogram (lag window, "
    "unique (ts, event_id) sort key); one shuffle on the key",
)
def q_inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inter_event_gaps(load_table(spark, sf_dir, "events"))


# -- rolling median (median filter) ----------------------------------------


@_register(
    "rolling_median_7",
    """
WITH m AS (
  SELECT event_id, user_id,
         list_sort(list(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS f
  FROM events
)
SELECT event_id, user_id,
       (f[CAST((len(f) + 1) // 2 AS INT)]
        + f[CAST(len(f) // 2 + 1 AS INT)]) // 2 AS median_micros
FROM m""",
    ref="extension: per-key rolling median filter (bounded 7-row frame, "
    "positional middle on micro-quantized integers -- the even-count "
    "midpoint is an integer mean, no float in the path; values are "
    "non-negative so floor-div equals trunc-div across engines)",
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.windows import rolling_median

    return rolling_median(load_table(spark, sf_dir, "events"), width=7)


# -- mergeable log-bucket quantile sketch ----------------------------------


def _qsketch_sql() -> str:
    from mapreduce6240project_spark.operators.sketch import (
        QSKETCH_BID_SQL,
        QSKETCH_REP_SQL,
    )

    bid = QSKETCH_BID_SQL.format(m="m")
    rep = QSKETCH_REP_SQL.format(b="bid")
    return f"""
WITH mm AS (
  SELECT CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS m FROM events
),
b AS (
  SELECT {bid} AS bid, count(*) AS n FROM mm WHERE m >= 0 GROUP BY 1
),
c AS (
  SELECT bid, n, sum(n) OVER (ORDER BY bid) AS cum, sum(n) OVER () AS total
  FROM b
),
q AS (
  SELECT unnest(['p50', 'p90', 'p99']) AS label,
         unnest([5000, 9000, 9900]) AS q10k
),
sel AS (
  SELECT label, min(bid) AS bid, max(total) AS n_total
  FROM c, q WHERE cum >= (q10k * total + 9999) // 10000 GROUP BY label
)
SELECT label, {rep} AS est_micros, CAST(n_total AS BIGINT) AS n_total FROM sel"""


@_register(
    "qsketch_value_quantiles",
    _qsketch_sql(),
    ref="extension: mergeable log-bucket quantile sketch (DDSketch idea, "
    "integer-exact: binary exponent + 3 mantissa bits, <=1/16 relative "
    "error) -- the scalable quantile path; sketch cardinality ~512 "
    "buckets regardless of data volume, sketches merge by adding counts",
)
def q_qsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.sketch import (
        quantile_sketch,
        quantile_sketch_estimate,
    )

    sk = quantile_sketch(load_table(spark, sf_dir, "events"), "value")
    return quantile_sketch_estimate(sk, {"p50": 0.5, "p90": 0.9, "p99": 0.99})


# -- n-gram-overlap contamination ------------------------------------------

_NORM6 = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_G8_TERMS = ", ".join(f"w[i+{j}]" for j in range(8))
_G8 = (
    f"CASE WHEN len(w) >= 8 THEN list_transform(generate_series(1, len(w) - 7), "
    f"i -> concat_ws(' ', {_G8_TERMS})) ELSE [concat_ws(' ', w)] END"
)


@_register(
    "contaminated_ngram",
    f"""
WITH toks AS (
  SELECT doc_id, source, string_split({_NORM6}, ' ') AS w FROM documents
),
tg AS (
  SELECT doc_id, unnest(list_distinct({_G8})) AS g
  FROM toks WHERE source <> 'src0'
),
eg AS (
  SELECT DISTINCT unnest(list_distinct({_G8})) AS g
  FROM toks WHERE source = 'src0'
)
SELECT doc_id, count(*) AS n_shared_grams
FROM tg JOIN eg USING (g) GROUP BY doc_id""",
    ref="extension: n-gram-overlap contamination (any shared word 8-gram "
    "with the eval corpus flags the training doc -- catches substring "
    "leakage exact fingerprints miss); eval grams broadcast, train text "
    "never shuffles",
)
def q_contaminated_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.curation import contamination_ngram_hits

    docs = load_table(spark, sf_dir, "documents")
    return contamination_ngram_hits(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=8,
    )
