"""data-engineering utilities: layout, quality audits, incremental maintenance, SCD, sinks, schema evolution.

Consolidated from the round-3 coverage waves (round-4 verdict item
7: thematic domain modules instead of flat wave numbering).  Each
section below is the original wave body verbatim; registry names,
oracles and semantics are unchanged (guarded by the registry
snapshot test and the full sf0.01 mirror).

* wave 4: Round-3 coverage wave: physical data layout (bucketed co-located
* wave 6: Round-3 coverage wave 6: data-quality auditing, reconciliation,
* wave 11: Round-3 coverage wave 11: incremental-maintenance and scalable
* wave 13: Round-3 coverage wave 13: slowly-changing-dimension history and
* wave 15: Round-3 coverage wave 15: null-semantics joins and complex-type
* wave 23: Round-3 coverage wave 23: data-engineering utility operators.
* wave 45: Round-3 coverage wave 45: Spark 4 VariantType and session path
* wave 54: Round-3 coverage wave 54: schema discovery and drift monitoring.
* wave 64: Round-3 coverage wave 64: deletion impact and schema evolution.
* wave 78: Round-3 coverage wave 78: fixed-width ingest, bag set-ops, and the
* wave 83: Round-3 coverage wave 83: dynamic-partition-overwrite sink,
"""

from __future__ import annotations

import tempfile
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from mapreduce6240project_spark.functions.actions import first_row
from mapreduce6240project_spark.config import scratch_dir
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.layout import (
    bucketed_merge_join,
    read_partition,
    write_bucketed_table,
    write_partitioned,
)
from mapreduce6240project_spark.sources.tables import load_table
from mapreduce6240project_spark.operators import quality as Q
from mapreduce6240project_spark.operators.textstats import chunk_documents_udtf
from mapreduce6240project_spark.operators.windows import (
    inter_event_gaps,
    interpolate_linear_grid,
)
from pyspark.sql import DataFrame, SparkSession, Window
from mapreduce6240project_spark.functions.numeric import stable_sum_micros_sql
from mapreduce6240project_spark.functions.hashing import hash60

# =========================================================================
# wave 4
# Round-3 coverage wave: physical data layout (bucketed co-located
# joins, partition-pruned scans) and an ORC source round-trip.
#
# These are the write-side half of the 100 TB story: the other queries
# show plans that *minimize* shuffles at read time; these show the
# layouts that *eliminate* them -- bucketing pays a fact table's join
# shuffle once at write time, directory partitioning turns a categorical
# filter into directory pruning.  Plan shapes (zero Exchange under the
# bucketed join, PartitionFilters on the pruned scan) are pinned in
# tests/test_plans.py.
#
# Money columns are summed in cent units (exact integers, associative)
# so Spark's partial aggregation and DuckDB's serial sum agree bit-for-
# bit -- the same fixed-point convention as the cluster-cost queries.
# =========================================================================

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


@_register(
    "bucketed_join_revenue",
    f"""
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum({_CENTS}) AS BIGINT) AS revenue_cents
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment""",
    ref="extension: shuffle-free equi-join via matched bucketing "
    "(HBase region co-location, kmeans.java:130-139, done Spark-native)",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two tables bucketed on the join key: the sort-merge join
    reads bucket i of each side in task i -- no Exchange anywhere in
    the plan (asserted in tests/test_plans.py)."""
    base = tempfile.mkdtemp(prefix="sparkgraft_bucketed_")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    write_bucketed_table(cust, "bkt_customer", "c_custkey", 8, f"{base}/cust")
    write_bucketed_table(orders, "bkt_orders", "c_custkey", 8, f"{base}/ord")
    joined = bucketed_merge_join(spark, "bkt_customer", "bkt_orders", "c_custkey")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"), F.sum(cents).alias("revenue_cents")
    )


@_register(
    "partitioned_scan_clicks",
    """
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_start,
       count(*) AS n,
       CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_micros
FROM events WHERE event_type = 'click'
GROUP BY hour_start""",
    ref="extension: categorical directory partitioning; the filter "
    "prunes directories, not rows (HBase column-family locality analog)",
)
def q_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lay events out partitioned by event_type, then aggregate one
    type: the predicate becomes a PartitionFilter -- non-click
    directories are never listed, let alone read."""
    out = tempfile.mkdtemp(prefix="sparkgraft_parts_")
    write_partitioned(load_table(spark, sf_dir, "events"), out, "event_type")
    clicks = read_partition(spark, out, "event_type", "click")
    micros = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    hour = (F.floor(F.col("ts").cast("long") / 3600) * 3600).cast("bigint")
    return clicks.groupBy(hour.alias("hour_start")).agg(
        F.count("*").alias("n"), F.sum(micros).alias("value_micros")
    )


@_register(
    "orc_roundtrip",
    f"""
SELECT o_orderstatus, count(*) AS n,
       CAST(sum({_CENTS}) AS BIGINT) AS total_cents
FROM orders GROUP BY o_orderstatus""",
    ref="S1/S5 analog: columnar ORC sink + source round-trip "
    "(second columnar format beside parquet)",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders as ORC, read it back, aggregate: exercises the
    second native columnar format end-to-end (schema preservation,
    predicate pushdown support comes free from the ORC reader)."""
    out = tempfile.mkdtemp(prefix="sparkgraft_orc_")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum(cents).alias("total_cents")
    )


# ---------------------------------------------------------------------------
# Product quantization: the whole index (global seed draw -> per-subspace
# integer Lloyd -> code assignment -> integer ADC) is exact bigint
# arithmetic, so the oracle replays every codebook entry, code, and
# distance bit-for-bit -- same convention as the IVF oracle it
# generalizes (one extra `s` grouping key threads the subspace through
# the CTE chain).
# ---------------------------------------------------------------------------


def _pq_sql(m: int = 4, n_codes: int = 16, iters: int = 2) -> str:
    sub = 64 // m
    ctes = [
        f"""
WITH iv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS q
  FROM embeddings
),
vs AS (SELECT vec_id, unnest(q) AS x, unnest(generate_series(1, len(q))) AS d,
              CAST((unnest(generate_series(1, len(q))) - 1) // {sub} AS INT) AS s
       FROM iv),
sr AS (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY ((vec_id % 2147483648) * 1103515245 + 12345) % 2147483648,
                    vec_id) AS rn
  FROM embeddings
),
c0 AS (
  SELECT sr.rn - 1 AS code, v.s, v.d, v.x AS cx
  FROM sr JOIN vs v USING (vec_id) WHERE sr.rn <= {n_codes}
)"""
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        ctes.append(
            f""",
d{i} AS (SELECT v.vec_id, c.s, c.code, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
       FROM vs v JOIN {prev} c ON v.d = c.d GROUP BY 1, 2, 3),
a{i} AS (SELECT vec_id, s, code FROM (
       SELECT vec_id, s, code,
              row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rn
       FROM d{i}) WHERE rn = 1),
u{i} AS (SELECT a.s, a.code, v.d, sum(v.x) AS sm, count(*) AS n
       FROM a{i} a JOIN vs v ON v.vec_id = a.vec_id AND v.s = a.s
       GROUP BY 1, 2, 3),
c{i} AS (SELECT p.s, p.code, p.d, COALESCE(u{i}.sm // u{i}.n, p.cx) AS cx
       FROM {prev} p LEFT JOIN u{i}
         ON u{i}.s = p.s AND u{i}.code = p.code AND u{i}.d = p.d)"""
        )
        prev = f"c{i}"
    ctes.append(
        f""",
df AS (SELECT v.vec_id, c.s, c.code, sum((v.x - c.cx) * (v.x - c.cx)) AS dist
       FROM vs v JOIN {prev} c ON v.d = c.d GROUP BY 1, 2, 3),
af AS (SELECT vec_id, s, code FROM (
       SELECT vec_id, s, code,
              row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rn
       FROM df) WHERE rn = 1),
qi AS (SELECT s, d, x FROM vs WHERE vec_id = 0),
lut AS (SELECT c.s, c.code, sum((c.cx - t.x) * (c.cx - t.x)) AS dist
       FROM {prev} c JOIN qi t ON c.d = t.d GROUP BY 1, 2)"""
    )
    return "".join(ctes)


@_register(
    "ann_pq_topk",
    _pq_sql()
    + """
SELECT vec_id, CAST(sum(l.dist) AS BIGINT) AS adc_dist
FROM af a JOIN lut l ON l.s = a.s AND l.code = a.code
GROUP BY vec_id
ORDER BY adc_dist, vec_id LIMIT 10""",
    ref="extension: product-quantization ANN (per-subspace integer "
    "codebooks, LUT-based asymmetric distance; the RAM-resident index "
    "shape -- 64 floats become m=4 byte codes)",
)
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import ann_pq_topk
    from mapreduce6240project_spark.plans.extensions import _query_vec

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_pq_topk(emb, _query_vec(spark, sf_dir), k=10)


# ---------------------------------------------------------------------------
# sampling extensions: per-group weighted draws and temperature mixing
# ---------------------------------------------------------------------------

from mapreduce6240project_spark.plans.extensions import _LCG  # noqa: E402


@_register(
    "weighted_sample_by_status",
    f"""
SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         row_number() OVER (
           PARTITION BY o_orderstatus
           ORDER BY power(({_LCG.format(k='o_orderkey')} + 1) / 2147483649.0,
                          1.0 / o_totalprice) DESC,
                    o_orderkey) AS rk
  FROM orders WHERE o_totalprice > 0
) WHERE rk <= 50""",
    ref="extension: per-group weighted sample w/o replacement "
    "(A-ES priorities under a WindowGroupLimit rank bound)",
)
def q_weighted_sample_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.sampling import (
        weighted_priority_sample_per_group,
    )

    orders = load_table(spark, sf_dir, "orders")
    return weighted_priority_sample_per_group(
        orders, k=50, weight_col="o_totalprice", key="o_orderkey",
        group_col="o_orderstatus",
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@_register(
    "temperature_resample_langs",
    # replays the driver's threshold math: fixed-point sqrt weights
    # (exact integer sum), then the same IEEE double op order as the
    # mixture oracle -- share = qs/sumq; total = min(n/share);
    # frac = least(1, share*total/n); threshold = trunc(frac * 2^31)
    f"""
WITH cnt AS (SELECT lang, count(*) AS n FROM documents
             WHERE lang IS NOT NULL GROUP BY lang),
q AS (SELECT lang, n,
             CAST(floor(sqrt(n) * 1000000 + 0.5) AS BIGINT) AS qs FROM cnt),
sq AS (SELECT CAST(sum(qs) AS BIGINT) AS sumq FROM q),
shr AS (SELECT lang, n, CAST(qs AS DOUBLE) / sumq AS share FROM q, sq),
tot AS (SELECT min(n / share) AS total FROM shr),
thr AS (
  SELECT lang,
         CAST(trunc(LEAST(1.0, share * total / n) * 2147483648) AS BIGINT) AS t
  FROM shr, tot
)
SELECT d.doc_id, d.lang FROM documents d JOIN thr USING (lang)
WHERE {_LCG.format(k='d.doc_id')} < t""",
    ref="extension: temperature-flattened corpus mixing "
    "(count^alpha shares, alpha=0.5; multilingual rebalancing)",
)
def q_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.sampling import temperature_resample

    docs = load_table(spark, sf_dir, "documents")
    return temperature_resample(docs, alpha=0.5, strata_col="lang", key="doc_id").select(
        "doc_id", "lang"
    )


# ---------------------------------------------------------------------------
# MMR: the greedy trajectory is deterministic (in-order cosine folds,
# exact max, id tie-breaks), so the oracle unrolls all k selection
# rounds into a CTE chain -- the same replay technique as the
# k-medoids oracle.
# ---------------------------------------------------------------------------

_DCOS = (
    "(list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b}))))"
)


def _mmr_sql(k: int = 5, lam: float = 0.7) -> str:
    om = repr(1.0 - lam)  # the exact double the driver computes
    lam_s = repr(lam)
    cos_rs = _DCOS.format(a="r.ev", b="s.ev")
    cos_ms = _DCOS.format(a="m.ev", b="s.ev")
    parts = [
        f"""
WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
              WHERE embedding IS NOT NULL
                AND len(list_filter(embedding, x -> x IS NULL)) = 0),
q AS (SELECT ev AS qv FROM vecs WHERE vec_id = 0),
rel AS (SELECT * FROM (
          SELECT vec_id, ev, {_DCOS.format(a="ev", b="qv")} AS rel FROM vecs, q)
        WHERE rel IS NOT NULL),
s1 AS (SELECT vec_id, ev, rel, rel AS score
       FROM rel ORDER BY rel DESC, vec_id LIMIT 1),
m1 AS (SELECT r.vec_id, r.ev, r.rel, {cos_rs} AS msim
       FROM rel r, s1 s WHERE r.vec_id <> s.vec_id)"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f""",
s{i} AS (SELECT vec_id, ev, rel, msim,
              {lam_s} * rel - {om} * msim AS score
       FROM m{i - 1} ORDER BY score DESC, vec_id LIMIT 1)"""
        )
        if i < k:
            parts.append(
                f""",
m{i} AS (SELECT m.vec_id, m.ev, m.rel, greatest(m.msim, {cos_ms}) AS msim
       FROM m{i - 1} m, s{i} s WHERE m.vec_id <> s.vec_id)"""
            )
    union = "\nUNION ALL ".join(
        f"SELECT {i} AS rank, vec_id, round(score, 4) AS score FROM s{i}"
        for i in range(1, k + 1)
    )
    return "".join(parts) + "\n" + union


@_register(
    "mmr_select_diverse",
    _mmr_sql(k=5, lam=0.7),
    ref="extension: maximal-marginal-relevance diverse top-k "
    "(Carbonell-Goldstein greedy, literal-broadcast iterative plan)",
)
def q_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import mmr_select
    from mapreduce6240project_spark.plans.extensions import _query_vec

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_select(emb, _query_vec(spark, sf_dir), k=5, lam=0.7)


# =========================================================================
# wave 6
# Round-3 coverage wave 6: data-quality auditing, reconciliation,
# robust outliers, unpivot/melt, Python UDTF lateral expansion, linear
# gap interpolation, and inter-arrival analytics.
#
# All extension surface (the reference's analytics stop at group-by
# aggregation, Analysis.java:75-130); every query here has a full DuckDB
# oracle.  Fixed-point discipline as elsewhere: any float that feeds a
# reorderable sum is micro-quantized first; medians run in doubled
# integer cents so interpolated midpoints stay integer-valued.
# =========================================================================

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


# =========================================================================
# wave 11
# Round-3 coverage wave 11: incremental-maintenance and scalable
# bookkeeping patterns a 100 TB pipeline leans on daily.
#
# - ``incremental_merge_agg``: incremental view maintenance.  History
#   (ts < cutoff) is aggregated once into mergeable partials (count +
#   integer-micros sum -- associative, so re-merging cannot drift), the
#   new delta (ts >= cutoff) is aggregated separately, and the two
#   partial tables are merged and finalized.  At 100 TB this is the
#   difference between re-scanning a year of history per day and scanning
#   only the new day; the oracle proves merge(history, delta) equals the
#   full recompute bit-for-bit.
# - ``length_band_docs``: percentile-band filtering (drop the length
#   tails, a standard corpus-quality gate).  The two global cutoffs are a
#   1-row aggregate broadcast into the scan filter -- no sort, no window.
# - ``stable_doc_ids``: global contiguous row numbering WITHOUT the
#   single-partition global window (``row_number() OVER (ORDER BY ...)``
#   funnels all data through one task -- the classic scale trap).  Range
#   repartition by key, sort within partitions, number within each
#   partition in parallel, then add per-partition offsets computed from a
#   partition-count table whose size is the partition count, not the data.
#
# Reference parity note: the reference has no incremental or bookkeeping
# surface; this wave belongs to the LLM-data-pipeline extension mandated
# alongside SURVEY.md section 2.
# =========================================================================

CUTOFF = "2024-01-16 00:00:00"


@_register(
    "incremental_merge_agg",
    f"""
SELECT event_type,
       count(*) AS n_events,
       {stable_sum_micros_sql('value')} AS sum_value
FROM events
GROUP BY event_type""",
    ref="extension: incremental view maintenance -- mergeable partial "
    "aggregates (count + integer-micros sum) over history ts < cutoff "
    "merged with the fresh delta; oracle is the full recompute, proving "
    "merge == recompute exactly",
)
def q_incremental_merge_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(CUTOFF).cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        # Mergeable state: BIGINT count + BIGINT micros sum.  Integer
        # addition is associative, so merging partials in any order (or
        # any number of increments) reproduces the full recompute.
        micros = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum(micros).alias("micros")
        )

    history = partials(ev.filter(F.col("ts") < cutoff))  # stored summary
    delta = partials(ev.filter(F.col("ts") >= cutoff))  # today's increment
    return (
        history.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n_events"), F.sum("micros").alias("micros"))
        .select(
            "event_type",
            "n_events",
            F.round(F.col("micros") / 1000000.0, 4).alias("sum_value"),
        )
    )


@_register(
    "length_band_docs",
    """
WITH cuts AS (
  SELECT quantile_cont(n_chars, 0.05) AS lo, quantile_cont(n_chars, 0.95) AS hi
  FROM documents
)
SELECT d.lang,
       count(*) AS n_docs,
       round(sum(d.n_chars) / count(*), 4) AS avg_chars
FROM documents d, cuts c
WHERE d.n_chars >= c.lo AND d.n_chars <= c.hi
GROUP BY d.lang""",
    ref="extension: percentile-band length gate (corpus-quality tail "
    "trim); cutoffs are a 1-row exact-percentile aggregate broadcast "
    "into the scan filter -- no global sort",
)
def q_length_band_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cuts = docs.agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    # 1-row broadcast nested-loop join: each scan task gets the cutoffs
    # as in-memory literals; the documents scan stays narrow.
    return (
        docs.crossJoin(F.broadcast(cuts))
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("n_chars") / F.count("*"), 4).alias("avg_chars"),
        )
    )


@_register(
    "stable_doc_ids",
    """
SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS stable_id
FROM documents""",
    ref="extension: scalable global row numbering -- range repartition + "
    "within-partition window + partition-count offsets; equals "
    "row_number() OVER (ORDER BY doc_id) without the single-partition "
    "global-window funnel",
)
def q_stable_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Degenerate (no-strata) case of the shared range-exchange +
    # pid-offsets helper; see operators.ranking.stratum_order_stats for
    # the boundary-sample pinning rationale.
    from mapreduce6240project_spark.operators.ranking import (
        stratum_order_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return stratum_order_stats(docs, strata=[], order=["doc_id"]).select(
        "doc_id", F.col("rn").alias("stable_id")
    )


# =========================================================================
# wave 13
# Round-3 coverage wave 13: slowly-changing-dimension history and
# corpus boilerplate detection.
#
# - ``scd2_user_state``: SCD type-2 history build from an event log --
#   per user, collapse consecutive duplicate states (lag), then derive
#   validity intervals (lead); the current version's ``valid_to_us`` is
#   NULL.  The warehouse-side sibling of ``scd_upsert`` (type 1 /
#   latest-wins): type 2 keeps every version with its validity window.
#   One shuffle on the history key; both windows share the same
#   (user_id, ts) partitioning so Catalyst plans a single sort+exchange.
# - ``boilerplate_chunks``: C4-style boilerplate detection -- token
#   chunks recurring across >= 2 distinct documents of the same source
#   (nav bars, license footers).  Shares the chunking stage with
#   paragraph dedup (``dedup.doc_chunks``); the shuffle key is the
#   (source, chunk-hash) pair, carrying digests, not text.
#
# Reference parity note: the reference has no history-tracking or
# boilerplate surface; this wave belongs to the LLM-data-pipeline
# extension mandated alongside SURVEY.md section 2.
# =========================================================================

BOILERPLATE_MIN_DOCS = 2
#: chunk granularity -- interpolated into BOTH the Spark call and the
#: oracle SQL so the two sides can never silently diverge
BOILERPLATE_CHUNK_TOKENS = 10


@_register(
    "scd2_user_state",
    """
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS us, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS prev_state,
         event_id
  FROM events
),
changes AS (
  SELECT user_id, us, event_type, event_id FROM ordered
  WHERE prev_state IS NULL OR prev_state <> event_type
)
SELECT user_id, event_type AS state, us AS valid_from_us,
       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         AS valid_to_us
FROM changes""",
    ref="extension: SCD type-2 history build (consecutive-duplicate "
    "collapse via lag, validity intervals via lead; type-1 sibling is "
    "scd_upsert)",
)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_type", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    changes = (
        ev.withColumn("prev_state", F.lag("event_type").over(w))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("event_type"))
        )
        .drop("prev_state")
    )
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w2).alias("valid_to_us"),
    )


@_register(
    "boilerplate_chunks",
    rf"""
WITH norm AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
  FROM documents
),
toks AS (
  SELECT doc_id, source, unnest(tk) AS tok,
         unnest(generate_series(1, len(tk))) - 1 AS pos
  FROM norm
),
chunks AS (
  SELECT doc_id, source, CAST(floor(pos / {BOILERPLATE_CHUNK_TOKENS}) AS INT) AS cpos,
         string_agg(tok, ' ' ORDER BY pos) AS chunk
  FROM toks GROUP BY doc_id, source, CAST(floor(pos / {BOILERPLATE_CHUNK_TOKENS}) AS INT)
)
SELECT source, chunk, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM chunks
GROUP BY source, chunk
HAVING count(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}""",
    ref="extension: C4-style boilerplate detection (chunks recurring in "
    ">= 2 distinct docs per source); shares dedup.doc_chunks with "
    "paragraph dedup",
)
def q_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import doc_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = doc_chunks(docs, chunk_tokens=BOILERPLATE_CHUNK_TOKENS).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return (
        chunks.groupBy("source", "chunk")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
    )


# =========================================================================
# wave 15
# Round-3 coverage wave 15: null-semantics joins and complex-type
# aggregation.
#
# - ``null_safe_prop_pairs``: a join whose condition uses NULL-SAFE
#   equality (``<=>`` / ``IS NOT DISTINCT FROM``) on a nullable
#   JSON-extracted property: two events of one user pair up when their
#   property values are equal *or both missing* -- semantics a plain
#   equi-join silently drops (NULL = NULL is never true).  The join still
#   hash-partitions on the non-nullable ``user_id`` key, so the null-safe
#   predicate rides an ordinary shuffle join, not a cartesian.
# - ``event_props_map``: per-user map-shaped aggregation
#   (event_type -> count) rendered canonically: sorted struct array ->
#   joined string, so map iteration order can never flip the result
#   hash.  The standard "build a feature map per entity" shape, with the
#   determinism handled explicitly.
#
# Reference parity note: the reference has neither NULL-aware join
# semantics nor complex types; this wave belongs to the engine-semantics
# extension surface alongside SURVEY.md section 2.
# =========================================================================

@_register(
    "null_safe_prop_pairs",
    """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_pairs
FROM ev a JOIN ev b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND a.k IS NOT DISTINCT FROM b.k
GROUP BY a.event_type, b.event_type""",
    ref="extension: null-safe equality join (<=> / IS NOT DISTINCT "
    "FROM) on a nullable JSON property; both-missing pairs match, "
    "which a plain equi-join drops",
)
def q_null_safe_prop_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    a, b = ev.alias("a"), ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & F.col("a.k").eqNullSafe(F.col("b.k")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
    )


@_register(
    "event_props_map",
    """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events WHERE event_type IS NOT NULL GROUP BY user_id, event_type
)
SELECT user_id,
       string_agg(event_type || ':' || n, ',' ORDER BY event_type)
         AS type_counts
FROM counts GROUP BY user_id""",
    ref="extension: per-entity map-shaped aggregation "
    "(event_type -> count) with canonical sorted rendering, so map "
    "iteration order cannot flip the hash",
)
def q_event_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a NULL event type has no map key: Spark's concat_ws would render
    # it as a bare count while DuckDB's string_agg silently drops the
    # NULL concat (dirty-events contract) -- exclude on both sides
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    return counts.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("event_type", "n"))),
                lambda s: F.concat_ws(":", s["event_type"], s["n"].cast("string")),
            ),
            ",",
        ).alias("type_counts")
    )


# =========================================================================
# wave 23
# Round-3 coverage wave 23: data-engineering utility operators.
#
# - ``table_checksum_orders``: order-independent content fingerprint of a
#   table -- per-row md5 over a canonical integer/string rendering,
#   summed in DECIMAL(38) (associative, no overflow out to ~1e12 rows)
#   and reduced mod 2^61-1.  The way you verify a 100 TB copy/migration
#   without sorting anything: one narrow scan, one scalar.
# - ``weighted_median_price``: exact weighted median per group with the
#   weight-CDF crossing rule.  Pre-aggregated to distinct values first so
#   the cumulative window is over the (group, value) grain -- both
#   smaller and deterministic under ties.
# - ``last_touch_attribution``: marketing-style last-touch -- every
#   purchase attributed to the user's latest preceding click within 24 h.
#   One user-partitioned ordered window; the conditional
#   ``last(..., ignorenulls)`` running value IS the as-of lookup, no
#   self-join.
# - ``python_datasource_range``: PySpark 4 custom Python DataSource
#   (``spark.dataSource.register``) -- a partitioned deterministic
#   synthetic source (LCG-derived columns) aggregated per page.  The
#   oracle replays the same integer recurrence over ``range()``, so the
#   whole custom-connector read path is value-hash-verified.
#
# Reference parity note: S-family source/sink breadth (SURVEY.md
# section 2.1) extended with the Python DataSource API; the checksum is
# the migration-validation counterpart of the KV sink round-trips.
# =========================================================================

_MERSENNE61 = (1 << 61) - 1


@_register(
    "table_checksum_orders",
    f"""
WITH rows_c AS (
  SELECT concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
                   epoch_us(o_orderdate), o_orderpriority) AS row_str
  FROM orders
),
h AS (
  SELECT ('0x' || substr(md5(row_str), 1, 15))::BIGINT AS hv FROM rows_c
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(hv) % {_MERSENNE61} AS BIGINT) AS checksum
FROM h""",
    ref="extension: order-independent table content checksum (canonical "
    "int/string row rendering -> 60-bit md5 -> associative DECIMAL(38) "
    "sum mod 2^61-1); verifies a copy at any scale with one scan",
)
def q_table_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"),
        F.unix_micros(F.col("o_orderdate")),
        F.col("o_orderpriority"),
    )
    hv = hash60(row_str)
    return (
        o.select(hv.alias("hv"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("hv").cast("decimal(38,0)")).alias("s"),
        )
        .select(
            "n_rows",
            F.expr(f"CAST(s % {_MERSENNE61} AS BIGINT)").alias("checksum"),
        )
    )


@_register(
    "weighted_median_price",
    """
WITH v AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT flag, price_c, qty,
         sum(qty) OVER (PARTITION BY flag ORDER BY price_c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         sum(qty) OVER (PARTITION BY flag) AS tw
  FROM v
)
SELECT flag,
       CAST(min(CASE WHEN 2 * cw >= tw THEN price_c END) AS BIGINT)
         AS weighted_median_c,
       CAST(min(tw) AS BIGINT) AS total_qty
FROM cum GROUP BY flag""",
    ref="extension: exact weighted median per group (weight-CDF crossing "
    "over the pre-aggregated distinct-value grain -- deterministic "
    "under ties, cumulative window carries values not rows)",
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_c"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint").alias("q"),
    )
    v = li.groupBy("flag", "price_c").agg(F.sum("q").alias("qty"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = v.select(
        "flag",
        "price_c",
        F.sum("qty").over(w_cum).alias("cw"),
        F.sum("qty").over(Window.partitionBy("flag")).alias("tw"),
    )
    return cum.groupBy("flag").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_c")))
        .cast("bigint")
        .alias("weighted_median_c"),
        F.min("tw").alias("total_qty"),
    )


@_register(
    "last_touch_attribution",
    """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
  FROM events
),
w AS (
  SELECT event_id, user_id, event_type, ts_us,
         last_value(CASE WHEN event_type = 'click' THEN ts_us END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS click_ts_us,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS click_event_id
  FROM ev
)
SELECT event_id AS purchase_event_id, user_id, click_event_id,
       CAST((ts_us - click_ts_us) // 1000000 AS BIGINT) AS gap_s
FROM w
WHERE event_type = 'purchase' AND click_ts_us IS NOT NULL
  AND ts_us - click_ts_us <= 86400000000""",
    ref="extension: last-touch attribution (each purchase -> latest "
    "preceding click within 24 h) -- the conditional ignorenulls "
    "running last over one user-ordered window IS the as-of lookup, "
    "no self-join, one shuffle",
)
def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts_us"))
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    marked = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.last(click_ts, ignorenulls=True).over(w).alias("click_ts_us"),
        F.last(click_id, ignorenulls=True).over(w).alias("click_event_id"),
    )
    return marked.filter(
        (F.col("event_type") == "purchase")
        & F.col("click_ts_us").isNotNull()
        & (F.col("ts_us") - F.col("click_ts_us") <= 86400000000)
    ).select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        "click_event_id",
        F.expr("(ts_us - click_ts_us) div 1000000").alias("gap_s"),
    )


# ---------------------------------------------------------------------------
# PySpark 4 custom Python DataSource
# ---------------------------------------------------------------------------

_PYDS_N = 50000
_PYDS_PARTS = 8


@_register(
    "python_datasource_range",
    f"""
WITH r AS (SELECT i FROM range({_PYDS_N}) t(i)),
d AS (
  SELECT CAST((i * 2654435761) % 7 AS INT) AS page,
         (i * 40503 + 17) % 1000003 AS score
  FROM r
)
SELECT page, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(score) AS BIGINT) AS score_sum
FROM d GROUP BY page""",
    ref="extension: PySpark 4 custom Python DataSource "
    "(spark.dataSource.register) -- partitioned deterministic synthetic "
    "reader; oracle replays the identical LCG over range(), verifying "
    "the whole custom-connector read path by value hash",
)
def q_python_datasource_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    # classes defined in the closure so cloudpickle ships them by value
    # to the worker (no package on the executor path required)
    class SynthReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", _PYDS_N))
            self.parts = int(options.get("parts", _PYDS_PARTS))

        def partitions(self):
            step = (self.n + self.parts - 1) // self.parts
            return [
                InputPartition((lo, min(lo + step, self.n)))
                for lo in range(0, self.n, step)
            ]

        def read(self, partition):
            lo, hi = partition.value
            for i in range(lo, hi):
                yield (i, (i * 2654435761) % 7, (i * 40503 + 17) % 1000003)

    class SynthDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synth_range"

        def schema(self):
            return "i bigint, page int, score bigint"

        def reader(self, schema):
            return SynthReader(self.options)

    spark.dataSource.register(SynthDataSource)
    df = (
        spark.read.format("synth_range")
        .option("n", str(_PYDS_N))
        .option("parts", str(_PYDS_PARTS))
        .load()
    )
    return df.groupBy("page").agg(
        F.count("*").alias("n"), F.sum("score").alias("score_sum")
    )


# =========================================================================
# wave 45
# Round-3 coverage wave 45: Spark 4 VariantType and session path
# mining.
#
# - ``props_variant_deciles``: the semi-structured ``props`` column
#   ingested through Spark 4's VariantType (``parse_json`` ->
#   ``variant_get``) instead of per-access string parsing --
#   variant decodes the JSON once into a binary form that repeated path
#   accesses read without re-parsing, the semi-structured analog of
#   columnar pushdown.  The query itself is a decile histogram of the
#   extracted integer.
# - ``session_path_top10``: top opening event-type paths (first three
#   events) per 30-minute-gap session -- the product-analytics "how do
#   sessions start" query, one step beyond pairwise transition counts.
#   Ties in event time resolve by event id, so paths are deterministic.
# =========================================================================

@_register(
    "props_variant_deciles",
    """
SELECT CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                -- TRY_CAST: valid JSON with a non-numeric string $.k
                -- passes json_valid; CAST would raise in DuckDB while
                -- Spark try_variant_get yields NULL (round-6 advice)
                THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
           END // 10 AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1""",
    ref="extension: VariantType ingestion (parse_json -> variant_get) "
    "of the semi-structured props column; decile histogram of the "
    "extracted integer",
)
def q_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json: a malformed props row must land in the NULL
    # decile, not kill the scan (parse_json is FAILFAST; one bad row in
    # a trillion would abort the job -- dirty-events contract).
    # try_variant_get: $.k holding a non-numeric STRING is valid JSON,
    # and plain variant_get throws on the failed bigint cast -- same
    # one-bad-row-kills-the-job failure mode (round-6 advice)
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select(k.alias("k"))
        .select(F.expr("k div 10").cast("bigint").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_SESS_CTE = """
WITH flagged AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, event_type, us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS session
  FROM flagged
),
rk AS (
  SELECT user_id, session, event_type,
         row_number() OVER (PARTITION BY user_id, session
                            ORDER BY us, event_id) AS rn
  FROM sess
),
paths AS (
  SELECT user_id, session, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM rk WHERE rn <= 3 GROUP BY 1, 2
)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM paths GROUP BY 1 ORDER BY n DESC, path LIMIT 10"""


@_register(
    "session_path_top10",
    _SESS_CTE,
    ref="extension: session opening-path mining -- 30-min gaps-and-"
    "islands sessionization, first-3 event-type path per session, "
    "corpus top-10; same session CTE family as session_window",
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts events have no session position (dirty-events contract)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
        )
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        F.expr(
            "CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)"
            " IS NULL OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us,"
            " event_id) >= 1800000000 THEN 1 ELSE 0 END"
        ).alias("new_s"),
    )
    sess = flagged.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        F.expr(
            "sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id)"
        ).alias("session"),
    )
    rk = sess.select(
        "user_id",
        "session",
        "event_type",
        F.expr(
            "row_number() OVER (PARTITION BY user_id, session"
            " ORDER BY us, event_id)"
        ).alias("rn"),
    ).filter(F.col("rn") <= 3)
    paths = rk.groupBy("user_id", "session").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


# =========================================================================
# wave 54
# Round-3 coverage wave 54: schema discovery and drift monitoring.
#
# - ``fd_violation_audit``: functional-dependency checking -- for each
#   claimed FD, how many left-hand-side groups map to more than one
#   right-hand-side value.  The profiling query behind schema discovery
#   and constraint validation: ``o_orderkey -> o_custkey`` must hold (a
#   key), ``c_nationkey -> c_mktsegment`` must not (a genuine
#   many-to-many).  One count-distinct aggregate per FD.
# - ``embedding_drift_l1``: distribution drift between two halves of the
#   embedding corpus (even vs odd ids standing in for old vs new
#   snapshots) -- L1 distance between their vector-norm histograms in
#   truncating permyriad proportions.  The monitoring metric that says
#   "the new embedding batch does not look like the old one" before it
#   poisons an index; norms via IEEE sqrt (correctly rounded, so both
#   engines quantize identically).
# =========================================================================

_FDS = (
    ("orders", "o_orderkey", "o_custkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
)


def _fd_sql() -> str:
    return " UNION ALL ".join(
        f"""
SELECT '{t}.{l}->{r}' AS fd,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating
FROM (SELECT {l}, count(DISTINCT {r}) AS nr FROM {t} GROUP BY {l})"""
        for t, l, r in _FDS
    )


@_register(
    "fd_violation_audit",
    _fd_sql(),
    ref="extension: functional-dependency violation audit -- LHS groups "
    "with >1 distinct RHS per claimed FD; schema-discovery profiling",
)
def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for t, l, r in _FDS:
        df = load_table(spark, sf_dir, t)
        g = df.groupBy(l).agg(F.count_distinct(F.col(r)).alias("nr"))
        outs.append(
            g.agg(
                F.lit(f"{t}.{l}->{r}").alias("fd"),
                F.count(F.lit(1)).alias("n_lhs"),
                F.sum(F.when(F.col("nr") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@_register(
    "embedding_drift_l1",
    """
WITH norms AS (
  SELECT vec_id % 2 AS half,
         CAST(floor(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                          CAST(embedding AS DOUBLE[])))
                    * 1000 + 0.5) AS BIGINT) // 100 AS bucket
  FROM embeddings
),
h AS (
  SELECT bucket,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS p,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS q
  FROM norms GROUP BY 1
),
tot AS (SELECT sum(p) AS np, sum(q) AS nq FROM h)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(abs(p * 10000 // np - q * 10000 // nq)) AS BIGINT)
         AS drift_permyriad
FROM h, tot""",
    ref="extension: embedding-distribution drift (L1 distance of "
    "norm-bucket histograms between corpus halves, truncating permyriad "
    "proportions) -- index-poisoning monitor",
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("embedding"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norms = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        F.floor(F.sqrt(dot) * 1000 + F.lit(0.5)).cast("bigint").alias("nmilli"),
    ).select("half", F.expr("nmilli div 100").alias("bucket"))
    h = norms.groupBy("bucket").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("p"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("q"),
    )
    tot = h.agg(F.sum("p").alias("np"), F.sum("q").alias("nq"))
    return h.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.expr("abs(p * 10000 div np - q * 10000 div nq)"))
        .cast("bigint")
        .alias("drift_permyriad"),
    )


# =========================================================================
# wave 64
# Round-3 coverage wave 64: deletion impact and schema evolution.
#
# - ``gdpr_delete_impact``: the right-to-be-forgotten impact report --
#   given a subject set (user/customer keys = 0 mod 97), how many rows
#   each table loses, including the two-hop cascade (customer -> orders
#   -> lineitem).  The query every deletion pipeline runs BEFORE
#   executing, and the shape is all semi-join counts -- no data moves.
# - ``schema_evolution_roundtrip``: parquet schema evolution -- two file
#   generations (v1 without ``lang``, v2 with it) written to one dataset,
#   read back with ``mergeSchema``; the query proves the merged read
#   reconciles (v1 rows surface with NULL lang, totals add up).  The
#   lakehouse capability that lets a 100 TB table grow columns without
#   rewriting history.
# =========================================================================

_MOD = 97


@_register(
    "gdpr_delete_impact",
    f"""
SELECT 'customer' AS table_name,
       CAST((SELECT count(*) FROM customer WHERE c_custkey % {_MOD} = 0)
            AS BIGINT) AS n_rows
UNION ALL
SELECT 'orders',
       CAST((SELECT count(*) FROM orders WHERE o_custkey % {_MOD} = 0)
            AS BIGINT)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT count(*) FROM lineitem l
             WHERE EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey
                             AND o.o_custkey % {_MOD} = 0)) AS BIGINT)
UNION ALL
SELECT 'events',
       CAST((SELECT count(*) FROM events WHERE user_id % {_MOD} = 0)
            AS BIGINT)""",
    ref="extension: GDPR deletion impact report -- subject-keyed "
    "semi-join counts incl. the customer -> orders -> lineitem cascade; "
    "runs before any delete executes",
)
def q_gdpr_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    doomed_orders = orders.filter(F.col("o_custkey") % _MOD == 0).select(
        "o_orderkey"
    )
    counts = [
        ("customer", cust.filter(F.col("c_custkey") % _MOD == 0)),
        ("orders", orders.filter(F.col("o_custkey") % _MOD == 0)),
        (
            "lineitem",
            li.join(
                doomed_orders, li.l_orderkey == doomed_orders.o_orderkey,
                "left_semi",
            ),
        ),
        ("events", ev.filter(F.col("user_id") % _MOD == 0)),
    ]
    outs = [
        df.agg(F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n_rows"))
        for name, df in counts
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@_register(
    "schema_evolution_roundtrip",
    """
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_v1_null_lang,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_v2_with_lang
FROM documents""",
    ref="extension: parquet schema evolution -- v1 files (no lang) + v2 "
    "files (with lang) in one dataset, mergeSchema read; the oracle is "
    "the reconciliation spec (v1 rows NULL out the new column)",
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="sparkgraft_evo_")
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source").write.mode(
        "overwrite"
    ).parquet(f"{out}/gen=v1")
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", "lang"
    ).write.mode("overwrite").parquet(f"{out}/gen=v2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/gen=v1", f"{out}/gen=v2"
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("lang").isNull().cast("bigint")).alias("n_v1_null_lang"),
        F.sum(F.col("lang").isNotNull().cast("bigint")).alias("n_v2_with_lang"),
    )


# =========================================================================
# wave 78
# Round-3 coverage wave 78: fixed-width ingest, bag set-ops, and the
# training-mix interleave schedule.
#
# - ``fixed_width_roundtrip``: the legacy mainframe-style source -- orders
#   rendered as fixed-width text records (zero-padded key, one-char
#   status, 14-digit cent amount, ISO date at fixed offsets), written
#   through the text sink, read back and parsed with pure ``substring`` +
#   cast expressions, then aggregated.  The oracle aggregates the source
#   table directly: a lossless round-trip must reproduce it.  Render and
#   parse are both map-only, codegen-friendly expression chains -- no
#   UDFs.
# - ``orders_except_all``: multiset (bag) set-difference coverage --
#   ``EXCEPT ALL`` between the open-order and fulfilled-order customer
#   key bags: a customer with 5 open and 2 fulfilled orders survives 3
#   times.  Spark's ``exceptAll`` and DuckDB's ``EXCEPT ALL`` share
#   semantics; the result is re-aggregated per customer so the output is
#   order-insensitive.  (``acctbal_except`` covers the DISTINCT variant;
#   this is the bag variant the reference's set ops lack.)
# - ``interleave_schedule``: the deterministic round-robin data-mixing
#   schedule a multi-source training run consumes -- per-source rank
#   (window partitioned BY SOURCE, so it scales with per-source
#   parallelism), source index from the tiny sorted source dimension
#   (broadcast), position = (rank-1) * n_sources + source_index.
#   Consecutive positions cycle through sources, the standard
#   interleaving that keeps any batch window source-balanced.
#
# Scale: all map-only or source-partitioned windows; the only global
# object is the source dimension (a handful of rows, broadcast).
# =========================================================================

@_register(
    "fixed_width_roundtrip",
    """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_c
FROM orders GROUP BY 1""",
    ref="S1/S5 analogue: fixed-width text record sink + source "
    "round-trip -- substring-offset parsing, no delimiters; oracle is "
    "the direct aggregate (round-trip must be lossless)",
)
def q_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    # layout: [0:12) orderkey zero-padded | [12:13) status |
    #         [13:27) cents zero-padded   | [27:37) ISO date
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.col("o_orderstatus"),
        F.lpad(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").cast(
                "string"
            ),
            14,
            "0",
        ),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd"),
    )
    out = tempfile.mkdtemp(prefix="sparkgraft_fw_")
    o.select(line.alias("value")).write.mode("overwrite").text(out)
    back = spark.read.text(out).select(
        F.substring("value", 1, 12).cast("bigint").alias("o_orderkey"),
        F.substring("value", 13, 1).alias("o_orderstatus"),
        F.substring("value", 14, 14).cast("bigint").alias("cents"),
        F.substring("value", 28, 10).alias("o_orderdate"),
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("bigint").alias("total_c"),
    )


@_register(
    "orders_except_all",
    """
WITH diff AS (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_surviving
FROM diff GROUP BY 1""",
    ref="extension: bag-semantics EXCEPT ALL over customer order "
    "multisets (multiplicity-aware; DISTINCT variant is "
    "acctbal_except)",
)
def q_orders_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        open_keys.exceptAll(done_keys)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_surviving"))
    )


@_register(
    "interleave_schedule",
    """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
  FROM documents
), src AS (
  SELECT source,
         row_number() OVER (ORDER BY source) - 1 AS src_idx,
         count(*) OVER () AS n_sources
  FROM (SELECT DISTINCT source FROM documents)
)
SELECT r.doc_id, r.source,
       CAST((r.rk - 1) * s.n_sources + s.src_idx AS BIGINT) AS pos
FROM ranked r JOIN src s ON r.source = s.source""",
    ref="extension: deterministic round-robin source interleave for "
    "multi-source training mixes -- source-partitioned ranks + "
    "broadcast source dimension",
)
def q_interleave_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ranked = docs.withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("source").orderBy("doc_id")),
    )
    src = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (F.row_number().over(Window.orderBy("source")) - 1).alias(
                "src_idx"
            ),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n_sources"),
        )
    )
    return ranked.join(F.broadcast(src), "source").select(
        "doc_id",
        "source",
        ((F.col("rk") - 1) * F.col("n_sources") + F.col("src_idx"))
        .cast("bigint")
        .alias("pos"),
    )


# =========================================================================
# wave 83
# Round-3 coverage wave 83: dynamic-partition-overwrite sink,
# correlation matrix, overdispersion gauge.
#
# - ``dynamic_partition_overwrite``: the lakehouse backfill write path --
#   events land in a day-partitioned parquet table, then ONE day is
#   re-written (values doubled, simulating a late correction) with
#   ``partitionOverwriteMode=dynamic``: only the touched partition is
#   replaced, every other partition's files are left untouched (verified
#   by re-reading the whole table).  The static default would TRUNCATE
#   the table first -- dynamic mode is the difference between a backfill
#   and a data-loss incident.  The oracle computes what the corrected
#   table must aggregate to.  Read-back goes through the partition-
#   pruned directory layout (day is a partition column, not a data
#   column).
# - ``event_type_corr_matrix``: pairwise Pearson correlation matrix of
#   the five event types' daily counts -- the co-movement panel behind
#   anomaly triage ("errors spike with clicks?").  Daily counts first
#   (one shuffle, ~150 rows at any SF -- the day dimension is calendar-
#   bounded), then a 10-pair self-join on day and five DECIMAL(38) power
#   sums per pair; one final double ratio rounded to 4 decimals (the
#   ``acf1_daily_value`` convention).
# - ``value_overdispersion``: variance-to-mean ratio (Fisher dispersion
#   index) of value cents per event type -- the gauge that tells you a
#   count/value stream is NOT Poisson-like before you model it as one
#   (VMR >> 1 means bursty/fat-tailed; the companion diagnostic to
#   ``event_anomalies``).  Sufficient stats only: n, sum(x), sum(x^2) in
#   DECIMAL(38) (exact out to ~1e12 rows, the stress-found convention
#   from ``segment_trend_slope``), VMR in permyriad via one final
#   integer-widened division.
#
# Scale: the sink writes per-partition files (the same layout a
# 1000-executor job produces); corr and VMR shrink to calendar/type
# dimensions before any quadratic or pairwise step.
# =========================================================================

@_register(
    "dynamic_partition_overwrite",
    """
WITH corrected AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CASE WHEN CAST(ts AS DATE) = DATE '2024-01-01'
              THEN CAST(floor(value * 100 + 0.5) AS BIGINT) * 2
              ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS v_c
  FROM events
)
SELECT day, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(v_c) AS BIGINT) AS sum_c
FROM corrected GROUP BY day""",
    ref="extension: partitionOverwriteMode=dynamic backfill -- rewrite "
    "one day partition in a day-partitioned parquet table without "
    "touching the others; oracle is the corrected table's aggregate",
)
def q_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").cast("string").alias("day"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
    )
    path = tempfile.mkdtemp(prefix="sparkgraft_dpo_")
    ev.write.mode("overwrite").partitionBy("day").parquet(path)

    # backfill: double 2024-01-01's values; dynamic mode replaces ONLY
    # that partition (static mode would truncate the whole table)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        ev.filter(F.col("day") == "2024-01-01").withColumn(
            "v_c", F.col("v_c") * 2
        ).write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = spark.read.parquet(path)
    return back.groupBy(F.col("day").cast("string").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("v_c").cast("bigint").alias("sum_c"),
    )


@_register(
    "event_type_corr_matrix",
    """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(a.n AS HUGEINT) AS x, CAST(b.n AS HUGEINT) AS y
  FROM daily a JOIN daily b
    ON a.day = b.day AND a.event_type < b.event_type
), sums AS (
  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_days,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT type_a, type_b, n_days,
       floor(CAST(n_days * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
                    * CAST(n_days * syy - sy * sy AS DOUBLE))
             * 10000 + 0.5) / 10000.0 AS r
FROM sums""",
    ref="extension: pairwise Pearson matrix of per-type daily counts -- "
    "calendar-bounded daily table, 10-pair self-join, DECIMAL(38) "
    "power sums, one final double ratio (acf1_daily_value convention)",
)
def q_event_type_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    a, b = daily.alias("a"), daily.alias("b")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pairs = a.join(
        b,
        (F.col("a.day") == F.col("b.day"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.n").cast("decimal(38,0)").alias("x"),
        F.col("b.n").cast("decimal(38,0)").alias("y"),
    )
    sums = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    num = (
        F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double")
    den = F.sqrt(
        (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        * (F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return sums.select(
        "type_a",
        "type_b",
        "n_days",
        (F.floor(num / den * 10000 + F.lit(0.5)) / 10000.0).alias("r"),
    )


@_register(
    "value_overdispersion",
    """
WITH s AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT)
           AS sx,
         sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT)
             * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sxx
  FROM events GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       CAST(sx // n AS BIGINT) AS mean_c,
       CAST((n * sxx - sx * sx) * 10000 // (n * n * (sx // n))
            AS BIGINT) AS vmr_pm
FROM s""",
    ref="extension: Fisher variance-to-mean dispersion index per event "
    "type -- DECIMAL(38)/HUGEINT sufficient stats (n, sum, sum-of-"
    "squares), permyriad VMR; burstiness gauge next to event_anomalies",
)
def q_value_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("v_c")).alias("sx"),
        F.sum(dec("v_c") * dec("v_c")).alias("sxx"),
    )
    # mean first (integer), then the widened VMR division -- matching
    # the oracle's expression shape exactly
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.expr("CAST(sx div n AS BIGINT)").alias("mean_c"),
        F.expr(
            "CAST((n * sxx - sx * sx) * 10000"
            " div (n * n * (sx div n)) AS BIGINT)"
        ).alias("vmr_pm"),
    )


# =========================================================================
# round-4 layout audit
#
# ``zonemap_pruning_audit``: quantifies what parquet row-group zone
# maps (min/max statistics) would prune for time-range predicates under
# two physical layouts -- files range-partitioned by insertion key
# (l_orderkey: what an append-only ingest produces) vs range-partitioned
# by l_shipdate (sort/cluster-on-write).  Each layout assigns rows to
# ~4096-row "files" by VALUE RANGE -- fid = (key - min) * n_files div
# span -- a pure projection expression, so the audit itself needs no
# global sort (an earlier row_number() formulation was a single-
# partition sort and measured 6.9x at 10x rows; this one is linear).
# Per-file min/max epoch micros form the zone map; an 8-slice predicate
# grid over the observed span counts prunable files (max < lo OR
# min >= hi) per layout, alongside the true selected-row count.  The
# point at 100 TB: scan pruning is a LAYOUT property -- the same
# predicate prunes ~0% of ingest-ordered files and ~(7/8) of
# date-clustered ones, the quantitative case for sort-on-write.  The
# fid products are DECIMAL(38)/HUGEINT (key-range x file-count
# overflows int64 at petabyte scale); all boundaries are exact
# truncating divisions.
# =========================================================================


@_register(
    "zonemap_pruning_audit",
    """
WITH base AS (
  SELECT epoch_us(l_shipdate) AS t_us, l_orderkey AS ok
  FROM lineitem
), bounds AS (
  SELECT min(t_us) AS mn, max(t_us) - min(t_us) + 1 AS span,
         min(ok) AS ok_mn, max(ok) - min(ok) + 1 AS ok_span,
         greatest(count(*) // 4096, 1) AS n_files
  FROM base
), fids AS (
  SELECT t_us,
         CAST((CAST(ok - ok_mn AS HUGEINT) * n_files) // ok_span
              AS BIGINT) AS fid_nat,
         CAST((CAST(t_us - mn AS HUGEINT) * n_files) // span
              AS BIGINT) AS fid_clu
  FROM base, bounds
), slices AS (
  SELECT i,
         mn + (span * i) // 8 AS lo,
         mn + (span * (i + 1)) // 8 AS hi
  FROM (SELECT unnest(range(8)) AS i), bounds
), zm_nat AS (
  SELECT fid_nat AS fid, min(t_us) AS f_min, max(t_us) AS f_max
  FROM fids GROUP BY 1
), zm_clu AS (
  SELECT fid_clu AS fid, min(t_us) AS f_min, max(t_us) AS f_max
  FROM fids GROUP BY 1
), pr_nat AS (
  SELECT s.i, count(*) AS files_total,
         count(*) FILTER (WHERE z.f_max < s.lo OR z.f_min >= s.hi)
           AS pruned_natural
  FROM slices s CROSS JOIN zm_nat z GROUP BY 1
), pr_clu AS (
  SELECT s.i, count(*) AS files_total_clu,
         count(*) FILTER (WHERE z.f_max < s.lo OR z.f_min >= s.hi)
           AS pruned_clustered
  FROM slices s CROSS JOIN zm_clu z GROUP BY 1
), sel AS (
  SELECT s.i, count(*) FILTER (WHERE b.t_us >= s.lo AND b.t_us < s.hi)
           AS rows_selected
  FROM slices s CROSS JOIN base b GROUP BY 1
)
SELECT CAST(pr_nat.i AS BIGINT) AS slice_id,
       CAST(files_total AS BIGINT) AS files_total,
       CAST(pruned_natural AS BIGINT) AS pruned_natural,
       CAST(files_total_clu AS BIGINT) AS files_total_clustered,
       CAST(pruned_clustered AS BIGINT) AS pruned_clustered,
       CAST(rows_selected AS BIGINT) AS rows_selected
FROM pr_nat JOIN pr_clu USING (i) JOIN sel USING (i)""",
    ref="extension: zone-map (row-group min/max) pruning audit under "
    "ingest-key-range vs shipdate-range file layout, 8-slice predicate "
    "grid -- pure-projection file assignment (no global sort), the "
    "quantitative case for sort-on-write at scan-pruning scale",
)
def q_zonemap_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.unix_micros("l_shipdate").alias("t_us"),
        F.col("l_orderkey").alias("ok"),
    )
    bounds = base.agg(
        F.min("t_us").alias("mn"),
        (F.max("t_us") - F.min("t_us") + 1).alias("span"),
        F.min("ok").alias("ok_mn"),
        (F.max("ok") - F.min("ok") + 1).alias("ok_span"),
        F.expr("greatest(count(*) div 4096, 1)").alias("n_files"),
    )
    fids = base.crossJoin(F.broadcast(bounds)).select(
        "t_us",
        F.expr(
            "CAST((CAST(ok - ok_mn AS DECIMAL(38,0)) * n_files)"
            " div ok_span AS BIGINT)"
        ).alias("fid_nat"),
        F.expr(
            "CAST((CAST(t_us - mn AS DECIMAL(38,0)) * n_files)"
            " div span AS BIGINT)"
        ).alias("fid_clu"),
    )
    slices = (
        spark.range(8)
        .select(F.col("id").alias("i"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "i",
            F.expr("mn + (span * i) div 8").alias("lo"),
            F.expr("mn + (span * (i + 1)) div 8").alias("hi"),
        )
    )

    def _zonemap(fid_col: str) -> DataFrame:
        return fids.groupBy(F.col(fid_col).alias("fid")).agg(
            F.min("t_us").alias("f_min"), F.max("t_us").alias("f_max")
        )

    def _pruned(zm: DataFrame, total: str, out: str) -> DataFrame:
        return (
            slices.crossJoin(zm)
            .groupBy("i")
            .agg(
                F.count(F.lit(1)).alias(total),
                F.count(
                    F.when(
                        (F.col("f_max") < F.col("lo"))
                        | (F.col("f_min") >= F.col("hi")),
                        1,
                    )
                ).alias(out),
            )
        )

    pr_nat = _pruned(_zonemap("fid_nat"), "files_total", "pruned_natural")
    pr_clu = _pruned(
        _zonemap("fid_clu"), "files_total_clustered", "pruned_clustered"
    )
    sel = (
        base.crossJoin(F.broadcast(slices))
        .groupBy("i")
        .agg(
            F.count(
                F.when(
                    (F.col("t_us") >= F.col("lo"))
                    & (F.col("t_us") < F.col("hi")),
                    1,
                )
            ).alias("rows_selected")
        )
    )
    return (
        pr_nat.join(pr_clu, "i")
        .join(sel, "i")
        .select(
            F.col("i").cast("bigint").alias("slice_id"),
            F.col("files_total").cast("bigint").alias("files_total"),
            F.col("pruned_natural").cast("bigint").alias("pruned_natural"),
            F.col("files_total_clustered")
            .cast("bigint")
            .alias("files_total_clustered"),
            F.col("pruned_clustered").cast("bigint").alias(
                "pruned_clustered"
            ),
            F.col("rows_selected").cast("bigint").alias("rows_selected"),
        )
    )


# round-4: shard-rebalance audit.  Growing a hash-sharded store from 16
# to 17 shards moves ~16/17 of all keys under modulo placement but only
# ~1/17 under rendezvous (highest-random-weight) placement -- THE
# operational argument for consistent placement at 100 TB, quantified
# on the actual key population.  Placement = arg_max over shards of
# hash60(key || ':' || shard) (the cross-engine md5-prefix hash), so
# both engines compute identical placements; the audit is one
# 16+17-way explode + two max_by aggregates per key -- linear, no
# shuffle wider than the key aggregate.

_RDVZ_N_OLD = 16
_RDVZ_N_NEW = 17


def _rendezvous_sql() -> str:
    from mapreduce6240project_spark.functions.hashing import hash60_sql

    h = hash60_sql("CAST(o_custkey AS VARCHAR) || ':' || CAST(s AS VARCHAR)")
    return f"""
WITH keys AS (SELECT DISTINCT o_custkey FROM orders),
pl AS (
  SELECT o_custkey,
         arg_max(s, {h})
           FILTER (WHERE s < {_RDVZ_N_OLD}) AS rdvz_old,
         arg_max(s, {h}) AS rdvz_new
  FROM keys, (SELECT unnest(range({_RDVZ_N_NEW})) AS s) shards
  GROUP BY 1
), fl AS (
  SELECT k.o_custkey,
         k.o_custkey % {_RDVZ_N_OLD} AS mod_old,
         k.o_custkey % {_RDVZ_N_NEW} AS mod_new,
         pl.rdvz_old, pl.rdvz_new
  FROM keys k JOIN pl USING (o_custkey)
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(count(*) FILTER (WHERE mod_old <> mod_new) AS BIGINT)
         AS moved_mod,
       CAST(count(*) FILTER (WHERE rdvz_old <> rdvz_new) AS BIGINT)
         AS moved_rendezvous,
       CAST(10000 * count(*) FILTER (WHERE mod_old <> mod_new)
            // count(*) AS BIGINT) AS moved_mod_permyriad,
       CAST(10000 * count(*) FILTER (WHERE rdvz_old <> rdvz_new)
            // count(*) AS BIGINT) AS moved_rendezvous_permyriad
FROM fl"""


@_register(
    "shard_rebalance_audit",
    _rendezvous_sql(),
    ref="extension: 16->17 shard-growth rebalance audit, modulo vs "
    "rendezvous (HRW) placement via the cross-engine md5-prefix hash "
    "-- quantifies the ~16/17 vs ~1/17 key movement on the real key "
    "population",
)
def q_shard_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.functions.hashing import hash60

    keys = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    shards = spark.range(_RDVZ_N_NEW).select(F.col("id").alias("s"))
    h = hash60(
        F.concat(
            F.col("o_custkey").cast("string"),
            F.lit(":"),
            F.col("s").cast("string"),
        )
    )
    pl = (
        keys.crossJoin(F.broadcast(shards))
        .select("o_custkey", "s", h.alias("hv"))
        .groupBy("o_custkey")
        .agg(
            F.expr(
                f"max_by(s, CASE WHEN s < {_RDVZ_N_OLD} THEN hv END)"
            ).alias("rdvz_old"),
            F.expr("max_by(s, hv)").alias("rdvz_new"),
        )
    )
    fl = pl.select(
        "o_custkey",
        (F.col("o_custkey") % _RDVZ_N_OLD).alias("mod_old"),
        (F.col("o_custkey") % _RDVZ_N_NEW).alias("mod_new"),
        "rdvz_old",
        "rdvz_new",
    )
    return fl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.count(F.when(F.col("mod_old") != F.col("mod_new"), 1))
        .cast("bigint")
        .alias("moved_mod"),
        F.count(F.when(F.col("rdvz_old") != F.col("rdvz_new"), 1))
        .cast("bigint")
        .alias("moved_rendezvous"),
        F.expr(
            "10000 * count(CASE WHEN mod_old <> mod_new THEN 1 END)"
            " div count(*)"
        )
        .cast("bigint")
        .alias("moved_mod_permyriad"),
        F.expr(
            "10000 * count(CASE WHEN rdvz_old <> rdvz_new THEN 1 END)"
            " div count(*)"
        )
        .cast("bigint")
        .alias("moved_rendezvous_permyriad"),
    )


# =========================================================================
# round 5: leakage-free feature encoding and physical-encoding advice.
#
# - ``oof_target_encode``: out-of-fold target (mean) encoding -- the
#   leakage-free categorical encoder: each (event_type, fold) cell's
#   encoding is the mean event value computed from the OTHER four
#   folds only, so no row's target leaks into its own feature.  Exact
#   integer micro arithmetic: per-cell cent sums/counts, one tiny
#   grouped fold, encoding = (total - own_fold) scaled before one
#   division.  Two keyed aggregates over projections; the per-type
#   totals join is enum-bounded (|event_type| rows, broadcast).
# - ``encoding_advisor``: per-column physical-encoding advice for the
#   lineitem flag/status/quantity columns: distinct count (dictionary
#   viability) and run count under the table's natural sort order
#   (l_orderkey, l_linenumber) for RLE viability.  Runs are counted
#   with a lag window PARTITIONED BY l_orderkey -- per-key frames, no
#   global sort (each partition boundary conservatively starts a new
#   run, which makes the count deterministic and layout-invariant);
#   the compared columns join the ORDER BY as tiebreakers because the
#   synthetic (l_orderkey, l_linenumber) is not unique, making run
#   counts well-defined under ties --
#   then one bounded union of three per-column aggregates.
# =========================================================================

_OOF_FOLDS = 5


@_register(
    "oof_target_encode",
    f"""
WITH e AS (
  SELECT event_type, user_id % {_OOF_FOLDS} AS fold,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
), per AS (
  SELECT event_type, fold, sum(v_c) AS s_c, count(*) AS c
  FROM e GROUP BY 1, 2
), tot AS (
  SELECT event_type, sum(s_c) AS st_c, sum(c) AS ct FROM per GROUP BY 1
)
SELECT p.event_type, CAST(p.fold AS BIGINT) AS fold,
       CAST(t.ct - p.c AS BIGINT) AS n_oof,
       CAST(CASE WHEN t.ct - p.c > 0 THEN
         (CAST(t.st_c AS HUGEINT) - p.s_c) * 10000 //
         CAST(t.ct - p.c AS HUGEINT)
       ELSE 0 END AS BIGINT) AS oof_mean_micro
FROM per p JOIN tot t ON t.event_type = p.event_type""",
    ref="extension: out-of-fold target encoding -- leakage-free "
    "categorical mean encoder (each fold's value excludes its own "
    "rows), exact integer micro; the K-FOLD counterpart of "
    "curation_ext's row-level target_encode_loo (different grain: "
    "per (category, fold) cell vs per event, the variant used when "
    "train/validation folds are fixed upstream)",
)
def q_oof_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.expr(f"user_id % {_OOF_FOLDS}").alias("fold"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_c"),
    )
    per = e.groupBy("event_type", "fold").agg(
        F.sum("v_c").alias("s_c"), F.count(F.lit(1)).alias("c")
    )
    tot = per.groupBy("event_type").agg(
        F.sum("s_c").alias("st_c"), F.sum("c").alias("ct")
    )
    return (
        per.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            F.col("fold").cast("bigint").alias("fold"),
            (F.col("ct") - F.col("c")).cast("bigint").alias("n_oof"),
            F.expr(
                "CAST(CASE WHEN ct - c > 0 THEN"
                " (CAST(st_c AS DECIMAL(38,0)) - s_c) * 10000 div"
                " CAST(ct - c AS DECIMAL(38,0))"
                " ELSE 0 END AS BIGINT)"
            ).alias("oof_mean_micro"),
        )
    )


@_register(
    "encoding_advisor",
    """
WITH runs AS (
  SELECT l_orderkey,
         CASE WHEN lag(l_returnflag) OVER w IS DISTINCT FROM l_returnflag
              THEN 1 ELSE 0 END AS rf_start,
         CASE WHEN lag(l_linestatus) OVER w IS DISTINCT FROM l_linestatus
              THEN 1 ELSE 0 END AS ls_start,
         CASE WHEN lag(l_quantity) OVER w IS DISTINCT FROM l_quantity
              THEN 1 ELSE 0 END AS qt_start
  FROM lineitem
  WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber,
    l_returnflag, l_linestatus, l_quantity)
), agg AS (
  SELECT count(*) AS n_rows,
         sum(rf_start) AS rf_runs, sum(ls_start) AS ls_runs,
         sum(qt_start) AS qt_runs
  FROM runs
), dis AS (
  SELECT count(DISTINCT l_returnflag) AS rf_d,
         count(DISTINCT l_linestatus) AS ls_d,
         count(DISTINCT l_quantity) AS qt_d
  FROM lineitem
), cols AS (
  SELECT 'l_returnflag' AS column_name, n_rows, rf_d AS n_distinct,
         rf_runs AS n_runs FROM agg, dis
  UNION ALL
  SELECT 'l_linestatus', n_rows, ls_d, ls_runs FROM agg, dis
  UNION ALL
  SELECT 'l_quantity', n_rows, qt_d, qt_runs FROM agg, dis
)
SELECT column_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(n_runs AS BIGINT) AS n_runs,
       CASE WHEN n_runs * 2 <= n_rows THEN 'dict_rle'
            WHEN n_distinct <= 64 THEN 'dict'
            ELSE 'plain' END AS advice
FROM cols""",
    ref="extension: physical-encoding advisor -- per-column distinct "
    "count + run count under the natural (l_orderkey, l_linenumber) "
    "order, keyed lag windows (no global sort), dictionary/RLE/plain "
    "recommendation",
)
def q_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity"
    )
    start = lambda c: F.when(  # noqa: E731
        ~F.lag(c).over(w).eqNullSafe(F.col(c)), 1
    ).otherwise(0)
    runs = li.select(
        start("l_returnflag").alias("rf_start"),
        start("l_linestatus").alias("ls_start"),
        start("l_quantity").alias("qt_start"),
    )
    agg = runs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("rf_start").alias("rf_runs"),
        F.sum("ls_start").alias("ls_runs"),
        F.sum("qt_start").alias("qt_runs"),
    )
    dis = li.agg(
        F.countDistinct("l_returnflag").alias("rf_d"),
        F.countDistinct("l_linestatus").alias("ls_d"),
        F.countDistinct("l_quantity").alias("qt_d"),
    )
    both = agg.crossJoin(F.broadcast(dis))
    # stack() the single joined row into the per-column rows instead of
    # a 3-way union: each union branch re-executes the whole upstream
    # (two lineitem scans per branch -- 6 total); stack keeps it at one
    # runs-scan + one distinct-scan.
    cols = both.selectExpr(
        "stack(3,"
        " 'l_returnflag', n_rows, rf_d, rf_runs,"
        " 'l_linestatus', n_rows, ls_d, ls_runs,"
        " 'l_quantity',  n_rows, qt_d, qt_runs"
        ") AS (column_name, n_rows, n_distinct, n_runs)"
    ).select(
        "column_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.col("n_runs").cast("bigint").alias("n_runs"),
    )
    return cols.select(
        "column_name",
        "n_rows",
        "n_distinct",
        "n_runs",
        F.expr(
            "CASE WHEN n_runs * 2 <= n_rows THEN 'dict_rle'"
            " WHEN n_distinct <= 64 THEN 'dict'"
            " ELSE 'plain' END"
        ).alias("advice"),
    )


# =========================================================================
# round 5: constraint-validation audits -- the Deequ-style rule checks a
# training-data pipeline runs before promoting a snapshot, beyond the
# column-profile/FK coverage of ``dq_audit``.
#
# - ``pk_uniqueness_audit``: candidate-key verdicts (row count, key
#   count, duplicate mass, max multiplicity) for the four natural keys,
#   including the composite (l_orderkey, l_linenumber) that the
#   synthetic generator deliberately leaves non-unique.  One keyed
#   count per candidate plus a one-row fold; the union branches scan
#   four DIFFERENT tables, so nothing is recomputed.
# - ``value_set_conformance``: enum-domain validation -- rows whose
#   flag/status/type columns fall outside the declared allowlist.  The
#   event_type allowlist deliberately excludes 'error' (error beacons
#   must not enter a training corpus), so the audit has nonzero mass;
#   the TPC-H columns conform and prove the zero path.  One aggregate
#   scan per table, stacked.
# - ``cross_field_consistency``: row- and order-level business rules:
#   unit-range discount, positive quantity/price, every order has
#   lines, and the order-total-vs-lineitem-sum reconciliation with a
#   1-cent-per-line rounding tolerance.  All lineitem rules ride ONE
#   scan (per-order partial aggregate -> orders left join -> one-row
#   fold stacked into rule rows).
#
# 100 TB shape: every audit is a single hash aggregate (or one keyed
# aggregate + broadcastable 1-row fold) per table scanned; outputs are
# enum-bounded (4 keys / 5 columns / 6 rules).
# =========================================================================

_EVENT_TYPE_ALLOW = ("click", "view", "purchase", "signup")


@_register(
    "pk_uniqueness_audit",
    """
WITH k_ord AS (SELECT count(*) AS m FROM orders GROUP BY o_orderkey),
k_cust AS (SELECT count(*) AS m FROM customer GROUP BY c_custkey),
k_ev AS (SELECT count(*) AS m FROM events GROUP BY event_id),
k_li AS (SELECT count(*) AS m FROM lineitem
         GROUP BY l_orderkey, l_linenumber)
SELECT 'orders.o_orderkey' AS candidate_key,
       CAST(sum(m) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(m) - count(*) AS BIGINT) AS dup_rows,
       CAST(max(m) AS BIGINT) AS max_multiplicity
FROM k_ord
UNION ALL
SELECT 'customer.c_custkey', CAST(sum(m) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(sum(m) - count(*) AS BIGINT),
       CAST(max(m) AS BIGINT)
FROM k_cust
UNION ALL
SELECT 'events.event_id', CAST(sum(m) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(sum(m) - count(*) AS BIGINT),
       CAST(max(m) AS BIGINT)
FROM k_ev
UNION ALL
SELECT 'lineitem.(l_orderkey,l_linenumber)', CAST(sum(m) AS BIGINT),
       CAST(count(*) AS BIGINT), CAST(sum(m) - count(*) AS BIGINT),
       CAST(max(m) AS BIGINT)
FROM k_li""",
    ref="extension: candidate-key uniqueness audit -- duplicate mass "
    "and max multiplicity per declared key, incl. the composite "
    "lineitem key the synthetic generator leaves non-unique",
)
def q_pk_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def verdict(df: DataFrame, key_cols: list[str], label: str) -> DataFrame:
        g = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("m"))
        return g.agg(
            F.lit(label).alias("candidate_key"),
            F.sum("m").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            (F.sum("m") - F.count(F.lit(1)))
            .cast("bigint")
            .alias("dup_rows"),
            F.max("m").cast("bigint").alias("max_multiplicity"),
        ).select(
            "candidate_key", "n_rows", "n_keys", "dup_rows",
            "max_multiplicity",
        )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        verdict(orders, ["o_orderkey"], "orders.o_orderkey")
        .unionByName(
            verdict(customer, ["c_custkey"], "customer.c_custkey")
        )
        .unionByName(verdict(events, ["event_id"], "events.event_id"))
        .unionByName(
            verdict(
                lineitem,
                ["l_orderkey", "l_linenumber"],
                "lineitem.(l_orderkey,l_linenumber)",
            )
        )
    )


@_register(
    "value_set_conformance",
    f"""
WITH o AS (
  SELECT count(*) AS n,
         count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P'))
           AS v_status,
         count(DISTINCT o_orderstatus) AS d_status,
         count(*) FILTER (WHERE o_orderpriority NOT IN
           ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'))
           AS v_prio,
         count(DISTINCT o_orderpriority) AS d_prio
  FROM orders
), l AS (
  SELECT count(*) AS n,
         count(*) FILTER (WHERE l_returnflag NOT IN ('A','N','R'))
           AS v_rf,
         count(DISTINCT l_returnflag) AS d_rf,
         count(*) FILTER (WHERE l_linestatus NOT IN ('F','O')) AS v_ls,
         count(DISTINCT l_linestatus) AS d_ls
  FROM lineitem
), e AS (
  SELECT count(*) AS n,
         count(*) FILTER (WHERE event_type NOT IN
           {_EVENT_TYPE_ALLOW!r}) AS v_et,
         count(DISTINCT event_type) AS d_et
  FROM events
)
SELECT 'orders.o_orderstatus' AS column_name, CAST(n AS BIGINT) AS n_rows,
       CAST(v_status AS BIGINT) AS n_violations,
       CAST(d_status AS BIGINT) AS n_observed,
       CAST(v_status * 10000 // n AS BIGINT) AS violation_pm
FROM o
UNION ALL
SELECT 'orders.o_orderpriority', CAST(n AS BIGINT), CAST(v_prio AS BIGINT),
       CAST(d_prio AS BIGINT), CAST(v_prio * 10000 // n AS BIGINT) FROM o
UNION ALL
SELECT 'lineitem.l_returnflag', CAST(n AS BIGINT), CAST(v_rf AS BIGINT),
       CAST(d_rf AS BIGINT), CAST(v_rf * 10000 // n AS BIGINT) FROM l
UNION ALL
SELECT 'lineitem.l_linestatus', CAST(n AS BIGINT), CAST(v_ls AS BIGINT),
       CAST(d_ls AS BIGINT), CAST(v_ls * 10000 // n AS BIGINT) FROM l
UNION ALL
SELECT 'events.event_type', CAST(n AS BIGINT), CAST(v_et AS BIGINT),
       CAST(d_et AS BIGINT), CAST(v_et * 10000 // n AS BIGINT) FROM e""",
    ref="extension: enum-domain conformance audit -- out-of-allowlist "
    "row mass per flag/status/type column; the event_type allowlist "
    "excludes 'error' so the violation path is exercised",
)
def q_value_set_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    def viol(cond):
        return F.count(F.when(cond, 1))

    o = orders.agg(
        F.count(F.lit(1)).alias("n"),
        viol(~F.col("o_orderstatus").isin("F", "O", "P")).alias("v_status"),
        F.countDistinct("o_orderstatus").alias("d_status"),
        viol(
            ~F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            )
        ).alias("v_prio"),
        F.countDistinct("o_orderpriority").alias("d_prio"),
    )
    li = lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        viol(~F.col("l_returnflag").isin("A", "N", "R")).alias("v_rf"),
        F.countDistinct("l_returnflag").alias("d_rf"),
        viol(~F.col("l_linestatus").isin("F", "O")).alias("v_ls"),
        F.countDistinct("l_linestatus").alias("d_ls"),
    )
    ev = events.agg(
        F.count(F.lit(1)).alias("n"),
        viol(~F.col("event_type").isin(*_EVENT_TYPE_ALLOW)).alias("v_et"),
        F.countDistinct("event_type").alias("d_et"),
    )
    o_rows = o.selectExpr(
        "stack(2,"
        " 'orders.o_orderstatus', n, v_status, d_status,"
        " 'orders.o_orderpriority', n, v_prio, d_prio"
        ") AS (column_name, n_rows, n_violations, n_observed)"
    )
    l_rows = li.selectExpr(
        "stack(2,"
        " 'lineitem.l_returnflag', n, v_rf, d_rf,"
        " 'lineitem.l_linestatus', n, v_ls, d_ls"
        ") AS (column_name, n_rows, n_violations, n_observed)"
    )
    e_rows = ev.selectExpr(
        "stack(1, 'events.event_type', n, v_et, d_et)"
        " AS (column_name, n_rows, n_violations, n_observed)"
    )
    return (
        o_rows.unionByName(l_rows).unionByName(e_rows).select(
            "column_name",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_violations").cast("bigint").alias("n_violations"),
            F.col("n_observed").cast("bigint").alias("n_observed"),
            F.expr("CAST(n_violations * 10000 div n_rows AS BIGINT)").alias(
                "violation_pm"
            ),
        )
    )


@_register(
    "cross_field_consistency",
    """
WITH per_order AS (
  SELECT l_orderkey, count(*) AS n_lines,
         count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
           AS disc_viol,
         count(*) FILTER (WHERE l_quantity < 1) AS qty_viol,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                        * 100 + 0.5) AS BIGINT)) AS calc_cents
  FROM lineitem GROUP BY 1
), oj AS (
  SELECT o.o_orderkey, p.n_lines, p.disc_viol, p.qty_viol, p.calc_cents,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
  FROM orders o LEFT JOIN per_order p ON p.l_orderkey = o.o_orderkey
), fold AS (
  SELECT coalesce(sum(n_lines), 0) AS li_n,
         coalesce(sum(disc_viol), 0) AS disc_v,
         coalesce(sum(qty_viol), 0) AS qty_v,
         count(*) AS ord_n,
         count(*) FILTER (WHERE total_cents <= 0) AS price_v,
         count(*) FILTER (WHERE n_lines IS NULL) AS noline_v,
         count(*) FILTER (WHERE n_lines IS NOT NULL) AS lined_n,
         count(*) FILTER (WHERE n_lines IS NOT NULL
           AND abs(total_cents - calc_cents) > n_lines) AS recon_v
  FROM oj
), ev AS (
  SELECT count(*) AS n,
         count(*) FILTER (WHERE value IS NULL OR value <= 0) AS v
  FROM events
)
SELECT 'lineitem.discount_in_unit_range' AS rule,
       CAST(li_n AS BIGINT) AS n_checked,
       CAST(disc_v AS BIGINT) AS n_violations,
       CAST(disc_v * 10000 // greatest(li_n, 1) AS BIGINT)
         AS violation_pm
FROM fold
UNION ALL
SELECT 'lineitem.quantity_at_least_1', CAST(li_n AS BIGINT),
       CAST(qty_v AS BIGINT),
       CAST(qty_v * 10000 // greatest(li_n, 1) AS BIGINT) FROM fold
UNION ALL
SELECT 'orders.totalprice_positive', CAST(ord_n AS BIGINT),
       CAST(price_v AS BIGINT),
       CAST(price_v * 10000 // greatest(ord_n, 1) AS BIGINT) FROM fold
UNION ALL
SELECT 'orders.has_lineitems', CAST(ord_n AS BIGINT),
       CAST(noline_v AS BIGINT),
       CAST(noline_v * 10000 // greatest(ord_n, 1) AS BIGINT) FROM fold
UNION ALL
SELECT 'orders.total_matches_lineitem_sum', CAST(lined_n AS BIGINT),
       CAST(recon_v AS BIGINT),
       CAST(recon_v * 10000 // greatest(lined_n, 1) AS BIGINT) FROM fold
UNION ALL
SELECT 'events.value_positive', CAST(n AS BIGINT), CAST(v AS BIGINT),
       CAST(v * 10000 // greatest(n, 1) AS BIGINT) FROM ev""",
    ref="extension: cross-field business-rule validation -- row-level "
    "range rules plus the order-total vs lineitem-sum reconciliation "
    "(1 cent/line rounding tolerance); all lineitem rules ride one "
    "scan via the per-order partial aggregate",
)
def q_cross_field_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("disc_viol"),
        F.count(F.when(F.col("l_quantity") < 1, 1)).alias("qty_viol"),
        F.sum(
            F.expr(
                "CAST(floor(l_extendedprice * (1 - l_discount)"
                " * (1 + l_tax) * 100 + 0.5) AS BIGINT)"
            )
        ).alias("calc_cents"),
    )
    oj = orders.select(
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "total_cents"
        ),
    ).join(per_order, F.col("l_orderkey") == F.col("o_orderkey"), "left")
    fold = oj.agg(
        F.coalesce(F.sum("n_lines"), F.lit(0)).alias("li_n"),
        F.coalesce(F.sum("disc_viol"), F.lit(0)).alias("disc_v"),
        F.coalesce(F.sum("qty_viol"), F.lit(0)).alias("qty_v"),
        F.count(F.lit(1)).alias("ord_n"),
        F.count(F.when(F.col("total_cents") <= 0, 1)).alias("price_v"),
        F.count(F.when(F.col("n_lines").isNull(), 1)).alias("noline_v"),
        F.count(F.when(F.col("n_lines").isNotNull(), 1)).alias("lined_n"),
        F.count(
            F.when(
                F.col("n_lines").isNotNull()
                & (
                    F.abs(F.col("total_cents") - F.col("calc_cents"))
                    > F.col("n_lines")
                ),
                1,
            )
        ).alias("recon_v"),
    )
    rule_rows = fold.selectExpr(
        "stack(5,"
        " 'lineitem.discount_in_unit_range', li_n, disc_v,"
        " 'lineitem.quantity_at_least_1', li_n, qty_v,"
        " 'orders.totalprice_positive', ord_n, price_v,"
        " 'orders.has_lineitems', ord_n, noline_v,"
        " 'orders.total_matches_lineitem_sum', lined_n, recon_v"
        ") AS (rule, n_checked, n_violations)"
    )
    ev_row = events.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.count(
            F.when(F.col("value").isNull() | (F.col("value") <= 0), 1)
        ).alias("n_violations"),
    ).select(F.lit("events.value_positive").alias("rule"), "n_checked",
             "n_violations")
    return rule_rows.unionByName(ev_row).select(
        "rule",
        F.col("n_checked").cast("bigint").alias("n_checked"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        F.expr(
            "CAST(n_violations * 10000 div greatest(n_checked, 1)"
            " AS BIGINT)"
        ).alias("violation_pm"),
    )


# =========================================================================
# wave 103: real ACID MERGE round-trip through the txlog table format
#
# ``txlog_merge_roundtrip``: the CDC/upsert story end-to-end through
# sources/txlog.py -- the parquet + JSON-commit-log table format whose
# commit protocol (atomic create-exclusive versions, snapshot replay,
# copy-on-write file-pruned MERGE, time travel) replaces the
# jar-gated lakehouse probes in sources/connectors.py with a working
# implementation (round-7 verdict gap 2).  The query CREATEs a table
# from orders, MERGEs a CDC batch (updates: every 7th order flips to
# status 'X' with a 1-cent correction; inserts: one synthetic 'N'
# order per 1000th key), then aggregates BOTH versions via time
# travel.  The oracle replays the merge relationally (CASE + UNION) --
# so the external hash check covers the whole physical path: commit
# atomicity, snapshot isolation, file pruning, and the time-travel
# read of the pre-merge version.
#
# Scale: MERGE rewrites only files containing matched keys (broadcast
# semi-join on the _metadata file identity; driver state = file
# count); snapshot
# replay is O(1) amortized via checkpoints.  The aggregate output is
# |status| x 2 rows.
# =========================================================================


@_register(
    "txlog_merge_roundtrip",
    """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_orderstatus IS NOT NULL
    AND o_totalprice IS NOT NULL
),
mxk AS (SELECT CAST(max(k) AS BIGINT) AS m FROM base),
merged AS (
  SELECT k,
         CASE WHEN k % 7 = 0 THEN 'X' ELSE status END AS status,
         CASE WHEN k % 7 = 0 THEN cents + 1 ELSE cents END AS cents
  FROM base
  UNION ALL
  SELECT k + mxk.m + 1 AS k, 'N' AS status, CAST(0 AS BIGINT) AS cents
  FROM base CROSS JOIN mxk WHERE k % 1000 = 0
),
v0 AS (
  SELECT CAST(0 AS BIGINT) AS version, status,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM base GROUP BY status
),
v1 AS (
  SELECT CAST(1 AS BIGINT) AS version, status,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM merged GROUP BY status
)
SELECT * FROM v0 UNION ALL SELECT * FROM v1""",
    ref="extension: ACID MERGE + time travel through the txlog commit "
    "protocol (sources/txlog.py) -- create, copy-on-write upsert, and "
    "both-version aggregates; oracle replays the merge relationally",
)
def q_txlog_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.sources.txlog import TxTable

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderkey").isNotNull()
            & F.col("o_orderstatus").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    tbl = TxTable(spark, scratch_dir("sparkgraft_txlog_"))
    tbl.create(base.repartition(4))
    updates = base.filter(F.col("k") % 7 == 0).select(
        "k", F.lit("X").alias("status"), (F.col("cents") + 1).alias("cents")
    )
    # insert keys sit ABOVE the real key domain at ANY scale factor:
    # a fixed offset collides with genuine orderkeys once sf grows past
    # the literal (review finding), so the offset is the in-plan max + 1 (keys start at 0, so a bare max offset collides with the max row itself)
    mx = base.agg(F.max("k").cast("bigint").alias("m"))
    inserts = (
        base.filter(F.col("k") % 1000 == 0)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("k") + F.col("m") + 1).alias("k"),
            F.lit("N").alias("status"),
            F.lit(0).cast("bigint").alias("cents"),
        )
    )
    tbl.merge(updates.unionByName(inserts), ["k"])

    def agg(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy("status").agg(
            F.lit(version).cast("bigint").alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )

    # time travel: version 0 must still read the pre-merge state
    return (
        agg(tbl.snapshot(0), 0)
        .unionByName(agg(tbl.snapshot(1), 1))
        .select("version", "status", "n_orders", "sum_cents")
    )


# =========================================================================
# wave 104: txlog DELETE (GDPR) and data-skipping verdicts
#
# ``txlog_gdpr_delete``: the right-to-erasure path through the ACID
# table -- create from events, copy-on-write DELETE of every 10th
# user's rows (only files containing them are rewritten), then
# aggregate the survivors AND the pre-delete version via time travel.
# The oracle replays the deletion relationally, so the external hash
# covers the rewrite's row-exactness and the old snapshot's isolation.
#
# ``txlog_skipping_audit``: externally checkable verdict for the
# zonemap reader (bernoulli_sample_ci pattern): file counts depend on
# range-partitioner sampling (not cross-run replayable), but the
# invariants ARE -- the range-clustered table must SKIP at least one
# file for a narrow range (boolean pinned TRUE), and the pruned read
# must return exactly the rows the full-scan filter returns (count
# equality as an exact integer).
# =========================================================================


@_register(
    "txlog_gdpr_delete",
    """
WITH base AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
),
v0 AS (
  SELECT CAST(0 AS BIGINT) AS version, event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM base GROUP BY event_type
),
v1 AS (
  SELECT CAST(1 AS BIGINT) AS version, event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM base WHERE user_id % 10 <> 0 GROUP BY event_type
)
SELECT * FROM v0 UNION ALL SELECT * FROM v1""",
    ref="extension: GDPR erasure through the txlog ACID table -- "
    "copy-on-write DELETE of every 10th user, file-pruned rewrite, "
    "both versions aggregated via time travel; oracle replays the "
    "deletion relationally",
)
def q_txlog_gdpr_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.sources.txlog import TxTable

    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        )
    )
    tbl = TxTable(spark, scratch_dir("sparkgraft_gdpr_"))
    tbl.create(base.repartition(4))
    tbl.delete_where(F.col("user_id") % 10 == 0)

    def agg(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.lit(version).cast("bigint").alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )

    return (
        agg(tbl.snapshot(0), 0)
        .unionByName(agg(tbl.snapshot(1), 1))
        .select("version", "event_type", "n_events", "sum_cents")
    )


@_register(
    "txlog_skipping_audit",
    """
WITH mx AS (
  SELECT CAST(max(o_orderkey) AS BIGINT) AS m FROM orders
  WHERE o_orderkey IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_rows_in_range,
       TRUE AS skipped_files,
       TRUE AS pruned_read_exact
FROM orders CROSS JOIN mx
WHERE o_orderkey IS NOT NULL
  AND o_orderkey BETWEEN mx.m * 1 // 100 AND mx.m * 5 // 100""",
    ref="extension: zonemap data-skipping verdict (bernoulli_sample_ci "
    "pattern) -- after a range-clustered OPTIMIZE the narrow read must "
    "skip >= 1 file and return exactly the full-scan rows; file counts "
    "are sampler-dependent, the booleans and the exact row count are "
    "not",
)
def q_txlog_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.sources.txlog import TxTable

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isNotNull())
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    tbl = TxTable(spark, scratch_dir("sparkgraft_skip_"))
    tbl.create(base.repartition(8))
    tbl.optimize(target_files=8, zorder_by=["k"])
    # scale-relative narrow range (1%-5% of the key domain): covers a
    # ~4% slice of the 8 range-clustered files at ANY sf, so skipping
    # is guaranteed and the verdict cannot depend on the scale factor
    m = first_row(tbl.snapshot().agg(F.max("k")))[0]  # bounded scalar
    lo, hi = m * 1 // 100, m * 5 // 100
    pruned, files_read, files_total = tbl.snapshot_where("k", lo, hi)
    n_pruned = pruned.count()  # bounded: one scalar per verdict
    n_full = tbl.snapshot().filter(F.col("k").between(lo, hi)).count()
    return spark.createDataFrame(
        [
            (
                n_pruned,
                bool(files_read < files_total),
                bool(n_pruned == n_full),
            )
        ],
        "n_rows_in_range BIGINT, skipped_files BOOLEAN, "
        "pruned_read_exact BOOLEAN",
    )


# =========================================================================
# wave 105: row-level change feed between txlog versions
#
# ``txlog_changes_cdf``: the Delta ``table_changes`` read done WITHOUT
# change files -- create a table from orders, MERGE a correction batch
# (every 7th order flips to status 'X' with a 1-cent bump), DELETE
# every 13th key, then read the row-level diff between version 0 and
# the head via ``TxTable.changes``: only the commits' FILE DELTA is
# opened (carried-forward files contain byte-identical rows on both
# sides and cancel), an update surfaces as a delete+insert pair.  The
# oracle replays the change feed relationally, so the external hash
# covers the file-delta cancellation argument, the COW rewrite
# row-exactness, and the exceptAll bag semantics end-to-end.
#
# Scale: the diff cost is proportional to what the intervening commits
# touched, never to the table; the two exceptAll shuffles carry the
# delta only.  Output is |change_type| x |status| rows.
# =========================================================================


@_register(
    "txlog_changes_cdf",
    """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_orderstatus IS NOT NULL
    AND o_totalprice IS NOT NULL
),
ins AS (
  -- rows present at head but not at v0: the new images of surviving
  -- merged rows (deleted-after-merge keys never reach the head)
  SELECT 'insert' AS change_type, 'X' AS status,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(cents + 1) AS BIGINT) AS sum_cents
  FROM base WHERE k % 7 = 0 AND k % 13 <> 0
  HAVING count(*) > 0
),
del AS (
  -- rows present at v0 but not at head: pre-merge images of every
  -- updated key plus the deleted unmodified keys
  SELECT 'delete' AS change_type, status,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM base WHERE k % 7 = 0 OR k % 13 = 0 GROUP BY status
)
SELECT * FROM ins UNION ALL SELECT * FROM del""",
    ref="extension: row-level CDC between txlog versions via the "
    "file-delta read (sources/txlog.py changes()) -- MERGE + DELETE, "
    "then the v0->head change feed aggregated; oracle replays the "
    "feed relationally",
)
def q_txlog_changes_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.sources.txlog import TxTable

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderkey").isNotNull()
            & F.col("o_orderstatus").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    tbl = TxTable(spark, scratch_dir("sparkgraft_cdf_"))
    tbl.create(base.repartition(4))
    updates = base.filter(F.col("k") % 7 == 0).select(
        "k", F.lit("X").alias("status"), (F.col("cents") + 1).alias("cents")
    )
    tbl.merge(updates, ["k"])
    tbl.delete_where(F.col("k") % 13 == 0)
    ch = tbl.changes(0, tbl.latest_version())
    return (
        ch.groupBy(F.col("_change").alias("change_type"), "status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .select("change_type", "status", "n_rows", "sum_cents")
    )


# =========================================================================
# wave 106 (cont.): two-dimensional Z-order skipping audit
#
# ``txlog_zorder_2d_audit``: the Morton-interleave payoff as an
# externally checkable verdict (skipping_audit pattern).  The events
# table lands in a txlog table keyed by (user bucket, epoch day),
# OPTIMIZE with zorder_by=[ub, d] clusters on the true 2-D interleave
# (sources/layout.zorder_key via sources/txlog.optimize), and the
# audit asserts that narrow ranges on EITHER column stay row-exact
# under the pruned read path -- zonemap pruning is conservative by
# construction, so exactness is deterministic.  The SKIPPING booleans
# (files_read < files_total) are NOT part of the oracle surface: file
# boundaries come from repartitionByRange's reservoir sampling over the
# Morton key, and a sampler-degenerate epoch (skewed day domain at some
# sf) could legitimately produce overlapping zonemaps and read all
# files (r9 ADVICE).  The skip contrast is pinned instead by
# tests/test_txlog.py::test_optimize_two_column_zorder_prunes_both_dims
# on a sampler-proof synthetic domain (uniform 0..999 on both dims),
# where lexicographic provably serves only its leading column.
# =========================================================================


@_register(
    "txlog_zorder_2d_audit",
    """
WITH base AS (
  SELECT user_id % 1000 AS ub,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
dr AS (SELECT min(d) AS dmin, max(d) AS dmax FROM base)
SELECT CAST(count(*) FILTER (WHERE ub BETWEEN 100 AND 150) AS BIGINT)
         AS n_ub_rows,
       TRUE AS ub_read_exact,
       CAST(count(*) FILTER (
         WHERE d BETWEEN dr.dmin + (dr.dmax - dr.dmin) // 4
                     AND dr.dmin + (dr.dmax - dr.dmin) // 2) AS BIGINT)
         AS n_d_rows,
       TRUE AS d_read_exact
FROM base CROSS JOIN dr
GROUP BY dr.dmin, dr.dmax""",
    ref="extension: 2-D Morton/Z-order pruned-read audit through the "
    "txlog OPTIMIZE path -- narrow ranges on EITHER clustered column "
    "stay row-exact under zonemap pruning (deterministic: pruning is "
    "conservative); the sampler-dependent skip booleans moved to the "
    "unit-test contrast on a sampler-proof domain (r9 ADVICE)",
)
def q_txlog_zorder_2d_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.sources.txlog import TxTable

    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            (F.col("user_id") % 1000).alias("ub"),
            F.expr(
                "CAST(floor(CAST(unix_timestamp(ts) AS DOUBLE) / 86400)"
                " AS BIGINT)"
            ).alias("d"),
        )
    )
    tbl = TxTable(spark, scratch_dir("sparkgraft_z2d_"))
    tbl.create(base.repartition(8))
    tbl.optimize(target_files=16, zorder_by=["ub", "d"])
    # scale-relative ranges; dmin/dmax are bounded scalars (the
    # skipping_audit contract)
    snap = tbl.snapshot()
    row = first_row(snap.agg(F.min("d").alias("a"), F.max("d").alias("b")))
    dmin, dmax = int(row["a"]), int(row["b"])
    lo_d = dmin + (dmax - dmin) // 4
    hi_d = dmin + (dmax - dmin) // 2
    ub_df, _ub_read, _n_files = tbl.snapshot_where("ub", 100, 150)
    d_df, _d_read, _ = tbl.snapshot_where("d", lo_d, hi_d)
    n_ub = ub_df.count()
    n_d = d_df.count()
    full_ub = snap.filter(F.col("ub").between(100, 150)).count()
    full_d = snap.filter(F.col("d").between(lo_d, hi_d)).count()
    return spark.createDataFrame(
        [
            (
                n_ub,
                bool(n_ub == full_ub),
                n_d,
                bool(n_d == full_d),
            )
        ],
        "n_ub_rows BIGINT, ub_read_exact BOOLEAN, "
        "n_d_rows BIGINT, d_read_exact BOOLEAN",
    )


# =========================================================================
# wave 108: RESTORE TABLE through the txlog commit log
#
# ``txlog_restore_roundtrip``: the rollback path -- create from
# orders, DELETE every 5th key (a bad job), RESTORE to version 0 as a
# NEW commit (history stays linear and append-only, no data files
# copied -- the commit re-adds the old version's log entries, cost
# O(file count) JSON regardless of table size), then aggregate the
# damaged version AND the restored head via time travel.  The oracle
# replays both states relationally, so the external hash pins that the
# restore returned the table EXACTLY to its pre-delete content while
# the damaged intermediate version remains readable.
# =========================================================================


@_register(
    "txlog_restore_roundtrip",
    """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_orderstatus IS NOT NULL
    AND o_totalprice IS NOT NULL
),
damaged AS (
  SELECT CAST(1 AS BIGINT) AS version, status,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM base WHERE k % 5 <> 0 GROUP BY status
),
restored AS (
  SELECT CAST(2 AS BIGINT) AS version, status,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM base GROUP BY status
)
SELECT * FROM damaged UNION ALL SELECT * FROM restored""",
    ref="extension: RESTORE TABLE ... TO VERSION through the txlog "
    "commit log (sources/txlog.py restore()) -- rollback as a new "
    "linear commit, no file copies; oracle replays the damaged and "
    "restored states relationally",
)
def q_txlog_restore_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.sources.txlog import TxTable

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderkey").isNotNull()
            & F.col("o_orderstatus").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    tbl = TxTable(spark, scratch_dir("sparkgraft_restore_"))
    tbl.create(base.repartition(4))
    tbl.delete_where(F.col("k") % 5 == 0)  # the bad job
    v = tbl.restore(0)  # the rollback

    def agg(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy("status").agg(
            F.lit(version).cast("bigint").alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )

    return (
        agg(tbl.snapshot(1), 1)  # damaged version stays readable
        .unionByName(agg(tbl.snapshot(v), 2))
        .select("version", "status", "n_orders", "sum_cents")
    )


# =========================================================================
# wave 109: merge-on-read DELETE via deletion vectors
#
# The txlog table format's round-10 step (r9 verdict item 8): DELETE
# can now mark rows dead in sidecar deletion vectors instead of
# rewriting their files (sources/txlog.py delete_where(mode="mor") --
# the public Delta DV design), with OPTIMIZE as the materializer.
# Three externally hash-checkable verdicts:
#
# ``txlog_dv_delete``: the write-amplification claim itself.  A mor
# delete of every 10th user re-adds vectors only -- the data-file set
# is provably IDENTICAL before and after (``no_files_rewritten``,
# exact set equality from the log, sampler-independent), the vectors'
# total cardinality equals the relational deleted-row count, the
# log-only net row count equals the relational survivor count, and
# both versions' aggregates hash against the relational replay (the
# DV-netting scan path and time travel across a DV commit).
#
# ``txlog_dv_purge``: OPTIMIZE materializes.  After the same delete,
# a compaction rewrite must leave zero vectors (physical == net rows
# in the log) while the version-1 (vectored) and version-2
# (materialized) snapshots aggregate IDENTICALLY -- the two read
# paths bracket the rewrite and both hash against the one relational
# truth.
#
# ``txlog_dv_changes``: the change feed sees through vectors.  A mor
# delete removes no files and adds none, so the naive path-set diff
# would read NOTHING; the entry-level (path, dv) comparison must
# surface exactly the newly-dead rows as deletes.  The oracle is the
# predicate's rows tagged 'delete' -- any resurrection, loss, or
# spurious insert breaks the hash.
#
# Scale: a mor delete writes O(matched rows) against cow's
# O(affected file bytes) -- at 100 TB with point deletes that is the
# difference between kilobytes and terabytes of write amplification;
# the per-scan cost is a broadcast anti-join bounded by DV
# cardinality, which OPTIMIZE keeps small.  All protocol facts below
# come from describe_detail (log-only JSON, no data scan).
# =========================================================================


@_register(
    "txlog_dv_delete",
    """
WITH base AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
),
scal AS (
  SELECT CAST(sum(CASE WHEN user_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS dv_dead_rows,
         CAST(sum(CASE WHEN user_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS log_net_rows
  FROM base
),
v0 AS (
  SELECT CAST(0 AS BIGINT) AS version, event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM base GROUP BY event_type
),
v1 AS (
  SELECT CAST(1 AS BIGINT) AS version, event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM base WHERE user_id % 10 <> 0 GROUP BY event_type
)
SELECT v.version, v.event_type, v.n_events, v.sum_cents,
       TRUE AS no_files_rewritten, s.dv_dead_rows, s.log_net_rows
FROM (SELECT * FROM v0 UNION ALL SELECT * FROM v1) v CROSS JOIN scal s""",
    ref="extension: merge-on-read DELETE via deletion vectors "
    "(sources/txlog.py delete_where(mode='mor'), the public Delta DV "
    "design) -- no data file rewritten (exact log file-set equality), "
    "vector cardinality and net row count pinned to their relational "
    "values, both versions aggregated through the DV-netting scan",
)
def q_txlog_dv_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.sources.txlog import TxTable

    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        )
    )
    tbl = TxTable(spark, scratch_dir("sparkgraft_dv_"))
    tbl.create(base.repartition(4))
    tbl.delete_where(F.col("user_id") % 10 == 0, mode="mor")
    # protocol facts from the log only (describe_detail: O(log) JSON,
    # no data scan) -- exact set equality, not a sampler-dependent
    # file count, so the pinned boolean cannot flake (r9 ADVICE 3)
    d0, d1 = tbl.describe_detail(0), tbl.describe_detail(1)
    no_rewrite = bool(d1["files"] == d0["files"])

    def agg(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.lit(version).cast("bigint").alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )

    return (
        agg(tbl.snapshot(0), 0)
        .unionByName(agg(tbl.snapshot(1), 1))
        .select(
            "version",
            "event_type",
            "n_events",
            "sum_cents",
            F.lit(no_rewrite).alias("no_files_rewritten"),
            F.lit(d1["dv_rows"]).cast("bigint").alias("dv_dead_rows"),
            F.lit(d1["n_rows"]).cast("bigint").alias("log_net_rows"),
        )
    )


@_register(
    "txlog_dv_purge",
    """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_orderstatus IS NOT NULL
    AND o_totalprice IS NOT NULL
),
surv AS (
  SELECT status, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM base WHERE k % 9 <> 0 GROUP BY status
)
SELECT CAST(1 AS BIGINT) AS version, status, n_orders, sum_cents,
       TRUE AS purged, TRUE AS log_rows_stable FROM surv
UNION ALL
SELECT CAST(2 AS BIGINT) AS version, status, n_orders, sum_cents,
       TRUE AS purged, TRUE AS log_rows_stable FROM surv""",
    ref="extension: OPTIMIZE materializes deletion vectors "
    "(sources/txlog.py optimize on a DV table, the Delta purge) -- "
    "the vectored (v1) and materialized (v2) snapshots must aggregate "
    "identically against the one relational truth, with the log "
    "pinning zero vectors and physical == net rows after the rewrite",
)
def q_txlog_dv_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.sources.txlog import TxTable

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderkey").isNotNull()
            & F.col("o_orderstatus").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    tbl = TxTable(spark, scratch_dir("sparkgraft_dvpurge_"))
    tbl.create(base.repartition(4))
    tbl.delete_where(F.col("k") % 9 == 0, mode="mor")
    tbl.optimize(target_files=2)
    d1, d2 = tbl.describe_detail(1), tbl.describe_detail(2)
    purged = bool(
        d1["n_dvs"] > 0
        and d2["n_dvs"] == 0
        and d2["physical_rows"] == d2["n_rows"]
    )
    stable = bool(d1["n_rows"] == d2["n_rows"])

    def agg(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy("status").agg(
            F.lit(version).cast("bigint").alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )

    return (
        agg(tbl.snapshot(1), 1)  # the DV-netting read path
        .unionByName(agg(tbl.snapshot(2), 2))  # the materialized files
        .select(
            "version",
            "status",
            "n_orders",
            "sum_cents",
            F.lit(purged).alias("purged"),
            F.lit(stable).alias("log_rows_stable"),
        )
    )


@_register(
    "txlog_dv_changes",
    """
WITH base AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
)
SELECT 'delete' AS change_type, event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM base WHERE user_id % 7 = 0 GROUP BY event_type""",
    ref="extension: change feed across a deletion-vector commit "
    "(sources/txlog.py changes() under entry-level (path, dv) "
    "comparison) -- a mor delete moves no files, so only the DV-aware "
    "diff surfaces its dead rows; oracle is the predicate's rows "
    "tagged delete",
)
def q_txlog_dv_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.sources.txlog import TxTable

    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        )
    )
    tbl = TxTable(spark, scratch_dir("sparkgraft_dvcdf_"))
    tbl.create(base.repartition(4))
    tbl.delete_where(F.col("user_id") % 7 == 0, mode="mor")
    ch = tbl.changes(0, 1)
    return (
        ch.groupBy(F.col("_change").alias("change_type"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .select("change_type", "event_type", "n_rows", "sum_cents")
    )


# =========================================================================
# wave 110: CHECK constraints on the txlog table
#
# ``txlog_constraint_gate``: ALTER TABLE ADD CONSTRAINT end-to-end
# (sources/txlog.py add_constraint -- the public Delta CHECK design).
# The constraint validates the EXISTING orders data at add time
# (cents >= 0 holds for every TPC-H total price), a deliberately
# violating append is rejected with the head version provably
# unmoved (both pinned as booleans from the log, deterministic), a
# compliant append of two literal rows lands, and the final snapshot
# aggregates against the relational truth (base UNION the two
# literals).  The external hash covers the validation scan, the
# write-time gate, the no-partial-commit guarantee, and the ordinary
# read path all at once.
#
# Scale: enforcement is one bounded take(1) probe per write batch
# (short-circuits on the first violation), not a per-row driver
# round-trip; add-time validation is a single full scan, the same
# cost Delta pays.
# =========================================================================


@_register(
    "txlog_constraint_gate",
    """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS status,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_orderstatus IS NOT NULL
    AND o_totalprice IS NOT NULL
),
final AS (
  SELECT * FROM base
  UNION ALL
  SELECT * FROM (VALUES
    (CAST(9000000001 AS BIGINT), 'C', CAST(12345 AS BIGINT)),
    (CAST(9000000002 AS BIGINT), 'C', CAST(67890 AS BIGINT))
  ) AS t(k, status, cents)
)
SELECT status, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       TRUE AS violating_write_rejected,
       TRUE AS head_unchanged_by_reject
FROM final GROUP BY status""",
    ref="extension: CHECK constraints through the txlog ACID table "
    "(sources/txlog.py add_constraint, the Delta design) -- existing "
    "data validated at add time, a violating append rejected with no "
    "partial commit, a compliant append landed, final snapshot "
    "aggregated against the relational truth",
)
def q_txlog_constraint_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.sources.txlog import TxTable

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderkey").isNotNull()
            & F.col("o_orderstatus").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    tbl = TxTable(spark, scratch_dir("sparkgraft_cons_"))
    tbl.create(base.repartition(4))
    tbl.add_constraint("cents_nonneg", "cents >= 0")
    head = tbl.latest_version()
    schema = "k BIGINT, status STRING, cents BIGINT"
    rejected = False
    try:
        tbl.append(
            spark.createDataFrame([(9000000000, "X", -1)], schema)
        )
    except ValueError:
        rejected = True
    unmoved = bool(tbl.latest_version() == head)
    tbl.append(
        spark.createDataFrame(
            [(9000000001, "C", 12345), (9000000002, "C", 67890)], schema
        )
    )
    return (
        tbl.snapshot()
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .select(
            "status",
            "n_orders",
            "sum_cents",
            F.lit(rejected).alias("violating_write_rejected"),
            F.lit(unmoved).alias("head_unchanged_by_reject"),
        )
    )


# =========================================================================
# wave 110 (cont.): GENERATED columns on the txlog table
#
# ``txlog_generated_fill``: GENERATED ALWAYS AS end-to-end
# (sources/txlog.py set_generated_column -- the Delta generated-column
# semantics).  A price-band column is registered as generated from
# cents; the definition validates the existing orders snapshot at set
# time, an append SUPPLYING a contradicting band is rejected whole
# (head provably unmoved -- both pinned as deterministic booleans), an
# append OMITTING the column gets it computed under the committed
# type, and the final per-band aggregate hashes against the
# relational truth (base UNION the two filled literals, band derived
# by the same expression in SQL).
#
# Scale: the fill is a projection (no extra pass); validation of a
# supplied column is one bounded take(1) probe per batch.
# =========================================================================


@_register(
    "txlog_generated_fill",
    """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
),
final AS (
  SELECT k, cents FROM base
  UNION ALL
  SELECT * FROM (VALUES
    (CAST(9000000001 AS BIGINT), CAST(7500000 AS BIGINT)),
    (CAST(9000000002 AS BIGINT), CAST(12500000 AS BIGINT))
  ) AS t(k, cents)
)
SELECT CAST(floor(cents / 5000000) AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       TRUE AS wrong_value_rejected,
       TRUE AS head_unchanged_by_reject
FROM final GROUP BY band""",
    ref="extension: GENERATED columns through the txlog ACID table "
    "(sources/txlog.py set_generated_column, the Delta GENERATED "
    "ALWAYS AS design) -- definition validated over existing data, "
    "contradicting append rejected whole, omitted column computed at "
    "write time, per-band aggregate against the relational truth",
)
def q_txlog_generated_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.sources.txlog import TxTable

    band_expr = "CAST(floor(cents / 5000000) AS BIGINT)"
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isNotNull() & F.col("o_totalprice").isNotNull())
        .select(
            F.col("o_orderkey").alias("k"),
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
        )
        .withColumn("band", F.expr(band_expr))
    )
    tbl = TxTable(spark, scratch_dir("sparkgraft_gen_"))
    tbl.create(base.repartition(4))
    tbl.set_generated_column("band", band_expr)
    head = tbl.latest_version()
    rejected = False
    try:
        tbl.append(
            spark.createDataFrame(
                [(9000000000, 123456, 999)],
                "k BIGINT, cents BIGINT, band BIGINT",
            )
        )
    except ValueError:
        rejected = True
    unmoved = bool(tbl.latest_version() == head)
    # omit the generated column: the engine computes it
    tbl.append(
        spark.createDataFrame(
            [(9000000001, 7500000), (9000000002, 12500000)],
            "k BIGINT, cents BIGINT",
        )
    )
    return (
        tbl.snapshot()
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .select(
            "band",
            "n_orders",
            "sum_cents",
            F.lit(rejected).alias("wrong_value_rejected"),
            F.lit(unmoved).alias("head_unchanged_by_reject"),
        )
    )


# =========================================================================
# wave 110 (cont.): RENAME COLUMN via column mapping
#
# ``txlog_rename_era_read``: the Delta column-mapping design through
# sources/txlog.py rename_column -- a rename is an O(1) metadata
# commit (the data-file set is provably IDENTICAL before and after,
# exact log equality), the renamed field keeps its stable physical
# parquet name in the schema metadata, and a post-rename append means
# the final snapshot spans TWO file eras (old files written under the
# physical name, new files likewise, both aliased to the new logical
# name at scan).  A write still using the old logical name is
# rejected (pinned).  The per-group aggregate over the era-spanning
# snapshot hashes against the relational truth, and the pre-rename
# version still reads under its own era's name via time travel
# (aggregated under an alias so both engines see one column name).
#
# Scale: rename cost is one JSON commit regardless of table size --
# the alternative (rewrite every file) is O(table) at 100 TB; the
# scan-side aliasing is a projection inside codegen, free.
# =========================================================================


@_register(
    "txlog_rename_era_read",
    """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
),
final AS (
  SELECT k, cents FROM base
  UNION ALL
  SELECT * FROM (VALUES
    (CAST(9000000001 AS BIGINT), CAST(11111 AS BIGINT)),
    (CAST(9000000002 AS BIGINT), CAST(22222 AS BIGINT))
  ) AS t(k, cents)
)
SELECT k % 7 AS k_mod7,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS sum_price_cents,
       TRUE AS rename_metadata_only,
       TRUE AS old_name_write_rejected
FROM final GROUP BY k % 7""",
    ref="extension: RENAME COLUMN via column mapping through the "
    "txlog ACID table (sources/txlog.py rename_column, the Delta "
    "column-mapping design) -- metadata-only rename pinned by exact "
    "file-set equality, old-name writes rejected, era-spanning "
    "snapshot aggregated against the relational truth",
)
def q_txlog_rename_era_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.sources.txlog import TxTable

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isNotNull() & F.col("o_totalprice").isNotNull())
        .select(
            F.col("o_orderkey").alias("k"),
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
        )
    )
    tbl = TxTable(spark, scratch_dir("sparkgraft_ren_"))
    tbl.create(base.repartition(4))
    d0 = tbl.describe_detail()
    tbl.rename_column("cents", "price_cents")
    metadata_only = bool(tbl.describe_detail()["files"] == d0["files"])
    rejected = False
    try:  # the old logical name is gone for writers
        tbl.append(
            spark.createDataFrame(
                [(9000000000, 1)], "k BIGINT, cents BIGINT"
            )
        )
    except ValueError:
        rejected = True
    # post-rename era: new files under the same stable physical name
    tbl.append(
        spark.createDataFrame(
            [(9000000001, 11111), (9000000002, 22222)],
            "k BIGINT, price_cents BIGINT",
        )
    )
    return (
        tbl.snapshot()
        .groupBy((F.col("k") % 7).alias("k_mod7"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price_cents").cast("bigint").alias("sum_price_cents"),
        )
        .select(
            "k_mod7",
            "n_orders",
            "sum_price_cents",
            F.lit(metadata_only).alias("rename_metadata_only"),
            F.lit(rejected).alias("old_name_write_rejected"),
        )
    )
