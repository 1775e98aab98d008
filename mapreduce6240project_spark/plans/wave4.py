"""Round-3 coverage wave: physical data layout (bucketed co-located
joins, partition-pruned scans) and an ORC source round-trip.

These are the write-side half of the 100 TB story: the other queries
show plans that *minimize* shuffles at read time; these show the
layouts that *eliminate* them -- bucketing pays a fact table's join
shuffle once at write time, directory partitioning turns a categorical
filter into directory pruning.  Plan shapes (zero Exchange under the
bucketed join, PartitionFilters on the pruned scan) are pinned in
tests/test_plans.py.

Money columns are summed in cent units (exact integers, associative)
so Spark's partial aggregation and DuckDB's serial sum agree bit-for-
bit -- the same fixed-point convention as the cluster-cost queries.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.layout import (
    bucketed_merge_join,
    read_partition,
    write_bucketed_table,
    write_partitioned,
)
from mapreduce6240project_spark.sources.tables import load_table

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
WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
q AS (SELECT ev AS qv FROM vecs WHERE vec_id = 0),
rel AS (SELECT vec_id, ev, {_DCOS.format(a="ev", b="qv")} AS rel FROM vecs, q),
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
