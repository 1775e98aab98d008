"""Round-3 coverage wave 79: activity streaks, referential-integrity
audit, lexical richness.

- ``user_active_streaks``: longest run of *consecutive* active days per
  user -- the classic gaps-and-islands shape.  Distinct (user, day) ->
  per-user ``row_number`` over the integer day index -> ``day_idx -
  row_number`` is constant within a consecutive run, so one more
  group-by counts each island.  Day arithmetic uses days-since-epoch
  integers (``datediff``/``date_diff``) so both engines subtract plain
  BIGINTs -- no interval semantics to diverge on.  Scale: the window is
  partitioned by user (full parallelism, no global sort) and operates
  on distinct days only, a tiny fraction of raw events.
- ``fk_orphan_audit``: referential-integrity audit of every
  foreign-key edge in the star schema (lineitem->orders/part/supplier,
  orders->customer, customer/supplier->nation, nation->region).  Each
  edge contributes one row: child rowcount + orphan count via
  left-anti join.  The parent side projects only its key, so Spark
  broadcasts the small dimensions and AQE shuffles the big ones; the
  per-edge results are single rows unioned together.  The companion to
  ``fd_violation_audit`` (functional dependencies) and ``dq_audit``
  (column-level nulls) -- together the three standard ingest gates.
- ``hapax_ratio_source``: per-source lexical richness -- token count,
  type count (distinct tokens), hapax count (types occurring exactly
  once within the source), and hapax share of types in permyriad.
  Natural prose keeps a high hapax share; templated/generated text
  collapses it, making this a cheap per-source quality gate next to
  ``zipf_slope_tokens`` (corpus-wide) and ``token_entropy``.  Shape:
  explode tokens -> one (source, token) count shuffle (partial-agg
  friendly) -> tiny per-source rollup.

Scale: streaks are user-partitioned windows over distinct days; the FK
audit is anti-joins Catalyst already knows how to place; hapax is one
group-by over (source, token) -- all shapes that survive 1000x.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@_register(
    "user_active_streaks",
    """
WITH d AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx
  FROM events
), isl AS (
  SELECT user_id, day_idx,
         day_idx - row_number() OVER (PARTITION BY user_id
                                      ORDER BY day_idx) AS grp
  FROM d
), runs AS (
  SELECT user_id, grp, count(*) AS run_len FROM isl GROUP BY 1, 2
)
SELECT user_id,
       CAST(sum(run_len) AS BIGINT) AS n_active_days,
       CAST(max(run_len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY 1""",
    ref="extension: gaps-and-islands longest consecutive-active-day "
    "streak per user -- integer day index minus per-user row_number "
    "labels each island; user-partitioned window over distinct days",
)
def q_user_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_idx")
    isl = d.withColumn("grp", F.col("day_idx") - F.row_number().over(w))
    runs = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.sum("run_len").cast("bigint").alias("n_active_days"),
        F.max("run_len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
    )


#: (edge label, child table, child FK column, parent table, parent key)
_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part",
     "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier",
     "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer",
     "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation",
     "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation",
     "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region",
     "r_regionkey"),
)

_FK_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS fk_edge,
       (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS n_child_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                          WHERE p.{pkey} = c.{fkey})) AS n_orphans"""
    for label, child, fkey, parent, pkey in _FK_EDGES
)


@_register(
    "fk_orphan_audit",
    _FK_ORACLE,
    ref="extension: referential-integrity audit -- orphan counts via "
    "left-anti join for every FK edge in the star schema; companion "
    "to fd_violation_audit/dq_audit as the third standard ingest gate",
)
def q_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = {
        name: load_table(spark, sf_dir, name)
        for name in (
            "lineitem", "orders", "part", "supplier", "customer",
            "nation", "region",
        )
    }
    per_edge = []
    for label, child, fkey, parent, pkey in _FK_EDGES:
        c = tables[child].select(F.col(fkey).alias("_k"))
        # parent keys are primary keys (unique), so a left join with a
        # hit marker counts rows and orphans in ONE child scan -- an
        # anti-join would re-scan the child for the rowcount.
        p = (
            tables[parent]
            .select(F.col(pkey).alias("_k"))
            .withColumn("_hit", F.lit(1))
        )
        per_edge.append(
            c.join(p, "_k", "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_child_rows"),
                F.count(F.when(F.col("_hit").isNull(), 1))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(
                F.lit(label).alias("fk_edge"), "n_child_rows", "n_orphans"
            )
        )
    return reduce(DataFrame.unionByName, per_edge)


@_register(
    "hapax_ratio_source",
    f"""
WITH tok AS (
  SELECT source, unnest(string_split({_NORM}, ' ')) AS t
  FROM documents WHERE {_NORM} <> ''
), c AS (
  SELECT source, t, count(*) AS n FROM tok GROUP BY 1, 2
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS n_hapax,
       count(*) FILTER (WHERE n = 1) * 10000 // count(*) AS hapax_pm
FROM c GROUP BY 1""",
    ref="extension: per-source hapax-legomena share (lexical richness "
    "gate) -- one (source, token) count shuffle, tiny per-source "
    "rollup; templated text collapses the hapax share",
)
def q_hapax_ratio_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("source", normalize_text("text").alias("nm"))
        .filter(F.col("nm") != "")
        .select("source", F.explode(F.split(F.col("nm"), " ")).alias("t"))
    )
    c = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    return (
        c.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.count(F.when(F.col("n") == 1, 1))
            .cast("bigint")
            .alias("n_hapax"),
        )
        # integer div (not double /) so the permyriad floor matches the
        # oracle's `//` bit-for-bit
        .withColumn("hapax_pm", F.expr("n_hapax * 10000 div n_types"))
    )
