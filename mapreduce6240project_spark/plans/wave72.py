"""Round-3 coverage wave 72: order-insensitive dedup and peer
percentiles.

- ``dedup_bag_fingerprint``: word-order-insensitive exact dedup -- the
  fingerprint is the md5 of the SORTED token multiset, so shuffled or
  re-ordered copies (listicles, reordered boilerplate) collapse where
  plain exact dedup misses them.  Same one-shuffle keep-lowest shape as
  ``dedup_exact``; reported as fingerprints with their copy counts and
  survivors.
- ``supplier_peer_percentile``: each supplier's revenue percentile
  within its nation (integer permyriad percent-rank) -- the
  peer-comparison window every benchmark report runs; nation-partitioned
  windows, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@_register(
    "dedup_bag_fingerprint",
    f"""
WITH bags AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(string_split({_NORM}, ' ')), ' '))
           AS bag_fp
  FROM documents
)
SELECT bag_fp, CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM bags GROUP BY 1""",
    ref="extension: word-order-insensitive dedup (md5 of the sorted "
    "token multiset) -- collapses re-ordered copies plain exact dedup "
    "misses; one digest shuffle",
)
def q_bag_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    bag = F.md5(
        F.array_join(F.sort_array(F.split(normalize_text("text"), " ")), " ")
    )
    return (
        docs.select("doc_id", bag.alias("bag_fp"))
        .groupBy("bag_fp")
        .agg(
            F.min("doc_id").cast("bigint").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@_register(
    "supplier_peer_percentile",
    """
WITH rev AS (
  SELECT s.s_suppkey, s.s_nationkey,
         sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev_c
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
)
SELECT s_suppkey, s_nationkey, CAST(rev_c AS BIGINT) AS rev_c,
       CAST((row_number() OVER (PARTITION BY s_nationkey
                                ORDER BY rev_c, s_suppkey) - 1) * 10000
            // greatest(count(*) OVER (PARTITION BY s_nationkey) - 1, 1)
            AS BIGINT) AS pct_permyriad
FROM rev""",
    ref="extension: peer percentile -- integer permyriad percent-rank "
    "of supplier revenue within its nation; nation-partitioned windows",
)
def q_supplier_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_nationkey")
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            ).alias("rev_c")
        )
    )
    return rev.select(
        "s_suppkey",
        "s_nationkey",
        F.col("rev_c").cast("bigint").alias("rev_c"),
        F.expr(
            "CAST((row_number() OVER (PARTITION BY s_nationkey"
            " ORDER BY rev_c, s_suppkey) - 1) * 10000"
            " div greatest(count(*) OVER (PARTITION BY s_nationkey) - 1, 1)"
            " AS BIGINT)"
        ).alias("pct_permyriad"),
    )
