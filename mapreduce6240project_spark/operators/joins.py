"""Join operators beyond Spark's built-ins: as-of join and interval
(range) join.

The reference has no relational joins at all (its J1/J2 patterns are
per-row HBase RPCs -- SURVEY.md section 2.4); equi/semi/anti/outer come
free from ``df.join``.  These two are the classic *missing* operators a
time-series/feature pipeline needs, implemented Spark-first:

* **as-of join** -- union + keyed window scan ("piggyback" technique):
  tag both sides, union, one window over (key, ts) carrying the last
  right-side value forward.  One shuffle per side, sort-merge within key
  partitions, no UDF, no per-group pandas.  This is the formulation that
  scales: state per key is O(1), and skewed keys parallelize across the
  window's sort spill.
* **interval join** -- bucketize time, explode each left row into the
  buckets its tolerance window can touch, equi-join on (key, bucket),
  post-filter the exact predicate.  Work is proportional to true
  near-pairs + bucket collisions, never |L| x |R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the ``value_cols`` of the latest right
    row with ``right.ts <= left.ts`` and the same ``key`` (backward
    as-of, inclusive).  Right rows with equal timestamps sort before
    left rows, so a row can match itself when both sides share a table.
    """
    l_tag = left.withColumn("_is_left", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r_cols = [F.col(c).alias(f"{c}{suffix}") for c in value_cols]
    r_tag = (
        right.select(key, F.col(right_ts).alias("_ts"), *r_cols)
        .withColumn("_is_left", F.lit(0))
    )
    for c in left.columns:
        if c not in {key} and c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    for c in [f"{c}{suffix}" for c in value_cols]:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[c for c in left.columns],
        "_is_left",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_is_left") == 1).drop("_is_left")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance_s: int,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Pairs (l, r) with the same ``key`` and |l.ts - r.ts| <=
    tolerance.  Bucketized: left rows replicate into the up-to-3 buckets
    their window can touch; the join is an equi-join on (key, bucket).
    """
    tol_us = tolerance_s * 1_000_000
    bucket = lambda c: F.floor(F.unix_micros(F.col(c)) / tol_us)  # noqa: E731
    offs = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("_off")
    l = left.select("*", F.unix_micros(F.col(left_ts)).alias("_lus"), offs).withColumn(
        "_bucket", bucket(left_ts) + F.col("_off")
    )
    rsel = right_cols if right_cols is not None else right.columns
    r = right.select(
        F.col(key).alias("_rkey"),
        F.unix_micros(F.col(right_ts)).alias("_rus"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rsel],
    ).withColumn("_bucket", F.floor(F.col("_rus") / tol_us))
    joined = l.join(
        r, (F.col(key) == F.col("_rkey")) & (l["_bucket"] == r["_bucket"])
    ).filter(F.abs(F.col("_lus") - F.col("_rus")) <= tol_us)
    return joined.drop("_off", "_bucket", "_rkey", "_lus", "_rus")
