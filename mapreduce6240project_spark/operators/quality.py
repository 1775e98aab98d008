"""Data-quality audit operators: column profiling, referential
integrity, and robust (median/MAD) outlier detection.

Extension surface: the reference has no data-quality tooling (its
ingest silently drops malformed rows, kmeans.java:139-150); a pipeline
feeding 100 TB of training data needs the audit to be a first-class
query.  Everything here is exact integer output (counts, fixed-point
cents) so the DuckDB oracle compares bit-for-bit.

Scale shape:

* ``column_profile`` is ONE full scan per table -- every metric
  (row count, per-column null count, per-column exact distinct) rides
  the same aggregate, so auditing n columns costs one shuffle, not n.
  The result is a single row exploded into a long (column, metric)
  frame driver-side-free.
* ``referential_violations`` is a left-anti join: with the parent key
  column pruned to a bare scan the join is shuffle-on-key (or broadcast
  when the parent is a dimension), never a full materialization.
* ``mad_outliers`` needs two exact medians per group; medians are
  computed with ``percentile`` over fixed-point cents scaled x2 so
  every intermediate (median of integers, median of absolute
  deviations) is an integer-valued double -- associative to compare,
  immune to float summation order.  Exact ``percentile`` sorts within
  each group; at 100 TB swap in ``approx_percentile`` and widen the
  outlier fence, or pre-bucket amounts -- the query shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, table_name: str, cols: list[str]) -> DataFrame:
    """Long-format profile: (table_name, column_name, metric, value)
    with metrics ``n_rows`` (column_name='*'), ``n_null`` and
    ``n_distinct`` per requested column.  One aggregate scan."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null__{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist__{c}"))
    row = df.agg(*aggs)

    entries = [
        F.struct(
            F.lit(table_name).alias("table_name"),
            F.lit("*").alias("column_name"),
            F.lit("n_rows").alias("metric"),
            F.col("__n_rows").cast("bigint").alias("value"),
        )
    ]
    for c in cols:
        entries.append(
            F.struct(
                F.lit(table_name).alias("table_name"),
                F.lit(c).alias("column_name"),
                F.lit("n_null").alias("metric"),
                F.col(f"__null__{c}").cast("bigint").alias("value"),
            )
        )
        entries.append(
            F.struct(
                F.lit(table_name).alias("table_name"),
                F.lit(c).alias("column_name"),
                F.lit("n_distinct").alias("metric"),
                F.col(f"__dist__{c}").cast("bigint").alias("value"),
            )
        )
    return row.select(F.explode(F.array(*entries)).alias("m")).select("m.*")


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    label: str,
) -> DataFrame:
    """Count of child rows whose key has no match in the parent (FK
    violations), as one profile-shaped row.  Left-anti join; null child
    keys count as violations (they reference nothing)."""
    orphans = child.select(child_key).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).cast("bigint").alias("value")).select(
        F.lit(label).alias("table_name"),
        F.lit(child_key).alias("column_name"),
        F.lit("fk_violations").alias("metric"),
        "value",
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    amount_col: str,
    fence: int = 3,
) -> DataFrame:
    """Per-group robust outlier count: |x - median| > fence * MAD.

    All comparisons run in doubled fixed-point cents so the exact
    medians (which interpolate between two middle values -- a possible
    .5) stay integer-valued: med2 = 2*median(cents), dev2 = |2*cents -
    med2|, mad4 = 2*median(dev2).  A value is an outlier iff
    2*dev2 > fence*mad4 -- pure integer arithmetic, reproducible on any
    engine.  Returns (group, n, n_outliers, mad4)."""
    cents = F.floor(F.col(amount_col).cast("double") * 100 + F.lit(0.5)).cast("bigint")
    base = df.select(F.col(group_col).alias("grp"), cents.alias("cents"))

    med = base.groupBy("grp").agg(
        (2 * F.percentile(F.col("cents").cast("double"), F.lit(0.5))).alias("med2")
    )
    dev = base.join(F.broadcast(med), "grp").select(
        "grp",
        F.abs(2 * F.col("cents").cast("double") - F.col("med2")).alias("dev2"),
    )
    mad = dev.groupBy("grp").agg(
        (2 * F.percentile(F.col("dev2"), F.lit(0.5))).alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((2 * F.col("dev2") > fence * F.col("mad4")).cast("bigint")).alias(
                "n_outliers"
            ),
            F.max(F.col("mad4").cast("bigint")).alias("mad4"),
        )
        .select(F.col("grp").alias(group_col), "n", "n_outliers", "mad4")
    )
