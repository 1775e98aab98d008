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
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the ``value_cols`` of the matching
    right row by time: ``backward`` (default) takes the latest right
    row with ``right.ts <= left.ts``, ``forward`` the earliest with
    ``right.ts >= left.ts``, ``nearest`` whichever side is closer in
    time (ties -> backward).  All inclusive: right rows at the exact
    left timestamp match in every direction, so a row can match itself
    when both sides share a table.

    Union + one window pass per key -- never a range join: right rows
    are tagged so they sort inside the left stream (before left rows
    for backward visibility, a second copy after for forward), then
    last/first(ignorenulls) carries the bracketing values.  One shuffle
    on the key, state per row is |value_cols| entries.

    Precondition: (key, ts) should be unique on the right side (and on
    the left for reproducible output) -- with duplicate timestamps the
    within-tie order of the union is engine-dependent, so which of the
    tied right rows wins is unspecified.  The registered oracles order
    by (ts, event_id) and rely on the driver data's collision-free
    timestamps; verified at all scale factors.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction}")
    want_prev = direction in ("backward", "nearest")
    want_next = direction in ("forward", "nearest")

    # _ord: right rows sort before left rows (0 < 1) so the *preceding*
    # frame of a left row sees same-timestamp rights; a second right
    # copy at _ord=2 sorts after, visible to the *following* frame.
    l_tag = (
        left.withColumn("_ord", F.lit(1))
        .withColumn("_ts", F.col(left_ts))
        .withColumn("_rts", F.lit(None).cast("long"))
    )
    r_cols = [F.col(c).alias(f"{c}{suffix}") for c in value_cols]
    r_base = right.select(
        key,
        F.col(right_ts).alias("_ts"),
        F.unix_micros(F.col(right_ts)).alias("_rts"),
        *r_cols,
    )
    tagged = [l_tag]
    if want_prev:
        tagged.append(_conform(r_base.withColumn("_ord", F.lit(0)), l_tag, key))
    if want_next:
        tagged.append(_conform(r_base.withColumn("_ord", F.lit(2)), l_tag, key))
    for c in [f"{c}{suffix}" for c in value_cols]:
        if c not in l_tag.columns:
            l_tag = tagged[0] = l_tag.withColumn(c, F.lit(None))
    unioned = tagged[0]
    for t in tagged[1:]:
        unioned = unioned.unionByName(t.select(*tagged[0].columns))

    wp = (
        Window.partitionBy(key)
        .orderBy("_ts", "_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(key)
        .orderBy("_ts", "_ord")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    out_cols = list(left.columns) + ["_ord"]
    carried = unioned.select(
        *out_cols,
        *(
            [F.last("_rts", ignorenulls=True).over(wp).alias("_pts")]
            + [
                F.last(f"{c}{suffix}", ignorenulls=True).over(wp).alias(f"_p_{c}")
                for c in value_cols
            ]
            if want_prev
            else []
        ),
        *(
            [F.first("_rts", ignorenulls=True).over(wn).alias("_nts")]
            + [
                F.first(f"{c}{suffix}", ignorenulls=True).over(wn).alias(f"_n_{c}")
                for c in value_cols
            ]
            if want_next
            else []
        ),
    ).filter(F.col("_ord") == 1)

    if direction == "backward":
        picked = [F.col(f"_p_{c}").alias(f"{c}{suffix}") for c in value_cols]
    elif direction == "forward":
        picked = [F.col(f"_n_{c}").alias(f"{c}{suffix}") for c in value_cols]
    else:
        lus = F.unix_micros(F.col(left_ts))
        # closer side wins; ties and one-sided misses -> backward
        use_prev = F.col("_nts").isNull() | (
            F.col("_pts").isNotNull() & ((lus - F.col("_pts")) <= (F.col("_nts") - lus))
        )
        picked = [
            F.when(use_prev, F.col(f"_p_{c}"))
            .otherwise(F.col(f"_n_{c}"))
            .alias(f"{c}{suffix}")
            for c in value_cols
        ]
    return carried.select(*left.columns, *picked)


def _conform(r_tag: DataFrame, l_tag: DataFrame, key: str) -> DataFrame:
    """Null-pad a tagged right side to the left side's column set."""
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    return r_tag


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
