"""Skew-mitigation operators.

At 100 TB a handful of hot keys (one language, one event type, one
null-ish default) can pin a shuffle partition while the rest of the
cluster idles.  Two standard counters, expressed as plain DataFrame
transformations so Catalyst/AQE still see through them:

* **salted two-phase aggregation** -- pre-aggregate on (key, salt) so
  the hot key's rows spread over ``n_salts`` partitions, then combine.
  For algebraic aggregates (count/sum/min/max) the result is exact.
* **salted broadcast-side replication join** -- replicate the small side
  n_salts times, salt the big side; every hot-key row still joins but
  lands on different reducers.

(AQE's ``skewJoin`` handles sort-merge skew automatically -- enabled in
session.py; these helpers cover aggregation skew and explicit control.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, cols: list[str], n_salts: int) -> Column:
    # deterministic salt from row identity -- spreads a hot key's rows
    # uniformly without an RNG (re-runs give identical partitioning)
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_count(
    df: DataFrame, key: str, n_salts: int = 16, id_cols: list[str] | None = None
) -> DataFrame:
    """Exact per-key count via two-phase salted aggregation."""
    salt = _salt(df, id_cols or df.columns, n_salts)
    partial = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(
        F.count("*").alias("_n")
    )
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Exact per-key sum via two-phase salted aggregation."""
    salt = _salt(df, id_cols or df.columns, n_salts)
    micros = F.floor(F.col(value) * 1000000 + F.lit(0.5)).cast("bigint")
    partial = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(
        F.sum(micros).alias("_s")
    )
    return partial.groupBy(key).agg(
        F.round(F.sum("_s") / 1000000.0, 4).alias(f"sum_{value}")
    )


def salted_broadcast_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: replicate ``small``
    n_salts times with an explicit salt column, salt ``big`` rows, and
    join on (key, salt).  Result is identical to a plain join."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("_salt", _salt(big, big.columns, n_salts))
    return big_salted.join(F.broadcast(small_rep), [key, "_salt"]).drop("_salt")
