"""Point lookups and key-range scans (SURVEY.md section 2.1 S7/S8,
section 2.4 J2).

The reference does per-row HBase RPCs (Get) and rowkey-prefix Scans
(Cluster.java:66-81,96-102).  In Spark the equivalents are joins and
pruned columnar scans -- no point-RPC machinery exists or is needed:

* range scan  -> ``BETWEEN`` predicate; with the feature store written
  sorted by key (sources.tweets.write_feature_store), Parquet row-group
  min/max stats prune the scan exactly like an HBase key-range scan.
* point lookup -> equi join.  For a small probe set, an ``isin`` filter
  (pushed to the scan); for a large probe relation, a hash join that
  AQE turns into broadcast when the probe side is small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_scan(df: DataFrame, key: str, lo: int, hi: int) -> DataFrame:
    """S7: inclusive key-range scan (fixes the reference's odd stop-key
    sub-range, SURVEY.md section 2.9.5)."""
    return df.filter(F.col(key).between(lo, hi))


def point_lookup(df: DataFrame, key: str, ids: Sequence[int]) -> DataFrame:
    """S8 for a literal id set: pushdown-able IN filter."""
    return df.filter(F.col(key).isin(*[int(i) for i in ids]))


def lookup_join(
    probe: DataFrame, build: DataFrame, key: str, how: str = "inner"
) -> DataFrame:
    """J2: hydration join (assignments x features ON tweet_id) --
    replaces the reference's per-row Gets (Cluster.java:169-177,
    Analysis.java:68-73).  AQE picks broadcast when ``probe`` is small;
    bucketed feature stores make this shuffle-free at scale."""
    return probe.join(build, key, how)
