"""Driver-side action helpers shared by probe/decision code paths."""

from __future__ import annotations

from pyspark.sql import DataFrame, Row


def first_row(df: DataFrame) -> Row | None:
    """Collect a known-tiny DataFrame (global aggregate, bounded scalar
    probe) and return its first row -- in ONE Spark job.

    ``df.first()`` plans ``CollectLimit(1)``, whose incremental
    partition-scan execution submits several sequential jobs (an initial
    single-partition round, then scale-up rounds; under AQE additionally
    one job per query stage).  For a global aggregate the full input is
    scanned regardless, so the incremental rounds are pure scheduling
    overhead: measured 5-12x slower than a straight ``collect()`` on the
    dedup decision probes (0.40 s/3 jobs -> 0.03 s/1 job at sf0.1).

    Only use on plans whose result is small and bounded (single-row
    aggregates, k-row probes) -- ``collect()`` has no row limit.
    """
    rows = df.collect()
    return rows[0] if rows else None
