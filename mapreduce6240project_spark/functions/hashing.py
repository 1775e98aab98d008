"""The engine's SQL-replayable 60-bit hash: the first 15 hex nibbles
of md5, read as an integer.  One definition for the Column expression
and its DuckDB twin -- the same idiom operators.sketch (HLL/CMS/Bloom)
and operators.dedup (SimHash/winnowing) build on, shared so the
convention (width, nibble count, cast) has a single home.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column) -> Column:
    """60-bit non-negative BIGINT hash of ``col`` (string-typed input;
    cast upstream so both engines hash the identical rendering)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str) -> str:
    """DuckDB twin of :func:`hash60`."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
