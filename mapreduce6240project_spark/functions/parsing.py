"""Dirty-data parsing / feature-derivation expressions (SURVEY.md
section 2.2, operators P5-P9).

Each function returns a Column expression reproducing the *intended*
semantics of the reference's per-line Java parsing (kmeans.java:33-110,
Analysis.java:95-97).  All are pure Catalyst expressions -> whole-stage
codegen; no Python runs per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INT_RE = r"^[0-9]+$"


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def hashtag_count(col: Column | str) -> Column:
    """P5 -- kmeans.java:33-49.

    Numeric string -> its int value; ``"[]"`` -> 0; anything else is a
    comma-joined list -> number of items; NULL/empty -> 0.
    """
    c = _c(col)
    return (
        F.when(c.isNull() | (c == ""), 0)
        .when(c.rlike(_INT_RE), F.coalesce(c.try_cast("int"), F.lit(0)))
        .when(c == "[]", 0)
        .otherwise(F.size(F.split(c, ",")))
    )


def time_bucket(col: Column | str) -> Column:
    """P6 -- kmeans.java:51-67.

    ``hh:mm:ss`` -> bucket: hour 5-12 -> 1, 13-18 -> 2, >20 or <=1 -> 3,
    else 0.  Non-3-part or non-numeric hour -> 0 (the reference's
    try/catch + length check).
    """
    c = _c(col)
    parts = F.split(c, ":")
    hour = parts.getItem(0)
    h = hour.try_cast("int")
    return (
        F.when(c.isNull() | (F.size(parts) != 3) | ~hour.rlike(_INT_RE), 0)
        .when((h >= 5) & (h <= 12), 1)
        .when((h >= 13) & (h <= 18), 2)
        .when((h > 20) | (h <= 1), 3)
        .otherwise(0)
    )


def bool01(col: Column | str) -> Column:
    """P7 -- kmeans.java:82-88.  Numeric string -> int; ``"True"`` -> 1;
    anything else -> 0."""
    c = _c(col)
    return (
        F.when(c.isNull(), 0)
        .when(c.rlike(_INT_RE), F.coalesce(c.try_cast("int"), F.lit(0)))
        .when(c == "True", 1)
        .otherwise(0)
    )


def parse_or_zero(col: Column | str) -> Column:
    """P8 -- kmeans.java:89-109.  ``Integer.parseInt`` with catch -> 0."""
    c = _c(col)
    return F.coalesce(c.try_cast("int"), F.lit(0))


def recode_language(col: Column | str, keep: tuple[str, ...] = ("en", "tr")) -> Column:
    """P9 -- Analysis.java:95-97.  Languages outside ``keep`` -> 'others'."""
    c = _c(col)
    return F.when(c.isin(*keep), c).otherwise(F.lit("others"))
