"""Property-based tests (SURVEY.md section 5 item 4): the parsing
Column expressions must agree with a straightforward Python reference
implementation of the kmeans.java semantics on arbitrary inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from mapreduce6240project_spark.functions.parsing import (
    bool01,
    hashtag_count,
    parse_or_zero,
    time_bucket,
)

_INT_RE = re.compile(r"^[0-9]+$")

# printable-ish strings, commas and colons included to hit list/time paths
TXT = st.text(
    alphabet=st.sampled_from("abc01:,.[] Tru"), min_size=0, max_size=12
)


def _py_int_or_none(s: str) -> int | None:
    if not _INT_RE.match(s):
        return None
    v = int(s)
    return v if -(2**31) <= v < 2**31 else None


def py_hashtag_count(s: str | None) -> int:
    # kmeans.java:33-49
    if s is None or s == "":
        return 0
    if _INT_RE.match(s):
        v = _py_int_or_none(s)
        return v if v is not None else 0
    if s == "[]":
        return 0
    return len(s.split(","))


def py_time_bucket(s: str | None) -> int:
    # kmeans.java:51-67
    if s is None:
        return 0
    parts = s.split(":")
    if len(parts) != 3 or not _INT_RE.match(parts[0]):
        return 0
    h = _py_int_or_none(parts[0])
    if h is None:
        return 0
    if 5 <= h <= 12:
        return 1
    if 13 <= h <= 18:
        return 2
    if h > 20 or h <= 1:
        return 3
    return 0


def py_bool01(s: str | None) -> int:
    # kmeans.java:82-88
    if s is None:
        return 0
    if _INT_RE.match(s):
        v = _py_int_or_none(s)
        return v if v is not None else 0
    return 1 if s == "True" else 0


def py_parse_or_zero(s: str | None) -> int:
    if s is None:
        return 0
    try:
        v = int(s)
    except ValueError:
        return 0
    return v if -(2**31) <= v < 2**31 else 0


CASES = [
    (hashtag_count, py_hashtag_count),
    (time_bucket, py_time_bucket),
    (bool01, py_bool01),
    (parse_or_zero, py_parse_or_zero),
]


@given(st.lists(TXT | st.none(), min_size=1, max_size=30))
@settings(max_examples=25, deadline=None)
def test_parsers_match_python_reference(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "c string")
    exprs = [fn("c").alias(f"e{i}") for i, (fn, _) in enumerate(CASES)]
    rows = df.select(*exprs).collect()
    for row, v in zip(rows, values):
        for i, (_, pyfn) in enumerate(CASES):
            assert row[f"e{i}"] == pyfn(v), (v, CASES[i][1].__name__)
