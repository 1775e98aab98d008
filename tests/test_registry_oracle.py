"""Mirror of the driver's t2 correctness gate: run every registry query
on Spark and its oracle on DuckDB at sf0.001 (fast) and compare
row-count + schema-width + order-insensitive values."""

from __future__ import annotations

import pandas as pd
import pytest

from mapreduce6240project_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"

ORACLE_SPECS = [s for s in REGISTRY.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in REGISTRY.values() if s.oracle is None]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_match(spark, duck, spec):
    got = _normalize(spec.fn(spark, SF).toPandas())
    want = _normalize(duck.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert got.shape == want.shape
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_runs(spark, spec):
    df = spec.fn(spark, SF)
    assert df.count() >= 0
    assert len(df.columns) > 0
