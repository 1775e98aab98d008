"""Grouped-map Pandas operators (``applyInPandas``).

The engine's policy is expressions-first (SCALE.md); this module is the
demonstration of the *grouped-map* escape hatch for per-group logic that
genuinely wants a dataframe in memory -- the UDAF-shaped third member of
the Python-interop family (``mapInPandas`` in operators.multimodal,
``applyInPandasWithState`` in streaming.jobs).

``zscore_by_group`` is deliberately also expressible with window
functions, which is exactly what makes it oracle-checkable: the DuckDB
oracle computes the same z-scores relationally, proving the Arrow
group-map path end-to-end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def zscore_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    ndigits: int = 4,
) -> DataFrame:
    """Per-group z-score of ``value_col`` (sample stddev, ddof=1), via
    Arrow-batched grouped-map.  Groups with stddev 0 or a single row
    yield z = 0.0."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        if pd.isna(std) or std == 0.0:
            z = pdf[value_col] * 0.0
        else:
            z = (pdf[value_col] - mean) / std
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                "zscore": z.round(ndigits),
            }
        )

    schema = f"{id_col} long, {group_col} int, zscore double"
    return df.groupBy(group_col).applyInPandas(per_group, schema=schema)
