"""Pinned dirty-events contract for the windowing / session / funnel /
time-series family.

Same mechanism as the zero-vector and dirty-text replays, pointed at
the ``events`` surface: real queries()/oracle_sql() pairs replayed on a
poisoned event log -- NULL timestamp, NULL user, NULL event_type, NULL
and zero and negative values, NULL and malformed props JSON, epoch and
far-future timestamps -- Spark vs DuckDB row-for-row.  Event logs at
ingest are exactly this dirty; a window/funnel kernel whose engine and
oracle disagree on them passes every clean-testdata gate and diverges
in production.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from mapreduce6240project_spark.plans import REGISTRY

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def dirty_events_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("dirty_events_sf")
    types = ["click", "view", "purchase", "signup", "error"]
    rows = []
    for i in range(120):
        rows.append(
            (
                i,
                _T0 + dt.timedelta(minutes=7 * i, seconds=i % 50),
                i % 9,
                types[i % 5],
                round(10.0 + (i * 37 % 500) / 7.0, 2),
                '{"k": %d}' % (i % 40),
            )
        )
    rows += [
        (900, None, 1, "click", 50.0, '{"k": 1}'),          # NULL ts
        (901, _T0 + dt.timedelta(hours=3), None, "view", 60.0, '{"k": 2}'),  # NULL user
        (902, _T0 + dt.timedelta(hours=4), 2, None, 70.0, '{"k": 3}'),       # NULL type
        (903, _T0 + dt.timedelta(hours=5), 3, "purchase", None, '{"k": 4}'),  # NULL value
        (904, _T0 + dt.timedelta(hours=6), 4, "click", 0.0, '{"k": 5}'),      # zero value
        (905, _T0 + dt.timedelta(hours=7), 5, "view", -42.5, '{"k": 6}'),     # negative
        (906, _T0 + dt.timedelta(hours=8), 6, "click", 80.0, None),           # NULL props
        (907, _T0 + dt.timedelta(hours=9), 7, "view", 90.0, "{not json"),     # bad JSON
        (908, dt.datetime(1970, 1, 1, 0, 0, 1), 8, "click", 5.0, '{"k": 7}'),  # epoch
        (909, dt.datetime(2099, 12, 31, 23, 59, 59), 0, "purchase", 7.5, '{"k": 8}'),  # far future
        # valid JSON, non-numeric $.k: passes json_valid, so only
        # TRY_CAST / try_variant_get keep the engines aligned (DuckDB
        # CAST('x' AS INT) raises; Spark non-ANSI cast yields NULL)
        (910, _T0 + dt.timedelta(hours=10), 1, "view", 12.0, '{"k": "x"}'),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, root / "events.parquet")
    return str(root)


@pytest.fixture(scope="module")
def dirty_events_duck(dirty_events_dir):
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS "
        f"SELECT * FROM '{dirty_events_dir}/events.parquet'"
    )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


REPLAY = [
    "tumbling_window",
    "session_window",
    "event_funnel",
    "inter_event_gaps",
    "out_of_order_lag",
    "user_running_value",
    "value_histogram",
    "distinct_users",
    "hourly_heatmap",
    "funnel_strict_3step",
    "session_transitions",
    "retention_cohorts",
    "twap_user_value",
    "ohlc_hourly_value",
    "value_moving_avg_30m",
    "events_throttle_1h",
    "user_active_streaks",
    "dau_wau_stickiness",
    # props JSON family (fixture carries NULL and malformed props)
    "props_json_stats",
    "event_props_map",
    "props_variant_deciles",
    "session_path_top10",
    # wave 94-96 statistics over the events surface (NULL ts/value/
    # type/user rows must be excluded identically on both engines)
    "acf_top_period",
    "seasonal_decompose_daily",
    "mann_whitney_effect",
    "iv_wald_estimate",
    "dp_laplace_counts",
    "ams_f2_user_stream",
    "ece_calibration",
    # feature-store-derived: the ingest filters (P1-P4) must drop the
    # same dirty rows before the multi-k sweep on both engines
    "elbow_knee_k",
    # wave 97-99 statistics over the events surface
    "qte_deciles",
    "wasserstein_value_gap",
    "bh_fdr_type_gaps",
    "f1_threshold_sweep",
]


@pytest.mark.parametrize("name", REPLAY)
def test_registry_replay_on_dirty_events(
    spark, dirty_events_dir, dirty_events_duck, name
):
    spec = REGISTRY[name]
    got = _normalize(spec.fn(spark, dirty_events_dir).toPandas())
    want = _normalize(dirty_events_duck.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)
