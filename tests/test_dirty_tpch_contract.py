"""Pinned dirty-row contract for the relational (TPC-H-shape) family.

Same mechanism as the vector/text/events replays, pointed at the
``lineitem``/``orders`` surface: real queries()/oracle_sql() pairs
replayed on a poisoned star -- NULL dates, NULL keys, NULL / zero /
negative quantities and prices, NULL status/flag strings, an orphan
lineitem (no matching order) and a lineitem-less order -- Spark vs
DuckDB row-for-row.  Fact tables at ingest carry exactly these rows;
the known engine asymmetries (Spark ASC = NULLS FIRST vs DuckDB NULLS
LAST, null-skipping vs null-propagating folds) are invisible on clean
testdata.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from mapreduce6240project_spark.plans import REGISTRY

_D0 = dt.datetime(1996, 1, 1)


@pytest.fixture(scope="module")
def dirty_tpch_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("dirty_tpch_sf")
    statuses = ["F", "O", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orders = []
    for i in range(60):
        orders.append(
            (
                i,
                i % 11,
                statuses[i % 3],
                round(1000.0 + (i * 97 % 9000) / 3.0, 2),
                _D0 + dt.timedelta(days=17 * i % 1400),
                prios[i % 5],
            )
        )
    orders += [
        (900, 1, "F", 5000.0, None, "1-URGENT"),     # NULL orderdate
        (901, None, "O", 6000.0, _D0, "2-HIGH"),     # NULL custkey
        (902, 2, None, 7000.0, _D0, "3-MEDIUM"),     # NULL status
        (903, 3, "F", None, _D0, "5-LOW"),           # NULL totalprice
        (904, 4, "O", 0.0, _D0, "5-LOW"),            # zero totalprice
        (905, 5, "F", 8000.0, _D0, None),            # NULL priority
        (906, 6, "O", 123.45, _D0, "1-URGENT"),      # lineitem-less order
    ]
    lines = []
    ln = 0
    for i in range(60):
        for j in range(1 + i % 3):
            ln += 1
            lines.append(
                (
                    i,
                    (i * 7 + j) % 40,
                    (i * 3 + j) % 10,
                    j + 1,
                    float(1 + (i + j) % 50),
                    round(100.0 + (i * 131 + j * 17) % 5000 / 7.0, 2),
                    round((i % 10) / 100.0, 2),
                    0.05,
                    ["N", "R", "A"][(i + j) % 3],
                    ["O", "F"][i % 2],
                    _D0 + dt.timedelta(days=(17 * i + 30 + j) % 1400),
                )
            )
    lines += [
        (900, 1, 1, 1, None, 500.0, 0.05, 0.05, "N", "O",
         _D0 + dt.timedelta(days=5)),                         # NULL quantity
        (901, 2, 2, 1, 10.0, None, 0.05, 0.05, "R", "F",
         _D0 + dt.timedelta(days=6)),                         # NULL price
        (902, 3, 3, 1, -4.0, -250.0, 0.0, 0.0, "A", "O",
         _D0 + dt.timedelta(days=7)),                         # negative qty/price
        (903, 4, 4, 1, 10.0, 300.0, None, 0.05, None, "F",
         _D0 + dt.timedelta(days=8)),                         # NULL discount/flag
        (904, 5, 5, 1, 10.0, 300.0, 0.05, 0.05, "N", None, None),  # NULL shipdate/status
        (99999, 6, 6, 1, 10.0, 300.0, 0.05, 0.05, "N", "O",
         _D0 + dt.timedelta(days=9)),                         # orphan lineitem
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
                "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in orders], pa.string()),
                "o_totalprice": pa.array([r[3] for r in orders], pa.float64()),
                "o_orderdate": pa.array(
                    [r[4] for r in orders], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(
                    [r[5] for r in orders], pa.string()
                ),
            }
        ),
        root / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
                "l_partkey": pa.array([r[1] for r in lines], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in lines], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in lines], pa.int32()),
                "l_quantity": pa.array([r[4] for r in lines], pa.float64()),
                "l_extendedprice": pa.array(
                    [r[5] for r in lines], pa.float64()
                ),
                "l_discount": pa.array([r[6] for r in lines], pa.float64()),
                "l_tax": pa.array([r[7] for r in lines], pa.float64()),
                "l_returnflag": pa.array([r[8] for r in lines], pa.string()),
                "l_linestatus": pa.array([r[9] for r in lines], pa.string()),
                "l_shipdate": pa.array(
                    [r[10] for r in lines], pa.timestamp("us")
                ),
            }
        ),
        root / "lineitem.parquet",
    )
    # dirty dimensions: NULL keys, NULL brands/nations, dangling refs
    brands = [f"Brand#{1 + i % 5}{1 + i % 5}" for i in range(40)]
    parts = [
        (i, f"part {i}", brands[i], f"TYPE {i % 7}", i % 50,
         round(900.0 + i, 2))
        for i in range(40)
    ]
    parts += [
        (950, "null brand", None, "TYPE 1", 5, 901.0),   # NULL brand
        (None, "null key", "Brand#11", "TYPE 2", 6, 902.0),  # NULL partkey
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in parts], pa.int64()),
                "p_name": pa.array([r[1] for r in parts], pa.string()),
                "p_brand": pa.array([r[2] for r in parts], pa.string()),
                "p_type": pa.array([r[3] for r in parts], pa.string()),
                "p_size": pa.array([r[4] for r in parts], pa.int32()),
                "p_retailprice": pa.array(
                    [r[5] for r in parts], pa.float64()
                ),
            }
        ),
        root / "part.parquet",
    )
    custs = [
        (i, f"cust {i}", i % 6, round(100.0 * i, 2),
         ["BUILDING", "MACHINERY", "AUTOMOBILE"][i % 3])
        for i in range(10)
    ]
    custs += [
        (960, "null nation", None, 10.0, "BUILDING"),  # NULL nationkey
        (None, "null key", 1, 11.0, "MACHINERY"),      # NULL custkey
        (961, "dangling nation", 99, 12.0, "BUILDING"),  # no such nation
    ]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in custs], pa.int64()),
                "c_name": pa.array([r[1] for r in custs], pa.string()),
                "c_nationkey": pa.array([r[2] for r in custs], pa.int32()),
                "c_acctbal": pa.array([r[3] for r in custs], pa.float64()),
                "c_mktsegment": pa.array([r[4] for r in custs], pa.string()),
            }
        ),
        root / "customer.parquet",
    )
    nations = [(i, f"NATION_{i}", i % 3) for i in range(6)]
    nations += [(7, None, 1)]  # NULL name
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([r[0] for r in nations], pa.int32()),
                "n_name": pa.array([r[1] for r in nations], pa.string()),
                "n_regionkey": pa.array([r[2] for r in nations], pa.int32()),
            }
        ),
        root / "nation.parquet",
    )
    return str(root)


@pytest.fixture(scope="module")
def dirty_tpch_duck(dirty_tpch_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("orders", "lineitem", "part", "customer", "nation"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{dirty_tpch_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


REPLAY = [
    # windows/ordering over dates and amounts
    "mom_revenue_growth",
    "orders_backlog_daily",
    "revenue_waterfall_monthly",
    "new_vs_returning_monthly",
    "first_order_vs_ltv",
    "open_order_aging",
    "fill_days_quantiles",
    "order_rank_profile",
    "rfm_segments",
    "lorenz_deciles",
    "orderkey_gap_audit",
    "dup_payment_pairs",
    "encoding_advisor",
    # aggregation / grouping shapes
    "pricing_summary",
    "rollup_revenue",
    "cube_order_counts",
    "corr_by_returnflag",
    "benford_totalprice",
    "month_of_year_index",
    "mad_outlier_prices",
    # sampling / checksum
    "weighted_sample_by_status",
    "table_checksum_orders",
    # wave 94-96 over dirty dimensions (NULL part/customer keys, NULL
    # brands/nations, dangling references)
    "mase_seasonal_naive",
    "simpson_reversal_audit",
    "theil_index_nations",
    "bradley_terry_brands",
    "modularity_brand_partition",
    "stump_split_gain",
]


@pytest.mark.parametrize("name", REPLAY)
def test_registry_replay_on_dirty_tpch(
    spark, dirty_tpch_dir, dirty_tpch_duck, name
):
    spec = REGISTRY[name]
    got = _normalize(spec.fn(spark, dirty_tpch_dir).toPandas())
    want = _normalize(dirty_tpch_duck.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)
