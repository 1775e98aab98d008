"""Pinned dirty-edge/dirty-corpus contract for the graph family
(round-6 verdict item 6 -- the fifth dirty-input replay suite).

Two layers:

1. **Operator-level dirty edges** -- NULL endpoints, a both-NULL edge,
   self-loops, exact and REVERSED duplicates -- into
   connected_components (driver AND forced-distributed paths),
   triangle_count, degree_histogram, kcore, bfs_hops, and the two
   pagerank variants, against hand-computed truths.  Before the
   round-7 hygiene contract these inputs crashed the driver union-find
   (``None < None``), fabricated NULL graph nodes, and double-counted
   triangles/degrees via reversed duplicates.

2. **Registry replay on a poisoned corpus** -- real queries()/
   oracle_sql() pairs of the simgraph family run on documents poisoned
   with NULL/empty/whitespace/short/duplicate texts, Spark vs DuckDB
   row-for-row (same mechanism as the other four dirty suites).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans import REGISTRY

# ---------------------------------------------------------------------------
# layer 1: operator-level dirty edges
# ---------------------------------------------------------------------------

DIRTY_EDGES = [
    (1, 2), (2, 1),            # reversed duplicate
    (2, 3), (2, 3),            # exact duplicate
    (4, 4),                    # self-loop
    (5, None), (None, 6),      # NULL endpoints
    (None, None),              # both NULL
    (7, 8), (8, 9), (7, 9),    # triangle
    (10, 11),
]


@pytest.fixture(scope="module")
def dirty_pairs(spark):
    return spark.createDataFrame(
        DIRTY_EDGES, "id_a bigint, id_b bigint"
    ).cache()


def test_connected_components_dirty_driver_and_distributed(dirty_pairs):
    from mapreduce6240project_spark.operators.graph import connected_components

    want = {1: 1, 2: 1, 3: 1, 4: 4, 7: 7, 8: 7, 9: 7, 10: 10, 11: 10}
    for cap in (200_000, 0):  # driver union-find / forced label-propagation
        got = {
            r.node: r.component
            for r in connected_components(
                dirty_pairs, driver_edge_cap=cap
            ).collect()
        }
        assert got == want, (cap, got)


def test_triangle_count_dirty(dirty_pairs, spark):
    from mapreduce6240project_spark.operators.graph import triangle_count

    assert triangle_count(dirty_pairs).first().n_triangles == 1
    # reversed duplicates alone must not manufacture triangles
    dup = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)],
        "id_a bigint, id_b bigint",
    )
    assert triangle_count(dup).first().n_triangles == 1


def test_degree_histogram_dirty(dirty_pairs):
    from mapreduce6240project_spark.operators.graph import degree_histogram

    got = {r.degree: r.n_nodes for r in degree_histogram(dirty_pairs).collect()}
    # deg 1: {1, 3, 10, 11}; deg 2: {2, 7, 8, 9}; the self-loop node 4
    # and the NULL-edge nodes 5/6 have no undirected degree
    assert got == {1: 4, 2: 4}


def test_kcore_dirty(dirty_pairs):
    from mapreduce6240project_spark.operators.graph import kcore

    got = {r.node: r.core_deg for r in kcore(dirty_pairs, k=2).collect()}
    assert got == {7: 2, 8: 2, 9: 2}


def test_bfs_dirty(dirty_pairs):
    from mapreduce6240project_spark.operators.graph import bfs_hops

    got = {r.node: r.hops for r in bfs_hops(dirty_pairs, source=7).collect()}
    assert got == {7: 0, 8: 1, 9: 1}
    # a node that only ever appeared via NULL edges reaches nothing
    only_null = {r.node: r.hops for r in bfs_hops(dirty_pairs, source=5).collect()}
    assert only_null == {5: 0}


def test_pagerank_dirty_node_set(dirty_pairs):
    from mapreduce6240project_spark.operators.graph import (
        pagerank_quantized,
        personalized_pagerank_quantized,
    )

    nodes = {r.node for r in pagerank_quantized(dirty_pairs).collect()}
    assert nodes == {1, 2, 3, 7, 8, 9, 10, 11}  # no NULL, no self-loop-only
    pnodes = {
        r.node for r in personalized_pagerank_quantized(dirty_pairs).collect()
    }
    assert pnodes == nodes
    # rank mass is conserved-ish: all ranks positive bigints
    assert all(
        r.pr > 0 for r in pagerank_quantized(dirty_pairs).collect()
    )


def test_global_clustering_dirty(dirty_pairs):
    from mapreduce6240project_spark.operators.graph import global_clustering

    r = global_clustering(dirty_pairs).first()
    # wedges: deg-2 nodes {2, 7, 8, 9} contribute C(2,2)=1 each -> 4
    assert (r.n_triangles, r.n_wedges) == (1, 4)
    assert r.gcc_micros == 750000  # 3*1/4


# ---------------------------------------------------------------------------
# layer 2: registry replay on a poisoned corpus (simgraph family)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dirty_graph_docs_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("dirty_graph_sf")
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "orders ship from the warehouse every weekday morning at dawn",
        "big order scan finds the top customers in every region fast",
        "a supplier in europe ships brass parts to asia every month",
    ]
    rows = []
    # near-dup clusters so the simgraph has real components/triangles:
    # 3 one-token variants of each base doc jaccard-connect
    for i in range(24):
        b = base[i % len(base)]
        rows.append((i, f"{b} tail{i // len(base)}", "en", f"src{i % 4}"))
    rows += [
        (900, None, "en", "src0"),           # NULL text
        (901, "", "de", "src1"),             # empty
        (902, "   ", "es", "src2"),          # whitespace-only
        (903, "solo", "en", "src3"),         # single token
        (904, base[0], "en", "src0"),        # exact duplicate of...
        (905, base[0], "en", "src1"),        # ...each other
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array(
                [len(r[1]) if r[1] is not None else None for r in rows],
                pa.int64(),
            ),
        }
    )
    pq.write_table(tbl, root / "documents.parquet")
    return str(root)


@pytest.fixture(scope="module")
def dirty_graph_duck(dirty_graph_docs_dir):
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{dirty_graph_docs_dir}/documents.parquet'"
    )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


REPLAY = [
    "dup_component_sizes",
    "triangle_count_simgraph",
    "degree_histogram_simgraph",
    "pagerank_simgraph",
    "bfs_hops_simgraph",
    "degree_assortativity",
    "graph_diameter_sweep",
    "ppr_seeded",
]


@pytest.mark.parametrize("name", REPLAY)
def test_registry_replay_on_dirty_graph_docs(
    spark, dirty_graph_docs_dir, dirty_graph_duck, name
):
    spec = REGISTRY[name]
    if spec.oracle is None:
        pytest.skip("rows-only query")
    got = _normalize(spec.fn(spark, dirty_graph_docs_dir).toPandas())
    want = _normalize(dirty_graph_duck.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)


# ---------------------------------------------------------------------------
# layer 2b: the co-purchase graph family on a poisoned orders/lineitem
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dirty_copurchase_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("dirty_copurchase_sf")
    # co-purchase structure: parts {1,2,3} co-occur in >= 2 orders each
    # pair (a dense triangle); parts {10,11} share exactly 2 orders;
    # part 20 appears once per order (support 1, filtered)
    li = []
    for o in (100, 101, 102):
        for p in (1, 2, 3):
            li.append((o, p))
    for o in (103, 104):
        li.append((o, 10))
        li.append((o, 11))
    li.append((105, 20))
    # the poison
    li += [
        (None, 1),        # NULL orderkey
        (100, None),      # NULL partkey
        (None, None),     # both NULL
        (100, 1),         # exact duplicate line (same order, same part)
        (100, 1),         # twice
        (9999, 7),        # order with a single line (no pair)
    ]
    orders = [(o, o % 5 + 1) for o in (100, 101, 102, 103, 104, 105)]
    orders += [(106, None), (None, 3)]  # NULL custkey / NULL orderkey
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in li], pa.int64()),
                "l_partkey": pa.array([r[1] for r in li], pa.int64()),
            }
        ),
        root / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
                "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
            }
        ),
        root / "orders.parquet",
    )
    return str(root)


@pytest.fixture(scope="module")
def dirty_copurchase_duck(dirty_copurchase_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{dirty_copurchase_dir}/{t}.parquet'"
        )
    yield con
    con.close()


COPURCHASE_REPLAY = [
    "adamic_adar_topk",
    "random_walks_k3",
    "hits_authorities_top10",
    "kcore3_copurchase",
]


@pytest.mark.parametrize("name", COPURCHASE_REPLAY)
def test_registry_replay_on_dirty_copurchase(
    spark, dirty_copurchase_dir, dirty_copurchase_duck, name
):
    spec = REGISTRY[name]
    got = _normalize(spec.fn(spark, dirty_copurchase_dir).toPandas())
    want = _normalize(dirty_copurchase_duck.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)
