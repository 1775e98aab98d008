"""Pinned zero-norm / null-vector contract for the similarity family
(round-5 verdict item 1).

Contract: an undefined cosine (zero-norm, NULL, or NULL-element vector)
is NULL -- never NaN.  NULL fails every ``>= threshold`` filter and is
excluded from top-k rankings, so a degenerate embedding can never top a
ranking or pair with everything in its bucket.  ``ivf_assign`` AND
``lsh_assign`` DROP NULL / NULL-element vectors identically on their
expression, Arrow, and oracle paths (a hash over undefined signs would
otherwise silently collapse every degenerate vector into bucket 0);
only a width/dim mismatch raises -- that is a configuration error, not
a data defect.

The registry replay below runs the REAL queries()/oracle_sql() pairs on
a poisoned corpus (zero vector + whole-NULL vector + NULL-element
vector + a prefix-aligned vector whose NULL lies beyond the matryoshka
prefix) -- Spark vs DuckDB must agree row-for-row, which is exactly the
check the external driver would run if the testdata grew a degenerate
embedding.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans import REGISTRY

DIM = 64


def _vec(i: int) -> list[float]:
    # deterministic pseudo-random unit-ish components in [-0.5, 0.5)
    return [
        (((i * DIM + d) * 1103515245 + 12345) % 2147483648) / 2147483648.0
        - 0.5
        for d in range(DIM)
    ]


@pytest.fixture(scope="module")
def poisoned_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("poisoned_sf")
    ids, vecs, labels = [], [], []
    for i in range(30):
        ids.append(i)
        vecs.append(_vec(i))
        labels.append(i % 3)
    # near-duplicate of vector 3 so pair/dedup queries have matches
    ids.append(40)
    vecs.append([x * 1.001 for x in _vec(3)])
    labels.append(1)
    # the poison: zero-norm, whole-NULL, and NULL-element vectors; 903
    # is the adversarial matryoshka case -- its first 16 dims EQUAL the
    # query's (prefix cosine 1.0, would top the prefix ranking) while a
    # trailing NULL makes the full vector undefined, so both engines
    # must exclude it from BOTH rankings, not just the full one
    ids.extend([900, 901, 902, 903])
    vecs.extend(
        [
            [0.0] * DIM,
            None,
            [0.1] * (DIM - 1) + [None],
            _vec(0)[:16] + [0.2] * (DIM - 17) + [None],
        ]
    )
    labels.extend([0, 1, 2, 0])
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, root / "embeddings.parquet")
    return str(root)


@pytest.fixture(scope="module")
def poisoned_duck(poisoned_dir):
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{poisoned_dir}/embeddings.parquet'"
    )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


REPLAY = [
    "embedding_topk",
    "embedding_range_search",
    "embedding_pairs_exact",
    "embedding_dup_pairs",
    "semantic_dedup",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_recall_at10",
    "knn_graph_top3",
    "matryoshka_recall16",
    # the remaining cosine/IVF consumers: recall/balance audits, MMR,
    # label retrieval metrics, int8 quantization
    "ivf_recall_curve",
    "ivf_cell_balance",
    "hard_negatives_cells",
    "mmr_select_diverse",
    "label_maxsim_rank",
    "retrieval_mrr_at10",
    "ndcg_at10",
    "embedding_quantize",
]


@pytest.mark.parametrize("name", REPLAY)
def test_registry_replay_on_poisoned_corpus(
    spark, poisoned_dir, poisoned_duck, name
):
    spec = REGISTRY[name]
    got = _normalize(spec.fn(spark, poisoned_dir).toPandas())
    want = _normalize(poisoned_duck.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)


def test_cosine_null_never_nan(spark):
    from mapreduce6240project_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [0.0, 1.0]),
            (2, [0.0, 0.0], [1.0, 1.0]),  # zero-norm left
            (3, None, [1.0, 1.0]),  # NULL vector
            (4, [1.0, None], [1.0, 1.0]),  # NULL element
        ],
        "id long, a array<double>, b array<double>",
    )
    rows = {r["id"]: r["c"] for r in df.select("id", cosine("a", "b").alias("c")).collect()}
    assert rows[1] == 0.0
    assert rows[2] is None and rows[3] is None and rows[4] is None
    assert not any(isinstance(v, float) and math.isnan(v) for v in rows.values())


def test_cosine_topk_excludes_undefined(spark):
    from mapreduce6240project_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.5, 0.5]), (2, [0.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    got = cosine_topk(emb, [1.0, 0.0], k=10).collect()
    assert [r.vec_id for r in got] == [0, 1]  # zero/NULL never ranked


def test_pandas_udf_cosine_null_on_zero_norm(spark):
    from mapreduce6240project_spark.operators.similarity import (
        make_cosine_pandas_udf,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, None), (3, [1.0, None])],
        "vec_id long, embedding array<double>",
    )
    udf = make_cosine_pandas_udf([1.0, 0.0])
    rows = {
        r.vec_id: r.sim
        for r in emb.select("vec_id", udf("embedding").alias("sim")).collect()
    }
    assert rows[0] == pytest.approx(1.0)
    # zero-norm, whole-NULL (would crash np.asarray un-masked), and
    # NULL-element all map to NULL -- never NaN, never a task kill
    assert rows[1] is None and rows[2] is None and rows[3] is None


def test_ivf_assign_paths_drop_nulls_identically(spark):
    from mapreduce6240project_spark.operators.similarity import ivf_assign

    rows = [(i, _vec(i)) for i in range(12)] + [
        (900, [0.0] * DIM),
        (901, None),
        (902, [0.1] * (DIM - 1) + [None]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[0] * DIM, [500_000] * DIM]
    expr = ivf_assign(emb, centroids=cents, use_pandas=False)
    arrow = ivf_assign(emb, centroids=cents, use_pandas=True)
    e = {r.vec_id: r.cell for r in expr.collect()}
    a = {r.vec_id: r.cell for r in arrow.collect()}
    assert e == a
    assert 901 not in e and 902 not in e  # dropped, not cell 0
    assert 900 in e  # zero vector is a VALID integer-k-means point


def test_mmr_skips_zero_norm_and_survives_all_zero_pool(spark):
    from mapreduce6240project_spark.operators.similarity import mmr_select

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    got = mmr_select(emb, [1.0, 0.0], k=4)
    assert [r.vec_id for r in got.collect()] == [0, 1]

    all_zero = spark.createDataFrame(
        [(0, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    assert mmr_select(all_zero, [1.0, 0.0], k=2).count() == 0


def test_lsh_assign_drops_null_vectors_raises_on_width(spark):
    """NULL / NULL-element vectors are DROPPED from the LSH index (no
    defined signs; same exclusion contract as ivf_assign -- previously
    they silently hashed into bucket 0).  A width/dim mismatch is a
    configuration error and still raises per-row."""
    from mapreduce6240project_spark.operators.similarity import lsh_assign

    emb = spark.createDataFrame(
        [(0, [1.0, -1.0]), (1, None), (2, [1.0, None])],
        "vec_id long, embedding array<double>",
    )
    got = lsh_assign(emb, n_tables=2, n_bits=2, dim=2).collect()
    assert {r.vec_id for r in got} == {0}

    bad_width = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="width"):
        lsh_assign(bad_width, dim=2).collect()
