"""Pinned dirty-text contract for the dedup / text-analysis family.

Same mechanism as tests/test_zero_vector_contract.py, pointed at the
``documents`` surface: real queries()/oracle_sql() pairs replayed on a
poisoned corpus -- NULL text, empty string, whitespace-only,
punctuation-only, a single token, non-ASCII text, a megatoken, and an
exact-duplicate pair -- Spark vs DuckDB row-for-row.  A crawl at 100 TB
contains ALL of these; a text operator whose engine and oracle disagree
on them would pass every clean-testdata gate and then silently diverge
in production.
"""

from __future__ import annotations

import pandas as pd
import pytest

from mapreduce6240project_spark.plans import REGISTRY


@pytest.fixture(scope="module")
def dirty_docs_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("dirty_docs_sf")
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "orders ship from the warehouse every weekday morning at dawn",
        "big order scan finds the top customers in every region fast",
        "a supplier in europe ships brass parts to asia every month",
        "click purchase click purchase the funnel converts at dawn",
        "data pipelines dedup tokenize and pack documents into shards",
    ]
    rows = []
    for i in range(24):
        rows.append(
            (
                i,
                f"{base[i % len(base)]} variant {i}",
                ["en", "de", "es"][i % 3],
                f"src{i % 4}",
            )
        )
    # the poison
    rows += [
        (900, None, "en", "src0"),          # NULL text
        (901, "", "de", "src1"),            # empty
        (902, "   ", "es", "src2"),         # whitespace-only
        (903, "...!!!", "en", "src3"),      # punctuation-only
        (904, "hello", "de", "src0"),       # single token (< shingle n)
        (905, "héllo wörld 你好", "zh", "src1"),  # non-ASCII
        (906, "x" * 5000, "en", "src2"),    # one megatoken
        (907, base[0], "en", "src3"),       # exact duplicate of...
        (908, base[0], "en", "src0"),       # ...this one
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
def dirty_duck(dirty_docs_dir):
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{dirty_docs_dir}/documents.parquet'"
    )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


REPLAY = [
    # dedup family
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_pipeline",
    "winnow_fingerprint_pairs",
    "dedup_paragraphs",
    "doc_fingerprint",
    "containment_pairs",
    "dedup_bag_fingerprint",
    # text analysis
    "token_count",
    "lang_id",
    "text_quality",
    "text_stats",
    "vocab_top50",
    "bigram_top20",
    "doc_size_pct_rank",
    "token_entropy",
    "byte_char_density",
    "tokenizer_fertility",
    # wave 94-95 text ops (NULL text/lang/source, empty and
    # whitespace-only docs, exact dup pairs)
    "kn_bigram_nll",
    "dup_span_extents",
    "js_divergence_sources",
]


@pytest.mark.parametrize("name", REPLAY)
def test_registry_replay_on_dirty_docs(spark, dirty_docs_dir, dirty_duck, name):
    spec = REGISTRY[name]
    got = _normalize(spec.fn(spark, dirty_docs_dir).toPandas())
    want = _normalize(dirty_duck.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)
