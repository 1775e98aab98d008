"""Semantic invariants for wave 50 (byte density, hard negatives)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_byte_density_multibyte_text(spark):
    docs = spark.createDataFrame(
        [(1, "hello", "en"), (2, "你好吗", "zh")],
        "doc_id long, text string, lang string",
    )
    out = {
        r.lang: (r.n_bytes, r.n_chars, r.density_micro)
        for r in docs.groupBy("lang")
        .agg(
            F.sum(F.octet_length("text")).cast("bigint").alias("n_bytes"),
            F.sum(F.length("text")).cast("bigint").alias("n_chars"),
            F.expr(
                "sum(octet_length(text)) * 1000000 div sum(length(text))"
            ).cast("bigint").alias("density_micro"),
        )
        .collect()
    }
    assert out["en"] == (5, 5, 1_000_000)
    assert out["zh"] == (9, 3, 3_000_000)  # CJK: 3 bytes per char


def test_hard_negatives_exclude_same_label(spark):
    rows = REGISTRY["hard_negatives_cells"].fn(spark, SF).collect()
    assert len(rows) > 0
    assert all(r.label_a != r.label_b for r in rows)
    assert all(r.n_pairs > 0 for r in rows)
