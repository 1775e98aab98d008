"""Semantic invariants for wave 46 (k-fold, confusion matrix,
throttle)."""

from __future__ import annotations

import datetime

from mapreduce6240project_spark.plans.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_kfold_balance_within_one(spark):
    rows = REGISTRY["kfold5_assign"].fn(spark, SF).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, {})[r.fold] = r.n
    for seg, folds in by_seg.items():
        assert set(folds) == {0, 1, 2, 3, 4}
        # round-robin by rank: fold sizes differ by at most 1
        assert max(folds.values()) - min(folds.values()) <= 1, (seg, folds)


def test_confusion_matrix_diagonal_dominates_and_reconciles(spark):
    rows = REGISTRY["lang_confusion_matrix"].fn(spark, SF).collect()
    from mapreduce6240project_spark.sources.tables import load_table

    total = sum(r.n for r in rows)
    assert total == load_table(spark, SF, "documents").count()
    # marker languages overlap (la in es+fr) but en diagnal should hold:
    en_row = {r.pred_lang: r.n for r in rows if r.true_lang == "en"}
    assert en_row.get("en", 0) >= max(
        v for k, v in en_row.items() if k != "en"
    )


def test_throttle_counts(spark):
    t0 = datetime.datetime(2024, 1, 1, 8, 0)

    def at(mins):
        return t0 + datetime.timedelta(minutes=mins)

    ev = spark.createDataFrame(
        [
            (1, 5, "click", at(0)),    # kept (first)
            (2, 5, "click", at(30)),   # suppressed (< 1h after #1)
            (3, 5, "click", at(95)),   # kept (65 min after #2)
            (4, 5, "view", at(1)),     # kept (different type)
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    from pyspark.sql import functions as F

    g = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"),
        F.expr(
            "lag(unix_micros(ts)) OVER (PARTITION BY user_id, event_type"
            " ORDER BY unix_micros(ts), event_id)"
        ).alias("prev_us"),
    )
    out = {
        (r.user_id, r.event_type): (r.n_total, r.n_kept)
        for r in g.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(
                    F.col("prev_us").isNull()
                    | (F.col("us") - F.col("prev_us") > 3_600_000_000),
                    1,
                ).otherwise(0)
            ).alias("n_kept"),
        )
        .collect()
    }
    assert out[(5, "click")] == (3, 2)
    assert out[(5, "view")] == (1, 1)
