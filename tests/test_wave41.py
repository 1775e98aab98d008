"""Semantic invariants for wave 41 (decayed trending, label scatter)."""

from __future__ import annotations

import datetime

from mapreduce6240project_spark.operators.analytics import (
    DECAY_MICRO,
    trending_scores,
)
from mapreduce6240project_spark.operators.vectors import label_scatter_ratio


def test_decay_table_is_exact_fixed_point():
    assert DECAY_MICRO[0] == 1_000_000
    assert DECAY_MICRO[1] == 900_000
    assert DECAY_MICRO[2] == 810_000
    assert all(a > b for a, b in zip(DECAY_MICRO, DECAY_MICRO[1:]))


def test_trending_weights_recent_days_higher(spark):
    d0 = datetime.datetime(2024, 1, 10, 12, 0)
    rows = []
    # type "new": 10 events on the newest day; type "old": 10 events 5
    # days earlier -- same volume, newer must outscore older
    for i in range(10):
        rows.append((d0, "new"))
        rows.append((d0 - datetime.timedelta(days=5), "old"))
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r.event_type: r.score_micro for r in trending_scores(ev).collect()}
    assert out["new"] == 10 * 1_000_000
    assert out["old"] == 10 * DECAY_MICRO[5]
    assert out["new"] > out["old"]


def test_label_scatter_separable_vs_shuffled(spark):
    # separable: labels live at distinct corners -> between >> within
    sep = spark.createDataFrame(
        [(i, [float(i % 2) * 10, 1.0], i % 2) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    )
    r = label_scatter_ratio(sep).collect()[0]
    assert r.n_labels == 2
    assert r.within == 0  # identical vectors within each label
    assert r.between > 0 and r.ratio_micro > 0

    # unseparable: identical distribution in both labels -> between ~ 0
    uns = spark.createDataFrame(
        [(i, [float(i % 2), 1.0], (i // 2) % 2) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    )
    r2 = label_scatter_ratio(uns).collect()[0]
    assert r2.between == 0
    assert r2.within > 0
