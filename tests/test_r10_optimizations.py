"""Focused tests for the round-10 optimization internals.

Each test pins an equivalence the r10 rewrites rely on:
* the F.expr fast path of medoid_distance_literal is bit-identical to
  the Column builder (including NULLs) and falls back when the medoid
  is not representable as a SQL literal;
* the fused kmedoids seed draw equals the distinct draw, including the
  duplicate-id fallback;
* the single-pass elbow sweep equals the former per-k union;
* the plan memos reuse plan objects without persisting data, and the
  ingest derivation can never alias the persisted feature store.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduce6240project_spark.functions.distance import (
    HASHTAG_WEIGHT,
    medoid_distance_literal,
)

SF = "/root/testdata/sf0.001"


def _column_distance(m, weighted=True):
    """The pre-r10 operator-by-operator construction, kept verbatim as
    the reference implementation."""
    w = HASHTAG_WEIGHT if weighted else 1.0
    return F.sqrt(
        F.pow(F.col("time_bucket") - F.lit(m["time_bucket"]), 2)
        + F.pow((F.col("num_hashtags") - F.lit(m["num_hashtags"])) * w, 2)
        + F.when(F.col("language") != F.lit(m["language"]), 1.0).otherwise(0.0)
        + F.pow(F.col("has_video") - F.lit(m["has_video"]), 2)
    )


@pytest.fixture(scope="module")
def probe(spark):
    return spark.createDataFrame(
        [
            (1, 2, "en", 1),
            (0, 0, "tr", 0),
            (3, 9, None, 1),  # NULL language row
            (2, 3, "o'brien", 0),  # quote in the data is fine either way
        ],
        "time_bucket INT, num_hashtags INT, language STRING, has_video INT",
    )


def test_distance_expr_fast_path_bit_exact(spark, probe):
    from mapreduce6240project_spark.plans.registry import MEDOIDS_BY_K

    medoids = [m for ms in MEDOIDS_BY_K.values() for m in ms]
    medoids.append(dict(medoids[0], language=None))  # NULL-literal medoid
    for m in medoids:
        for weighted in (True, False):
            got = probe.select(
                medoid_distance_literal(m, weighted).alias("d")
            ).collect()
            want = probe.select(_column_distance(m, weighted).alias("d")).collect()
            # exact doubles, not approx: the expressions must be
            # bit-identical for the oracle hash to stay stable
            assert [r["d"] for r in got] == [r["d"] for r in want], m


def test_distance_expr_falls_back_on_unrepresentable_medoid(spark, probe):
    # a quote in the medoid language cannot be embedded in the SQL
    # string form; the builder must fall back to the Column path and
    # still produce the right values
    m = {"time_bucket": 1, "num_hashtags": 2, "language": "o'brien", "has_video": 0}
    got = probe.select(medoid_distance_literal(m).alias("d")).collect()
    want = probe.select(_column_distance(m).alias("d")).collect()
    assert [r["d"] for r in got] == [r["d"] for r in want]
    # row 4 has language o'brien == medoid -> language term 0
    assert got[3]["d"] == probe.select(
        _column_distance(m).alias("d")
    ).collect()[3]["d"]


def test_kmedoids_fused_seed_draw_matches_distinct_draw(spark):
    from mapreduce6240project_spark.operators.clustering import FEATURE_COLS
    from mapreduce6240project_spark.operators.sampling import (
        sample_k_seeds,
        seed_hash,
    )
    from mapreduce6240project_spark.sources.tweets import feature_store

    feats = feature_store(spark, SF).select(*FEATURE_COLS)
    for k in (2, 3, 5):
        fused = (
            feats.orderBy(seed_hash("tweet_id"), F.col("tweet_id"))
            .limit(k)
            .collect()
        )
        distinct = [r.tweet_id for r in sample_k_seeds(feats, k).collect()]
        assert [r["tweet_id"] for r in fused] == distinct


def test_kmedoids_duplicate_ids_fall_back(spark):
    from mapreduce6240project_spark.operators.clustering import kmedoids
    from mapreduce6240project_spark.operators.sampling import sample_k_seeds
    from mapreduce6240project_spark.sources.tweets import feature_store

    feats = feature_store(spark, SF)
    # every id duplicated -> the fused TakeOrdered draw MUST see
    # adjacent duplicate ids in its top-k and fall back to the
    # distinct draw
    dup = feats.unionByName(feats)
    res = kmedoids(dup, k=3, max_iter=2, tol=0.0)
    seed_ids = [int(r.tweet_id) for r in sample_k_seeds(dup, 3).collect()]
    assert len(seed_ids) == len(set(seed_ids)) == 3
    got_ids = [int(m["tweet_id"]) for m in res.medoids]
    assert len(got_ids) == len(set(got_ids)) == 3  # distinct medoid ids


def test_elbow_single_pass_equals_per_k_union(spark):
    from mapreduce6240project_spark.operators.clustering import (
        assign_clusters,
        cluster_cost,
    )
    from mapreduce6240project_spark.plans import REGISTRY
    from mapreduce6240project_spark.plans.registry import MEDOIDS_BY_K
    from mapreduce6240project_spark.sources.tweets import feature_store

    feats = feature_store(spark, SF)
    old = None
    for k, medoids in MEDOIDS_BY_K.items():
        assigned = assign_clusters(feats, medoids)
        costs = cluster_cost(assigned, medoids).withColumn("k", F.lit(k))
        old = costs if old is None else old.unionByName(costs)
    want = {
        (r["k"], r["cluster"], r["n_members"], r["total_cost"])
        for r in old.select("k", "cluster", "n_members", "total_cost").collect()
    }
    got = {
        tuple(r)
        for r in REGISTRY["elbow_sweep"].fn(spark, SF).collect()
    }
    assert got == want


def test_load_table_memoizes_plan_without_persisting(spark):
    from mapreduce6240project_spark.sources.tables import load_table

    a = load_table(spark, SF, "orders")
    b = load_table(spark, SF, "orders")
    assert a is b  # plan object reuse
    assert a.storageLevel.useMemory is False  # nothing persisted
    assert a.count() > 0  # still computes from parquet


def test_ingest_plan_never_aliases_feature_store_cache(spark):
    import contextlib
    import io

    from mapreduce6240project_spark.sources.tweets import (
        feature_store,
        tweet_features_from_events,
    )

    ingest = tweet_features_from_events(spark, SF)
    # unrelated fixtures may legitimately have cached the ingest frame
    # itself (e.g. test_clustering's module fixture); that is caller
    # cache usage, not store aliasing -- clear it so this test checks
    # the STORE/ingest relation, not incidental session state
    if ingest.storageLevel.useMemory or ingest.storageLevel.useDisk:
        ingest.unpersist(blocking=True)
    feature_store(spark, SF).write.format("noop").mode("overwrite").save()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ingest.explain("formatted")
    plan = buf.getvalue()
    # the timed ETL derivation must recompute from parquet, never read
    # the persisted store (CacheManager substitutes plan-equal queries)
    assert "InMemoryRelation" not in plan and "InMemoryTableScan" not in plan
    assert "Scan parquet" in plan


def test_store_plan_differs_from_ingest_even_when_fan_out_is_noop(spark):
    """The at-scale regime (ADVICE r10, medium): once the events scan is
    already >= defaultParallelism partitions, fan_out is a no-op on BOTH
    plans, so the fan-out placement alone no longer separates them --
    the unconditional where(lit(True)) marker must.  Simulated by
    stubbing fan_out to identity and comparing ANALYZED plans with
    sameResult (exactly what CacheManager matches on)."""
    from mapreduce6240project_spark.operators import fanout
    from mapreduce6240project_spark.sources import tweets

    real_fan_out = fanout.fan_out
    fanout.fan_out = lambda df, min_factor=1.0: df
    try:
        ingest = tweets._derive_features(spark, SF, pre_fan_out=True)
        store_plan = fanout.fan_out(
            tweets._derive_features(spark, SF, pre_fan_out=False)
        ).where(F.lit(True))
    finally:
        fanout.fan_out = real_fan_out
    a = ingest._jdf.queryExecution().analyzed()
    b = store_plan._jdf.queryExecution().analyzed()
    assert not a.sameResult(b)
    # and the marker is what does it: without the filter the two plans
    # WOULD alias under a no-op fan_out (regression canary for the
    # exact r10 gaming incident)
    c = store_plan._jdf.queryExecution().analyzed().children().head()
    assert a.sameResult(c)
