from __future__ import annotations

import duckdb

from mapreduce6240project_spark.sources.tables import load_table
from mapreduce6240project_spark.sources.tweets import (
    TWEET_FEATURES_SQL_CTE,
    tweet_features_from_events,
)

SF = "/root/testdata/sf0.001"


def test_load_table_timestamps_match_duckdb(spark, duck):
    ev = load_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    s = ev.selectExpr("min(unix_micros(ts)) AS us").first().us
    d = duck.sql("SELECT min(epoch_us(ts)) FROM events").fetchone()[0]
    assert s == d  # ns->us truncation parity


def test_tweet_features_match_duckdb_oracle(spark, duck):
    sdf = tweet_features_from_events(spark, SF).orderBy("tweet_id").toPandas()
    ddf = duck.sql(
        f"WITH {TWEET_FEATURES_SQL_CTE} SELECT * FROM features ORDER BY tweet_id"
    ).df()
    assert sdf.shape == ddf.shape
    for c in sdf.columns:
        assert (sdf[c].astype(str) == ddf[c].astype(str)).all(), c


def test_bucketed_feature_store(spark):
    """write_feature_store(buckets=N) saves a bucket-sorted table that a
    later key join can use without a shuffle on the bucketed side."""
    from mapreduce6240project_spark.sources.tweets import (
        tweet_features_from_events,
        write_feature_store,
    )

    feats = tweet_features_from_events(spark, SF)
    write_feature_store(feats, "bucketed_feature_store_test", buckets=4)
    back = spark.table("bucketed_feature_store_test")
    assert back.count() == feats.count()
    desc = spark.sql("DESCRIBE EXTENDED bucketed_feature_store_test").collect()
    txt = "\n".join(str(r) for r in desc)
    assert "tweet_id" in txt and ("Num Buckets" in txt or "bucket" in txt.lower())
    spark.sql("DROP TABLE bucketed_feature_store_test")


def test_release_feature_store(spark):
    from mapreduce6240project_spark.sources.tweets import (
        _FEATURE_STORE_CACHE,
        feature_store,
        release_feature_store,
    )

    sf = "/root/testdata/sf0.001"
    df = feature_store(spark, sf)
    assert df is feature_store(spark, sf)  # cached handle
    assert release_feature_store(spark, sf) == 1
    assert sf not in _FEATURE_STORE_CACHE.get(spark, {})
    df2 = feature_store(spark, sf)  # re-derivable after release
    assert df2 is not df
    assert release_feature_store(spark) == 1
    assert release_feature_store(spark) == 0
