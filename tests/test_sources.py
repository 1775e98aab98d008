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
