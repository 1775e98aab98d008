"""Sources & sinks (SURVEY.md section 2.1)."""

from mapreduce6240project_spark.sources.tables import load_table, load_tables
from mapreduce6240project_spark.sources.tweets import (
    TWEET_FEATURES_SCHEMA,
    ingest_tweets,
    parse_tweet_lines,
    tweet_features_from_events,
    write_feature_store,
)
from mapreduce6240project_spark.sources.txlog import ConcurrentCommitError, TxTable

__all__ = [
    "load_table",
    "load_tables",
    "TWEET_FEATURES_SCHEMA",
    "ingest_tweets",
    "parse_tweet_lines",
    "tweet_features_from_events",
    "write_feature_store",
    "TxTable",
    "ConcurrentCommitError",
]
