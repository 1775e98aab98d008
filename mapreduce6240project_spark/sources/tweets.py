"""Tweets ingest: dirty CSV -> feature store (SURVEY.md sections 2.1-2.2).

Replaces the reference ETL job (kmeans.java `prepMapper`, the jar's
Main-Class): line-at-a-time text read, regex field split, silent
malformed-row drops, and the 7-feature derivation written to the HBase
``preprocess`` table (kmeans.java:24-112,130-163).

Spark-first shape: one narrow stage -- ``read.text -> split -> filters ->
feature expressions -> write.parquet`` -- no shuffle anywhere (the
reference job is likewise map-only, kmeans.java:146).  The feature store
is parquet sorted by ``tweet_id`` within files, so Parquet row-group
min/max statistics give the same key-range pruning the HBase rowkey
layout gave the reference's prefix scans (Cluster.java:66-81).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.parsing import (
    bool01,
    hashtag_count,
    parse_or_zero,
    time_bucket,
)

#: Split on commas NOT followed by whitespace, so free-text fields
#: containing ", " survive -- the reference's exact regex
#: (kmeans.java:30-31; Java regex, same dialect Spark uses).
SPLIT_REGEX = r",(?!\s)"

TWEET_FEATURES_SCHEMA = (
    "tweet_id BIGINT, language STRING, num_hashtags INT, time_bucket INT, "
    "has_video INT, reply_count INT, retweet_count INT, like_count INT"
)

# Positional CSV columns consumed by the reference (kmeans.java:38-110).
_COL_ID = 0
_COL_TIME = 4
_COL_LANG = 11
_COL_REPLY = 15
_COL_RETWEET = 16
_COL_LIKE = 17
_COL_HASHTAGS = 18
_COL_HAS_VIDEO = 23


def parse_tweet_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw text lines -> tweet feature rows.

    Reproduces the reference's filters and derivations:
      P1 empty-line drop           (kmeans.java:26-28)
      S2 regex split               (kmeans.java:30-31)
      P2 arity filter (>23 cols)   (kmeans.java:35-37)
      P4 numeric-key filter        (kmeans.java:71-75)
      P5-P8 feature derivations    (kmeans.java:33-110)
    """
    parts = F.split(F.col(value_col), SPLIT_REGEX)
    return (
        lines.filter(F.col(value_col) != "")  # P1
        .select(parts.alias("p"))
        .filter(F.size("p") > _COL_HAS_VIDEO)  # P2: res.length <= 23 dropped
        .select(
            F.col("p").getItem(_COL_ID).try_cast("long").alias("tweet_id"),
            F.col("p").getItem(_COL_LANG).alias("language"),
            hashtag_count(F.col("p").getItem(_COL_HASHTAGS)).alias("num_hashtags"),
            time_bucket(F.col("p").getItem(_COL_TIME)).alias("time_bucket"),
            bool01(F.col("p").getItem(_COL_HAS_VIDEO)).alias("has_video"),
            parse_or_zero(F.col("p").getItem(_COL_REPLY)).alias("reply_count"),
            parse_or_zero(F.col("p").getItem(_COL_RETWEET)).alias("retweet_count"),
            parse_or_zero(F.col("p").getItem(_COL_LIKE)).alias("like_count"),
        )
        .filter(F.col("tweet_id").isNotNull())  # P4
    )


def ingest_tweets(spark: SparkSession, path: str) -> DataFrame:
    """S1: read raw tweet CSV as text (the reference uses TextInputFormat,
    not a CSV parser -- kmeans.java:160) and parse."""
    return parse_tweet_lines(spark.read.text(path))


def write_feature_store(features: DataFrame, path: str, buckets: int | None = None) -> None:
    """S4: persist the feature store.

    Sorted-by-key parquet stands in for the HBase key-ordered table
    (kmeans.java:70-75,130-139): row-group min/max stats on ``tweet_id``
    make ``BETWEEN`` range scans pruned scans.  At cluster scale, pass
    ``buckets`` to also bucket by ``tweet_id`` so later point-lookup
    joins (J2) co-locate without a shuffle.
    """
    writer = (
        features.repartitionByRange(features.sparkSession.sparkContext.defaultParallelism, "tweet_id")
        .sortWithinPartitions("tweet_id")
        .write.mode("overwrite")
    )
    if buckets:
        writer.bucketBy(buckets, "tweet_id").sortBy("tweet_id").format("parquet").saveAsTable(
            path.strip("/").replace("/", "_")
        )
    else:
        writer.parquet(path)


#: session-scoped PLAN memo for the feature derivation: the ~30
#: when-chain expressions cost ~0.45 s of py4j round-trips to build,
#: and the plan is a pure function of (session, sf_dir).  Like
#: tables._TABLE_CACHE this reuses only the unresolved plan object --
#: nothing is persisted; every action still computes from the parquet
#: files (feature_store's persist() of this plan is the separate,
#: documented store semantics).
_FEATURE_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def tweet_features_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic tweet-feature table derived from the driver's
    ``events`` table (FIXTURES.md section 3 sanctions this derivation --
    no tweets CSV ships with the test data).

    The derivation first *renders* dirty string columns (numeric strings,
    ``"[]"``, ``"True"``/``"False"``, comma-joined lists, garbage), then
    runs them through the same P5-P8 parsing expressions the CSV ingest
    uses, so the full parse path is exercised and DuckDB-oracle-checkable
    (the oracle mirrors both steps in ANSI SQL).

    r10 optimization: the RAW events are fanned out to the session's
    parallelism BEFORE the feature expressions, so the regex/parse work
    runs on every core instead of inside the scan task (the bench
    parquet arrives as one row group = one task; measured 0.76 s ->
    0.48 s at sf0.1, 2.0 s -> 1.2 s at 10x).  fan_out is a
    metadata-gated no-op whenever the scan is already wide, so the
    100 TB plan is unchanged.  Row-local expressions make the result
    order-independent.  NOTE: :func:`feature_store` deliberately builds
    a structurally different plan (fan-out after the derivation plus an
    unconditional trivial-filter marker, see there) so Spark's cache
    manager never serves this query -- the timed ETL derivation -- from
    the persisted store, on narrow and wide inputs alike.
    """
    per_session = _FEATURE_PLAN_CACHE.setdefault(spark, {})
    cached = per_session.get(sf_dir)
    if cached is not None:
        return cached
    out = _derive_features(spark, sf_dir, pre_fan_out=True)
    per_session[sf_dir] = out
    return out


def _derive_features(
    spark: SparkSession, sf_dir: str, pre_fan_out: bool
) -> DataFrame:
    from mapreduce6240project_spark.operators.fanout import fan_out
    from mapreduce6240project_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    if pre_fan_out:
        ev = fan_out(ev)
    raw = ev.select(
        F.col("event_id").alias("tweet_id"),
        F.date_format("ts", "HH:mm:ss").alias("raw_time"),
        # explicit NULL branch: Spark 4's element_at with a NULL index
        # does NOT return NULL (observed: it yields the last element),
        # while DuckDB's list[NULL] is NULL -- a NULL user_id must
        # produce a NULL language on both engines (dirty-events replay
        # finding; clean data never has NULL user_id, so the clean-path
        # output is unchanged)
        F.when(
            F.col("user_id").isNotNull(),
            F.element_at(
                F.array(F.lit("en"), F.lit("tr"), F.lit("es"), F.lit("de")),
                (F.col("user_id") % 4 + 1).cast("int"),
            ),
        ).alias("language"),
        F.when(F.col("event_type") == "click", F.lit("[]"))
        .when(F.col("event_type") == "view", F.lit("tag1,tag2,tag3"))
        .when(F.col("event_type") == "purchase", (F.col("user_id") % 10).cast("string"))
        .otherwise(F.lit("a,b"))
        .alias("raw_hashtags"),
        F.when(F.col("event_type") == "view", F.lit("True"))
        .when(F.col("event_type") == "click", F.lit("1"))
        .when(F.col("event_type") == "error", F.lit("False"))
        .otherwise(F.lit("0"))
        .alias("raw_has_video"),
        F.when(F.col("event_id") % 5 == 0, F.lit("x"))
        .otherwise((F.col("user_id") % 50).cast("string"))
        .alias("raw_reply"),
        (F.col("event_id") % 97).cast("string").alias("raw_retweet"),
        F.floor(F.col("value")).cast("string").alias("raw_like"),
    )
    return raw.select(
        "tweet_id",
        "language",
        hashtag_count("raw_hashtags").alias("num_hashtags"),
        time_bucket("raw_time").alias("time_bucket"),
        bool01("raw_has_video").alias("has_video"),
        parse_or_zero("raw_reply").alias("reply_count"),
        parse_or_zero("raw_retweet").alias("retweet_count"),
        parse_or_zero("raw_like").alias("like_count"),
    )


#: session-scoped materialized feature stores: a weak-keyed map from
#: the live SparkSession to {sf_dir: persisted DataFrame}.  Weak keys
#: (rather than id(spark)) mean a stopped, garbage-collected session
#: drops its whole entry -- no stale DataFrames bound to dead sessions
#: when CPython reuses the id, no executor-cache leak across sessions
#: in long-lived drivers.
_FEATURE_STORE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def feature_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature table as a *store*: derived once per session per
    ``sf_dir``, persisted, and shared by every consumer.

    This mirrors the reference architecture exactly: the ETL job
    populates the HBase ``preprocess`` table once (kmeans.java:130-163)
    and every later job -- clustering, analysis, evaluation -- reads
    that table rather than re-parsing the CSV (Cluster.java:66-81,
    Analysis.java:68-73).  Here the "table" is a persisted DataFrame;
    at cluster scale it is the sorted/bucketed parquet written by
    :func:`write_feature_store`.  ``ingest_featurize`` (the ETL query
    itself) intentionally bypasses this cache so the derivation cost
    stays measured."""
    per_session = _FEATURE_STORE_CACHE.setdefault(spark, {})
    df = per_session.get(sf_dir)
    if df is None:
        from mapreduce6240project_spark.operators.fanout import fan_out

        # fan_out AFTER the derivation, BEFORE persist: small test
        # inputs arrive as one partition, and the one-time repartition
        # cost is amortized -- every consumer (including the iterative
        # k-medoids loop) reads the already-wide cache.  At scale the
        # scan is already wide and fan_out adds nothing.  This plan
        # must be structurally different from
        # tweet_features_from_events (which fans the raw events out
        # BEFORE the expressions): Spark's CacheManager substitutes the
        # persisted store into any query whose plan equals the cached
        # one, and the ingest_featurize bench query must keep measuring
        # the raw derivation, never the cache (r10 finding -- with
        # identical plans the timed ETL silently became a cache read).
        # The fan-out placement alone guarantees that only on NARROW
        # inputs (fan_out is a no-op once the scan is already wide --
        # the at-scale case, or any 1-core host), so the store plan
        # additionally carries an always-present trivial filter marker:
        # where(lit(True)) keeps the ANALYZED plans distinct in every
        # regime (cache matching runs on analyzed plans, before the
        # optimizer would eliminate the filter), at zero runtime cost
        # (r11, ADVICE item).
        df = (
            fan_out(_derive_features(spark, sf_dir, pre_fan_out=False))
            .where(F.lit(True))
            .persist()
        )
        per_session[sf_dir] = df
    return df


def release_feature_store(spark: SparkSession, sf_dir: str | None = None) -> int:
    """Unpersist the session's materialized feature store(s) -- for
    ``sf_dir`` only, or all of them when omitted.  Weakref eviction
    already covers session GC; this is the explicit hook for a
    long-lived multi-tenant driver that rotates datasets within one
    session (round-3 verdict minor #3).  Returns the number of stores
    released."""
    per_session = _FEATURE_STORE_CACHE.get(spark)
    if not per_session:
        return 0
    keys = [sf_dir] if sf_dir is not None else list(per_session)
    n = 0
    for k in keys:
        df = per_session.pop(k, None)
        if df is not None:
            df.unpersist(blocking=False)
            n += 1
    return n


#: ANSI-SQL (DuckDB) mirror of :func:`tweet_features_from_events`, used as
#: a CTE by every oracle query that consumes tweet features.
TWEET_FEATURES_SQL_CTE = """
features AS (
  SELECT
    tweet_id,
    language,
    CASE WHEN raw_hashtags IS NULL OR raw_hashtags = '' THEN 0
         WHEN regexp_matches(raw_hashtags, '^[0-9]+$')
           THEN coalesce(try_cast(raw_hashtags AS INT), 0)
         WHEN raw_hashtags = '[]' THEN 0
         ELSE len(string_split(raw_hashtags, ',')) END AS num_hashtags,
    CASE WHEN raw_time IS NULL OR len(string_split(raw_time, ':')) <> 3
              OR NOT regexp_matches(string_split(raw_time, ':')[1], '^[0-9]+$') THEN 0
         WHEN try_cast(string_split(raw_time, ':')[1] AS INT) BETWEEN 5 AND 12 THEN 1
         WHEN try_cast(string_split(raw_time, ':')[1] AS INT) BETWEEN 13 AND 18 THEN 2
         WHEN try_cast(string_split(raw_time, ':')[1] AS INT) > 20
              OR try_cast(string_split(raw_time, ':')[1] AS INT) <= 1 THEN 3
         ELSE 0 END AS time_bucket,
    CASE WHEN raw_has_video IS NULL THEN 0
         WHEN regexp_matches(raw_has_video, '^[0-9]+$')
           THEN coalesce(try_cast(raw_has_video AS INT), 0)
         WHEN raw_has_video = 'True' THEN 1
         ELSE 0 END AS has_video,
    coalesce(try_cast(raw_reply AS INT), 0) AS reply_count,
    coalesce(try_cast(raw_retweet AS INT), 0) AS retweet_count,
    coalesce(try_cast(raw_like AS INT), 0) AS like_count
  FROM (
    SELECT
      event_id AS tweet_id,
      strftime(ts, '%H:%M:%S') AS raw_time,
      ['en', 'tr', 'es', 'de'][CAST(user_id % 4 AS INT) + 1] AS language,
      CASE WHEN event_type = 'click' THEN '[]'
           WHEN event_type = 'view' THEN 'tag1,tag2,tag3'
           WHEN event_type = 'purchase' THEN CAST(user_id % 10 AS VARCHAR)
           ELSE 'a,b' END AS raw_hashtags,
      CASE WHEN event_type = 'view' THEN 'True'
           WHEN event_type = 'click' THEN '1'
           WHEN event_type = 'error' THEN 'False'
           ELSE '0' END AS raw_has_video,
      CASE WHEN event_id % 5 = 0 THEN 'x'
           ELSE CAST(user_id % 50 AS VARCHAR) END AS raw_reply,
      CAST(event_id % 97 AS VARCHAR) AS raw_retweet,
      CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS raw_like
    FROM events
  )
)
"""
