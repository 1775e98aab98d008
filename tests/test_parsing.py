"""Dirty-data unit tests for P1-P9 (SURVEY.md section 5 item 3).

Adversarial rows mirror kmeans.java:26-109 semantics: quoted commas,
``[]``, ``True``, non-numeric counts, short rows, bad times.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.parsing import (
    bool01,
    hashtag_count,
    parse_or_zero,
    recode_language,
    time_bucket,
)
from mapreduce6240project_spark.sources.tweets import parse_tweet_lines


def _eval(spark, expr_fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["c"])
    return [r[0] for r in df.select(expr_fn("c")).collect()]


def test_hashtag_count(spark):
    # kmeans.java:33-49: int passthrough / "[]" -> 0 / list length
    vals = ["3", "[]", "a,b,c", "", None, "single", "0", "x,y"]
    assert _eval(spark, hashtag_count, vals) == [3, 0, 3, 0, 0, 1, 0, 2]


def test_time_bucket(spark):
    # kmeans.java:51-67: hour 5-12 -> 1, 13-18 -> 2, >20 or <=1 -> 3, else 0
    vals = [
        "05:00:00", "12:59:59", "13:00:00", "18:30:00", "21:00:01",
        "23:59:59", "00:10:00", "01:00:00", "02:00:00", "19:00:00",
        "bad", "", None, "12:00", "aa:bb:cc",
    ]
    expect = [1, 1, 2, 2, 3, 3, 3, 3, 0, 0, 0, 0, 0, 0, 0]
    assert _eval(spark, time_bucket, vals) == expect


def test_bool01(spark):
    # kmeans.java:82-88
    vals = ["1", "0", "True", "False", "", None, "7"]
    assert _eval(spark, bool01, vals) == [1, 0, 1, 0, 0, 0, 7]


def test_parse_or_zero(spark):
    # kmeans.java:89-109: parseInt with catch -> 0
    vals = ["42", "-3", "x", "", None, "12.5"]
    assert _eval(spark, parse_or_zero, vals) == [42, -3, 0, 0, 0, 0]


def test_recode_language(spark):
    # Analysis.java:95-97
    vals = ["en", "tr", "fr", "es", None]
    assert _eval(spark, recode_language, vals) == ["en", "tr", "others", "others", "others"]


def _line(id="1300000000000000001", time="06:30:00", lang="en", reply="1",
          retweet="2", like="3", hashtags="a, b", video="True", ncols=24):
    # hashtag lists are serialized with ", " separators, which the
    # lookahead split regex deliberately keeps as one field
    cols = [f"f{i}" for i in range(ncols)]
    for pos, v in [(0, id), (4, time), (11, lang), (15, reply), (16, retweet),
                   (17, like), (18, hashtags), (23, video)]:
        if pos < ncols:
            cols[pos] = v
    return ",".join(cols)


def test_parse_tweet_lines_happy_and_drops(spark):
    lines = [
        _line(),                              # kept
        "",                                   # P1: empty -> dropped
        _line(ncols=20),                      # P2: short row -> dropped
        _line(id="notanumber"),               # P4: bad key -> dropped
        # free text containing ", " must not split (kmeans.java:30-31)
        _line(lang="en") + ', trailing "hello, world" text,x',
    ]
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    out = parse_tweet_lines(df).orderBy("tweet_id").collect()
    assert len(out) == 2
    row = out[0]
    assert row.tweet_id == 1300000000000000001
    assert (row.language, row.num_hashtags, row.time_bucket, row.has_video) == ("en", 2, 1, 1)
    assert (row.reply_count, row.retweet_count, row.like_count) == (1, 2, 3)


def test_lookahead_split_keeps_comma_space(spark):
    df = spark.createDataFrame([('a,b, c,d',)], ["value"])
    got = df.select(F.split("value", r",(?!\s)").alias("p")).first().p
    assert got == ["a", "b, c", "d"]


def test_trending_clamps_old_events(spark):
    # events 100 days apart: the old day must contribute at the minimum
    # decay weight, not vanish from the score (round-3 advice)
    from mapreduce6240project_spark.operators.analytics import (
        DECAY_MICRO,
        trending_scores,
    )

    rows = [
        ("click", "2024-01-01 00:00:00"),
        ("click", "2024-04-10 00:00:00"),  # 100 days later
        ("view", "2024-04-10 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    scores = {r.event_type: r.score_micro for r in trending_scores(ev).collect()}
    assert scores["view"] == DECAY_MICRO[0]
    assert scores["click"] == DECAY_MICRO[0] + DECAY_MICRO[63]
