"""Spark 4 stateful streaming surfaces and streaming job variants.

Consolidated from the round-3 coverage waves (round-4 verdict item
7: thematic domain modules instead of flat wave numbering).  Each
section below is the original wave body verbatim; registry names,
oracles and semantics are unchanged (guarded by the registry
snapshot test and the full sf0.01 mirror).

* wave 43: Round-3 coverage wave 43: the Spark 4 stateful-streaming API and a
* wave 58: Round-3 coverage wave 58: ingest-loss accounting and streaming CDC.
* wave 59: Round-3 coverage wave 59: streaming quantiles and sequence-gap
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from mapreduce6240project_spark.config import scratch_dir
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table
from mapreduce6240project_spark.sources.tweets import SPLIT_REGEX
from mapreduce6240project_spark.plans.engineering import _qsketch_sql

# =========================================================================
# wave 43
# Round-3 coverage wave 43: the Spark 4 stateful-streaming API and a
# dataset datasheet rollup.
#
# - ``streaming_tws_peaks``: per-user count + exact integer value peak
#   through ``transformWithStateInPandas`` (StatefulProcessor + typed
#   ValueState) -- the modern replacement for ``applyInPandasWithState``,
#   registered so BOTH custom-state APIs are exercised end-to-end and
#   oracle-checked against the batch group-by.
# - ``dataset_card``: the datasheet every corpus release ships -- doc
#   counts, char totals, and whitespace-token totals at (source, lang),
#   (source) and (lang) grains plus the grand total, in ONE scan via
#   GROUPING SETS (Expand), with grouping ids exposed so each grain is
#   unambiguous.
# =========================================================================

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@_register(
    "streaming_tws_peaks",
    """
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(max(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS max_micros
FROM events GROUP BY 1""",
    ref="extension: transformWithStateInPandas (Spark 4 typed-state "
    "API) per-user count + integer value peak; bounded-stream result "
    "equals the batch group-by oracle",
)
def q_streaming_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.streaming.jobs import streaming_tws_user_peaks

    return streaming_tws_user_peaks(spark, sf_dir)


@_register(
    "dataset_card",
    f"""
SELECT coalesce(source, '<all>') AS source,
       coalesce(lang, '<all>') AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(string_split({_NORM}, ' '))) AS BIGINT) AS total_words
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())""",
    ref="extension: dataset datasheet -- multi-grain doc/char/word "
    "totals in one scan via GROUPING SETS (Expand operator), the "
    "corpus-release summary table",
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        "n_chars",
        F.size(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
            )
        ).alias("words"),
    )
    return (
        docs.groupingSets(
            [["source", "lang"], ["source"], ["lang"], []], "source", "lang"
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("words").cast("bigint").alias("total_words"),
        )
        .select(
            F.coalesce("source", F.lit("<all>")).alias("source"),
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            "n_docs",
            "total_chars",
            "total_words",
        )
    )


# =========================================================================
# wave 58
# Round-3 coverage wave 58: ingest-loss accounting and streaming CDC.
#
# - ``ingest_quarantine_report``: data-loss accounting for the CSV ingest
#   path -- the reference's ETL drops malformed rows SILENTLY
#   (kmeans.java:26-37,71-75); production pipelines must count what they
#   drop and why.  The query runs the real parse filters over the
#   rendered tweet CSV plus three planted malformed lines (empty,
#   under-arity, non-numeric key) and reports per-reason counts.  The
#   oracle is the spec: every rendered event parses cleanly, each planted
#   line trips exactly one filter.
# - ``streaming_cdc`` -- the streaming twin of ``cdc_latest_state``:
#   per-user last-event state (max (ts, event_id)) in
#   ``applyInPandasWithState``, tombstones applied at emission; final
#   state equals the batch window query, which is the oracle.
# =========================================================================

@_register(
    "ingest_quarantine_report",
    """
SELECT CAST((SELECT count(*) FROM events) + 3 AS BIGINT) AS n_input,
       CAST(1 AS BIGINT) AS n_empty,
       CAST(1 AS BIGINT) AS n_arity,
       CAST(1 AS BIGINT) AS n_badid,
       CAST((SELECT count(*) FROM events) AS BIGINT) AS n_kept""",
    ref="P1/P2/P4 accounting: per-reason quarantine counts for the CSV "
    "ingest filters (kmeans.java:26-37,71-75 drops these silently); "
    "planted malformed lines prove each filter fires exactly once",
)
def q_quarantine_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.plans.parity import _render_tweet_csv

    planted = spark.createDataFrame(
        [
            ("",),  # P1 empty line
            ("a,b,c",),  # P2 arity <= 23
            ("xx," + ",".join(f"f{i}" for i in range(1, 24)),),  # P4 bad key
        ],
        "value string",
    )
    lines = _render_tweet_csv(spark, sf_dir).unionByName(planted)
    parts = F.split(F.col("value"), SPLIT_REGEX)
    flagged = lines.select(
        (F.col("value") == "").alias("is_empty"),
        ((F.col("value") != "") & (F.size(parts) <= 23)).alias("is_arity"),
        (
            (F.col("value") != "")
            & (F.size(parts) > 23)
            & parts.getItem(0).try_cast("long").isNull()
        ).alias("is_badid"),
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.col("is_empty").cast("bigint")).alias("n_empty"),
        F.sum(F.col("is_arity").cast("bigint")).alias("n_arity"),
        F.sum(F.col("is_badid").cast("bigint")).alias("n_badid"),
        F.sum(
            (
                ~F.col("is_empty") & ~F.col("is_arity") & ~F.col("is_badid")
            ).cast("bigint")
        ).alias("n_kept"),
    )


@_register(
    "streaming_cdc",
    """
WITH ranked AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, cents AS last_value_cents
FROM ranked WHERE rn = 1 AND event_type <> 'error'""",
    ref="extension: streaming CDC compaction -- applyInPandasWithState "
    "last-event-wins with tombstones at emission; bounded-stream result "
    "equals the batch window oracle (same SQL as cdc_latest_state)",
)
def q_streaming_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.streaming.jobs import streaming_cdc_state

    return streaming_cdc_state(spark, sf_dir)


# =========================================================================
# wave 59
# Round-3 coverage wave 59: streaming quantiles and sequence-gap
# integrity.
#
# - ``streaming_qsketch``: quantiles over a stream via the mergeable
#   log-bucket sketch -- per-micro-batch sketches land in an epoch store
#   and merge by bucket-count addition (associative + commutative, so the
#   result is batch-identical however the stream is split).  Completes
#   the mergeable-sketch streaming pair with ``streaming_hll_rollup``.
# - ``orderkey_gap_audit``: ingestion-completeness check -- missing
#   ranges in the order-key sequence.  Partition-honest: keys hash into
#   fixed-width buckets, gaps WITHIN a bucket come from a bucket-local
#   lag window, and gaps ACROSS bucket boundaries from the bucket-stats
#   table (bucket-count rows, broadcastable); no global-sort window ever
#   sees the full key set.
# =========================================================================

_BUCKET = 100_000


@_register(
    "streaming_qsketch",
    # identical estimate arithmetic to qsketch_value_quantiles: the
    # merged stream sketch IS the batch sketch, so they share the oracle
    _qsketch_sql(),
    ref="extension: streaming mergeable quantile sketch (per-batch "
    "sketches, epoch store, count-sum merge) -- batch-identical by "
    "associativity; shares the batch oracle",
)
def q_streaming_qsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.streaming.jobs import (
        streaming_qsketch_quantiles,
    )

    return streaming_qsketch_quantiles(spark, sf_dir)


@_register(
    "orderkey_gap_audit",
    f"""
WITH k AS (SELECT o_orderkey AS key, o_orderkey // {_BUCKET} AS b FROM orders),
intra AS (
  SELECT key, lag(key) OVER (PARTITION BY b ORDER BY key) AS prev
  FROM k
),
intra_gaps AS (
  SELECT prev + 1 AS gap_start, key - 1 AS gap_end
  FROM intra WHERE prev IS NOT NULL AND key - prev > 1
),
bs AS (SELECT b, min(key) AS mn, max(key) AS mx FROM k GROUP BY b),
edge AS (
  SELECT mx, lead(mn) OVER (ORDER BY b) AS next_mn
  FROM bs
),
edge_gaps AS (
  SELECT mx + 1 AS gap_start, next_mn - 1 AS gap_end
  FROM edge WHERE next_mn IS NOT NULL AND next_mn - mx > 1
),
gaps AS (SELECT * FROM intra_gaps UNION ALL SELECT * FROM edge_gaps)
SELECT CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(coalesce(sum(gap_end - gap_start + 1), 0) AS BIGINT)
         AS n_missing_keys,
       CAST(coalesce(min(gap_start), -1) AS BIGINT) AS first_gap_start
FROM gaps""",
    ref="extension: sequence-gap integrity audit -- bucket-local lag "
    "windows + bucket-stats edge pass; no global-sort window over the "
    "full key set",
)
def q_orderkey_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.expr(f"o_orderkey div {_BUCKET}").alias("b"),
    )
    intra = k.select(
        "key", F.expr("lag(key) OVER (PARTITION BY b ORDER BY key)").alias("prev")
    )
    intra_gaps = intra.filter(
        F.col("prev").isNotNull() & (F.col("key") - F.col("prev") > 1)
    ).select(
        (F.col("prev") + 1).alias("gap_start"), (F.col("key") - 1).alias("gap_end")
    )
    bs = k.groupBy("b").agg(F.min("key").alias("mn"), F.max("key").alias("mx"))
    edge = bs.select(
        "mx", F.expr("lead(mn) OVER (ORDER BY b)").alias("next_mn")
    )
    edge_gaps = edge.filter(
        F.col("next_mn").isNotNull() & (F.col("next_mn") - F.col("mx") > 1)
    ).select(
        (F.col("mx") + 1).alias("gap_start"), (F.col("next_mn") - 1).alias("gap_end")
    )
    gaps = intra_gaps.unionByName(edge_gaps)
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.coalesce(F.sum(F.col("gap_end") - F.col("gap_start") + 1), F.lit(0))
        .cast("bigint")
        .alias("n_missing_keys"),
        F.coalesce(F.min("gap_start"), F.lit(-1))
        .cast("bigint")
        .alias("first_gap_start"),
    )


# =========================================================================
# round 5: bounded-state streaming dedup.
#
# ``streaming_dedup_bounded_state``: dropDuplicatesWithinWatermark --
# the state-evicting dedup operator (state O(keys within watermark),
# not O(keys ever seen)).  Single-batch bounded replay => kept set ==
# first event per (user_id, event_type); eviction/re-emission
# semantics pinned by a two-batch planted test where no SQL oracle can
# see them.  Output: per-type arrivals vs kept vs suppressed mass.
# =========================================================================


@_register(
    "streaming_dedup_bounded_state",
    """
WITH kept AS (
  SELECT event_type, count(DISTINCT user_id) AS n_kept
  FROM events GROUP BY 1
), arr AS (
  SELECT event_type, count(*) AS n_events FROM events GROUP BY 1
)
SELECT a.event_type, CAST(a.n_events AS BIGINT) AS n_events,
       CAST(k.n_kept AS BIGINT) AS n_kept,
       CAST(a.n_events - k.n_kept AS BIGINT) AS n_suppressed
FROM arr a JOIN kept k ON k.event_type = a.event_type""",
    ref="extension: bounded-state streaming dedup "
    "(dropDuplicatesWithinWatermark, Spark 3.5+ state eviction) -- "
    "per-type suppressed-duplicate mass; cf. streaming_dedup (plain "
    "dropDuplicates, unbounded key state)",
)
def q_streaming_dedup_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.streaming import (
        streaming_dedup_bounded_state,
    )

    return streaming_dedup_bounded_state(spark, sf_dir)


# =========================================================================
# wave 103: streaming CDC into the ACID txlog table
#
# ``streaming_txlog_cdc``: the lakehouse streaming-sink pattern --
# every micro-batch MERGEs its per-user latest state into a
# sources/txlog table under an idempotent writer transaction
# (txn=("cdc", epoch_id): a replayed batch is a no-op, the Delta
# txnAppId/txnVersion design).  The per-batch reduce + re-reduce over
# matched current rows is an associative last-wins fold, so the final
# table is identical however the stream is split into batches; the
# oracle is therefore the same batch window SQL as ``streaming_cdc``
# (restricted to non-null users, the mergeable key domain).
# =========================================================================


@_register(
    "streaming_txlog_cdc",
    """
WITH ranked AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE user_id IS NOT NULL
)
SELECT user_id, cents AS last_value_cents
FROM ranked WHERE rn = 1 AND event_type <> 'error'""",
    ref="extension: streaming CDC upserts into the txlog ACID table "
    "(foreachBatch + idempotent writer txn); batching-independent "
    "last-wins fold, tombstones filtered at emission -- same oracle "
    "as streaming_cdc over the non-null key domain",
)
def q_streaming_txlog_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.streaming.jobs import streaming_txlog_cdc

    root = scratch_dir("sparkgraft_txcdc_")
    return streaming_txlog_cdc(spark, sf_dir, root)
