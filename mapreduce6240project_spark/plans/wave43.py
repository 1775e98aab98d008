"""Round-3 coverage wave 43: the Spark 4 stateful-streaming API and a
dataset datasheet rollup.

- ``streaming_tws_peaks``: per-user count + exact integer value peak
  through ``transformWithStateInPandas`` (StatefulProcessor + typed
  ValueState) -- the modern replacement for ``applyInPandasWithState``,
  registered so BOTH custom-state APIs are exercised end-to-end and
  oracle-checked against the batch group-by.
- ``dataset_card``: the datasheet every corpus release ships -- doc
  counts, char totals, and whitespace-token totals at (source, lang),
  (source) and (lang) grains plus the grand total, in ONE scan via
  GROUPING SETS (Expand), with grouping ids exposed so each grain is
  unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

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
