"""Round-3 coverage wave 26: time-weighted and market-style analytics.

- ``twap_user_value``: time-weighted average value per user -- each
  observation weighted by the seconds until the next one (the
  IoT/finance TWAP).  All-integer: cent values x second gaps summed in
  BIGINT, one exact integer division to micro-units at the end.  One
  user shuffle shared by the ordering window and the aggregate.
- ``ohlc_hourly_value``: OHLC bars -- open/high/low/close of the
  event value per (event_type, hour).  Open/close are picked by
  ascending/descending ``row_number`` over (ts, event_id) so ties are
  deterministic cross-engine (no reliance on struct-min ordering
  quirks); bars are hour-grain so the windows are bounded.
- ``benford_totalprice``: Benford's-law first-digit audit of order
  totals -- observed counts vs the expected ``N * log10(1 + 1/d)``
  occupancy, the classic fraud/data-quality screen.  Expected counts
  are micro-floored from an identical IEEE expression in both engines.
- ``xml_roundtrip``: Spark 4's built-in XML source/sink end-to-end
  (write nation as XML rows, read back, aggregate); the oracle runs
  the same aggregate over the original parquet, so content identity
  through the XML codec is value-hash-verified.

Reference parity note: extends the analytics family (SURVEY.md
section 2.6) with time-weighted aggregation, bar-building, and a
distributional data-quality audit.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "twap_user_value",
    """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
),
gapped AS (
  SELECT user_id, v_c,
         (lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us)
           // 1000000 AS dt_s
  FROM ev
),
agg AS (
  SELECT user_id,
         CAST(sum(CAST(v_c AS HUGEINT) * dt_s) AS HUGEINT) AS wsum,
         CAST(sum(dt_s) AS BIGINT) AS span_s
  FROM gapped WHERE dt_s IS NOT NULL GROUP BY user_id
)
SELECT user_id,
       CAST((wsum * 10000) // span_s AS BIGINT) AS twap_micro,
       span_s
FROM agg WHERE span_s > 0""",
    ref="extension: time-weighted average (TWAP) per entity -- cent "
    "values x second gaps in exact integers, one integer division to "
    "micro-units; single user-key shuffle for window + aggregate",
)
def q_twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v_c"),
    )
    gapped = ev.select(
        "user_id",
        "v_c",
        F.expr("(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)"
               " - us) div 1000000").alias("dt_s"),
    ).filter(F.col("dt_s").isNotNull())
    agg = gapped.groupBy("user_id").agg(
        F.sum(F.col("v_c").cast("decimal(38,0)") * F.col("dt_s")).alias("wsum"),
        F.sum("dt_s").alias("span_s"),
    )
    # multiply BEFORE narrowing: wsum * 10000 stays in DECIMAL(38)
    # (matching the oracle's HUGEINT ordering), and only the per-user
    # quotient -- bounded by the max observed value in micro-units --
    # is cast down to BIGINT
    return agg.filter(F.col("span_s") > 0).select(
        "user_id",
        F.expr("CAST((wsum * 10000) div span_s AS BIGINT)").alias(
            "twap_micro"
        ),
        "span_s",
    )


@_register(
    "ohlc_hourly_value",
    """
WITH ev AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 AS hour_no,
         epoch_us(ts) AS us, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
),
o AS (
  SELECT event_type, hour_no, v_c,
         row_number() OVER (PARTITION BY event_type, hour_no
                            ORDER BY us, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, hour_no
                            ORDER BY us DESC, event_id DESC) AS rn_d
  FROM ev
)
SELECT event_type, CAST(hour_no AS BIGINT) AS hour_no,
       CAST(min(CASE WHEN rn_a = 1 THEN v_c END) AS BIGINT) AS open_c,
       CAST(max(v_c) AS BIGINT) AS high_c,
       CAST(min(v_c) AS BIGINT) AS low_c,
       CAST(min(CASE WHEN rn_d = 1 THEN v_c END) AS BIGINT) AS close_c,
       CAST(count(*) AS BIGINT) AS n
FROM o GROUP BY event_type, hour_no""",
    ref="extension: OHLC bar building per (series, hour) -- "
    "deterministic open/close via asc/desc row_number on (ts, id); "
    "hour-grain windows stay bounded at any scale",
)
def q_ohlc_hourly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("hour_no"),
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v_c"),
    )
    w = Window.partitionBy("event_type", "hour_no")
    o = ev.select(
        "event_type",
        "hour_no",
        "v_c",
        F.row_number().over(w.orderBy("us", "event_id")).alias("rn_a"),
        F.row_number()
        .over(w.orderBy(F.col("us").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
    )
    return o.groupBy("event_type", "hour_no").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("v_c"))).alias("open_c"),
        F.max("v_c").alias("high_c"),
        F.min("v_c").alias("low_c"),
        F.min(F.when(F.col("rn_d") == 1, F.col("v_c"))).alias("close_c"),
        F.count("*").alias("n"),
    )


@_register(
    "benford_totalprice",
    """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
obs AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM digits GROUP BY digit
),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs)
SELECT digit, n_obs,
       CAST(floor(n * (ln(1.0 + 1.0 / digit) / ln(10.0)) * 1000000 + 0.5)
            AS BIGINT) AS expected_micro
FROM obs, tot""",
    ref="extension: Benford first-digit audit (fraud/data-quality "
    "screen) -- observed counts vs N*log10(1+1/d) expectation, "
    "micro-floored from an identical IEEE expression in both engines",
)
def q_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n_obs")
    )
    tot = obs.agg(F.sum("n_obs").alias("n"))
    expected = F.floor(
        F.col("n")
        * (F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0)))
        * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit", "n_obs", expected.alias("expected_micro")
    )


@_register(
    "xml_roundtrip",
    """
SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
       min(n_name) AS first_nation
FROM nation GROUP BY n_regionkey""",
    ref="S1/S5 analog: XML sink + source round-trip (Spark 4 built-in "
    "XML data source); the oracle aggregates the ORIGINAL parquet, so "
    "content identity through the XML codec is value-hash-verified",
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write nation as XML rows, read it back, aggregate.  Exercises
    Spark 4's built-in XML codec end-to-end (schema inference on read
    is avoided by passing the writer's schema, matching production
    practice for schema-stable feeds)."""
    out = tempfile.mkdtemp(prefix="sparkgraft_xml_") + "/nation"
    nation = load_table(spark, sf_dir, "nation")
    nation.write.format("xml").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).mode("overwrite").save(out)
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema(nation.schema)
        .load(out)
    )
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n"), F.min("n_name").alias("first_nation")
    )
