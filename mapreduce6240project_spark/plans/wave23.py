"""Round-3 coverage wave 23: data-engineering utility operators.

- ``table_checksum_orders``: order-independent content fingerprint of a
  table -- per-row md5 over a canonical integer/string rendering,
  summed in DECIMAL(38) (associative, no overflow out to ~1e12 rows)
  and reduced mod 2^61-1.  The way you verify a 100 TB copy/migration
  without sorting anything: one narrow scan, one scalar.
- ``weighted_median_price``: exact weighted median per group with the
  weight-CDF crossing rule.  Pre-aggregated to distinct values first so
  the cumulative window is over the (group, value) grain -- both
  smaller and deterministic under ties.
- ``last_touch_attribution``: marketing-style last-touch -- every
  purchase attributed to the user's latest preceding click within 24 h.
  One user-partitioned ordered window; the conditional
  ``last(..., ignorenulls)`` running value IS the as-of lookup, no
  self-join.
- ``python_datasource_range``: PySpark 4 custom Python DataSource
  (``spark.dataSource.register``) -- a partitioned deterministic
  synthetic source (LCG-derived columns) aggregated per page.  The
  oracle replays the same integer recurrence over ``range()``, so the
  whole custom-connector read path is value-hash-verified.

Reference parity note: S-family source/sink breadth (SURVEY.md
section 2.1) extended with the Python DataSource API; the checksum is
the migration-validation counterpart of the KV sink round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.hashing import hash60
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_MERSENNE61 = (1 << 61) - 1


@_register(
    "table_checksum_orders",
    f"""
WITH rows_c AS (
  SELECT concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
                   epoch_us(o_orderdate), o_orderpriority) AS row_str
  FROM orders
),
h AS (
  SELECT ('0x' || substr(md5(row_str), 1, 15))::BIGINT AS hv FROM rows_c
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(hv) % {_MERSENNE61} AS BIGINT) AS checksum
FROM h""",
    ref="extension: order-independent table content checksum (canonical "
    "int/string row rendering -> 60-bit md5 -> associative DECIMAL(38) "
    "sum mod 2^61-1); verifies a copy at any scale with one scan",
)
def q_table_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"),
        F.unix_micros(F.col("o_orderdate")),
        F.col("o_orderpriority"),
    )
    hv = hash60(row_str)
    return (
        o.select(hv.alias("hv"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("hv").cast("decimal(38,0)")).alias("s"),
        )
        .select(
            "n_rows",
            F.expr(f"CAST(s % {_MERSENNE61} AS BIGINT)").alias("checksum"),
        )
    )


@_register(
    "weighted_median_price",
    """
WITH v AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT flag, price_c, qty,
         sum(qty) OVER (PARTITION BY flag ORDER BY price_c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         sum(qty) OVER (PARTITION BY flag) AS tw
  FROM v
)
SELECT flag,
       CAST(min(CASE WHEN 2 * cw >= tw THEN price_c END) AS BIGINT)
         AS weighted_median_c,
       CAST(min(tw) AS BIGINT) AS total_qty
FROM cum GROUP BY flag""",
    ref="extension: exact weighted median per group (weight-CDF crossing "
    "over the pre-aggregated distinct-value grain -- deterministic "
    "under ties, cumulative window carries values not rows)",
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_c"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint").alias("q"),
    )
    v = li.groupBy("flag", "price_c").agg(F.sum("q").alias("qty"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = v.select(
        "flag",
        "price_c",
        F.sum("qty").over(w_cum).alias("cw"),
        F.sum("qty").over(Window.partitionBy("flag")).alias("tw"),
    )
    return cum.groupBy("flag").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_c")))
        .cast("bigint")
        .alias("weighted_median_c"),
        F.min("tw").alias("total_qty"),
    )


@_register(
    "last_touch_attribution",
    """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
  FROM events
),
w AS (
  SELECT event_id, user_id, event_type, ts_us,
         last_value(CASE WHEN event_type = 'click' THEN ts_us END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS click_ts_us,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS click_event_id
  FROM ev
)
SELECT event_id AS purchase_event_id, user_id, click_event_id,
       CAST((ts_us - click_ts_us) // 1000000 AS BIGINT) AS gap_s
FROM w
WHERE event_type = 'purchase' AND click_ts_us IS NOT NULL
  AND ts_us - click_ts_us <= 86400000000""",
    ref="extension: last-touch attribution (each purchase -> latest "
    "preceding click within 24 h) -- the conditional ignorenulls "
    "running last over one user-ordered window IS the as-of lookup, "
    "no self-join, one shuffle",
)
def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts_us"))
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    marked = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.last(click_ts, ignorenulls=True).over(w).alias("click_ts_us"),
        F.last(click_id, ignorenulls=True).over(w).alias("click_event_id"),
    )
    return marked.filter(
        (F.col("event_type") == "purchase")
        & F.col("click_ts_us").isNotNull()
        & (F.col("ts_us") - F.col("click_ts_us") <= 86400000000)
    ).select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        "click_event_id",
        F.expr("(ts_us - click_ts_us) div 1000000").alias("gap_s"),
    )


# ---------------------------------------------------------------------------
# PySpark 4 custom Python DataSource
# ---------------------------------------------------------------------------

_PYDS_N = 50000
_PYDS_PARTS = 8


@_register(
    "python_datasource_range",
    f"""
WITH r AS (SELECT i FROM range({_PYDS_N}) t(i)),
d AS (
  SELECT CAST((i * 2654435761) % 7 AS INT) AS page,
         (i * 40503 + 17) % 1000003 AS score
  FROM r
)
SELECT page, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(score) AS BIGINT) AS score_sum
FROM d GROUP BY page""",
    ref="extension: PySpark 4 custom Python DataSource "
    "(spark.dataSource.register) -- partitioned deterministic synthetic "
    "reader; oracle replays the identical LCG over range(), verifying "
    "the whole custom-connector read path by value hash",
)
def q_python_datasource_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    # classes defined in the closure so cloudpickle ships them by value
    # to the worker (no package on the executor path required)
    class SynthReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", _PYDS_N))
            self.parts = int(options.get("parts", _PYDS_PARTS))

        def partitions(self):
            step = (self.n + self.parts - 1) // self.parts
            return [
                InputPartition((lo, min(lo + step, self.n)))
                for lo in range(0, self.n, step)
            ]

        def read(self, partition):
            lo, hi = partition.value
            for i in range(lo, hi):
                yield (i, (i * 2654435761) % 7, (i * 40503 + 17) % 1000003)

    class SynthDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synth_range"

        def schema(self):
            return "i bigint, page int, score bigint"

        def reader(self, schema):
            return SynthReader(self.options)

    spark.dataSource.register(SynthDataSource)
    df = (
        spark.read.format("synth_range")
        .option("n", str(_PYDS_N))
        .option("parts", str(_PYDS_PARTS))
        .load()
    )
    return df.groupBy("page").agg(
        F.count("*").alias("n"), F.sum("score").alias("score_sum")
    )
