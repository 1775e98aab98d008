"""product/behavioral analytics over the event stream (funnels, fraud, engagement).

Consolidated from the round-3 coverage waves (round-4 verdict item
7: thematic domain modules instead of flat wave numbering).  Each
section below is the original wave body verbatim; registry names,
oracles and semantics are unchanged (guarded by the registry
snapshot test and the full sf0.01 mirror).

* wave 8: Round-3 coverage wave 8: product-analytics shapes over the event
* wave 17: Round-3 coverage wave 17: strict ordered-sequence funnel.
* wave 60: Round-3 coverage wave 60: abuse/fraud detection heuristics.
* wave 62: Round-3 coverage wave 62: empirical-Bayes smoothing and repurchase
* wave 67: Round-3 coverage wave 67: duplicate payments and engagement
* wave 79: Round-3 coverage wave 79: activity streaks, referential-integrity
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from mapreduce6240project_spark.functions.numeric import stable_sum_micros
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from functools import reduce

# =========================================================================
# wave 8
# Round-3 coverage wave 8: product-analytics shapes over the event
# stream -- weekly retention cohorts, within-session transition bigrams
# (Markov edges), and the day-of-week x hour activity heatmap.
#
# All integer-exact outputs: week offsets are exact epoch arithmetic
# (both engines truncate weeks to naive Monday midnights), transitions
# count lead() pairs under the unique (ts, event_id) sort, and the
# heatmap derives day-of-week from epoch days (dayofweek() numbering
# differs between engines; ``(epoch_day + 4) % 7`` with 0=Sunday does
# not).
# =========================================================================

@_register(
    "retention_cohorts",
    """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort
  FROM events GROUP BY user_id
),
act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
SELECT CAST(epoch(cohort) AS BIGINT) AS cohort_start,
       CAST((epoch(wk) - epoch(cohort)) / 604800 AS INT) AS week_offset,
       count(*) AS n_users
FROM act JOIN firsts USING (user_id)
GROUP BY 1, 2""",
    ref="extension: weekly retention cohorts (first-activity week x "
    "active week); two aggregations + one key join, offsets are exact "
    "epoch arithmetic on Monday-truncated weeks",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.unix_timestamp(F.date_trunc("week", F.min("ts"))).alias("cohort_s")
    )
    act = ev.select(
        "user_id", F.unix_timestamp(F.date_trunc("week", F.col("ts"))).alias("wk_s")
    ).distinct()
    return (
        act.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_s").alias("cohort_start"),
            ((F.col("wk_s") - F.col("cohort_s")) / 604800)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# -- within-session transition bigrams -------------------------------------


@_register(
    "session_transitions",
    """
WITH o AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
  WHERE ts IS NOT NULL
),
f AS (
  SELECT *, CASE WHEN us - lag(us) OVER w >= 1800000000
                   OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, sum(new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM f
),
t AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id, sess
                                ORDER BY us, event_id) AS dst
  FROM s
)
SELECT src, dst, count(*) AS n
FROM t WHERE dst IS NOT NULL
GROUP BY 1, 2 ORDER BY n DESC, src, dst LIMIT 20""",
    ref="extension: within-session Markov transition edges (sessionize "
    "via gaps-and-islands + lead bigrams); one shuffle on the user key, "
    "top-k via TakeOrderedAndProject",
)
def q_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts events have no session position (dirty-events contract)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    new = (
        F.when(
            (us - F.lag(us).over(w) >= 1_800_000_000)
            | F.lag(us).over(w).isNull(),
            1,
        )
        .otherwise(0)
    )
    flagged = ev.withColumn("_new", new).withColumn(
        "_sess", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    wt = Window.partitionBy("user_id", "_sess").orderBy(us, "event_id")
    pairs = flagged.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wt).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "src", "dst")
        .limit(20)
    )


# -- day-of-week x hour activity heatmap -----------------------------------


@_register(
    "hourly_heatmap",
    """
SELECT CAST((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7 AS INT) AS dow,
       CAST(hour(ts) AS INT) AS hour,
       count(*) AS n,
       round(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)) / 1000000.0, 4)
         AS sum_value
FROM events GROUP BY 1, 2""",
    ref="extension: day-of-week x hour activity heatmap; dow from epoch "
    "days ((day+4)%7, 0=Sunday) because dayofweek() numbering differs "
    "between engines",
)
def q_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch_day = F.floor(F.unix_timestamp("ts") / 86400).cast("bigint")
    return ev.groupBy(
        ((epoch_day + 4) % 7).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        stable_sum_micros("value").alias("sum_value"),
    )


# -- per-user value trend (exact-integer regression slope) -----------------


@_register(
    "user_value_trend",
    """
WITH pts AS (
  SELECT user_id,
         epoch_us(ts) // 1000000 - 1704067200 AS x,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y
  FROM events
),
aggs AS (
  SELECT user_id,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM pts GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_micros_per_s
FROM aggs WHERE n * sxx - sx * sx <> 0""",
    ref="extension: per-user OLS trend of event value over time.  The "
    "closed-form slope (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is computed from "
    "exact integer sums (x = whole epoch seconds rebased to 2024-01-01, "
    "y = value in fixed-point micros, accumulated as decimal(38,0)): "
    "associative, so bit-identical under any partial-agg order, unlike a "
    "raw float regr_slope.  One shuffle on user_id; seconds (not micros) "
    "keep n*Sxx inside 38 digits even at 1e7 events/user",
)
def q_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    x = (F.expr("unix_micros(ts) div 1000000") - F.lit(1704067200)).cast(dec)
    y = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint").cast(dec)
    aggs = (
        ev.select("user_id", x.alias("x"), y.alias("y"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    n = F.col("n_events").cast(dec)
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        aggs.filter(den != 0)
        .select(
            "user_id",
            "n_events",
            F.round(num.cast("double") / den.cast("double"), 6).alias(
                "slope_micros_per_s"
            ),
        )
    )


# =========================================================================
# wave 17
# Round-3 coverage wave 17: strict ordered-sequence funnel.
#
# ``funnel_strict_3step``: users who performed click -> view -> purchase
# in strictly increasing time order, with the whole sequence inside 30
# minutes of the first click -- MATCH_RECOGNIZE-style sequence detection
# expressed as a chain of conditional min-aggregations:
#
#     c = min(ts | click)                  per user
#     v = min(ts | view    and ts > c)     per user
#     p = min(ts | purchase and ts > v)    per user
#
# Each step is one hash aggregation over events joined to the (1 row per
# user) previous step -- the earliest-match semantics of a sequential
# scan, with no per-user sort, no window funnel, no state machine.  The
# per-stage frames are user-count-sized, so every join broadcasts or
# shuffles a skinny table, never the event log twice.
#
# Reference parity note: sequence/funnel analytics are engine extensions
# alongside SURVEY.md section 2.11's event surface.
# =========================================================================

FUNNEL_WINDOW_US = 30 * 60 * 1_000_000


@_register(
    "funnel_strict_3step",
    f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
s1 AS (
  SELECT user_id, min(us) AS c_us FROM ev WHERE event_type = 'click'
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, s1.c_us, min(e.us) AS v_us
  FROM ev e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'view' AND e.us > s1.c_us
  GROUP BY e.user_id, s1.c_us
),
s3 AS (
  SELECT e.user_id, s2.c_us, min(e.us) AS p_us
  FROM ev e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.us > s2.v_us
  GROUP BY e.user_id, s2.c_us
)
SELECT (SELECT count(*) FROM s1) AS n_click,
       (SELECT count(*) FROM s2) AS n_click_view,
       (SELECT count(*) FROM s3
         WHERE p_us - c_us <= {FUNNEL_WINDOW_US}) AS n_full_funnel""",
    ref="extension: strict ordered-sequence funnel (earliest-match "
    "click->view->purchase within 30 min) via chained conditional "
    "min-aggregations; MATCH_RECOGNIZE semantics without a per-user "
    "sort or state machine",
)
def q_funnel_strict_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s1 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("us") > F.col("c_us"))
        .groupBy("user_id", "c_us")
        .agg(F.min("us").alias("v_us"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("us") > F.col("v_us"))
        .groupBy("user_id", "c_us")
        .agg(F.min("us").alias("p_us"))
    )
    full = s3.filter(F.col("p_us") - F.col("c_us") <= FUNNEL_WINDOW_US)
    return (
        s1.agg(F.count("*").alias("n_click"))
        .crossJoin(s2.agg(F.count("*").alias("n_click_view")))
        .crossJoin(full.agg(F.count("*").alias("n_full_funnel")))
    )


# =========================================================================
# wave 60
# Round-3 coverage wave 60: abuse/fraud detection heuristics.
#
# - ``bot_regularity_audit``: inter-event-time regularity per user -- the
#   classic bot signal (machine traffic fires on a clock; human gaps are
#   overdispersed).  Relative variance of gap seconds in exact integer
#   arithmetic: rel_var_permyriad = (n*Sgg - Sg^2) * 10000 / Sg^2 via the
#   closed-form sums, reported as (n_users_scored, n_regular) with the
#   regular threshold at 20% relative variance.  Gap seconds (not
#   micros) keep every product inside bigint at any volume.
# - ``burst_users_10min``: velocity rule -- users whose peak 10-minute
#   event count exceeds a threshold.  Tumbling-window counts then a
#   per-user max; the same shape a streaming rules engine runs with a
#   sliding state store.
# =========================================================================

_REL_VAR_MAX = 2000  # permyriad: 20% relative variance
_BURST_N = 5


@_register(
    "bot_regularity_audit",
    f"""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) // 1000000
           - lag(epoch_us(ts) // 1000000)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events
),
s AS (
  SELECT user_id, count(*) AS n, sum(gap_s) AS sg,
         sum(gap_s * gap_s) AS sgg
  FROM g WHERE gap_s IS NOT NULL GROUP BY 1
  HAVING count(*) >= 5 AND sum(gap_s) > 0
),
rv AS (
  SELECT user_id,
         (n * sgg - sg * sg) * 10000 // (sg * sg) AS rel_var_permyriad
  FROM s
)
SELECT CAST(count(*) AS BIGINT) AS n_users_scored,
       CAST(sum(CASE WHEN rel_var_permyriad < {_REL_VAR_MAX}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_regular
FROM rv""",
    ref="extension: bot-regularity heuristic -- exact integer relative "
    "variance of inter-event gap seconds per user (closed-form sums); "
    "gap seconds bound every product inside bigint",
)
def q_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # order the lag by FULL-resolution micros (the oracle orders by ts):
    # ordering by floored seconds could pair different neighbors when
    # two events share a second
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    g = ev.select(
        "user_id",
        (
            F.expr("us div 1000000")
            - F.expr(
                "lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)"
                " div 1000000"
            )
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    s = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("gap_s").alias("sg"),
            F.sum(F.expr("gap_s * gap_s")).alias("sgg"),
        )
        .filter((F.col("n") >= 5) & (F.col("sg") > 0))
    )
    rv = s.select(
        F.expr("(n * sgg - sg * sg) * 10000 div (sg * sg)").alias(
            "rel_var_permyriad"
        )
    )
    return rv.agg(
        F.count(F.lit(1)).alias("n_users_scored"),
        F.sum(
            F.when(F.col("rel_var_permyriad") < _REL_VAR_MAX, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_regular"),
    )


@_register(
    "burst_users_10min",
    f"""
WITH w AS (
  SELECT user_id, epoch_us(ts) // 600000000 AS win, count(*) AS n
  FROM events GROUP BY 1, 2
),
peaks AS (SELECT user_id, max(n) AS peak FROM w GROUP BY 1)
SELECT user_id, CAST(peak AS BIGINT) AS peak_10min
FROM peaks WHERE peak >= {_BURST_N}""",
    ref="extension: velocity rule -- peak tumbling-10-minute event "
    "count per user, flagged above the burst threshold; the batch twin "
    "of a streaming rules engine",
)
def q_burst_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = ev.groupBy(
        "user_id", F.expr("unix_micros(ts) div 600000000").alias("win")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        w.groupBy("user_id")
        .agg(F.max("n").alias("peak"))
        .filter(F.col("peak") >= _BURST_N)
        .select("user_id", F.col("peak").cast("bigint").alias("peak_10min"))
    )


# =========================================================================
# wave 62
# Round-3 coverage wave 62: empirical-Bayes smoothing and repurchase
# cycles.
#
# - ``part_return_rate_shrunk``: per-part return rate shrunk toward the
#   global rate with pseudo-count alpha=20 -- empirical-Bayes smoothing,
#   the cold-start fix every ranking/recsys pipeline applies to sparse
#   per-item rates (a part with 1 return in 2 rows must not outrank one
#   with 30 in 100).  All integer fixed point: shrunk_micro =
#   (k * 1e6 + alpha * global_micro) div (n + alpha).
# - ``repurchase_cycle_days``: mean days between a customer's consecutive
#   orders, rolled up per market segment in truncating milli-days -- the
#   repurchase-cycle input to retention and inventory planning.  Lag
#   window per customer, exact integer day sums.
# =========================================================================

_ALPHA = 20


@_register(
    "part_return_rate_shrunk",
    f"""
WITH pr AS (
  SELECT l_partkey, count(*) AS n,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS k
  FROM lineitem GROUP BY 1
),
g AS (SELECT sum(k) * 1000000 // sum(n) AS global_micro FROM pr)
SELECT l_partkey, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       CAST(k * 1000000 // n AS BIGINT) AS raw_micro,
       CAST((k * 1000000 + {_ALPHA} * g.global_micro) // (n + {_ALPHA})
            AS BIGINT) AS shrunk_micro
FROM pr, g""",
    ref="extension: empirical-Bayes shrunk per-part return rate "
    "(pseudo-count toward the global rate) -- integer fixed point, one "
    "part-keyed aggregate + 1-row global broadcast",
)
def q_return_rate_shrunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("k"),
    )
    g = pr.agg(F.expr("sum(k) * 1000000 div sum(n)").alias("global_micro"))
    return pr.crossJoin(F.broadcast(g)).select(
        "l_partkey",
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k"),
        F.expr("k * 1000000 div n").cast("bigint").alias("raw_micro"),
        F.expr(
            f"(k * 1000000 + {_ALPHA} * global_micro) div (n + {_ALPHA})"
        )
        .cast("bigint")
        .alias("shrunk_micro"),
    )


@_register(
    "repurchase_cycle_days",
    """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
  FROM orders
),
gaps AS (
  SELECT o_custkey,
         d - lag(d) OVER (PARTITION BY o_custkey
                          ORDER BY d, o_orderkey) AS gap_days
  FROM o
),
cust AS (
  SELECT o_custkey, count(*) AS n_intervals, sum(gap_days) AS total_days
  FROM gaps WHERE gap_days IS NOT NULL GROUP BY 1
)
SELECT c.c_mktsegment,
       CAST(sum(n_intervals) AS BIGINT) AS n_intervals,
       CAST(sum(total_days) * 1000 // sum(n_intervals) AS BIGINT)
         AS avg_days_milli
FROM cust JOIN customer c ON cust.o_custkey = c.c_custkey
GROUP BY 1""",
    ref="extension: repurchase cycle -- lag window per customer, "
    "segment rollup of exact integer day gaps in truncating milli-days",
)
def q_repurchase_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d"), "o_orderkey"
    )
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("d"),
            F.expr(
                "lag(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)"
            ),
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    cust = gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("gap_days").alias("total_days"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        cust.join(F.broadcast(c), cust.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_intervals").cast("bigint").alias("n_intervals"),
            F.expr("sum(total_days) * 1000 div sum(n_intervals)")
            .cast("bigint")
            .alias("avg_days_milli"),
        )
    )


# =========================================================================
# wave 67
# Round-3 coverage wave 67: duplicate payments and engagement
# stickiness.
#
# - ``dup_payment_pairs``: double-charge detection -- order pairs from
#   the same customer with the identical cent amount placed within one
#   day.  The join key is (customer, exact cents), so candidates are
#   equi-join-generated and the date band is a residual filter; the
#   classic fraud/ops reconciliation query.
# - ``dau_wau_stickiness``: DAU/WAU engagement ratio per day -- distinct
#   daily actives over distinct actives in the trailing 7 days, in
#   truncating permyriad.  The trailing-week distinct is computed by
#   fanning each (user, day) fact to the 7 window days it supports
#   (bounded x7 explode at day grain), then one distinct count per
#   window day -- no quadratic self-join, no sketch needed at day grain.
# =========================================================================

@_register(
    "dup_payment_pairs",
    """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS d
  FROM orders
)
SELECT a.o_custkey, a.o_orderkey AS order_a, b.o_orderkey AS order_b,
       CAST(a.cents AS BIGINT) AS cents
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.cents = b.cents
 AND a.o_orderkey < b.o_orderkey
 AND abs(a.d - b.d) <= 1""",
    ref="extension: double-charge detection -- (customer, exact cents) "
    "equi-join with a 1-day band filter; fraud/ops reconciliation",
)
def q_dup_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a, b = o.alias("a"), o.alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.cents") == F.col("b.cents"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.abs(F.datediff(F.col("a.d"), F.col("b.d"))) <= 1),
    ).select(
        F.col("a.o_custkey").alias("o_custkey"),
        F.col("a.o_orderkey").alias("order_a"),
        F.col("b.o_orderkey").alias("order_b"),
        F.col("a.cents").alias("cents"),
    )


@_register(
    "dau_wau_stickiness",
    """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
fan AS (
  SELECT user_id, day + CAST(o.off AS INT) AS wday
  FROM ud, unnest(generate_series(0, 6)) AS o(off)
),
wau AS (SELECT wday AS day, count(DISTINCT user_id) AS wau FROM fan GROUP BY 1)
SELECT CAST(strftime(d.day, '%Y-%m-%d') AS VARCHAR) AS day,
       CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
       CAST(d.dau * 10000 // w.wau AS BIGINT) AS stickiness_permyriad
FROM dau d JOIN wau w ON d.day = w.day""",
    ref="extension: DAU/WAU stickiness -- trailing-week distinct via a "
    "bounded x7 day-grain fan-out + distinct count; no self-join, no "
    "sketch needed at day grain",
)
def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    fan = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
    ).select("user_id", F.expr("date_add(day, off)").alias("wday"))
    wau = fan.groupBy(F.col("wday").alias("day")).agg(
        F.count_distinct("user_id").alias("wau")
    )
    return dau.join(wau, "day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("dau").cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
        F.expr("dau * 10000 div wau").cast("bigint").alias(
            "stickiness_permyriad"
        ),
    )


# =========================================================================
# wave 79
# Round-3 coverage wave 79: activity streaks, referential-integrity
# audit, lexical richness.
#
# - ``user_active_streaks``: longest run of *consecutive* active days per
#   user -- the classic gaps-and-islands shape.  Distinct (user, day) ->
#   per-user ``row_number`` over the integer day index -> ``day_idx -
#   row_number`` is constant within a consecutive run, so one more
#   group-by counts each island.  Day arithmetic uses days-since-epoch
#   integers (``datediff``/``date_diff``) so both engines subtract plain
#   BIGINTs -- no interval semantics to diverge on.  Scale: the window is
#   partitioned by user (full parallelism, no global sort) and operates
#   on distinct days only, a tiny fraction of raw events.
# - ``fk_orphan_audit``: referential-integrity audit of every
#   foreign-key edge in the star schema (lineitem->orders/part/supplier,
#   orders->customer, customer/supplier->nation, nation->region).  Each
#   edge contributes one row: child rowcount + orphan count via
#   left-anti join.  The parent side projects only its key, so Spark
#   broadcasts the small dimensions and AQE shuffles the big ones; the
#   per-edge results are single rows unioned together.  The companion to
#   ``fd_violation_audit`` (functional dependencies) and ``dq_audit``
#   (column-level nulls) -- together the three standard ingest gates.
# - ``hapax_ratio_source``: per-source lexical richness -- token count,
#   type count (distinct tokens), hapax count (types occurring exactly
#   once within the source), and hapax share of types in permyriad.
#   Natural prose keeps a high hapax share; templated/generated text
#   collapses it, making this a cheap per-source quality gate next to
#   ``zipf_slope_tokens`` (corpus-wide) and ``token_entropy``.  Shape:
#   explode tokens -> one (source, token) count shuffle (partial-agg
#   friendly) -> tiny per-source rollup.
#
# Scale: streaks are user-partitioned windows over distinct days; the FK
# audit is anti-joins Catalyst already knows how to place; hapax is one
# group-by over (source, token) -- all shapes that survive 1000x.
# =========================================================================

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@_register(
    "user_active_streaks",
    """
WITH d AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx
  FROM events
), isl AS (
  SELECT user_id, day_idx,
         day_idx - row_number() OVER (PARTITION BY user_id
                                      ORDER BY day_idx) AS grp
  FROM d
), runs AS (
  SELECT user_id, grp, count(*) AS run_len FROM isl GROUP BY 1, 2
)
SELECT user_id,
       CAST(sum(run_len) AS BIGINT) AS n_active_days,
       CAST(max(run_len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY 1""",
    ref="extension: gaps-and-islands longest consecutive-active-day "
    "streak per user -- integer day index minus per-user row_number "
    "labels each island; user-partitioned window over distinct days",
)
def q_user_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_idx")
    isl = d.withColumn("grp", F.col("day_idx") - F.row_number().over(w))
    runs = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.sum("run_len").cast("bigint").alias("n_active_days"),
        F.max("run_len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
    )


#: (edge label, child table, child FK column, parent table, parent key)
_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part",
     "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier",
     "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer",
     "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation",
     "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation",
     "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region",
     "r_regionkey"),
)

_FK_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS fk_edge,
       (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS n_child_rows,
       (SELECT CAST(count(*) AS BIGINT) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                          WHERE p.{pkey} = c.{fkey})) AS n_orphans"""
    for label, child, fkey, parent, pkey in _FK_EDGES
)


@_register(
    "fk_orphan_audit",
    _FK_ORACLE,
    ref="extension: referential-integrity audit -- orphan counts via "
    "left-anti join for every FK edge in the star schema; companion "
    "to fd_violation_audit/dq_audit as the third standard ingest gate",
)
def q_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = {
        name: load_table(spark, sf_dir, name)
        for name in (
            "lineitem", "orders", "part", "supplier", "customer",
            "nation", "region",
        )
    }
    per_edge = []
    for label, child, fkey, parent, pkey in _FK_EDGES:
        c = tables[child].select(F.col(fkey).alias("_k"))
        # parent keys are primary keys (unique), so a left join with a
        # hit marker counts rows and orphans in ONE child scan -- an
        # anti-join would re-scan the child for the rowcount.
        p = (
            tables[parent]
            .select(F.col(pkey).alias("_k"))
            .withColumn("_hit", F.lit(1))
        )
        per_edge.append(
            c.join(p, "_k", "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_child_rows"),
                F.count(F.when(F.col("_hit").isNull(), 1))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(
                F.lit(label).alias("fk_edge"), "n_child_rows", "n_orphans"
            )
        )
    return reduce(DataFrame.unionByName, per_edge)


@_register(
    "hapax_ratio_source",
    f"""
WITH tok AS (
  SELECT source, unnest(string_split({_NORM}, ' ')) AS t
  FROM documents WHERE {_NORM} <> ''
), c AS (
  SELECT source, t, count(*) AS n FROM tok GROUP BY 1, 2
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS n_hapax,
       count(*) FILTER (WHERE n = 1) * 10000 // count(*) AS hapax_pm
FROM c GROUP BY 1""",
    ref="extension: per-source hapax-legomena share (lexical richness "
    "gate) -- one (source, token) count shuffle, tiny per-source "
    "rollup; templated text collapses the hapax share",
)
def q_hapax_ratio_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("source", normalize_text("text").alias("nm"))
        .filter(F.col("nm") != "")
        .select("source", F.explode(F.split(F.col("nm"), " ")).alias("t"))
    )
    c = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    return (
        c.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.count(F.when(F.col("n") == 1, 1))
            .cast("bigint")
            .alias("n_hapax"),
        )
        # integer div (not double /) so the permyriad floor matches the
        # oracle's `//` bit-for-bit
        .withColumn("hapax_pm", F.expr("n_hapax * 10000 div n_types"))
    )


# =========================================================================
# round-4 attribution family
#
# - ``time_decay_attribution``: exponential time-decay multi-touch
#   attribution -- each view/click within 1 hour before the same user's
#   next purchase earns weight halving every 15 minutes of age
#   (integer bit-shift, exact in both engines), normalized per purchase
#   to micro credits by truncating division.  Completes the attribution
#   triptych with ``last_touch_attribution`` (winner-take-all) and
#   ``linear_attribution`` (equal split).
# - ``markov_removal_attribution``: Markov-chain removal-effect
#   attribution (Anderl et al.) -- user journeys truncated at first
#   purchase become a transition-count matrix; conversion probability
#   within 4 steps from START is computed by unrolled integer-micro
#   matrix powers (per-term ``(v * p) div 1e6`` truncation, so the sum
#   is order-independent and replays bit-exactly on any engine and any
#   partitioning); each channel's removal effect = conversion drop when
#   transitions touching that channel are redirected to the implicit
#   null absorber (no renormalization).  The journey scan is one
#   user-keyed window; everything after the count aggregate is
#   fixed-size (<= states^2 rows), so the unrolled powers are free at
#   any scale.
# =========================================================================


@_register(
    "time_decay_attribution",
    """
WITH nxt AS (
  SELECT event_type, user_id, epoch_us(ts) AS t_us,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS purch_us
  FROM events
), touch AS (
  SELECT event_type, user_id, purch_us,
         1000000 // (1 << CAST(((purch_us - t_us) // 60000000) // 15
                               AS BIGINT)) AS w
  FROM nxt
  WHERE event_type IN ('view', 'click')
    AND purch_us IS NOT NULL AND purch_us - t_us <= 3600000000
), norm AS (
  SELECT event_type, w,
         sum(w) OVER (PARTITION BY user_id, purch_us) AS w_tot
  FROM touch
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum((w * 1000000) // w_tot) AS BIGINT) AS credit_micro
FROM norm GROUP BY event_type""",
    ref="extension: time-decay multi-touch attribution -- half-life 15 "
    "min via integer bit-shift weights, per-purchase truncating-div "
    "normalization; same forward as-of window as linear_attribution "
    "(no range join)",
)
def q_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = ev.select(
        "event_type",
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        )
        .over(w)
        .alias("purch_us"),
    )
    touch = nxt.filter(
        F.col("event_type").isin("view", "click")
        & F.col("purch_us").isNotNull()
        & (F.col("purch_us") - F.col("t_us") <= 3600000000)
    ).withColumn(
        "w",
        F.expr(
            "1000000 div shiftleft(1, CAST(((purch_us - t_us) div 60000000)"
            " div 15 AS INT))"
        ),
    )
    norm = touch.withColumn(
        "w_tot", F.sum("w").over(Window.partitionBy("user_id", "purch_us"))
    )
    return norm.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum(F.expr("(w * 1000000) div w_tot"))
        .cast("bigint")
        .alias("credit_micro"),
    )


_MARKOV_SCEN_SQL = (
    "SELECT * FROM (VALUES ('full', NULL), ('no_view', 'view'),"
    " ('no_click', 'click'), ('no_signup', 'signup'),"
    " ('no_error', 'error')) AS scen(scenario, rm)"
)


def _markov_removal_sql() -> str:
    # unrolled 4-step integer-micro matrix powers; per-term truncating
    # division makes every sum order-independent (exact cross-engine)
    steps = []
    prev = "t1"
    steps.append(
        """
v1 AS (
  SELECT scenario, t AS st, sum(p) AS m
  FROM ps WHERE f = 'start' GROUP BY 1, 2
),
t1 AS (SELECT * FROM v1 WHERE st <> 'purchase')"""
    )
    for k in range(2, 5):
        steps.append(
            f"""
v{k} AS (
  SELECT ps.scenario, ps.t AS st, sum(({prev}.m * ps.p) // 1000000) AS m
  FROM {prev} JOIN ps ON ps.scenario = {prev}.scenario AND ps.f = {prev}.st
  GROUP BY 1, 2
),
t{k} AS (SELECT * FROM v{k} WHERE st <> 'purchase')"""
        )
        prev = f"t{k}"
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), cut AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'purchase' THEN rn END) AS pr
  FROM seq GROUP BY 1
), j AS (
  SELECT s.user_id, s.event_type, s.rn
  FROM seq s JOIN cut c ON s.user_id = c.user_id
  WHERE c.pr IS NULL OR s.rn <= c.pr
), tr AS (
  SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id ORDER BY rn),
                  'start') AS f,
         event_type AS t
  FROM j
), cnt AS (
  SELECT f, t, count(*) AS c FROM tr GROUP BY 1, 2
), ends AS (
  SELECT event_type AS f, count(*) AS e FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rr
    FROM j) last_rows
  WHERE rr = 1 AND event_type <> 'purchase' GROUP BY 1
), outs AS (
  SELECT cnt.f, sum(cnt.c) + coalesce(min(e.e), 0) AS tot
  FROM cnt LEFT JOIN ends e USING (f) GROUP BY cnt.f
), p AS (
  SELECT cnt.f, cnt.t, (1000000 * cnt.c) // outs.tot AS p
  FROM cnt JOIN outs USING (f)
), scen AS ({_MARKOV_SCEN_SQL}), ps AS (
  SELECT scen.scenario, p.f, p.t, p.p
  FROM p CROSS JOIN scen
  WHERE scen.rm IS NULL OR (p.f <> scen.rm AND p.t <> scen.rm)
),{",".join(steps)},
allv AS (
  SELECT * FROM v1 UNION ALL SELECT * FROM v2
  UNION ALL SELECT * FROM v3 UNION ALL SELECT * FROM v4
), conv AS (
  SELECT scen.scenario,
         CAST(coalesce(sum(allv.m) FILTER (WHERE allv.st = 'purchase'), 0)
              AS BIGINT) AS conv_micro
  FROM scen LEFT JOIN allv ON allv.scenario = scen.scenario
  GROUP BY 1
)
SELECT c.scenario, c.conv_micro,
       CAST(f.conv_micro - c.conv_micro AS BIGINT) AS removal_effect_micro
FROM conv c CROSS JOIN (SELECT conv_micro FROM conv
                        WHERE scenario = 'full') f"""


@_register(
    "markov_removal_attribution",
    _markov_removal_sql(),
    ref="extension: Markov removal-effect attribution -- journeys "
    "truncated at first purchase, transition probs as truncating "
    "integer micros, conversion within 4 steps from START via unrolled "
    "matrix powers (per-term (v*p) div 1e6, order-independent), "
    "removal = transitions touching the channel redirected to the "
    "implicit null absorber; everything after the count aggregate is "
    "fixed-size",
)
def q_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w_rn).alias("rn")
    )
    cut = seq.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("rn"))).alias(
            "pr"
        )
    )
    j = seq.join(cut, "user_id").filter(
        F.col("pr").isNull() | (F.col("rn") <= F.col("pr"))
    )
    w_lag = Window.partitionBy("user_id").orderBy("rn")
    tr = j.select(
        F.coalesce(F.lag("event_type").over(w_lag), F.lit("start")).alias(
            "f"
        ),
        F.col("event_type").alias("t"),
    )
    cnt = tr.groupBy("f", "t").agg(F.count(F.lit(1)).alias("c"))
    w_rr = Window.partitionBy("user_id").orderBy(F.col("rn").desc())
    ends = (
        j.withColumn("rr", F.row_number().over(w_rr))
        .filter((F.col("rr") == 1) & (F.col("event_type") != "purchase"))
        .groupBy(F.col("event_type").alias("f"))
        .agg(F.count(F.lit(1)).alias("e"))
    )
    outs = (
        cnt.join(ends, "f", "left")
        .groupBy("f")
        .agg(
            (F.sum("c") + F.coalesce(F.min("e"), F.lit(0))).alias("tot")
        )
    )
    p = cnt.join(outs, "f").select(
        "f", "t", F.expr("(1000000 * c) div tot").alias("p")
    )
    # The transition-prob table is fixed-size (|event-type enum|+1
    # squared, <= 36 rows here) -- C-row driver state like the kmedoids
    # combo table, NOT data-scale.  The 4-step powers over 5 scenarios
    # are pure integer micro math, identical term-by-term to the
    # oracle's unrolled CTEs ((v * p) div 1e6 per term, then integer
    # sums -- order-independent).
    prows = p.collect()
    if len(prows) > 4096:  # pragma: no cover - enum-bounded by design
        raise ValueError(
            "markov_removal_attribution: transition matrix exceeds the "
            f"bounded-state cap ({len(prows)} rows); the state space "
            "must be a small enum"
        )
    base = {(r["f"], r["t"]): r["p"] for r in prows}
    scenarios = [
        ("full", None),
        ("no_view", "view"),
        ("no_click", "click"),
        ("no_signup", "signup"),
        ("no_error", "error"),
    ]
    convs: list[tuple[str, int]] = []
    for scen, rm in scenarios:
        probs = {
            (f, t): pp
            for (f, t), pp in base.items()
            if rm is None or (f != rm and t != rm)
        }
        v = {"start": 1_000_000}
        conv = 0
        for _ in range(4):
            nv: dict[str, int] = {}
            for (f, t), pp in probs.items():
                if f in v:
                    nv[t] = nv.get(t, 0) + (v[f] * pp) // 1_000_000
            conv += nv.pop("purchase", 0)
            v = nv
        convs.append((scen, conv))
    full_conv = dict(convs)["full"]
    return spark.createDataFrame(
        [(s, c, full_conv - c) for s, c in convs],
        "scenario string, conv_micro long, removal_effect_micro long",
    )


# round-4: probability-calibration audit.  A user's purchase propensity
# is "predicted" from the first half of the span (purchase share of
# their events, integer micro) and scored against whether they actually
# purchased in the second half: per-decile reliability bins (mean
# predicted vs empirical rate) plus the per-bin Brier contribution in
# micro^2 units -- every quantity an exact integer (DECIMAL(38) sums
# for the squared terms), so the diagram replays bit-exactly.


@_register(
    "brier_reliability_bins",
    """
WITH ev2 AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events
), thr AS (
  SELECT (min(t_us) + max(t_us)) // 2 AS mid_us FROM ev2
), u AS (
  SELECT user_id,
         (1000000 * count(*) FILTER (WHERE event_type = 'purchase'
                                     AND t_us < (SELECT mid_us FROM thr)))
           // count(*) FILTER (WHERE t_us < (SELECT mid_us FROM thr)) AS p,
         CAST(coalesce(max(CASE WHEN event_type = 'purchase'
                       AND t_us >= (SELECT mid_us FROM thr)
                       THEN 1 ELSE 0 END), 0) AS BIGINT) AS y
  FROM ev2 GROUP BY 1
  HAVING count(*) FILTER (WHERE t_us < (SELECT mid_us FROM thr)) > 0
)
SELECT CAST(least(p // 100000, 9) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(p) // count(*) AS BIGINT) AS mean_p_micro,
       CAST((10000 * sum(y)) // count(*) AS BIGINT) AS rate_permyriad,
       CAST(CAST(sum(CAST((p - 1000000 * y) AS HUGEINT)
                     * (p - 1000000 * y)) AS HUGEINT)
            // count(*) AS BIGINT) AS brier_micro2_mean
FROM u GROUP BY 1""",
    ref="extension: reliability diagram + per-bin Brier score for a "
    "first-half purchase-share propensity vs second-half outcome -- "
    "integer micro probabilities, DECIMAL(38)/HUGEINT squared sums, "
    "truncating-div bin means",
)
def q_brier_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev2 = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("t_us")
    )
    thr = ev2.agg(F.expr("(min(t_us) + max(t_us)) div 2").alias("mid_us"))
    u = (
        ev2.crossJoin(F.broadcast(thr))
        .groupBy("user_id")
        .agg(
            F.expr(
                "(1000000 * count(CASE WHEN event_type = 'purchase'"
                " AND t_us < mid_us THEN 1 END))"
                " div count(CASE WHEN t_us < mid_us THEN 1 END)"
            ).alias("p"),
            F.expr(
                "CAST(coalesce(max(CASE WHEN event_type = 'purchase'"
                " AND t_us >= mid_us THEN 1 ELSE 0 END), 0) AS BIGINT)"
            ).alias("y"),
            F.expr(
                "count(CASE WHEN t_us < mid_us THEN 1 END)"
            ).alias("_npre"),
        )
        .filter(F.col("_npre") > 0)
    )
    return (
        u.groupBy(F.expr("CAST(least(p div 100000, 9) AS BIGINT)").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.expr("sum(p) div count(*)").cast("bigint").alias(
                "mean_p_micro"
            ),
            F.expr("(10000 * sum(y)) div count(*)")
            .cast("bigint")
            .alias("rate_permyriad"),
            F.expr(
                "CAST(sum(CAST(p - 1000000 * y AS DECIMAL(38,0))"
                " * (p - 1000000 * y)) div count(*) AS BIGINT)"
            ).alias("brier_micro2_mean"),
        )
    )


# =========================================================================
# wave 94: Simpson's-paradox audit
#
# ``simpson_reversal_audit``: does the sign of "high-discount lines are
# returned more often than low-discount lines" REVERSE inside any part
# brand relative to the corpus-level aggregate?  The canonical
# confounding check every observational metrics pipeline needs before
# shipping a rate comparison.  All rates are compared by integer
# cross-multiplication (rh*tl vs rl*th) so no division -- and therefore
# no float -- exists anywhere in the query; signs and flags are exact.
# 100 TB: one broadcast dim join (part brand) + two hash aggregates;
# the audit table is |brands| rows.
# =========================================================================


@_register(
    "simpson_reversal_audit",
    """
WITH tagged AS (
  SELECT p.p_brand,
         CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END AS hi,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_discount IS NOT NULL AND l.l_returnflag IS NOT NULL
),
agg AS (
  SELECT CAST(sum(CASE WHEN hi = 1 THEN ret END) AS BIGINT) AS rh,
         CAST(count(CASE WHEN hi = 1 THEN 1 END) AS BIGINT) AS th,
         CAST(sum(CASE WHEN hi = 0 THEN ret END) AS BIGINT) AS rl,
         CAST(count(CASE WHEN hi = 0 THEN 1 END) AS BIGINT) AS tl
  FROM tagged
),
per AS (
  SELECT p_brand,
         CAST(sum(CASE WHEN hi = 1 THEN ret END) AS BIGINT) AS rh,
         CAST(count(CASE WHEN hi = 1 THEN 1 END) AS BIGINT) AS th,
         CAST(sum(CASE WHEN hi = 0 THEN ret END) AS BIGINT) AS rl,
         CAST(count(CASE WHEN hi = 0 THEN 1 END) AS BIGINT) AS tl
  FROM tagged GROUP BY 1
  HAVING count(CASE WHEN hi = 1 THEN 1 END) > 0
     AND count(CASE WHEN hi = 0 THEN 1 END) > 0
)
SELECT per.p_brand, per.rh, per.th, per.rl, per.tl,
       CAST(sign(agg.rh * agg.tl - agg.rl * agg.th) AS BIGINT) AS agg_dir,
       CAST(sign(per.rh * per.tl - per.rl * per.th) AS BIGINT) AS brand_dir,
       CAST(CASE WHEN sign(agg.rh * agg.tl - agg.rl * agg.th)
                    * sign(per.rh * per.tl - per.rl * per.th) < 0
                 THEN 1 ELSE 0 END AS BIGINT) AS reversed
FROM per CROSS JOIN agg""",
    ref="extension: Simpson's-paradox detection -- aggregate vs "
    "per-stratum direction of a rate comparison via integer "
    "cross-multiplication; zero float ops end to end",
)
def q_simpson_reversal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_discount").isNotNull() & F.col("l_returnflag").isNotNull()
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    tagged = li.join(
        F.broadcast(pt), li.l_partkey == pt.p_partkey
    ).select(
        "p_brand",
        F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("hi"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )

    def _counts(grouped):
        return grouped.agg(
            F.sum(F.when(F.col("hi") == 1, F.col("ret"))).alias("rh"),
            F.count(F.when(F.col("hi") == 1, 1)).alias("th"),
            F.sum(F.when(F.col("hi") == 0, F.col("ret"))).alias("rl"),
            F.count(F.when(F.col("hi") == 0, 1)).alias("tl"),
        )

    agg = _counts(tagged.groupBy()).select(
        F.signum(
            (F.col("rh") * F.col("tl") - F.col("rl") * F.col("th")).cast(
                "double"
            )
        )
        .cast("bigint")
        .alias("agg_dir")
    )
    per = _counts(tagged.groupBy("p_brand")).filter(
        (F.col("th") > 0) & (F.col("tl") > 0)
    )
    brand_dir = (
        F.signum(
            (F.col("rh") * F.col("tl") - F.col("rl") * F.col("th")).cast(
                "double"
            )
        )
        .cast("bigint")
        .alias("brand_dir")
    )
    return per.crossJoin(F.broadcast(agg)).select(
        "p_brand",
        "rh",
        "th",
        "rl",
        "tl",
        "agg_dir",
        brand_dir,
        F.when(F.col("agg_dir") * brand_dir < 0, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("reversed"),
    )


# =========================================================================
# wave 95: expected calibration error
#
# ``ece_calibration``: the scalar summary of the reliability diagram
# ``brier_reliability_bins`` draws -- per-decile |empirical rate -
# mean predicted| weighted by bin mass (ECE), plus the worst bin
# (MCE).  Same first-half-propensity / second-half-outcome
# construction as the diagram, same all-integer micro units: per bin
# the gap |1e6 * sum(y) - sum(p)| is an exact integer, so ECE/MCE are
# exact truncating divisions -- the calibration gate a model-serving
# pipeline can hash-check.
# =========================================================================


@_register(
    "ece_calibration",
    """
WITH ev2 AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events
), thr AS (
  SELECT (min(t_us) + max(t_us)) // 2 AS mid_us FROM ev2
), u AS (
  SELECT user_id,
         (1000000 * count(*) FILTER (WHERE event_type = 'purchase'
                                     AND t_us < (SELECT mid_us FROM thr)))
           // count(*) FILTER (WHERE t_us < (SELECT mid_us FROM thr)) AS p,
         CAST(coalesce(max(CASE WHEN event_type = 'purchase'
                       AND t_us >= (SELECT mid_us FROM thr)
                       THEN 1 ELSE 0 END), 0) AS BIGINT) AS y
  FROM ev2 GROUP BY 1
  HAVING count(*) FILTER (WHERE t_us < (SELECT mid_us FROM thr)) > 0
),
bins AS (
  SELECT CAST(least(p // 100000, 9) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(abs(1000000 * sum(y) - sum(p)) AS BIGINT) AS gap_microusers
  FROM u GROUP BY 1
)
SELECT CAST(sum(n_b) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(gap_microusers) // sum(n_b) AS BIGINT) AS ece_micro,
       CAST(max(gap_microusers // n_b) AS BIGINT) AS mce_micro
FROM bins""",
    ref="extension: expected + maximum calibration error over the "
    "brier_reliability_bins deciles -- exact integer bin gaps, "
    "truncating-div summary; the scalar calibration gate",
)
def q_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev2 = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("t_us")
    )
    thr = ev2.agg(F.expr("(min(t_us) + max(t_us)) div 2").alias("mid_us"))
    u = (
        ev2.crossJoin(F.broadcast(thr))
        .groupBy("user_id")
        .agg(
            F.expr(
                "(1000000 * count(CASE WHEN event_type = 'purchase'"
                " AND t_us < mid_us THEN 1 END))"
                " div count(CASE WHEN t_us < mid_us THEN 1 END)"
            ).alias("p"),
            F.expr(
                "CAST(coalesce(max(CASE WHEN event_type = 'purchase'"
                " AND t_us >= mid_us THEN 1 ELSE 0 END), 0) AS BIGINT)"
            ).alias("y"),
            F.expr("count(CASE WHEN t_us < mid_us THEN 1 END)").alias(
                "_npre"
            ),
        )
        .filter(F.col("_npre") > 0)
    )
    bins = u.groupBy(
        F.expr("CAST(least(p div 100000, 9) AS BIGINT)").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.abs(1000000 * F.sum("y") - F.sum("p"))
        .cast("bigint")
        .alias("gap_microusers"),
    )
    return bins.agg(
        F.sum("n_b").cast("bigint").alias("n_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.expr("sum(gap_microusers) div sum(n_b)")
        .cast("bigint")
        .alias("ece_micro"),
        F.max(F.expr("gap_microusers div n_b"))
        .cast("bigint")
        .alias("mce_micro"),
    )


# =========================================================================
# wave 99: operating-point selection
#
# ``f1_threshold_sweep``: sweep the decision threshold over the same
# first-half-propensity / second-half-outcome table as
# ``brier_reliability_bins`` / ``ece_calibration`` and report
# precision / recall / F1 at each decile cut plus the argmax-F1
# operating point -- the last step of shipping a classifier the
# calibration audits only score.  Exactness: TP/FP/FN are integer
# counts per cut; P, R, F1 are reported as micro ratios via one
# truncating division each, and the argmax comparison is done by
# integer cross-multiplication of F1 = 2TP/(2TP+FP+FN) (numerators
# 2TP*(den_other) vs ...), so the winner is exact, never a float
# artifact.  The sweep table is 10 rows regardless of input size.
# =========================================================================


@_register(
    "f1_threshold_sweep",
    """
WITH ev2 AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events
), thr AS (
  SELECT (min(t_us) + max(t_us)) // 2 AS mid_us FROM ev2
), u AS (
  SELECT user_id,
         (1000000 * count(*) FILTER (WHERE event_type = 'purchase'
                                     AND t_us < (SELECT mid_us FROM thr)))
           // count(*) FILTER (WHERE t_us < (SELECT mid_us FROM thr)) AS p,
         CAST(coalesce(max(CASE WHEN event_type = 'purchase'
                       AND t_us >= (SELECT mid_us FROM thr)
                       THEN 1 ELSE 0 END), 0) AS BIGINT) AS y
  FROM ev2 GROUP BY 1
  HAVING count(*) FILTER (WHERE t_us < (SELECT mid_us FROM thr)) > 0
),
cuts AS (SELECT unnest(generate_series(0, 9)) * 100000 AS cut),
conf AS (
  SELECT cuts.cut,
         CAST(count(CASE WHEN u.p >= cuts.cut AND u.y = 1 THEN 1 END)
              AS BIGINT) AS tp,
         CAST(count(CASE WHEN u.p >= cuts.cut AND u.y = 0 THEN 1 END)
              AS BIGINT) AS fp,
         CAST(count(CASE WHEN u.p < cuts.cut AND u.y = 1 THEN 1 END)
              AS BIGINT) AS fn
  FROM u CROSS JOIN cuts GROUP BY 1
),
scored AS (
  SELECT cut, tp, fp, fn,
         CASE WHEN tp + fp = 0 THEN 0
              ELSE tp * 1000000 // (tp + fp) END AS prec_micro,
         CASE WHEN tp + fn = 0 THEN 0
              ELSE tp * 1000000 // (tp + fn) END AS rec_micro,
         CASE WHEN 2 * tp + fp + fn = 0 THEN 0
              ELSE 2 * tp * 1000000 // (2 * tp + fp + fn) END AS f1_micro
  FROM conf
),
best AS (
  SELECT min(cut) AS best_cut FROM scored s1
  WHERE NOT EXISTS (
    SELECT 1 FROM scored s2
    WHERE 2 * s2.tp * (2 * s1.tp + s1.fp + s1.fn)
          > 2 * s1.tp * (2 * s2.tp + s2.fp + s2.fn)
  )
)
SELECT CAST(s.cut AS BIGINT) AS cut_micro, s.tp, s.fp, s.fn,
       CAST(s.prec_micro AS BIGINT) AS prec_micro,
       CAST(s.rec_micro AS BIGINT) AS rec_micro,
       CAST(s.f1_micro AS BIGINT) AS f1_micro,
       CAST(CASE WHEN s.cut = b.best_cut THEN 1 ELSE 0 END AS BIGINT)
         AS is_best
FROM scored s CROSS JOIN best b""",
    ref="extension: precision/recall/F1 threshold sweep over the "
    "propensity table with an exact cross-multiplied argmax -- the "
    "operating-point selection the calibration audits stop short of",
)
def q_f1_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev2 = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("t_us")
    )
    thr = ev2.agg(F.expr("(min(t_us) + max(t_us)) div 2").alias("mid_us"))
    u = (
        ev2.crossJoin(F.broadcast(thr))
        .groupBy("user_id")
        .agg(
            F.expr(
                "(1000000 * count(CASE WHEN event_type = 'purchase'"
                " AND t_us < mid_us THEN 1 END))"
                " div count(CASE WHEN t_us < mid_us THEN 1 END)"
            ).alias("p"),
            F.expr(
                "CAST(coalesce(max(CASE WHEN event_type = 'purchase'"
                " AND t_us >= mid_us THEN 1 ELSE 0 END), 0) AS BIGINT)"
            ).alias("y"),
            F.expr("count(CASE WHEN t_us < mid_us THEN 1 END)").alias(
                "_npre"
            ),
        )
        .filter(F.col("_npre") > 0)
    )
    cuts = F.explode(
        F.array(*[F.lit(c * 100000) for c in range(10)])
    ).alias("cut")
    conf = (
        u.select("p", "y", cuts)
        .groupBy("cut")
        .agg(
            F.count(
                F.when((F.col("p") >= F.col("cut")) & (F.col("y") == 1), 1)
            ).alias("tp"),
            F.count(
                F.when((F.col("p") >= F.col("cut")) & (F.col("y") == 0), 1)
            ).alias("fp"),
            F.count(
                F.when((F.col("p") < F.col("cut")) & (F.col("y") == 1), 1)
            ).alias("fn"),
        )
    )
    scored = conf.select(
        "cut",
        "tp",
        "fp",
        "fn",
        F.when(F.col("tp") + F.col("fp") == 0, 0)
        .otherwise(F.expr("tp * 1000000 div (tp + fp)"))
        .alias("prec_micro"),
        F.when(F.col("tp") + F.col("fn") == 0, 0)
        .otherwise(F.expr("tp * 1000000 div (tp + fn)"))
        .alias("rec_micro"),
        F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, 0)
        .otherwise(F.expr("2 * tp * 1000000 div (2 * tp + fp + fn)"))
        .alias("f1_micro"),
    )
    o = scored.select(
        F.col("cut").alias("o_cut"),
        F.col("tp").alias("o_tp"),
        F.col("fp").alias("o_fp"),
        F.col("fn").alias("o_fn"),
    )
    # exact argmax by cross-multiplied F1; ties -> smallest cut
    dominated = (
        scored.join(
            F.broadcast(o),
            2 * o.o_tp * (2 * F.col("tp") + F.col("fp") + F.col("fn"))
            > 2 * F.col("tp") * (2 * o.o_tp + o.o_fp + o.o_fn),
            "left_semi",
        )
        .select("cut")
    )
    best = (
        scored.join(dominated, "cut", "left_anti")
        .agg(F.min("cut").alias("best_cut"))
    )
    return scored.crossJoin(F.broadcast(best)).select(
        F.col("cut").cast("bigint").alias("cut_micro"),
        "tp",
        "fp",
        "fn",
        F.col("prec_micro").cast("bigint").alias("prec_micro"),
        F.col("rec_micro").cast("bigint").alias("rec_micro"),
        F.col("f1_micro").cast("bigint").alias("f1_micro"),
        F.when(F.col("cut") == F.col("best_cut"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_best"),
    )
