"""Round-3 coverage wave 84: PSI drift, conversion latency, linear
attribution.

- ``psi_value_drift``: Population Stability Index between the parity
  user cohorts' value distributions -- the industry-standard drift
  score next to ``ks_value_drift`` (KS is the sup-norm; PSI weights
  every bin and is what model-monitoring dashboards alarm on, with
  0.1/0.25 watch/act thresholds).  Same $10 bins and cohorts as the
  KS/calibration queries; Laplace add-one smoothing keeps empty-bin
  logs finite (documented, applied identically in both engines).  The
  per-bin log ratio is floor-quantized to micro-nats (the
  ``zipf_slope_tokens`` convention) and the whole sum stays in
  DECIMAL(38) with ONE final division -- bit-exact across engines.
- ``signup_to_purchase_latency``: per-user conversion latency -- first
  signup event to the first purchase at-or-after it, in whole seconds.
  Two user-keyed aggregations (signup min, then conditional purchase
  min after the join); users who never convert are dropped.  The
  funnel-latency table every growth dashboard starts from, the
  continuous companion to ``event_funnel``/``funnel_strict_3step``
  (which count stage reach, not time-to-convert).
- ``linear_attribution``: equal-credit (linear) multi-touch
  attribution -- each view/click within 1 hour BEFORE a purchase by
  the same user shares that purchase's credit equally; credits sum per
  touch type in exact micro units (``floor(n_type * 1e6 / n_touches)``
  per purchase, then an integer sum).  The forward as-of window
  (``asof_next_purchase`` pattern) assigns each touch its next
  purchase with NO range join: one user-partitioned ordered window,
  then a (user, purchase) group-by.  Complements
  ``last_touch_attribution`` (winner-take-all).

Scale: PSI reduces to a bounded histogram before any math; latency is
two user-keyed shuffles; attribution is a user-partitioned window plus
two bounded aggregations -- no pairwise range join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "psi_value_drift",
    """
WITH binned AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) // 1000 AS bin,
         count(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
         count(*) FILTER (WHERE user_id % 2 = 1) AS n_b
  FROM events GROUP BY 1
), sm AS (
  SELECT bin, n_a + 1 AS a, n_b + 1 AS b,
         CAST(sum(n_a + 1) OVER () AS DECIMAL(38,0)) AS ta,
         CAST(sum(n_b + 1) OVER () AS DECIMAL(38,0)) AS tb
  FROM binned
), term AS (
  SELECT ta, tb,
         (a * tb - b * ta)
           * CAST(floor(ln(CAST(a * tb AS DOUBLE) / CAST(b * ta AS DOUBLE))
                        * 1000000 + 0.5) AS BIGINT) AS num
  FROM sm
)
SELECT CAST(count(*) AS BIGINT) AS n_bins,
       CAST(max(ta) AS BIGINT) AS tot_a_sm,
       CAST(max(tb) AS BIGINT) AS tot_b_sm,
       CAST(CAST(sum(num) AS HUGEINT)
            // CAST(max(ta) * max(tb) AS HUGEINT) AS BIGINT) AS psi_micro
FROM term""",
    ref="extension: Population Stability Index between parity cohorts "
    "over $10 value bins -- add-one smoothing, micro-nat quantized "
    "log ratios, DECIMAL(38) sum, one final division; PSI companion "
    "to ks_value_drift",
)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    binned = (
        ev.select(
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 1000")
            .alias("bin"),
            F.col("user_id"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("user_id") % 2 == 0, 1)).alias("n_a"),
            F.count(F.when(F.col("user_id") % 2 == 1, 1)).alias("n_b"),
        )
    )
    w = Window.partitionBy()
    sm = binned.select(
        (F.col("n_a") + 1).alias("a"),
        (F.col("n_b") + 1).alias("b"),
        F.sum(F.col("n_a") + 1).over(w).cast("decimal(38,0)").alias("ta"),
        F.sum(F.col("n_b") + 1).over(w).cast("decimal(38,0)").alias("tb"),
    )
    term = sm.select(
        "ta",
        "tb",
        (
            (F.col("a") * F.col("tb") - F.col("b") * F.col("ta"))
            * F.expr(
                "CAST(floor(ln(CAST(a * tb AS DOUBLE)"
                " / CAST(b * ta AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
            )
        ).alias("num"),
    )
    return term.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.max("ta").cast("bigint").alias("tot_a_sm"),
        F.max("tb").cast("bigint").alias("tot_b_sm"),
        F.expr("CAST(sum(num) div (max(ta) * max(tb)) AS BIGINT)").alias(
            "psi_micro"
        ),
    )


@_register(
    "signup_to_purchase_latency",
    """
WITH signup AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY 1
), conv AS (
  SELECT s.user_id, s.signup_ts, min(e.ts) AS purchase_ts
  FROM signup s JOIN events e
    ON e.user_id = s.user_id
   AND e.event_type = 'purchase' AND e.ts >= s.signup_ts
  GROUP BY 1, 2
)
SELECT user_id,
       CAST(epoch_us(signup_ts) AS BIGINT) AS signup_us,
       CAST(epoch_us(purchase_ts) AS BIGINT) AS purchase_us,
       CAST((epoch_us(purchase_ts) - epoch_us(signup_ts)) // 1000000
            AS BIGINT) AS latency_s
FROM conv""",
    ref="extension: first-signup -> first-subsequent-purchase latency "
    "per user -- two user-keyed aggregations, whole-second deltas; "
    "time-to-convert companion to the funnel reach queries",
)
def q_signup_to_purchase_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    conv = (
        signup.join(
            p,
            (signup.user_id == F.col("p_uid"))
            & (F.col("p_ts") >= F.col("signup_ts")),
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("purchase_ts"))
    )
    su = F.unix_micros(F.col("signup_ts"))
    pu = F.unix_micros(F.col("purchase_ts"))
    return conv.select(
        "user_id",
        su.cast("bigint").alias("signup_us"),
        pu.cast("bigint").alias("purchase_us"),
        ((pu - su) / F.lit(1000000)).cast("bigint").alias("latency_s"),
    )


@_register(
    "linear_attribution",
    """
WITH nxt AS (
  SELECT event_type, user_id, epoch_us(ts) AS t_us,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS purch_us
  FROM events
), touch AS (
  SELECT event_type, user_id, purch_us
  FROM nxt
  WHERE event_type IN ('view', 'click')
    AND purch_us IS NOT NULL AND purch_us - t_us <= 3600000000
), grp AS (
  SELECT user_id, purch_us, event_type, count(*) AS n_type,
         sum(count(*)) OVER (PARTITION BY user_id, purch_us) AS n_touch
  FROM touch GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(sum(n_type) AS BIGINT) AS n_touches,
       CAST(sum(n_type * 1000000 // n_touch) AS BIGINT) AS credit_micro
FROM grp GROUP BY 1""",
    ref="extension: linear (equal-share) multi-touch attribution over "
    "a 1h lookback -- forward as-of window assigns each touch its "
    "next purchase (no range join), per-purchase equal split in exact "
    "micro units; winner-take-all variant is last_touch_attribution",
)
def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            F.when(
                F.col("event_type") == "purchase", F.unix_micros("ts")
            )
        )
        .over(w)
        .alias("purch_us"),
    )
    touch = nxt.filter(
        F.col("event_type").isin("view", "click")
        & F.col("purch_us").isNotNull()
        & (F.col("purch_us") - F.col("t_us") <= 3600000000)
    )
    grp = touch.groupBy("user_id", "purch_us", "event_type").agg(
        F.count(F.lit(1)).alias("n_type")
    )
    grp = grp.withColumn(
        "n_touch",
        F.sum("n_type").over(Window.partitionBy("user_id", "purch_us")),
    )
    return grp.groupBy("event_type").agg(
        F.sum("n_type").cast("bigint").alias("n_touches"),
        F.sum(F.expr("n_type * 1000000 div n_touch"))
        .cast("bigint")
        .alias("credit_micro"),
    )
