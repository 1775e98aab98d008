"""Sketch operators: Bloom-filter membership and a portable HyperLogLog.

Spark's own runtime bloom-filter join injection
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) covers the
automatic case; this module provides the *explicit* operator a pipeline
wants when the build side is computed once and probed many times (e.g.
"documents already ingested" membership across daily batches).

The filter is a plain bitmap: ``m`` bits as ``m/64`` longs.  Build is
one aggregation (bit positions -> per-word ``bit_or``); the bitmap is
collected (m/8 bytes -- 1 KiB for m=8192) and folded into the probe
expression as a literal array, so probing is a narrow projection:
``(words[p div 64] >> (p % 64)) & 1`` per hash function, all codegen.
No false negatives by construction; false-positive rate ~ (1-e^{-kn/m})^k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: Carter-Wegman constants for the integer-key hash family (same
#: derivation as operators.dedup.minhash_signatures)
_P = (1 << 31) - 1
_CW = [
    (
        (2654435761 * (j + 1) + 104729) % (_P - 1) + 1,
        (40503 * (j + 1) * 69621 + 12345) % _P,
    )
    for j in range(16)
]


def _positions(col: Column, m: int, k: int, int_keys: bool = False) -> list[Column]:
    """k bit positions per key.  ``int_keys=True`` uses the affine
    Carter-Wegman family over the (mod-2^31-reduced) key -- pure bigint
    arithmetic, overflow-safe under ANSI and replayable in the DuckDB
    oracle; the default xxhash64 family handles arbitrary types."""
    if int_keys:
        base = F.pmod(col.cast("bigint"), F.lit(_P))
        return [
            F.pmod(F.pmod(base * F.lit(a) + F.lit(b), F.lit(_P)), F.lit(m))
            for a, b in _CW[:k]
        ]
    return [F.pmod(F.xxhash64(F.lit(j), col), F.lit(m)) for j in range(k)]


def build_bloom(
    df: DataFrame, col: str, m: int = 8192, k: int = 4, int_keys: bool = False
) -> list[int]:
    """Aggregate the build side into an m-bit bitmap (list of m/64
    unsigned-ish longs), driver-resident.  Null keys are excluded: a
    null never matches an equi-join, so it must not set bits."""
    assert m % 64 == 0
    pos = F.explode(F.array(*_positions(F.col(col), m, k, int_keys))).alias("p")
    words = (
        df.filter(F.col(col).isNotNull())
        .select(pos)
        .select((F.col("p") / 64).cast("int").alias("w"),
                F.call_function("shiftleft", F.lit(1).cast("bigint"), F.pmod(F.col("p"), F.lit(64)).cast("int")).alias("b"))
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    bitmap = [0] * (m // 64)
    for r in words:
        bitmap[r.w] = r.word
    return bitmap


def bloom_might_contain(
    bitmap: list[int], col, m: int = 8192, k: int = 4, int_keys: bool = False
) -> Column:
    """Probe expression: true iff every hash position's bit is set.
    Null keys probe false (semi-join parity)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.array(*[F.lit(int(w)).cast("bigint") for w in bitmap])
    cond = c.isNotNull()
    for p in _positions(c, m, k, int_keys):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        bit = F.call_function("shiftright", word, F.pmod(p, F.lit(64)).cast("int")).bitwiseAND(F.lit(1))
        cond = cond & (bit == 1)
    return cond


def bloom_semi_filter(
    probe: DataFrame, build: DataFrame, probe_col: str, build_col: str,
    m: int = 8192, k: int = 4, int_keys: bool = False,
) -> DataFrame:
    """Approximate semi-join: keep probe rows whose key is *probably* in
    the build side.  Superset of the exact semi-join (no false
    negatives); follow with the exact join when exactness matters -- the
    bloom pre-filter then prunes the shuffle."""
    bitmap = build_bloom(build, build_col, m, k, int_keys)
    return probe.filter(bloom_might_contain(bitmap, probe_col, m, k, int_keys))


# ===========================================================================
# Portable HyperLogLog
# ===========================================================================

def hll_distinct(df: DataFrame, col: str, b: int = 8) -> DataFrame:
    """Approximate distinct count as a *portable* HyperLogLog: every step
    is deterministic, engine-neutral arithmetic, so a SQL oracle (DuckDB)
    replays the exact estimate bit-for-bit -- unlike
    ``approx_count_distinct``, whose HLL++ sketch is engine-internal.

    Construction (Flajolet et al. 2007, the plain HLL estimator):

    * 60-bit hash ``h`` = first 15 hex nibbles of ``md5(cast(key as
      string))`` -- the same SQL-replayable hash family the SimHash and
      winnowing operators use (``operators.dedup``).
    * bucket ``j`` = top ``b`` bits of ``h``; remainder ``w`` = low
      ``60-b`` bits; rank ``rho`` = leading-zero count of ``w`` within
      its ``60-b``-bit width, plus one (``w == 0`` -> width+1), computed
      as ``width + 1 - length(bin(w))`` -- both Spark and DuckDB render
      ``bin`` minimal-width.
    * register ``M_j = max(rho)`` per bucket: ONE map-side-partial
      ``groupBy`` whose exchange carries at most ``m = 2^b`` rows.
    * harmonic mean in *integer* fixed point: each register contributes
      ``2^(width+1-M_j)`` (empty registers ``2^(width+1)``), summed as
      exact bigints -- associative, so bit-identical under any
      partitioning or executor count; floats appear only in the final
      scalar estimate.
    * small-range (linear-counting) correction per the paper when
      ``E <= 2.5m`` and empty registers exist.

    Scale: the only exchange is the m-row register agg; the estimate is
    a 1-row scalar after it.  Returns one row: ``n_approx`` (bigint).
    """
    regs = hll_registers(df, col, b)
    return hll_estimate(regs, b)


def hll_registers(df: DataFrame, col: str, b: int = 8, group_cols: tuple = ()) -> DataFrame:
    """The mergeable state of :func:`hll_distinct`: (group..., j, M)
    register rows, at most ``2^b`` per group.  Registers merge by
    ``max(M)`` per bucket -- associative and idempotent, so estimates
    for any rollup level derive from finer-grained registers WITHOUT
    rescanning the raw data (the pre-aggregated-cube property)."""
    assert 4 <= b <= 16
    width = 60 - b
    scale = width + 1
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    w = h.bitwiseAND(F.lit((1 << width) - 1))
    bucket = F.call_function("shiftright", h, F.lit(width).cast("int"))
    rho = F.when(w == 0, F.lit(scale)).otherwise(
        F.lit(scale) - F.length(F.call_function("bin", w))
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(*group_cols, bucket.alias("j"), rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("M"))
    )


def hll_estimate(regs: DataFrame, b: int = 8, group_cols: tuple = ()) -> DataFrame:
    """Finalize register rows into ``n_approx`` (per group when
    ``group_cols`` given; one global row otherwise, including on empty
    input).  Same integer harmonic sum + linear-counting branch as
    :func:`hll_distinct`."""
    m = 1 << b
    width = 60 - b
    scale = width + 1  # max possible rho; 2^(scale-M) >= 1 stays integral
    alpha = 0.7213 / (1.0 + 1.079 / m)  # alpha_m for m >= 128 (paper)
    grouped = regs.groupBy(*group_cols) if group_cols else regs
    summed = grouped.agg(
        F.count("*").alias("used"),
        # coalesce: zero rows (empty/all-null input) must estimate 0, not null
        F.coalesce(
            F.sum(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("bigint"),
                    (F.lit(scale) - F.col("M")).cast("int"),
                )
            ),
            F.lit(0).cast("bigint"),
        ).alias("sp"),
    )
    empty = F.lit(m) - F.col("used")
    total = F.col("sp") + empty * F.lit(1 << scale)
    raw = F.lit(alpha * m * m * float(1 << scale)) / total.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double")),
    ).otherwise(raw)
    return summed.select(
        *group_cols, F.round(est).cast("bigint").alias("n_approx")
    )


def hll_oracle_sql(table: str, col: str, b: int = 8) -> str:
    """The DuckDB replay of :func:`hll_distinct` -- identical hash,
    identical integer register math, identical correction branch."""
    m = 1 << b
    width = 60 - b
    scale = width + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    mask = (1 << width) - 1
    return f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM {table} WHERE {col} IS NOT NULL
),
r AS (
  SELECT h >> {width} AS j,
         CASE WHEN (h & {mask}) = 0 THEN {scale}
              ELSE {scale} - length(bin(h & {mask})) END AS rho
  FROM h
),
regs AS (SELECT j, max(rho) AS M FROM r GROUP BY j),
s AS (
  SELECT count(*) AS used,
         COALESCE(sum((1::BIGINT << ({scale} - M))::BIGINT), 0) AS sp
  FROM regs
)
SELECT CAST(round(
  CASE WHEN (CAST({alpha!r} AS DOUBLE) * {m} * {m} * CAST({float(1 << scale)!r} AS DOUBLE)
             / (sp + ({m} - used) * ({1 << scale})::BIGINT)) <= {2.5 * m}
            AND ({m} - used) > 0
       THEN CAST({float(m)!r} AS DOUBLE) * ln(CAST({float(m)!r} AS DOUBLE) / ({m} - used))
       ELSE CAST({alpha!r} AS DOUBLE) * {m} * {m} * CAST({float(1 << scale)!r} AS DOUBLE)
            / (sp + ({m} - used) * ({1 << scale})::BIGINT)
  END) AS BIGINT) AS n_approx
FROM s"""


# ===========================================================================
# Portable Count-Min Sketch (heavy-hitter counts)
# ===========================================================================

def cms_params(d: int = 4) -> list[tuple[int, int]]:
    """The d Carter-Wegman (a, b) rows shared by the Spark build/estimate
    and the DuckDB oracle replay."""
    return [(a, b) for a, b in _CW[:d]]


def _cms_base(col: Column) -> Column:
    """60-bit md5 token hash reduced mod P -- the per-key input to every
    CMS row hash.  Same replayable md5 family as hll_distinct."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint"), F.lit(_P)
    )


def cms_build(items: DataFrame, col: str, w: int = 1024, d: int = 4) -> DataFrame:
    """Count-Min sketch over one occurrence column: d x w counters as a
    (i, p, c) table with at most d*w rows.

    This is the 100 TB shape for frequency estimation: the exchange
    carries at most d*w (i, p) partial counts per map partition -- a few
    KiB -- no matter how large the vocabulary is, where an exact
    ``groupBy(token)`` shuffles the whole distinct vocabulary.  Counts
    are integer-exact and the hash is engine-neutral, so a SQL oracle
    rebuilds the identical sketch (see :func:`cms_oracle_sql`).
    """
    base = _cms_base(F.col(col))
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(
                    F.pmod(base * F.lit(a) + F.lit(b), F.lit(_P)), F.lit(w)
                ).alias("p"),
            )
            for i, (a, b) in enumerate(cms_params(d))
        ]
    )
    return (
        items.filter(F.col(col).isNotNull())
        .select(F.explode(rows).alias("r"))
        .select("r.i", "r.p")
        .groupBy("i", "p")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, col: str, w: int = 1024, d: int = 4
) -> DataFrame:
    """Point estimates ``n_cms = min_i sketch[i][h_i(key)]`` for each
    candidate row; never underestimates the true count.  The sketch is
    at most d*w rows -- broadcast it, so estimation is shuffle-free on
    the candidate side.  A candidate none of whose d counters exist
    (key never seen AND no colliding keys) drops out of the inner join
    rather than estimating 0; the oracle replays the same semantics."""
    from pyspark.sql.functions import broadcast

    base = _cms_base(F.col(col))
    pos = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.pmod(
                        F.pmod(base * F.lit(a) + F.lit(b), F.lit(_P)), F.lit(w)
                    ).alias("p"),
                )
                for i, (a, b) in enumerate(cms_params(d))
            ]
        )
    ).alias("r")
    expanded = candidates.select("*", pos).select("*", "r.i", "r.p").drop("r")
    others = [c for c in candidates.columns]
    return (
        expanded.join(broadcast(sketch), ["i", "p"])
        .groupBy(*others)
        .agg(F.min("c").alias("n_cms"))
    )


def cms_oracle_sql(
    occurrences_cte: str, col: str, topk: int, w: int = 1024, d: int = 4
) -> str:
    """DuckDB replay of sketch build + top-k estimate.

    ``occurrences_cte`` is a SQL subquery producing one row per
    occurrence with column ``col``.  Returns (token, n_exact, n_cms)
    for the exact top-``topk`` keys (ties broken by key) -- the same
    ground-truth-vs-sketch comparison the Spark query emits."""
    params = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(cms_params(d)))
    return f"""
WITH occ AS ({occurrences_cte}),
params(i, a, b) AS (VALUES {params}),
h AS (
  SELECT {col}, ('0x' || substr(md5({col}), 1, 15))::BIGINT % {_P} AS base
  FROM occ WHERE {col} IS NOT NULL
),
sketch AS (
  SELECT i, ((a * base + b) % {_P}) % {w} AS p, count(*) AS c
  FROM h CROSS JOIN params GROUP BY 1, 2
),
top AS (
  SELECT {col}, count(*) AS n_exact FROM occ WHERE {col} IS NOT NULL
  GROUP BY 1 ORDER BY n_exact DESC, {col} LIMIT {topk}
),
cand AS (
  SELECT t.{col}, t.n_exact, p.i,
         ((p.a * (('0x' || substr(md5(t.{col}), 1, 15))::BIGINT % {_P}) + p.b)
          % {_P}) % {w} AS p
  FROM top t CROSS JOIN params p
)
SELECT c.{col}, c.n_exact, min(s.c) AS n_cms
FROM cand c JOIN sketch s USING (i, p)
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# integer-exact log-bucket quantile sketch (DDSketch-style)
# ---------------------------------------------------------------------------

#: rep/bid arithmetic shared by the Spark plan and the DuckDB oracle.
#: Bucket id for micro-quantized m >= 0: m itself below 8 (exact), else
#: 8*e + top-3-mantissa-bits where e = floor(log2 m) -- computed via
#: length(bin(m)), pure integer ops, no libm (whose last-ulp log()
#: differences could flip a bucket boundary between engines).
#: Portability note: shifts are spelled as multiplication/division by
#: power(2, k) -- exact doubles for k < 53 and valid syntax in BOTH
#: Spark SQL and DuckDB (<< / >> and DIV are not portable between
#: them).  Exact for micros below 2^53; beyond that (values over ~9e9
#: in micro units) switch to the engine-native shift operators.
QSKETCH_BID_SQL = (
    "CASE WHEN {m} < 8 THEN {m} "
    "ELSE 8 * (length(bin({m})) - 1) "
    "+ CAST(floor({m} / power(2, length(bin({m})) - 4)) AS BIGINT) - 8 END"
)

#: representative value (bucket midpoint) from a bucket id; e = bid/8,
#: t = bid%8, low = (8+t)*2^(e-3), midpoint adds 2^(e-4) when e > 3
QSKETCH_REP_SQL = (
    "CASE WHEN {b} < 8 THEN CAST({b} AS BIGINT) "
    "ELSE CAST((8 + {b} % 8) * power(2, CAST(floor({b} / 8) AS BIGINT) - 3) "
    "+ CASE WHEN CAST(floor({b} / 8) AS BIGINT) > 3 "
    "THEN power(2, CAST(floor({b} / 8) AS BIGINT) - 4) ELSE 0 END AS BIGINT) END"
)


def quantile_sketch(df: DataFrame, col: str) -> DataFrame:
    """Mergeable log-bucket quantile sketch over a non-negative value
    column: (bid, n) bucket counts.

    DDSketch's idea (log-width buckets -> bounded *relative* error)
    made integer-exact: the bucket key is the binary exponent plus the
    top 3 mantissa bits of the micro-quantized value, so relative error
    is <= 1/16 per bucket and every step is integer arithmetic -- no
    ``log()`` whose last-ulp differences could flip a boundary between
    engines or CPU types.  The sketch is ONE narrow pass + a bucket-key
    shuffle whose cardinality is ~8*64 regardless of data volume, and
    two sketches merge by adding counts -- the property that makes
    quantiles cheap at 100 TB where exact per-group sorting is not."""
    m = F.floor(F.col(col).cast("double") * 1000000 + F.lit(0.5)).cast("bigint")
    return (
        df.select(m.alias("m"))
        .filter(F.col("m") >= 0)
        .selectExpr(QSKETCH_BID_SQL.format(m="m") + " AS bid")
        .groupBy("bid")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantile_sketch_estimate(
    sketch: DataFrame, quantiles: dict[str, float]
) -> DataFrame:
    """(label, est_micros, n_total) per requested quantile: the first
    bucket whose cumulative count reaches ceil(q * total), reported at
    the bucket midpoint.  The target rank is computed in exact integer
    arithmetic from per-myriad quantiles -- ceil(0.9 * 1000) in IEEE
    doubles is 901, not 900, because 0.9*1000 rounds up a hair; the
    integer form (q10k * total + 9999) div 10000 cannot drift.  The
    bucket table is a few hundred rows, so the single-partition
    cumulative window is free."""
    from pyspark.sql import Window

    spark = sketch.sparkSession
    w = Window.orderBy("bid").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    c = sketch.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(wall)
    )
    # .limit() is a semantic no-op (the frame IS len(quantiles) rows)
    # that makes the bound structural -- the cross join's broadcast
    # build side carries a GlobalLimit node plan auditors can see
    qdf = spark.createDataFrame(
        sorted((k, int(round(v * 10000))) for k, v in quantiles.items()),
        "label string, q10k long",
    ).limit(len(quantiles))
    rank = F.expr("CAST((q10k * total + 9999) div 10000 AS BIGINT)")
    hits = (
        c.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= rank)
        .groupBy("label")
        .agg(F.min("bid").alias("bid"), F.max("total").alias("n_total"))
    )
    return hits.selectExpr(
        "label",
        QSKETCH_REP_SQL.format(b="bid") + " AS est_micros",
        "n_total",
    )


def quantile_sketch_grouped(
    df: DataFrame, col: str, group_cols: tuple = ()
) -> DataFrame:
    """Per-group mergeable log-bucket quantile sketch: (group...,
    bid, n).  Identical bucket math to :func:`quantile_sketch`; the
    group key simply rides the bucket shuffle, so a day/tenant summary
    table of quantile sketches costs one partial-aggregated pass, and
    any coarser grain re-derives by ADDING bucket counts (the merge
    property HLL rollups get from max-per-bucket, here from plus)."""
    m = F.floor(F.col(col).cast("double") * 1000000 + F.lit(0.5)).cast("bigint")
    return (
        df.select(*group_cols, m.alias("m"))
        .filter(F.col("m") >= 0)
        .selectExpr(*group_cols, QSKETCH_BID_SQL.format(m="m") + " AS bid")
        .groupBy(*group_cols, "bid")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantile_sketch_estimate_grouped(
    sketch: DataFrame, quantiles: dict[str, float], group_cols: tuple = ()
) -> DataFrame:
    """Per-group quantile estimates from a grouped sketch: (group...,
    label, est_micros, n_total).  Same exact-integer target rank as
    :func:`quantile_sketch_estimate`; the cumulative window partitions
    on the group key, so every partition is a few hundred bucket rows
    no matter how large its group's data was."""
    from pyspark.sql import Window

    spark = sketch.sparkSession
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*group_cols)
    c = sketch.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(wall)
    )
    # .limit() is a semantic no-op (the frame IS len(quantiles) rows)
    # that makes the bound structural -- the cross join's broadcast
    # build side carries a GlobalLimit node plan auditors can see
    qdf = spark.createDataFrame(
        sorted((k, int(round(v * 10000))) for k, v in quantiles.items()),
        "label string, q10k long",
    ).limit(len(quantiles))
    rank = F.expr("CAST((q10k * total + 9999) div 10000 AS BIGINT)")
    hits = (
        c.crossJoin(F.broadcast(qdf))
        .filter(F.col("cum") >= rank)
        .groupBy(*group_cols, "label")
        .agg(F.min("bid").alias("bid"), F.max("total").alias("n_total"))
    )
    return hits.selectExpr(
        *group_cols,
        "label",
        QSKETCH_REP_SQL.format(b="bid") + " AS est_micros",
        "n_total",
    )


def cms_inner_product(
    left: DataFrame,
    right: DataFrame,
    col: str,
    w: int = 1024,
    d: int = 4,
) -> DataFrame:
    """Join-size estimation by sketch inner product (the AMS/CMS
    estimator, Alon-Matias-Szegedy / Cormode-Muthukrishnan): the
    equi-join cardinality ``|L JOIN R ON col| = sum_k fL(k) * fR(k)``
    is estimated as ``min_i sum_p cmsL[i][p] * cmsR[i][p]`` -- never an
    underestimate, within ``eps * |L| * |R|`` with the standard CMS
    guarantees.  Returns one row ``(n_est, n_exact, err_micro)`` with
    the exact size computed alongside for calibration (drop the exact
    branch in production -- estimating join sizes WITHOUT running the
    join is the point: it is what a cost-based optimizer consults
    before picking broadcast vs shuffle strategies).

    Scale shape: each side's sketch is one d*w-bounded partial-agg
    pass (the exchange carries counters, never keys); the inner
    product is a d*w-row join of two broadcast-sized tables.  The
    exact branch is one key-shuffle count-aggregate pair join --
    vocabulary-sized, not data-sized.
    """
    skl = cms_build(left, col, w=w, d=d)
    skr = cms_build(right, col, w=w, d=d)
    est = (
        skl.withColumnRenamed("c", "cl")
        .join(skr.withColumnRenamed("c", "cr"), ["i", "p"])
        .groupBy("i")
        .agg(F.sum(F.col("cl") * F.col("cr")).alias("ip"))
        .agg(F.min("ip").cast("bigint").alias("n_est"))
    )
    lf = left.filter(F.col(col).isNotNull()).groupBy(col).agg(
        F.count("*").alias("nl")
    )
    rf = right.filter(F.col(col).isNotNull()).groupBy(col).agg(
        F.count("*").alias("nr")
    )
    exact = lf.join(rf, col).agg(
        F.coalesce(F.sum(F.col("nl") * F.col("nr")), F.lit(0))
        .cast("bigint")
        .alias("n_exact")
    )
    return (
        est.crossJoin(exact)  # two 1-row frames
        .select(
            "n_est",
            "n_exact",
            F.expr(
                "CAST(CASE WHEN n_exact = 0 THEN 0 ELSE"
                " (n_est - n_exact) * 1000000 div n_exact END AS BIGINT)"
            ).alias("err_micro"),
        )
    )


def cms_inner_product_oracle_sql(
    left_cte: str, right_cte: str, col: str, w: int = 1024, d: int = 4
) -> str:
    """DuckDB replay of :func:`cms_inner_product`: rebuild both
    sketches with the shared Carter-Wegman rows, min-over-rows inner
    product, exact join size alongside."""
    params = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(cms_params(d)))
    return f"""
WITH params(i, a, b) AS (VALUES {params}),
lo AS ({left_cte}),
ro AS ({right_cte}),
lh AS (
  SELECT ('0x' || substr(md5({col}), 1, 15))::BIGINT % {_P} AS base
  FROM lo WHERE {col} IS NOT NULL),
rh AS (
  SELECT ('0x' || substr(md5({col}), 1, 15))::BIGINT % {_P} AS base
  FROM ro WHERE {col} IS NOT NULL),
ls AS (
  SELECT i, ((a * base + b) % {_P}) % {w} AS p, CAST(count(*) AS BIGINT) AS c
  FROM lh CROSS JOIN params GROUP BY 1, 2),
rs AS (
  SELECT i, ((a * base + b) % {_P}) % {w} AS p, CAST(count(*) AS BIGINT) AS c
  FROM rh CROSS JOIN params GROUP BY 1, 2),
ip AS (
  SELECT ls.i, sum(ls.c * rs.c) AS ip
  FROM ls JOIN rs USING (i, p) GROUP BY ls.i),
est AS (SELECT CAST(min(ip) AS BIGINT) AS n_est FROM ip),
lf AS (SELECT {col}, count(*) AS nl FROM lo WHERE {col} IS NOT NULL GROUP BY 1),
rf AS (SELECT {col}, count(*) AS nr FROM ro WHERE {col} IS NOT NULL GROUP BY 1),
ex AS (
  SELECT CAST(COALESCE(sum(lf.nl * rf.nr), 0) AS BIGINT) AS n_exact
  FROM lf JOIN rf USING ({col}))
SELECT n_est, n_exact,
       CAST(CASE WHEN n_exact = 0 THEN 0
            ELSE (n_est - n_exact) * 1000000 // n_exact END AS BIGINT)
         AS err_micro
FROM est, ex"""
