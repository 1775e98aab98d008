"""Sampling operators (SURVEY.md section 2.6 R1-R3).

The reference's seed sampler (random.java) funnels every candidate id to
one reducer and draws k distinct ids with ``Random`` -- plus a biased
early-``return`` Bernoulli pre-filter (SURVEY.md section 2.9.4).  The
engine provides:

* ``bernoulli_sample`` -- unbiased ``df.sample`` (documented deviation
  from the reference's prefix-biased early-return).
* ``sample_k_seeds`` -- deterministic distinct k-draw: order by a
  multiplicative-hash of the key and take k.  The hash is plain integer
  arithmetic so the *same* draw is expressible in ANSI SQL for the
  DuckDB oracle, unlike ``F.rand(seed)`` whose generator is
  Spark-internal.  Scale: ``orderBy().limit(k)`` compiles to
  TakeOrderedAndProject -- a per-partition top-k + k-row driver merge,
  no global sort, no single-reducer funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# LCG-style multiplicative hash constants (public-domain, e.g. glibc's
# rand coefficients); any odd multiplier works -- choice is arbitrary but
# must match plans.registry's oracle SQL.
_MULT = 1103515245
_INC = 12345
_MOD = 2147483648


def seed_hash(col: str = "tweet_id") -> F.Column:
    """Deterministic pseudo-random ordering key, pure integer arithmetic:
    ``((id mod 2^31) * MULT + INC) mod 2^31``.

    The inner ``mod 2^31`` bounds the product below 2^62 so the
    expression never overflows a bigint under ANSI mode -- keys at
    100 TB scale exceed 2^33, where the unreduced form would throw.
    Values are unchanged for keys < 2^31 (the reduction is a no-op)."""
    return ((F.col(col) % F.lit(_MOD)) * F.lit(_MULT) + F.lit(_INC)) % F.lit(_MOD)


def sample_k_seeds(features: DataFrame, k: int, key: str = "tweet_id") -> DataFrame:
    """R2/R3: distinct deterministic k-draw of seed ids."""
    return (
        features.select(key)
        .distinct()
        .orderBy(seed_hash(key), F.col(key))
        .limit(k)
    )


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """R1: unbiased Bernoulli row sample (reference: random.java:60-68,
    whose early-return made the kept set a biased prefix -- not
    replicated)."""
    return df.sample(fraction=fraction, seed=seed)


def hash_sample(df: DataFrame, fraction: float, key: str = "tweet_id") -> DataFrame:
    """Consistent (hash-based) Bernoulli sample: keep rows whose LCG hash
    of ``key`` falls below ``fraction * 2^31``.

    Unlike ``rand()``-based sampling the draw is a pure function of the
    key: the same row is in or out regardless of run, partitioning, or
    engine -- the property train/eval splits and incremental pipelines
    need (a re-run over an appended corpus keeps every prior decision).
    Plan: a single deterministic comparison filter, fully pushable and
    narrow -- no shuffle, no RNG state per partition."""
    return df.filter(seed_hash(key) < F.lit(int(fraction * _MOD)))


def stratified_hash_sample(
    df: DataFrame, fractions: dict[str, float], strata_col: str, key: str = "tweet_id"
) -> DataFrame:
    """Per-stratum consistent sample: each stratum keeps its own
    fraction, decided by the same keyed LCG hash as :func:`hash_sample`
    (so a row's fate is stable even if its stratum's fraction changes
    for *other* strata).  Strata absent from ``fractions`` are dropped.
    Equivalent to ``df.sampleBy`` but deterministic per key and
    oracle-expressible; still one narrow filter, no shuffle."""
    thr = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        lit = F.lit(int(frac * _MOD))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = thr.otherwise(F.lit(0))
    return df.filter(seed_hash(key) < thr)


def mixture_resample(
    df: DataFrame,
    targets: dict[str, float],
    strata_col: str = "lang",
    key: str = "doc_id",
) -> DataFrame:
    """Corpus mixing: downsample strata so the output matches the target
    mixture ``{stratum: share}`` (shares summing to 1), keeping the
    largest total achievable without upsampling any stratum.

    Two passes: a stratum-count aggregate (tiny -- one row per stratum,
    collected to the driver), then one consistent keyed-hash filter with
    per-stratum literal thresholds.  The decision is a pure function of
    (key, targets, stratum counts): re-runs and engines agree, and the
    oracle recomputes the same thresholds in SQL with the same IEEE
    double operation order (share * total / n, truncated to a 2^31
    threshold).  Strata absent from ``targets`` are dropped; targets
    absent from the data are ignored."""
    counts = {
        r[strata_col]: r.n
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
    }
    present = {s: share for s, share in targets.items() if s in counts and share > 0}
    if not present:
        return df.filter(F.lit(False))
    total = min(counts[s] / share for s, share in present.items())
    fractions = {
        s: min(1.0, share * total / counts[s]) for s, share in present.items()
    }
    return stratified_hash_sample(df, fractions, strata_col, key)


def weighted_priority_sample(
    df: DataFrame, k: int, weight_col: str, key: str
) -> DataFrame:
    """Weighted sample without replacement: draw ``k`` rows with
    inclusion probability proportional to ``weight_col`` (Efraimidis &
    Spirakis A-ES priority sampling, a published algorithm): each row
    gets priority ``u^(1/w)`` with ``u`` uniform in (0,1), and the k
    highest priorities win.

    ``u`` comes from the keyed LCG hash (``(h+1) / (2^31+1)``), so the
    draw is a pure function of the key -- re-run-stable, append-stable
    (new rows compete on their own priority without reshuffling prior
    winners), and expressible in ANSI SQL for the oracle.  Rows with
    non-positive weight are excluded (their inclusion probability is 0).

    Scale: one narrow projection + ``orderBy().limit(k)`` =
    TakeOrderedAndProject -- per-partition top-k then a k-row driver
    merge; no global sort, no shuffle of the data.  Ties (impossible for
    distinct keys, since u is injective below 2^31) break on the key."""
    u = (seed_hash(key) + 1) / F.lit(float(_MOD + 1))
    priority = F.pow(u, 1.0 / F.col(weight_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_priority", priority)
        .orderBy(F.col("_priority").desc(), F.col(key))
        .limit(k)
        .drop("_priority")
    )


def weighted_priority_sample_per_group(
    df: DataFrame, k: int, weight_col: str, key: str, group_col: str
) -> DataFrame:
    """Per-group weighted sample without replacement: within every
    ``group_col`` value, the ``k`` rows with the highest A-ES priorities
    (``u^(1/w)``, same keyed-LCG ``u`` as
    :func:`weighted_priority_sample`) win.

    Plan: one hash shuffle on the group key, then Spark's
    WindowGroupLimit pushes the ``rank <= k`` bound below the window
    sort -- each task keeps a k-row heap per group instead of fully
    sorting its partition, so per-group cost is O(n log k).  Skewed
    groups parallelize across the window's spill; there is no driver
    funnel at any k."""
    from pyspark.sql import Window

    u = (seed_hash(key) + 1) / F.lit(float(_MOD + 1))
    w = Window.partitionBy(group_col).orderBy(
        F.pow(u, 1.0 / F.col(weight_col)).desc(), F.col(key)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def temperature_resample(
    df: DataFrame,
    alpha: float = 0.5,
    strata_col: str = "lang",
    key: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened corpus mixing: target shares proportional
    to ``count^alpha`` (alpha < 1 upweights small strata relative to
    their natural frequency -- the standard multilingual / multi-source
    rebalancing used when assembling training mixtures), then the same
    no-upsampling downsample as :func:`mixture_resample`.

    For cross-engine exactness the ``n^alpha`` weights are quantized to
    6-decimal fixed point (``floor(n^alpha * 1e6 + 0.5)``) before
    normalizing: the share denominator is then an exact integer sum
    (associative), so the oracle recomputes identical IEEE doubles for
    every threshold.  ``alpha=0.5`` uses ``sqrt`` explicitly (correctly
    rounded in every IEEE engine, unlike general ``pow``).

    Same scale shape as mixture_resample: one tiny per-stratum count
    aggregate to the driver, then a single narrow keyed-hash filter."""
    import math

    counts = {
        r[strata_col]: r.n
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
        if r[strata_col] is not None
    }
    if not counts:
        return df.filter(F.lit(False))
    q = {
        s: math.floor(
            (math.sqrt(n) if alpha == 0.5 else n**alpha) * 1_000_000 + 0.5
        )
        for s, n in counts.items()
    }
    sumq = sum(q.values())
    targets = {s: qs / sumq for s, qs in q.items()}
    return mixture_resample(df, targets, strata_col=strata_col, key=key)


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    strata_col: str = "lang",
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Budgeted corpus selection: within every stratum, admit documents
    in a deterministic shuffled order until the stratum's cumulative
    token count reaches ``budget_tokens``.  Returns
    ``(strata_col, key, n_tok, cum_tok)`` for the admitted documents.

    This is how training mixtures are actually specified -- "200 B
    tokens of web, 30 B of code" -- a *token* budget, not a row budget
    (documents vary by orders of magnitude in length, so row sampling
    over/under-shoots the mixture).  The admission order is the keyed
    60-bit md5 hash (re-run-stable, append-stable: new docs land at
    hash-determined positions without displacing decisions the budget
    already admitted ahead of them).  A document is admitted when the
    running total *before* it is still under budget, so the budget is
    always reached-or-exceeded by a bounded overshoot (< one max
    document), never undershot while eligible docs remain.

    Scale shape: one hash shuffle on the stratum + a running-sum window
    -- the window needs only a single running accumulator per stratum
    (rows-unbounded-preceding frames stream in sort order; no buffering
    of the frame).  Per-stratum sorted order at 100 TB is a range
    partition within the stratum; the cumulative sum then needs a
    two-pass prefix (per-partition totals, then offset broadcast) --
    exactly what Spark's window exchange already plans.
    """
    from pyspark.sql import Window

    from mapreduce6240project_spark.functions.hashing import hash60
    from mapreduce6240project_spark.operators.dedup import tokens

    with_tok = docs.select(
        F.col(strata_col),
        F.col(key),
        F.size(tokens(text_col)).cast("bigint").alias("n_tok"),
        hash60(F.col(key).cast("string")).alias("_pri"),
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy("_pri", key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_tok.withColumn("cum_tok", F.sum("n_tok").over(w))
        .filter(F.col("cum_tok") - F.col("n_tok") < budget_tokens)
        .select(strata_col, key, "n_tok", "cum_tok")
    )
