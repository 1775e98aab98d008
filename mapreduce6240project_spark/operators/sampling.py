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
    ``(id * MULT + INC) mod 2^31``."""
    return (F.col(col) * F.lit(_MULT) + F.lit(_INC)) % F.lit(_MOD)


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
