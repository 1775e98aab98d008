"""Sketch operators: Bloom-filter membership.

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
