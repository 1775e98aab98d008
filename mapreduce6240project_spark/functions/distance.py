"""The clustering distance kernel.

Reference semantics (defined identically at Cluster.java:32-43,
Cluster2.java:30-41, Cluster4.java:30-41, Cluster5.java:30-41,
distanceCal.java:28-39; unweighted variant kmeansCluster.java:85-93):

    d(a, b) = sqrt( (a.time_bucket - b.time_bucket)^2
                  + (w * (a.num_hashtags - b.num_hashtags))^2
                  + (a.language != b.language ? 1 : 0)
                  + (a.has_video - b.has_video)^2 )

with w = 0.8 (weighted) or w = 1.0 (unweighted).  reply/retweet/like
counts are stored but never enter the distance (SURVEY.md section 2.3).

Implemented as a pure Column expression: per-row evaluation stays inside
whole-stage codegen, so assigning N rows against k medoids is k extra
projected columns over one scan -- no join, no shuffle, no UDF.  That is
the 100 TB-scale replacement for the reference's N x k HBase point Gets
(Cluster.java:95-107).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

#: feature columns that participate in the distance
DISTANCE_FEATURES = ("time_bucket", "num_hashtags", "language", "has_video")

HASHTAG_WEIGHT = 0.8


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def feature_distance(
    a_prefix: str = "",
    b_prefix: str = "b_",
    weighted: bool = True,
) -> Column:
    """Distance between two feature rows present side-by-side in one row
    (e.g. after a join), with column names ``{prefix}time_bucket`` etc.
    """
    w = HASHTAG_WEIGHT if weighted else 1.0

    def col(prefix: str, name: str) -> Column:
        return F.col(prefix + name)

    return F.sqrt(
        F.pow(col(a_prefix, "time_bucket") - col(b_prefix, "time_bucket"), 2)
        + F.pow((col(a_prefix, "num_hashtags") - col(b_prefix, "num_hashtags")) * w, 2)
        + F.when(col(a_prefix, "language") != col(b_prefix, "language"), 1.0).otherwise(0.0)
        + F.pow(col(a_prefix, "has_video") - col(b_prefix, "has_video"), 2)
    )


def medoid_distance_literal(medoid: Mapping[str, object], weighted: bool = True) -> Column:
    """Distance from the current row's features to a *constant* medoid.

    The medoid is a plain Python mapping collected on the driver (k <= 5
    rows), folded into the expression as literals -- Catalyst
    constant-folds them, so the assignment step is a narrow projection.

    Built as ONE ``F.expr`` SQL string (r10 optimization): the former
    operator-by-operator Column construction paid ~15 py4j round-trips
    per medoid, which dominated the *driver-side* cost of the k-medoids
    and elbow plans (hundreds of milliseconds per query at k=2..5).
    The string parses to the identical expression tree -- double
    literals carry the ``D`` suffix (a bare ``0.8`` would parse as
    DECIMAL and change the arithmetic), the ``CASE`` mirrors
    ``when/otherwise`` (a NULL language falls through to 0.0 on both),
    and the addition order is unchanged, so every IEEE intermediate is
    bit-identical.  Non-representable medoid values (quotes, non-int
    features) fall back to the Column builder.
    """
    w = HASHTAG_WEIGHT if weighted else 1.0
    tb, nh, hv = (medoid["time_bucket"], medoid["num_hashtags"], medoid["has_video"])
    lang = medoid["language"]
    simple = (
        all(isinstance(v, int) and not isinstance(v, bool) for v in (tb, nh, hv))
        and (lang is None or (isinstance(lang, str) and "'" not in lang and "\\" not in lang))
    )
    if simple:
        lang_sql = "CAST(NULL AS STRING)" if lang is None else f"'{lang}'"
        return F.expr(
            f"sqrt(power(time_bucket - {tb}, 2)"
            f" + power((num_hashtags - {nh}) * {w!r}D, 2)"
            f" + (CASE WHEN language != {lang_sql} THEN 1.0D ELSE 0.0D END)"
            f" + power(has_video - {hv}, 2))"
        )
    return F.sqrt(
        F.pow(F.col("time_bucket") - F.lit(medoid["time_bucket"]), 2)
        + F.pow((F.col("num_hashtags") - F.lit(medoid["num_hashtags"])) * w, 2)
        + F.when(F.col("language") != F.lit(medoid["language"]), 1.0).otherwise(0.0)
        + F.pow(F.col("has_video") - F.lit(medoid["has_video"]), 2)
    )
