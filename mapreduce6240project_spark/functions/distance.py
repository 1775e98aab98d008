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
    """
    w = HASHTAG_WEIGHT if weighted else 1.0
    return F.sqrt(
        F.pow(F.col("time_bucket") - F.lit(medoid["time_bucket"]), 2)
        + F.pow((F.col("num_hashtags") - F.lit(medoid["num_hashtags"])) * w, 2)
        + F.when(F.col("language") != F.lit(medoid["language"]), 1.0).otherwise(0.0)
        + F.pow(F.col("has_video") - F.lit(medoid["has_video"]), 2)
    )
