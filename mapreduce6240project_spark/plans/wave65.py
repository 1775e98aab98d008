"""Round-3 coverage wave 65: cross-method dedup agreement and
selectivity-estimation audits.

- ``dedup_method_agreement``: do SimHash (Hamming <= 3) and MinHash
  (exact-verified J >= 0.5) agree on which pairs are duplicates?
  Reported as pair-set sizes, the intersection, and the pair-set
  Jaccard in permyriad -- the audit you run before swapping one dedup
  method for a cheaper one.  Both pair sets replay in SQL (md5-variant
  SimHash; MinHash reduces to the exact ground truth).
- ``selectivity_estimate_audit``: cost-model validation -- the
  quantile sketch's estimate of ``value > 75`` selectivity vs the
  actual filtered count, error in permyriad.  With ``join_size_cms``
  this completes the pair of CBO inputs (filter selectivity + join
  cardinality) measured as first-class queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.sketch import QSKETCH_BID_SQL
from mapreduce6240project_spark.plans.extensions import (
    _ngram_jaccard_sql,
    _simhash_md5_sql,
)
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_CUT = 75  # selectivity predicate: value > 75


@_register(
    "dedup_method_agreement",
    f"""
WITH sh AS (
  SELECT id_a, id_b FROM ({_simhash_md5_sql(3)})
),
mh AS (
  SELECT id_a, id_b FROM ({_ngram_jaccard_sql(0.5)})
),
b AS (SELECT count(*) AS n FROM mh),
a AS (SELECT count(*) AS n FROM sh),
i AS (SELECT count(*) AS n FROM sh JOIN mh USING (id_a, id_b))
SELECT CAST(a.n AS BIGINT) AS n_simhash, CAST(b.n AS BIGINT) AS n_minhash,
       CAST(i.n AS BIGINT) AS n_both,
       CAST(i.n * 10000 // (a.n + b.n - i.n) AS BIGINT)
         AS pair_jaccard_permyriad
FROM a, b, i""",
    ref="extension: cross-method dedup agreement (SimHash Hamming<=3 vs "
    "MinHash-verified J>=0.5 pair sets) -- intersection + pair-set "
    "Jaccard; the swap-methods audit",
)
def q_dedup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sh = D.simhash_pairs(docs, max_hamming=3, token_hash="md5").select(
        "id_a", "id_b"
    )
    mh = D.jaccard_verified_pairs(
        docs, D.minhash_candidate_pairs(docs), threshold=0.5
    ).select("id_a", "id_b")
    a = sh.agg(F.count(F.lit(1)).alias("n_simhash"))
    b = mh.agg(F.count(F.lit(1)).alias("n_minhash"))
    i = sh.join(mh, ["id_a", "id_b"]).agg(F.count(F.lit(1)).alias("n_both"))
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(i))
        .select(
            "n_simhash",
            "n_minhash",
            "n_both",
            F.expr("n_both * 10000 div (n_simhash + n_minhash - n_both)")
            .cast("bigint")
            .alias("pair_jaccard_permyriad"),
        )
    )


def _selectivity_sql() -> str:
    bid = QSKETCH_BID_SQL.format(m="m")
    cut_micro = _CUT * 1_000_000
    cut_bid = f"CASE WHEN {cut_micro} < 8 THEN {cut_micro} ELSE 8 * (length(bin({cut_micro})) - 1) + CAST(floor({cut_micro} / power(2, length(bin({cut_micro})) - 4)) AS BIGINT) - 8 END"
    return f"""
WITH mm AS (
  SELECT CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS m FROM events
),
b AS (SELECT {bid} AS bid, count(*) AS n FROM mm WHERE m >= 0 GROUP BY 1),
tot AS (SELECT sum(n) AS total FROM b),
est AS (
  SELECT sum(n) AS n_est FROM b WHERE bid > ({cut_bid})
),
act AS (SELECT count(*) AS n_act FROM events WHERE value > {_CUT})
SELECT CAST(coalesce(est.n_est, 0) AS BIGINT) AS n_estimated,
       CAST(act.n_act AS BIGINT) AS n_actual,
       CAST(abs(coalesce(est.n_est, 0) - act.n_act) * 10000
            // greatest(act.n_act, 1) AS BIGINT) AS err_permyriad
FROM est, act, tot"""


@_register(
    "selectivity_estimate_audit",
    _selectivity_sql(),
    ref="extension: filter-selectivity estimation from the quantile "
    "sketch vs the actual count (err in permyriad) -- the CBO input "
    "pair-completing audit to join_size_cms",
)
def q_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.sketch import quantile_sketch

    ev = load_table(spark, sf_dir, "events")
    sk = quantile_sketch(ev, "value")
    cut_micro = _CUT * 1_000_000
    cut_bid_expr = (
        f"CASE WHEN {cut_micro} < 8 THEN {cut_micro} "
        f"ELSE 8 * (length(bin({cut_micro})) - 1) "
        f"+ CAST(floor({cut_micro} / power(2, length(bin({cut_micro})) - 4)) AS BIGINT) - 8 END"
    )
    est = sk.filter(F.expr(f"bid > ({cut_bid_expr})")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_estimated")
    )
    act = ev.filter(F.col("value") > _CUT).agg(
        F.count(F.lit(1)).alias("n_actual")
    )
    return est.crossJoin(F.broadcast(act)).select(
        "n_estimated",
        "n_actual",
        F.expr(
            "abs(n_estimated - n_actual) * 10000 div greatest(n_actual, 1)"
        )
        .cast("bigint")
        .alias("err_permyriad"),
    )
