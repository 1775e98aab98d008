"""Round-3 coverage wave 40: index-quality curves -- the audits that
turn "approximate" operators into *trusted* operators.

- ``ivf_recall_curve``: recall@10 of the IVF index at n_probe in
  {1, 2, 4} -- the probe-count knob is THE latency/recall dial at
  100 TB, and this query measures the curve the dial moves along.  One
  shared cell assignment; per-probe branches differ only in the probed
  cell set.
- ``qsketch_error_audit``: the mergeable log-bucket quantile sketch's
  estimates vs the exact interpolated quantiles, with the relative
  error in exact integer per-myriad -- verifying the sketch honors its
  <=1/16 relative-error contract before it replaces exact sorting at
  scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators import similarity as S
from mapreduce6240project_spark.operators.sketch import (
    QSKETCH_BID_SQL,
    QSKETCH_REP_SQL,
    quantile_sketch,
    quantile_sketch_estimate,
)
from mapreduce6240project_spark.plans.extensions import _ivf_cells_sql, _query_vec
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_PROBES = (1, 2, 4)

_SIM = (
    "list_dot_product(v.ev, qv) / (sqrt(list_dot_product(v.ev, v.ev)) "
    "* sqrt(list_dot_product(qv, qv)))"
)


def _recall_curve_sql() -> str:
    parts = [
        _ivf_cells_sql(),
        """
, qi AS (SELECT unnest(q) AS x, unnest(generate_series(1, len(q))) AS d
       FROM iv WHERE vec_id = 0),
pd AS (SELECT c.cell, sum((c.cx - t.x) * (c.cx - t.x)) AS dist
       FROM c2 c JOIN qi t ON c.d = t.d GROUP BY 1),
pr AS (SELECT cell, row_number() OVER (ORDER BY dist, cell) AS rn FROM pd),
esims AS (
  SELECT v.vec_id, """
        + _SIM.replace("v.ev", "v.ev")
        + """ AS sim_raw
  FROM vecs v, q
),
exact AS (SELECT vec_id FROM (
  SELECT vec_id, row_number() OVER (ORDER BY sim_raw DESC, vec_id) AS rn
  FROM esims) WHERE rn <= 10)""",
    ]
    for p in _PROBES:
        parts.append(
            f""",
asims{p} AS (
  SELECT a.vec_id, {_SIM} AS sim_raw
  FROM af a JOIN vecs v USING (vec_id), q
  WHERE a.cell IN (SELECT cell FROM pr WHERE rn <= {p})
),
approx{p} AS (SELECT vec_id FROM (
  SELECT vec_id, row_number() OVER (ORDER BY sim_raw DESC, vec_id) AS rn
  FROM asims{p}) WHERE rn <= 10),
r{p} AS (
  SELECT {p} AS n_probe, 10 AS k, CAST(count(*) AS BIGINT) AS hits,
         round(count(*) / 10.0, 4) AS recall
  FROM exact JOIN approx{p} USING (vec_id))"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM r{p}" for p in _PROBES)
    parts.append(f"\n{union} ORDER BY n_probe")
    return "".join(parts)


@_register(
    "ivf_recall_curve",
    _recall_curve_sql(),
    ref="extension: IVF recall@10 vs n_probe curve (1/2/4) -- the "
    "latency/recall dial measured as a first-class query; one shared "
    "cell assignment, per-probe branches prune to the probed cells",
)
def q_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    branches = [
        S.ann_recall(emb, qv, k=10, n_probe=p).select(
            F.lit(p).alias("n_probe"), "k", "hits", "recall"
        )
        for p in _PROBES
    ]
    return reduce(lambda a, b: a.unionByName(b), branches).orderBy("n_probe")


_QLABELS = (("p50", 0.5, 5000), ("p90", 0.9, 9000), ("p99", 0.99, 9900))


def _qsketch_audit_sql() -> str:
    bid = QSKETCH_BID_SQL.format(m="m")
    rep = QSKETCH_REP_SQL.format(b="bid")
    labels = ", ".join(f"'{l}'" for l, _, _ in _QLABELS)
    q10ks = ", ".join(str(t) for _, _, t in _QLABELS)
    exacts = " UNION ALL ".join(
        f"SELECT '{l}' AS label, CAST(floor(round(quantile_cont(value, {q}), 4)"
        f" * 10000 + 0.5) AS BIGINT) AS exact_e4 FROM events"
        for l, q, _ in _QLABELS
    )
    return f"""
WITH mm AS (
  SELECT CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS m FROM events
),
b AS (
  SELECT {bid} AS bid, count(*) AS n FROM mm WHERE m >= 0 GROUP BY 1
),
c AS (
  SELECT bid, n, sum(n) OVER (ORDER BY bid) AS cum, sum(n) OVER () AS total
  FROM b
),
q AS (SELECT unnest([{labels}]) AS label, unnest([{q10ks}]) AS q10k),
sel AS (
  SELECT label, min(bid) AS bid
  FROM c, q WHERE cum >= (q10k * total + 9999) // 10000 GROUP BY label
),
est AS (SELECT label, CAST(({rep}) // 100 AS BIGINT) AS est_e4 FROM sel),
ex AS ({exacts})
SELECT e.label, e.est_e4, x.exact_e4,
       CAST(abs(e.est_e4 - x.exact_e4) * 10000 // x.exact_e4 AS BIGINT)
         AS err_permyriad
FROM est e JOIN ex x USING (label)"""


@_register(
    "qsketch_error_audit",
    _qsketch_audit_sql(),
    ref="extension: quantile-sketch error audit -- sketch estimates vs "
    "exact interpolated quantiles, relative error in integer per-myriad; "
    "validates the <=1/16 relative-error contract",
)
def q_qsketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = quantile_sketch(ev, "value")
    est = quantile_sketch_estimate(
        sk, {l: q for l, q, _ in _QLABELS}
    ).select("label", F.expr("est_micros div 100").cast("long").alias("est_e4"))
    exact = ev.agg(
        *[
            F.expr(
                f"CAST(floor(round(percentile(value, {q}), 4) * 10000 + 0.5)"
                " AS BIGINT)"
            ).alias(l)
            for l, q, _ in _QLABELS
        ]
    )
    n = len(_QLABELS)
    stack_args = ", ".join(f"'{l}', {l}" for l, _, _ in _QLABELS)
    exact_long = exact.selectExpr(
        f"stack({n}, {stack_args}) AS (label, exact_e4)"
    )
    return est.join(F.broadcast(exact_long), "label").select(
        "label",
        "est_e4",
        "exact_e4",
        F.expr("abs(est_e4 - exact_e4) * 10000 div exact_e4")
        .cast("long")
        .alias("err_permyriad"),
    )
