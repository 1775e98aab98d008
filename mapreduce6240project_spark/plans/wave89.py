"""Round-3 coverage wave 89: agreement statistic, revenue waterfall,
feature standardization.

- ``lang_id_kappa``: Cohen's kappa between the labeled ``lang`` and
  the marker-argmax LID prediction -- chance-corrected agreement, the
  scalar that tells you whether ``lang_id_accuracy``'s number beats
  the class-prior baseline (accuracy alone flatters skewed corpora).
  Built from the SAME confusion counts as ``lang_confusion_matrix``
  (the oracle reuses the verified scoring SQL), then pure integer
  arithmetic: kappa = (n*sum(diag) - sum(row_k*col_k)) /
  (n^2 - sum(row_k*col_k)) in exact micro units.
- ``revenue_waterfall_monthly``: the gross -> -discount -> +tax -> net
  monthly decomposition (the finance waterfall behind every revenue
  chart; ``pricing_summary`` aggregates the same terms per flag, this
  is the time-series form).  One rounding per row per term (exact
  cents), one month-grain shuffle.
- ``embedding_standardize``: per-dimension z-scoring of the embedding
  matrix -- the standardization step before PCA/whitening/linear
  probes (``embedding_covariance`` measures the raw second moments;
  this APPLIES the normalization).  Sufficient stats per dim in
  DECIMAL(38), std quantized once to micro units in double sqrt
  (identical expression both engines), then the z-value for every
  (vector, dim) cell in exact milli units via integer-widened
  division; constant dims emit z = 0.  Map-side explode + a 64-row
  broadcast join -- no global sort.

Scale: kappa and the waterfall reduce to label-pair / month grids;
standardization broadcasts 64 per-dim stats against a map-only
explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


def _kappa_sql() -> str:
    from mapreduce6240project_spark.plans.wave46 import _confusion_sql

    return f"""
WITH conf AS ({_confusion_sql()}),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END)
              AS BIGINT) AS diag
  FROM conf
),
marg AS (
  SELECT CAST(sum(r.rn * c.cn) AS BIGINT) AS pe_num
  FROM (SELECT true_lang AS k, sum(n) AS rn FROM conf GROUP BY 1) r
  JOIN (SELECT pred_lang AS k, sum(n) AS cn FROM conf GROUP BY 1) c
    ON r.k = c.k
)
SELECT t.n AS n_docs,
       CAST(t.diag * 10000 // t.n AS BIGINT) AS accuracy_pm,
       CAST((t.n * t.diag - m.pe_num) * 1000000
            // (t.n * t.n - m.pe_num) AS BIGINT) AS kappa_micro
FROM tot t, marg m"""


@_register(
    "lang_id_kappa",
    _kappa_sql(),
    ref="extension: Cohen's kappa of the marker-argmax LID vs labels "
    "-- chance-corrected agreement from the lang_confusion_matrix "
    "counts, exact integer arithmetic",
)
def q_lang_id_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.textstats import lang_id

    docs = load_table(spark, sf_dir, "documents")
    pred = lang_id(docs)
    conf = (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = conf.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum(F.when(F.col("true_lang") == F.col("pred_lang"), F.col("n")))
        .cast("bigint")
        .alias("diag"),
    ).select("n", F.coalesce("diag", F.lit(0)).alias("diag"))
    r = conf.groupBy(F.col("true_lang").alias("k")).agg(
        F.sum("n").alias("rn")
    )
    c = conf.groupBy(F.col("pred_lang").alias("k")).agg(
        F.sum("n").alias("cn")
    )
    marg = (
        r.join(c, "k")
        .agg(F.sum(F.col("rn") * F.col("cn")).cast("bigint").alias("pe_num"))
    )
    return tot.crossJoin(F.broadcast(marg)).select(
        F.col("n").alias("n_docs"),
        F.expr("diag * 10000 div n").cast("bigint").alias("accuracy_pm"),
        F.expr("(n * diag - pe_num) * 1000000 div (n * n - pe_num)")
        .cast("bigint")
        .alias("kappa_micro"),
    )


@_register(
    "revenue_waterfall_monthly",
    """
SELECT CAST(year(CAST(l_shipdate AS DATE)) * 12
            + month(CAST(l_shipdate AS DATE)) AS BIGINT) AS mon,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS gross_c,
       CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS discount_c,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * l_tax
                           * 100 + 0.5) AS BIGINT)) AS BIGINT) AS tax_c,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            - sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                       AS BIGINT))
            + sum(CAST(floor(l_extendedprice * (1 - l_discount) * l_tax
                             * 100 + 0.5) AS BIGINT)) AS BIGINT) AS net_c
FROM lineitem GROUP BY 1""",
    ref="extension: monthly gross -> -discount -> +tax -> net revenue "
    "waterfall in exact cents (one rounding per row per term); "
    "time-series form of pricing_summary",
)
def q_revenue_waterfall_monthly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
    d = F.expr(
        "CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)"
    )
    t = F.expr(
        "CAST(floor(l_extendedprice * (1 - l_discount) * l_tax * 100"
        " + 0.5) AS BIGINT)"
    )
    mon = (
        F.year(F.col("l_shipdate").cast("date")) * 12
        + F.month(F.col("l_shipdate").cast("date"))
    ).cast("bigint")
    agg = li.select(
        mon.alias("mon"), g.alias("g"), d.alias("d"), t.alias("t")
    ).groupBy("mon").agg(
        F.sum("g").cast("bigint").alias("gross_c"),
        F.sum("d").cast("bigint").alias("discount_c"),
        F.sum("t").cast("bigint").alias("tax_c"),
    )
    return agg.select(
        "mon",
        "gross_c",
        "discount_c",
        "tax_c",
        (F.col("gross_c") - F.col("discount_c") + F.col("tax_c"))
        .cast("bigint")
        .alias("net_c"),
    )


@_register(
    "embedding_standardize",
    """
WITH q AS (
  SELECT e.vec_id, CAST(t.i AS INT) - 1 AS pos,
         CAST(floor(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE)
                    * 1000000) AS BIGINT) AS qx
  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
), s AS (
  SELECT pos, CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(qx) AS DECIMAL(38,0)) AS sx,
         sum(CAST(qx AS HUGEINT) * qx) AS sxx
  FROM q GROUP BY pos
), st AS (
  SELECT pos, n, sx,
         CAST(floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / n)
              AS BIGINT) AS std_micro
  FROM s
)
SELECT q.vec_id, CAST(q.pos AS BIGINT) AS pos,
       CAST(CASE WHEN st.std_micro = 0 THEN 0
                 ELSE CAST((q.qx * st.n - st.sx) * 1000 AS HUGEINT)
                      // CAST(st.std_micro * st.n AS HUGEINT) END
            AS BIGINT) AS z_milli
FROM q JOIN st ON q.pos = st.pos""",
    ref="extension: per-dimension z-scoring of embeddings -- "
    "DECIMAL(38) sufficient stats, one micro-quantized std per dim, "
    "exact milli z-values via widened integer division; applies what "
    "embedding_covariance measures",
)
def q_embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        "pos",
        F.expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)").alias(
            "qx"
        ),
    )
    s = q.groupBy("pos").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("qx").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            F.col("qx").cast("decimal(38,0)")
            * F.col("qx").cast("decimal(38,0)")
        ).alias("sxx"),
    )
    st = s.select(
        "pos",
        "n",
        "sx",
        F.expr(
            "CAST(floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / n)"
            " AS BIGINT)"
        ).alias("std_micro"),
    )
    return q.join(F.broadcast(st), "pos").select(
        "vec_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.expr(
            "CAST(CASE WHEN std_micro = 0 THEN 0"
            " ELSE CAST((qx * n - sx) * 1000 AS DECIMAL(38,0))"
            " div CAST(std_micro * n AS DECIMAL(38,0)) END AS BIGINT)"
        ).alias("z_milli"),
    )
