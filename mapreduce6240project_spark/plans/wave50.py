"""Round-3 coverage wave 50: byte-level tokenizer planning and
hard-negative mining.

- ``byte_char_density``: UTF-8 bytes per character per language --
  the planning metric for byte-level tokenizers (a byte-BPE pays ~3x
  sequence length on CJK text; this measures exactly that multiplier
  per language).  Integer fixed point over octet_length/length.
- ``hard_negatives_cells``: contrastive hard-negative mining -- pairs
  of vectors that share an IVF cell (geometrically close) but carry
  different labels, counted per label pair.  Same-cell different-label
  pairs are THE hard negatives for metric learning; the IVF bucketing
  keeps candidate generation O(N^1.5) instead of all-pairs, identical
  scale shape to ``embedding_dup_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.extensions import _ivf_cells_sql
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table


@_register(
    "byte_char_density",
    """
SELECT lang,
       CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(sum(strlen(text)) * 1000000 // sum(length(text)) AS BIGINT)
         AS density_micro
FROM documents
GROUP BY lang""",
    ref="extension: UTF-8 bytes-per-character by language -- the "
    "byte-level-tokenizer sequence-length multiplier; one narrow pass",
)
def q_byte_char_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(F.octet_length("text")).cast("bigint").alias("n_bytes"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.expr("sum(octet_length(text)) * 1000000 div sum(length(text))")
        .cast("bigint")
        .alias("density_micro"),
    )


@_register(
    "hard_negatives_cells",
    _ivf_cells_sql()
    + """
, lab AS (SELECT vec_id, label FROM embeddings)
SELECT la.label AS label_a, lb.label AS label_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id
JOIN lab la ON la.vec_id = a.vec_id
JOIN lab lb ON lb.vec_id = b.vec_id
WHERE la.label <> lb.label
GROUP BY 1, 2""",
    ref="extension: contrastive hard-negative mining -- same-IVF-cell "
    "different-label pairs per label pair; O(N^1.5) bucketed candidate "
    "generation, never all-pairs",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.similarity import ivf_assign

    emb = load_table(spark, sf_dir, "embeddings")
    cells = ivf_assign(emb).select("vec_id", "cell")
    lab = emb.select("vec_id", "label")
    a = cells.alias("a")
    b = cells.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
    )
    return (
        pairs.join(lab.withColumnRenamed("vec_id", "id_a").withColumnRenamed(
            "label", "label_a"), "id_a")
        .join(lab.withColumnRenamed("vec_id", "id_b").withColumnRenamed(
            "label", "label_b"), "id_b")
        .filter(F.col("label_a") != F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
