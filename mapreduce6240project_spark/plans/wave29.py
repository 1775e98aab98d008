"""Round-3 coverage wave 29: training-example preparation.

- ``vocab_encode_docs``: tokenizer-style id encoding -- a top-256
  frequency vocabulary (rank = id, deterministic count-then-token
  tie-break) broadcast into one corpus pass that maps every token to
  its id (OOV -> 0) and truncates to the first 64 positions.  Each
  example is summarized as (length, id checksum) so the oracle
  hash-checks the whole encoded sequence without comparing array
  renderings -- same convention as ``feature_hashing``.
- ``mlm_mask_plan``: deterministic BERT/T5-style masking plan -- a
  token position is masked iff ``md5(doc_id, pos) % 100 < 15`` (15%
  rate).  Reports per-doc mask counts and the checksum of masked
  positions, so the plan (not just the rate) is value-verified.  The
  hash-gated decision makes the "random" corruption reproducible
  across engines, runs, and partitionings -- exactly what a training
  pipeline needs for resumable preprocessing.

Reference parity note: LLM-pipeline extension surface; composes with
``pack_chunks_2k`` (packing) and ``training_shards`` (sharding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.functions.hashing import hash60
from mapreduce6240project_spark.plans.extensions import _NORM
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_VOCAB = 256
_MAXLEN = 64
_MASK_PCT = 15


@_register(
    "vocab_encode_docs",
    f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split({_NORM}, ' ')) AS tok,
         generate_subscripts(string_split({_NORM}, ' '), 1) AS pos
  FROM documents
),
vocab AS (
  SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS id
  FROM tok GROUP BY tok
  ORDER BY count(*) DESC, tok LIMIT {_VOCAB}
),
enc AS (
  SELECT tok.doc_id, tok.pos, COALESCE(vocab.id, 0) AS id
  FROM tok LEFT JOIN vocab ON tok.tok = vocab.tok
  WHERE tok.pos <= {_MAXLEN}
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS seq_len,
       CAST(sum(pos * id) AS BIGINT) AS ids_checksum
FROM enc GROUP BY doc_id""",
    ref="extension: vocabulary id-encoding (top-256 rank vocab "
    "broadcast into one corpus pass, OOV=0, truncate 64); encoded "
    "sequence verified via position-weighted integer checksum",
)
def q_vocab_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "tok")
    )
    tok = docs.select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    counts = tok.groupBy("tok").agg(F.count("*").alias("n"))
    vocab = (
        counts.orderBy(F.col("n").desc(), "tok")
        .limit(_VOCAB)
        .select(
            "tok",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "tok"))
            .alias("id"),
        )
    )
    enc = (
        tok.filter(F.col("pos") <= _MAXLEN)
        .join(F.broadcast(vocab), "tok", "left")
        .select("doc_id", "pos", F.coalesce("id", F.lit(0)).alias("id"))
    )
    return enc.groupBy("doc_id").agg(
        F.count("*").alias("seq_len"),
        F.sum(F.col("pos") * F.col("id")).alias("ids_checksum"),
    )


@_register(
    "mlm_mask_plan",
    f"""
WITH pos AS (
  SELECT doc_id,
         generate_subscripts(string_split({_NORM}, ' '), 1) AS p
  FROM documents
),
masked AS (
  SELECT doc_id, p,
         CASE WHEN ('0x' || substr(md5(doc_id || ':' || p), 1, 15))::BIGINT
                   % 100 < {_MASK_PCT}
              THEN 1 ELSE 0 END AS m
  FROM pos
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(m) AS BIGINT) AS n_masked,
       CAST(sum(CASE WHEN m = 1 THEN p ELSE 0 END) AS BIGINT)
         AS masked_pos_checksum
FROM masked GROUP BY doc_id""",
    ref="extension: deterministic MLM masking plan (md5(doc,pos) mod "
    "100 < 15) -- reproducible across engines/partitionings; the plan "
    "itself is verified via the masked-position checksum",
)
def q_mlm_mask_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import tokens

    pos = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("p"))
    h = hash60(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("p").cast("string"),
        )
    )
    m = F.when(h % 100 < _MASK_PCT, 1).otherwise(0)
    masked = pos.select("doc_id", "p", m.alias("m"))
    return masked.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("m").alias("n_masked"),
        F.sum(F.when(F.col("m") == 1, F.col("p")).otherwise(0)).alias(
            "masked_pos_checksum"
        ),
    )
