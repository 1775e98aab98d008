"""Round-3 coverage wave 37: statistical language modeling over the
corpus -- an add-one-smoothed bigram LM and a trainable character-trigram
language classifier.

- ``bigram_lm_order``: top-10 continuations of the token "order" under
  an add-one bigram model, probabilities in 6-decimal fixed point
  ((c12 + 1) * 1e6 // (c1 + V)) so the model replays bit-for-bit in
  SQL.  The LM tables (continuation counts, context count, vocabulary
  size) are the classic n-gram-LM build re-expressed as one bigram
  stream + two 1-row broadcast aggregates.
- ``lang_id_trigram_acc``: Cavnar-Trenkle character-trigram profiles
  trained on even-doc-id documents (top-20 trigrams per language),
  odd-id documents classified by profile-hit count, accuracy rolled up
  per true language.  The profile is (n_langs x 20) rows -- broadcast;
  no shuffle ever carries document-sized state.

Reference parity note: extension surface (the reference has no text
pipeline); these extend the lang-id / LM-quality family of
``operators/textstats.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce6240project_spark.operators.textstats import (
    bigram_lm_continuations,
    chartrigram_lang_id,
)
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@_register(
    "bigram_lm_order",
    f"""
WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
bg AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i + 1])) AS b
  FROM t WHERE len(w) >= 2
),
sp AS (SELECT string_split(b, ' ')[1] AS w1, string_split(b, ' ')[2] AS w2 FROM bg),
c12 AS (SELECT w2, count(*) AS c12 FROM sp WHERE w1 = 'order' GROUP BY 1),
c1 AS (SELECT sum(c12) AS c1 FROM c12),
v AS (
  SELECT count(DISTINCT tok) AS v FROM (
    SELECT unnest(string_split({_NORM}, ' ')) AS tok
    FROM documents WHERE {_NORM} <> '')
)
SELECT w2 AS next_tok, CAST(c12 AS BIGINT) AS c12,
       CAST((c12 + 1) * 1000000 // (c1 + v) AS BIGINT) AS prob_micro
FROM c12, c1, v
ORDER BY c12 DESC, next_tok LIMIT 10""",
    ref="extension: add-one-smoothed bigram LM continuation query -- "
    "bigram stream + two 1-row broadcast aggregates, probabilities in "
    "truncating fixed point",
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_continuations(
        load_table(spark, sf_dir, "documents"), "order", k=10
    )


@_register(
    "lang_id_trigram_acc",
    f"""
WITH base AS (
  SELECT doc_id, lang, {_NORM} AS nm FROM documents WHERE length({_NORM}) >= 3
),
grams AS (
  SELECT doc_id, lang, substring(nm, CAST(i AS INT), 3) AS tri
  FROM base, unnest(generate_series(1, length(nm) - 2)) a(i)
),
counts AS (
  SELECT lang, tri, count(*) AS c FROM grams WHERE doc_id % 2 = 0 GROUP BY 1, 2
),
profile AS (
  SELECT lang AS p_lang, tri FROM (
    SELECT lang, tri,
           row_number() OVER (PARTITION BY lang ORDER BY c DESC, tri) AS rn
    FROM counts) WHERE rn <= 20
),
scores AS (
  SELECT g.doc_id, g.lang, p.p_lang, count(*) AS score
  FROM grams g JOIN profile p ON g.tri = p.tri
  WHERE g.doc_id % 2 = 1
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT doc_id, lang, p_lang AS pred FROM (
    SELECT doc_id, lang, p_lang,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, p_lang) AS rn
    FROM scores) WHERE rn = 1
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
FROM pred GROUP BY 1""",
    ref="extension: Cavnar-Trenkle char-trigram LID with even/odd "
    "train/test split -- broadcast (lang x 20) profile, hit-count "
    "argmax, per-language accuracy rollup",
)
def q_lang_id_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chartrigram_lang_id(load_table(spark, sf_dir, "documents"), profile_k=20)
