"""Round-3 coverage wave 35: co-occurrence pair generation and
corpus-level n-gram diagnostics for pre-training data.

- ``skipgram_pairs_top``: word2vec training-pair generation -- every
  (center, context) token pair within a +-2 window, counted corpus-wide.
  One window pass computes only the *positive* offsets; the negative
  side is the same stream mirrored, halving the window work.
- ``bigram_coverage_score``: per-document fraction of bigrams occurring
  >= 2 times corpus-wide -- an integer LM-flavored quality signal of the
  family used for corpus filtering (templated text scores high, noise
  scores low).
- ``trigram_novelty``: per-document count of distinct trigrams and of
  trigrams first seen in that document (min doc_id over the corpus) --
  the dataset-growth novelty curve diagnostic.

All three are pure integer counting over hash-balanced shuffles
(document window -> n-gram key aggregate -> key-colocated join), nothing
driver-sized, so they hold their shape at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce6240project_spark.operators.curation import (
    bigram_coverage,
    skipgram_pairs_topk,
    trigram_novelty,
)
from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_TOKS = f"SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents"


@_register(
    "skipgram_pairs_top",
    f"""
WITH t AS ({_TOKS}),
pp AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i + 1])) AS p
  FROM t WHERE len(w) >= 2
  UNION ALL
  SELECT unnest(list_transform(generate_series(1, len(w) - 2),
                               i -> w[i] || ' ' || w[i + 2])) AS p
  FROM t WHERE len(w) >= 3
),
pairs AS (
  SELECT string_split(p, ' ')[1] AS center, string_split(p, ' ')[2] AS context
  FROM pp
  UNION ALL
  SELECT string_split(p, ' ')[2] AS center, string_split(p, ' ')[1] AS context
  FROM pp
)
SELECT center, context, CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY 1, 2
ORDER BY n DESC, center, context LIMIT 30""",
    ref="extension: word2vec skip-gram pair generation (+-2 window) -- "
    "positive-offset lead() window mirrored instead of a second pass; "
    "count aggregate + TakeOrderedAndProject top-k",
)
def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return skipgram_pairs_topk(load_table(spark, sf_dir, "documents"), window=2, k=30)


@_register(
    "bigram_coverage_score",
    f"""
WITH t AS ({_TOKS}),
bg AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
                                       i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM t WHERE len(w) >= 2
),
cnt AS (SELECT bigram, count(*) AS c FROM bg GROUP BY 1)
SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       CAST(100 * sum(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) // count(*)
            AS BIGINT) AS coverage_pct
FROM bg b JOIN cnt c ON b.bigram = c.bigram
GROUP BY 1""",
    ref="extension: per-doc bigram corpus-coverage quality signal -- "
    "bigram stream -> corpus counts -> key-colocated join back -> "
    "per-doc aggregate; truncating integer percent",
)
def q_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_coverage(load_table(spark, sf_dir, "documents"), min_count=2)


@_register(
    "trigram_novelty",
    f"""
WITH t AS ({_TOKS}),
tr0 AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
                        i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS tri
  FROM t WHERE len(w) >= 3
),
tr AS (SELECT DISTINCT doc_id, tri FROM tr0),
f AS (SELECT tri, min(doc_id) AS first_doc FROM tr GROUP BY 1)
SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_tri,
       CAST(sum(CASE WHEN f.first_doc = tr.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel
FROM tr JOIN f ON tr.tri = f.tri
GROUP BY 1""",
    ref="extension: corpus novelty curve input -- distinct (doc, trigram) "
    "-> min(doc_id) per trigram -> join back -> per-doc novel counts",
)
def q_trigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trigram_novelty(load_table(spark, sf_dir, "documents"))
