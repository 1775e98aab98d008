"""Round-3 coverage wave 32: tokenizer training, PCA input, vocabulary
coverage.

- ``bpe_merges_10``: BPE tokenizer TRAINING (Sennrich et al. 2016) --
  the first 10 learned merge rules from corpus word frequencies.  The
  Spark side is the kmedoids-style driver loop (distributed pair count
  + 1-row collect per round); the oracle unrolls the 10 rounds as
  MATERIALIZED CTEs, with merge application pinned to leftmost
  non-overlapping replace-scan semantics (identical in both engines).
- ``embedding_covariance``: exact integer d x d covariance numerator
  via per-Arrow-batch numpy Gram partials (mapInPandas) summed in
  DECIMAL(38,0) -- the PCA/whitening input without the per-row d^2
  explode.  Oracle recomputes from a d^2 unnest self-join (fine at
  oracle scale; the Spark plan is the one that survives 100 TB).
- ``vocab_coverage_100``: cumulative corpus-coverage curve of the
  top-100 vocabulary (what fraction of token instances the top-k
  tokens cover) -- the standard vocab-size diagnostic; all-integer
  micro shares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.plans.registry import _register
from mapreduce6240project_spark.sources.tables import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_BPE_MERGES = 10
_BPE_TOP_WORDS = 200


def _bpe_oracle_sql(n_merges: int, top_words: int) -> str:
    """Unrolled BPE training rounds.  Every w{r}/m{r} is MATERIALIZED:
    each round references its predecessor multiply, so default inlining
    would expand exponentially (the same hazard as the k-core CTEs)."""
    parts = [
        f"""
WITH tok AS (SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents),
wf AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tok WHERE w <> ''
       GROUP BY w ORDER BY freq DESC, w LIMIT {top_words}),
w0 AS MATERIALIZED (
  SELECT w, freq,
         ' ' || array_to_string(list_transform(range(1, length(w) + 1),
                                               i -> substr(w, i, 1)), ' ')
             || ' ' AS seq
  FROM wf)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f""",
p{r} AS (
  SELECT syms[i] AS pa, syms[i+1] AS pb, CAST(sum(freq) AS BIGINT) AS n
  FROM (SELECT freq, string_split(trim(seq), ' ') AS syms FROM w{r - 1}),
       unnest(range(1, len(syms))) AS t(i)
  GROUP BY 1, 2),
m{r} AS MATERIALIZED (
  SELECT {r} AS round, pa, pb, n FROM p{r} ORDER BY n DESC, pa, pb LIMIT 1),
w{r} AS MATERIALIZED (
  SELECT w, freq,
         replace(seq,
                 ' ' || (SELECT pa FROM m{r}) || ' ' || (SELECT pb FROM m{r}) || ' ',
                 ' ' || (SELECT pa FROM m{r}) || (SELECT pb FROM m{r}) || ' ') AS seq
  FROM w{r - 1})"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM m{r}" for r in range(1, n_merges + 1))
    parts.append(f"\n{union}")
    return "".join(parts)


@_register(
    "bpe_merges_10",
    _bpe_oracle_sql(_BPE_MERGES, _BPE_TOP_WORDS),
    ref="extension: BPE tokenizer training (Sennrich et al. 2016) -- "
    "corpus-sized word-frequency pass, then vocabulary-sized merge "
    "rounds with 1-row driver collects (Cluster.java:310-386 iterate "
    "pattern); merge application = leftmost non-overlapping replace "
    "scan, pinned identically in both engines",
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.textstats import bpe_learn_merges

    return bpe_learn_merges(
        load_table(spark, sf_dir, "documents"),
        n_merges=_BPE_MERGES,
        top_words=_BPE_TOP_WORDS,
    )


_COV_SQL = """
WITH q AS (
  SELECT e.vec_id, CAST(t.i AS INT) - 1 AS i,
         CAST(floor(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE) * 1000000
                    + 0.5) AS BIGINT) AS qx
  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
),
n AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n FROM embeddings),
s AS (SELECT i, CAST(sum(qx) AS DECIMAL(38,0)) AS s_i FROM q GROUP BY i),
g AS (
  SELECT a.i AS i, b.i AS j, CAST(sum(a.qx * b.qx) AS DECIMAL(38,0)) AS s_ij
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
)
SELECT g.i, g.j,
       -- exact integer rendered as text: DECIMAL(38,0) leaves both
       -- BIGINT range (n^2 * 1e12 micros^2 passes 2^63 near n ~ 3000)
       -- and pandas' lossless dtypes, so the compare column is the
       -- decimal's digits
       CAST(CAST((SELECT n FROM n) * g.s_ij - sa.s_i * sb.s_i
                 AS DECIMAL(38,0)) AS VARCHAR) AS cov_num
FROM g JOIN s sa ON g.i = sa.i JOIN s sb ON g.j = sb.i"""


@_register(
    "embedding_covariance",
    _COV_SQL,
    ref="extension: exact integer covariance numerator (PCA/whitening "
    "input) -- per-Arrow-batch numpy Gram partials via mapInPandas, "
    "d^2-bounded task state, DECIMAL(38,0) cross-batch sums; no "
    "per-row d^2 explode at any scale",
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.vectors import embedding_covariance

    return embedding_covariance(load_table(spark, sf_dir, "embeddings"))


_VOCAB_COVERAGE_SQL = f"""
WITH tok AS (SELECT unnest(string_split({_NORM}, ' ')) AS token FROM documents),
vf AS MATERIALIZED (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM vf),
top AS (SELECT token, n FROM vf ORDER BY n DESC, token LIMIT 100),
ranked AS (
  SELECT token, n,
         CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS k,
         CAST(sum(n) OVER (ORDER BY n DESC, token
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum_n
  FROM top
)
SELECT k, token, n, cum_n,
       -- BIGINT floor division on both engines (cum_n * 1e6 < 2^63
       -- up to ~9e12 corpus tokens; beyond that, scale the micro
       -- factor down): DECIMAL '//' in DuckDB rounds, BIGINT doesn't
       CAST(cum_n * 1000000 // (SELECT n_total FROM tot) AS BIGINT)
         AS share_micro
FROM ranked
ORDER BY k"""


@_register(
    "vocab_coverage_100",
    _VOCAB_COVERAGE_SQL,
    ref="extension: vocabulary coverage curve (cumulative share of "
    "token instances covered by the top-k vocab) -- vocab-sized "
    "running-sum window after one corpus count pass; integer micro "
    "shares",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce6240project_spark.operators.dedup import tokens
    from mapreduce6240project_spark.operators.fanout import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(F.explode(tokens("text")).alias("token"))
    vf = tok.groupBy("token").agg(F.count("*").cast("bigint").alias("n"))
    # n_total from the vocab-sized aggregate (one corpus pass), folded
    # in as a literal; the ranked window then runs over ONLY the
    # top-100 rows (TakeOrderedAndProject first -- no whole-vocab
    # single-partition window at any scale)
    n_total = vf.agg(F.sum("n").alias("t")).collect()[0].t
    top = vf.orderBy(F.desc("n"), "token").limit(100)
    w_rank = Window.orderBy(F.desc("n"), "token")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.withColumn("k", F.row_number().over(w_rank).cast("bigint"))
        .withColumn("cum_n", F.sum("n").over(w_cum).cast("bigint"))
        .select(
            "k",
            "token",
            "n",
            "cum_n",
            F.expr(
                f"CAST(cum_n * 1000000 div {n_total} AS BIGINT)"
            ).alias("share_micro"),
        )
        .orderBy("k")
    )
