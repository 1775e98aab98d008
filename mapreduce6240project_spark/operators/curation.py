"""Training-data curation operators over the documents table: within-doc
repetition analysis, PII redaction, eval-set decontamination,
deterministic train/val/test splitting, and corpus bigram statistics.

These are the pre-training curation steps (the C4/Gopher-rules family)
re-expressed as Catalyst plans:

* repetition -> explode + two-level hash aggregate (map-side partial);
* redaction -> regexp chains (whole-stage codegen, RE2-safe patterns so
  the DuckDB oracle runs the identical regex);
* decontamination -> broadcast LEFT ANTI join on content fingerprints;
* split -> pure integer LCG arithmetic (same draw replayable in SQL);
* bigrams -> posexplode + lead() window, then a count aggregate.

At 100 TB: every operator here is a single shuffle (or none for
redaction/split, which stay map-only).  The decontamination anti-join
broadcasts the eval fingerprint set (eval corpora are small by
construction); were the eval side ever large, the same plan degrades
gracefully to a shuffled anti-join.

Reference anchor: the reference has no text pipeline (its ETL is
kmeans.java:24-112 CSV feature extraction); this module is the
extension surface named in BASELINE.json (documents table ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduce6240project_spark.operators.dedup import normalize_text
from mapreduce6240project_spark.operators.sampling import _INC, _MOD, _MULT

# RE2-safe redaction patterns (character classes only -- no lookaround)
# so Spark (Java regex) and DuckDB (RE2) match the same spans.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
LONG_DIGITS_RE = r"[0-9]{9,}"


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition profile: token totals, distinct-token
    count, duplicate-token ratio, and the most-frequent token's share.

    Gopher-style repetition filters threshold on exactly these ratios.
    Plan shape: explode tokens -> hash aggregate (id, token) -> hash
    aggregate (id).  Both aggregates get map-side partials, so the first
    exchange carries one row per distinct (doc, token) and the second
    one partial-sum row per (doc, partition) -- both far below the
    exploded token count."""
    tok = docs.select(
        F.col(id_col), F.explode(F.split(normalize_text(text_col), " ")).alias("tok")
    )
    per_tok = tok.groupBy(id_col, "tok").agg(F.count("*").alias("n"))
    return per_tok.groupBy(id_col).agg(
        F.sum("n").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.round(
            (F.sum("n") - F.count("*")) / F.sum("n"), 4
        ).alias("dup_ratio"),
        F.round(F.max("n") / F.sum("n"), 4).alias("top_tok_share"),
    )


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mask emails, long digit runs, then phone-like runs (in that
    order -- a bare 16-digit card number is ``<NUM>``, not a phone);
    count the redactions per document.  Map-only (no shuffle): three
    regexp replaces + three regexp_extract_all counts, all codegen."""
    c = F.col(text_col)
    after_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    after_digits = F.regexp_replace(after_email, LONG_DIGITS_RE, "<NUM>")
    n_matches = (
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))
        + F.size(F.regexp_extract_all(after_email, F.lit(LONG_DIGITS_RE), F.lit(0)))
        + F.size(F.regexp_extract_all(after_digits, F.lit(PHONE_RE), F.lit(0)))
    )
    redacted = F.regexp_replace(after_digits, PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        redacted.alias("redacted_text"),
        n_matches.cast("int").alias("n_redactions"),
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop training documents whose normalized-text fingerprint appears
    in the eval corpus (exact-match decontamination).

    Plan: broadcast LEFT ANTI join on md5(normalized text).  The eval
    fingerprint set is deduplicated before the broadcast so the hashed
    relation is minimal."""
    fp = F.md5(normalize_text(text_col))
    eval_fps = eval_docs.select(fp.alias("fingerprint")).distinct()
    return (
        train.withColumn("fingerprint", fp)
        .join(F.broadcast(eval_fps), "fingerprint", "left_anti")
        .drop("fingerprint")
    )


def assign_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, int, int] = (8, 1, 1),
) -> DataFrame:
    """Deterministic train/val/test assignment by LCG hash of the id:
    bucket = hash(id) mod sum(weights); the first ``weights[0]`` buckets
    are train, the next val, the rest test.  Pure integer arithmetic ->
    the identical draw is expressible in ANSI SQL, and the assignment is
    stable under any repartitioning or re-run (unlike F.rand)."""
    total = sum(weights)
    h = ((F.col(id_col) % F.lit(_MOD)) * F.lit(_MULT) + F.lit(_INC)) % F.lit(_MOD)
    bucket = h % F.lit(total)
    split = (
        F.when(bucket < weights[0], "train")
        .when(bucket < weights[0] + weights[1], "val")
        .otherwise("test")
    )
    return docs.withColumn("split", split)


def source_cap(
    docs: DataFrame,
    max_per_source: int = 100,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source document cap -- the web-curation "at most N pages per
    domain" rule.  Keeps the ``max_per_source`` lowest-LCG-hash docs per
    source (a deterministic uniform draw, stable across re-runs and
    repartitionings), annotated with their within-source rank.

    Plan: one hash shuffle on ``source_col`` + a rank window.  At 100 TB
    a mega-domain skews the window partition; the mitigation is a
    pre-filter pass -- ``hash_sample`` each heavy domain down to ~10x
    the cap before ranking (the hash draw composes: the lowest-hash
    survivors are identical) -- or AQE skew-split, since rank only needs
    sorted runs."""
    from mapreduce6240project_spark.operators.sampling import seed_hash

    w = Window.partitionBy(source_col).orderBy(seed_hash(id_col), F.col(id_col))
    return (
        docs.withColumn("source_rank", F.row_number().over(w))
        .filter(F.col("source_rank") <= max_per_source)
    )


def training_shards(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data output:
    every doc gets a shard (LCG hash mod n_shards) and a position within
    its shard (rank by a second-round hash), so writing
    ``partitionBy(shard) ORDER BY pos`` yields byte-identical training
    files on every run -- the reproducibility contract a 100 TB corpus
    build needs.

    Plan: one shuffle on shard + a rank window per shard; shard counts
    are balanced by the hash, so the windows are even.  Integer
    arithmetic end to end -> the same assignment is expressible in ANSI
    SQL."""
    from mapreduce6240project_spark.operators.sampling import seed_hash

    h = seed_hash(id_col)
    # second LCG round decorrelates within-shard order from shard choice
    h2 = ((h % F.lit(_MOD)) * F.lit(_MULT) + F.lit(_INC)) % F.lit(_MOD)
    shard = (h % F.lit(n_shards)).cast("int")
    w = Window.partitionBy(shard).orderBy(h2, F.col(id_col))
    return docs.select(
        F.col(id_col),
        shard.alias("shard"),
        F.row_number().over(w).alias("pos"),
    )


def bigram_topk(
    docs: DataFrame, k: int = 20, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level top-k bigrams: posexplode tokens, pair each token
    with its successor via a lead() window partitioned by document, then
    one count aggregate and a TakeOrderedAndProject top-k.

    The window shuffle partitions by document id (balanced), and the
    final ``orderBy().limit(k)`` is a per-partition top-k + k-row driver
    merge -- no global sort at any scale."""
    tok = docs.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(text_col), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bigrams = tok.select(
        F.concat_ws(" ", F.col("tok"), F.lead("tok", 1).over(w)).alias("bigram"),
        F.lead("tok", 1).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(k)
    )


def contamination_ngram_hits(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """N-gram-overlap contamination detection: training documents
    sharing ANY word ``n``-gram with the eval corpus, with the count of
    distinct shared grams -- the industry-standard contamination rule
    (substring leakage that exact-fingerprint matching misses).

    Plan: the eval side collapses to a distinct gram set (eval corpora
    are small: thousands of docs), broadcast into an equi-join against
    the exploded train grams; one narrow explode + broadcast join + one
    doc-level aggregate.  Train text never shuffles -- only (doc_id,
    gram) hits do, and those are bounded by the overlap size."""
    from mapreduce6240project_spark.operators.dedup import shingles

    eval_grams = (
        eval_docs.select(
            F.explode(F.array_distinct(shingles(text_col, n))).alias("g")
        )
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(text_col, n))).alias("g")
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def skipgram_pairs_topk(
    docs: DataFrame,
    window: int = 2,
    k: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Word2vec-style skip-gram training pairs: every (center, context)
    token pair within ``window`` positions, counted corpus-wide, top-k.

    One posexplode + one window pass computes ``lead(o)`` for every
    positive offset o <= window; the negative offsets are the same pairs
    swapped, so instead of a second window pass the positive-offset pair
    stream is unioned with its own (context, center) mirror -- half the
    window work, identical semantics.  One count aggregate (partial
    map-side combine) and a TakeOrderedAndProject close it out; the only
    shuffles are the per-document window partition and the pair-count
    exchange, both hash-balanced at any corpus size.
    """
    tok = docs.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(text_col), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = tok.select(
        F.col("tok"),
        *[F.lead("tok", o).over(w).alias(f"lead{o}") for o in range(1, window + 1)],
    )
    pos_pairs = (
        leads.select(
            F.col("tok").alias("center"),
            F.explode(F.array(*[F.col(f"lead{o}") for o in range(1, window + 1)])).alias(
                "context"
            ),
        )
        .filter(F.col("context").isNotNull())
    )
    pairs = pos_pairs.unionByName(
        pos_pairs.select(
            F.col("context").alias("center"), F.col("center").alias("context")
        )
    )
    return (
        pairs.groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "center", "context")
        .limit(k)
    )


def bigram_coverage(
    docs: DataFrame,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram *coverage*: what fraction of a document's
    bigrams occur at least ``min_count`` times corpus-wide.  A cheap,
    fully integer language-model-flavored quality signal -- boilerplate
    and templated text score high, line noise scores low -- of the
    family used for pre-training corpus filtering.

    Plan: bigram stream (posexplode + lead window) -> corpus counts
    (hash aggregate) -> join the stream back to the counts on the bigram
    key (co-partitioned with the aggregate output, so AQE plans it
    without an extra exchange) -> per-document aggregate.  Documents
    with fewer than two tokens have no bigrams and are absent from the
    output by definition.  All counts integer; the coverage percentage
    uses truncating integer division so the oracle replays it exactly.
    """
    tok = docs.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(text_col), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bigrams = tok.select(
        F.col(id_col),
        F.concat_ws(" ", F.col("tok"), F.lead("tok", 1).over(w)).alias("bigram"),
        F.lead("tok", 1).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull()).drop("nxt")
    counts = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    return (
        bigrams.join(counts, "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("c") >= min_count, 1).otherwise(0)).alias("n_common"),
        )
        .withColumn(
            "coverage_pct", F.expr("100 * n_common div n_bigrams").cast("long")
        )
    )


def trigram_novelty(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus novelty profile: per document, how many distinct trigrams
    it contains and how many of them appear *first* in this document
    (first = the minimum doc_id over the corpus).  Summed over a
    doc-id-ordered corpus this traces the novelty curve -- the knee
    where additional data stops contributing new n-grams -- a standard
    dataset-growth diagnostic for pre-training corpora.

    Plan: distinct (doc, trigram) pairs -> min(doc_id) per trigram ->
    join back on the trigram key -> per-document aggregate.  Every stage
    is a hash shuffle on a high-cardinality key with map-side partials;
    nothing is driver-sized.
    """
    tok = docs.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(text_col), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    tri = (
        tok.select(
            F.col(id_col),
            F.concat_ws(
                " ", F.col("tok"), F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
            ).alias("tri"),
            F.lead("tok", 2).over(w).alias("l2"),
        )
        .filter(F.col("l2").isNotNull())
        .drop("l2")
        .distinct()
    )
    first = tri.groupBy("tri").agg(F.min(id_col).alias("first_doc"))
    return (
        tri.join(first, "tri")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.sum(F.when(F.col("first_doc") == F.col(id_col), 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
    )
