"""Text-analysis operators over the `documents` table (FIXTURES.md §C) —
the language-ID / quality-scoring / token-counting / fingerprinting
stage of an LLM training-data pipeline.

Everything here is built-in column functions (split/filter/size/md5/
regexp_replace) — per-row, embarrassingly parallel, whole-stage
codegen'd; no UDFs, no shuffles except the final order-by for the
deterministic gate projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sqlstreamstore_spark.operators.partitioning import with_min_parallelism
from pyspark.sql import types as T

#: Tiny English function-word set for the n-gram-free language heuristic
#: and the stopword-ratio quality feature.
EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"]


def _tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def token_stats(documents: DataFrame) -> DataFrame:
    """Whitespace token count + char stats per document."""
    toks = _tokens()
    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars_computed"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    ).orderBy("doc_id")


def quality_score(documents: DataFrame) -> DataFrame:
    """Length / stopword-ratio / distinct-ratio quality features.

    Ratios are double(int)/double(int) — bit-identical across engines.
    """
    toks = _tokens()
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        (n_distinct.cast("double") / n_tokens.cast("double")).alias("distinct_ratio"),
    ).orderBy("doc_id")


def language_id(documents: DataFrame, threshold: float = 0.15) -> DataFrame:
    """Heuristic language ID: stopword hit-rate over the English
    function-word set; >= threshold → 'en'."""
    toks = _tokens()
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    score = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
        / F.size(toks).cast("double")
    )
    return documents.select(
        "doc_id",
        "lang",
        score.alias("en_score"),
        F.when(score >= threshold, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
    ).orderBy("doc_id")


def rolling_hash_fingerprint(documents: DataFrame, mod: int = 1_000_000_007) -> DataFrame:
    """Polynomial rolling hash over the character stream:
    acc = (acc*31 + codepoint) mod p — a pure integer fold, expressible
    in both engines (Spark `aggregate`, DuckDB `list_reduce`) and exact.
    This is the classic Rabin-Karp-style document fingerprint."""
    chars = F.split(F.col("text"), "")
    acc = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda a, c: (a * F.lit(31) + F.ascii(c)) % F.lit(mod),
    )
    return documents.select("doc_id", acc.alias("rhash")).orderBy("doc_id")


def regex_token_count(documents: DataFrame) -> DataFrame:
    """BPE-ish tokenization via regex: words, numbers, and single
    non-space symbols counted separately — the cheap token-count proxy a
    data pipeline uses for budget estimates."""
    words = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-zA-Z]+"), 0))
    numbers = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]+"), 0))
    symbols = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^a-zA-Z0-9\s]"), 0))
    return documents.select(
        "doc_id",
        words.alias("n_word_tokens"),
        numbers.alias("n_number_tokens"),
        symbols.alias("n_symbol_tokens"),
        (words + numbers + symbols).alias("n_tokens_bpeish"),
    ).orderBy("doc_id")


def fingerprint(documents: DataFrame) -> DataFrame:
    """Canonical-form document fingerprint: lowercase, strip non
    [a-z0-9 ], collapse runs of spaces, md5. Identical docs (modulo
    formatting) share a fingerprint — the join key for exact dedup."""
    normalized = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
    )
    return documents.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
    ).orderBy("doc_id")


def corpus_vocabulary(documents: DataFrame, limit: int = 200) -> DataFrame:
    """Corpus vocabulary with term and document frequencies — the
    input to tokenizer training / frequency-based filtering in a
    training-data pipeline. One explode + one groupBy (partial agg
    map-side; only (token, counts) shuffle)."""
    tok = documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("token"))
        .limit(limit)
    )


def term_counts(documents: DataFrame) -> DataFrame:
    """(token, tf, df) partial term statistics for ONE batch of
    documents — the monoid cell of the incremental vocabulary index.
    Both counters are additive across DISJOINT document batches: tf
    trivially, df because each doc_id lives in exactly one batch, so
    per-batch distinct-doc counts partition the global df. One explode
    + one groupBy (partial agg map-side; only (token, counts)
    shuffle)."""
    tok = documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    return tok.groupBy("token").agg(
        F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df")
    )


def build_term_index(documents: DataFrame, path: str) -> None:
    """Materialize the corpus's term-count rows — the vocabulary tier
    of the index-once lifecycle (digest / banded-LSH / IVF / TERMS).
    A daily delta upserts its partial counts instead of re-tokenizing
    the corpus; the merged view is a groupBy-sum over count rows.
    At 100 TB the index is vocabulary-sized (tokens × ~24 bytes), far
    below the corpus, and merge cost is ∝ index + delta."""
    term_counts(documents).write.mode("overwrite").parquet(path)


def upsert_term_index(new_docs: DataFrame, path: str) -> None:
    """Append the delta batch's partial (token, tf, df) rows —
    O(delta); existing files are never rewritten. Batches must be
    doc-disjoint (the df-additivity contract in :func:`term_counts`);
    a re-sent delta double-counts, which is exactly what
    :func:`sqlstreamstore_spark.analytics.dedup.compact_index` cannot
    fix for counters — dedupe deltas upstream (digest anti-join)."""
    term_counts(new_docs).write.mode("append").parquet(path)


def vocabulary_from_index(spark, path: str, limit: int = 200) -> DataFrame:
    """Merged vocabulary view over the materialized term index:
    groupBy-sum of the partial rows. merge == rebuild (pytest-pinned
    and hash-oracled against the full-corpus SQL) because both
    counters are additive over disjoint batches. Same output contract
    as :func:`corpus_vocabulary`."""
    idx = spark.read.parquet(path)
    return (
        idx.groupBy("token")
        .agg(F.sum("tf").alias("tf"), F.sum("df").alias("df"))
        .orderBy(F.col("tf").desc(), F.col("token"))
        .limit(limit)
    )


def compact_term_index(spark, path: str, target_partitions: int = 8) -> None:
    """Compact the COUNTER-VALUED term index: unlike the set-semantics
    indexes (`dedup.compact_index`, which refuses this layout), the
    partial (token, tf, df) rows merge by groupBy-SUM — duplicates
    carry count mass, so the rewrite collapses each token to one fully
    merged row (idempotent: re-compacting is a no-op by the monoid).
    Same retire-then-swap discipline as `dedup.compact_index`,
    including entry-time recovery of a stranded ``.__retired__``;
    the swap goes through the Hadoop FileSystem of the path's scheme
    (:mod:`sqlstreamstore_spark.sources.hadoopfs`), so it works on
    ``file:``/HDFS/object stores alike."""
    from sqlstreamstore_spark.sources.hadoopfs import recover_retired, retire_swap

    recover_retired(spark, path)
    merged = (
        spark.read.parquet(path)
        .groupBy("token")
        .agg(F.sum("tf").alias("tf"), F.sum("df").alias("df"))
        .repartition(target_partitions)
    )
    tmp = path.rstrip("/") + ".__compacting__"
    merged.write.mode("overwrite").parquet(tmp)
    retire_swap(spark, path, tmp)


def ngram_novelty(documents: DataFrame, n: int = 3) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    word n-grams NOT already seen in any lower-doc_id document — the
    curation signal behind "how much of this crawl snapshot is new
    content" (the complement of bulk inter-document repetition).

    Shape at 100 TB: one shingle explode, one min-aggregate per shingle
    (partial agg map-side), one linear join back on the shingle, one
    per-doc aggregate — no pair joins anywhere. Novelty is an exact
    int/int division, bit-identical in the oracle.
    """
    from sqlstreamstore_spark.analytics.dedup import exploded_shingles

    # the shingle frame feeds both the min-aggregate and the join side —
    # pin it so the explode runs once (2.4× at sf0.1; localCheckpoint,
    # not persist: blocks die with the plan)
    sh = exploded_shingles(with_min_parallelism(documents), n).localCheckpoint()
    firsts = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
            ).cast("bigint").alias("n_seen"),
        )
        .withColumn(
            "novelty",
            (F.col("n_grams") - F.col("n_seen")).cast("double")
            / F.col("n_grams").cast("double"),
        )
        .orderBy("doc_id")
    )


def kmv_distinct_ngrams(documents: DataFrame, k: int = 64, n: int = 3) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch over the corpus's
    word n-grams, next to the exact count it estimates.

    The sketch: md5 maps grams ~uniformly onto [0, 1); the k-th
    smallest of N distinct hashes sits near k/N, so N̂ = (k−1)/u_k —
    and when fewer than k distinct hashes exist, the sketch holds the
    whole domain and reports its exact size. Fixed-width lowercase hex
    sorts lexicographically = numerically, so "k smallest hashes" is a
    sort+limit (TakeOrderedAndProject: per-partition heaps of k rows,
    driver merge — the sketch never shuffles more than k values per
    partition). u_k uses the first 12 hex chars (48 bits — exact in
    BIGINT and in double on both engines), making the whole estimate
    deterministic and hash-oracle-able — unlike HLL-style sketches
    whose register layouts are engine-private.

    The exact count is computed alongside (it's the oracle of the
    estimate); at 100 TB you'd drop it and keep only the k-row sketch,
    which also merges across partitions/snapshots by union + re-limit.
    """
    from sqlstreamstore_spark.analytics.dedup import exploded_shingles

    # pin the distinct hash frame: it feeds both the sketch and the
    # exact count — without the pin the corpus explode+md5+distinct
    # runs twice (the ngram_novelty pin discipline)
    hs = exploded_shingles(with_min_parallelism(documents), n, keys=()).select(
        F.md5(F.col("s")).alias("h")
    ).distinct().localCheckpoint()
    sketch = (
        hs.orderBy("h")
        .limit(k)
        .agg(F.count("*").alias("n_sketch"), F.max("h").alias("kth"))
    )
    exact = hs.agg(F.count("*").cast("bigint").alias("n_exact"))
    frac = F.conv(F.substring(F.col("kth"), 1, 12), 16, 10).cast("double") / F.lit(
        float(1 << 48)
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(F.lit(float(k - 1)) / frac)
    return (
        exact.join(sketch)  # two 1-row frames: trivial cross join
        .select(
            "n_exact",
            F.lit(k).cast("bigint").alias("k"),
            est.alias("kmv_estimate"),
            ((est - F.col("n_exact").cast("double")) / F.col("n_exact").cast("double")).alias(
                "rel_err"
            ),
        )
    )


def kmv_distinct_ngrams_by_source(
    documents: DataFrame, k: int = 32, n: int = 3
) -> DataFrame:
    """Per-source KMV sketches next to their exact counts — the grouped
    form of `kmv_distinct_ngrams`, showing the property that makes KMV
    the right sketch for a partitioned corpus: it's an aggregate. Each
    source keeps its k smallest hashes (a per-group window rank — the
    shuffle key is the source, parallel over groups), estimates its own
    distinct n-gram count, and two sources' sketches merge by
    union + re-rank — so per-partition sketches roll up to any grouping
    without rescanning the corpus."""
    from pyspark.sql import Window

    from sqlstreamstore_spark.analytics.dedup import exploded_shingles

    hs = (
        exploded_shingles(with_min_parallelism(documents), n, keys=("source",))
        .select("source", F.md5(F.col("s")).alias("h"))
        .distinct()
        .localCheckpoint()  # feeds both the per-group rank and the exact counts
    )
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        hs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("source")
        .agg(F.count("*").alias("n_sketch"), F.max("h").alias("kth"))
    )
    exact = hs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_exact")
    )
    frac = F.conv(F.substring(F.col("kth"), 1, 12), 16, 10).cast("double") / F.lit(
        float(1 << 48)
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(F.lit(float(k - 1)) / frac)
    return (
        exact.join(sk, "source")
        .select(
            "source",
            "n_exact",
            est.alias("kmv_estimate"),
            (
                (est - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double")
            ).alias("rel_err"),
        )
        .orderBy("source")
    )


def tf_idf_top_terms(
    documents: DataFrame, top_k: int = 3, max_doc: int = 50
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf
    (idf = ln(N/df) over the FULL corpus; candidate docs capped for the
    gate query). Two shuffles: token df aggregate + per-doc window."""
    from pyspark.sql import Window

    n_docs = documents.count()
    tok = documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    df_counts = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    tf = (
        tok.filter(F.col("doc_id") < max_doc)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    scored = tf.join(F.broadcast(df_counts), "token").select(
        "doc_id",
        "token",
        (
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "token", "tfidf", "rk")
        .orderBy("doc_id", "rk")
    )


def source_quality_rollup(documents: DataFrame) -> DataFrame:
    """Per-source curation dashboard: document count, token-length mean,
    mean distinct-token ratio, and exact-duplicate rate — the rollup a
    corpus owner watches per ingestion source. One groupBy with partial
    aggregation; the md5 for the dup rate shuffles as a 16-byte digest."""
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens.cast("double")
    return (
        documents.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.avg(n_tokens.cast("double")).alias("avg_tokens"),
            F.avg(distinct_ratio).alias("avg_distinct_ratio"),
            (
                F.lit(1.0)
                - F.countDistinct(F.md5(F.col("text"))).cast("double")
                / F.count("*").cast("double")
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


def repetition_signals(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition/quality signals per document — the
    filters a training-data pipeline applies before tokenization
    (duplicate-heavy documents are boilerplate/spam): duplicate-word
    fraction, most-common-word dominance, duplicate-2-gram fraction,
    mean word length.

    Shape at scale: one explode + two hash aggregations keyed by doc_id
    (partial combine map-side) for the word counts, per-row array
    expressions for the 2-gram stats, one equi-join back to the
    per-row frame. Ratios are double(int)/double(int), bit-identical in
    the DuckDB oracle.
    """
    toks = _tokens()
    # split projected ONCE below the 2-gram transform (r12 wave 10 —
    # the _shingles_arr rule: an inline split re-evaluates per gram)
    tk = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tk) - F.lit(2)),
        lambda i: F.array_join(F.slice(tk, i + F.lit(1), 2), " "),
    )
    per_row = documents.select(
        "doc_id", "text", _tokens().alias("_toks")
    ).select(
        "doc_id",
        F.length("text").alias("__nch"),
        F.when(F.size(tk) >= 2, (F.size(tk) - F.lit(1)).cast("bigint"))
        .otherwise(F.lit(None))
        .alias("__n_g"),
        F.when(F.size(tk) >= 2, F.size(F.array_distinct(grams)).cast("bigint"))
        .otherwise(F.lit(None))
        .alias("__n_gd"),
    )
    wc = (
        documents.select("doc_id", F.explode(toks).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
    )
    ws = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("__top_c"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        ws.join(per_row, "doc_id")
        .select(
            "doc_id",
            "n_words",
            (d("n_distinct") / d("n_words")).alias("distinct_word_ratio"),
            (d("__top_c") / d("n_words")).alias("top_word_ratio"),
            (F.lit(1.0) - d("__n_gd") / d("__n_g")).alias("dup_2gram_ratio"),
            ((d("__nch") - (d("n_words") - F.lit(1.0))) / d("n_words")).alias(
                "mean_word_len"
            ),
        )
        .orderBy("doc_id")
    )


#: Default redaction patterns for scrub_redact. In production the list
#: is emails/URLs/phones (the PII set); the fixture corpus is synthetic
#: word-salad with none of those, so the gate exercises the same
#: count+replace+hash plumbing on a stopword pattern instead. RE2- and
#: Java-regex-compatible (no backrefs, \b both dialects).
SCRUB_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"\b(the|a|and|of|to|in|is|for|on|with)\b", "<W>"),
)
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\+?[0-9][0-9 -]{7,}[0-9]", "<PHONE>"),
)


def scrub_redact(
    documents: DataFrame,
    patterns: tuple[tuple[str, str], ...] = SCRUB_PATTERNS,
) -> DataFrame:
    """Regex redaction pass: count matches per pattern family, replace
    them, return the scrubbed text's digest + length (joins downstream
    ship digests, not text). Pure column expressions — whole-stage
    codegen, no shuffle, the text column dies in the projection.
    """
    scrubbed = F.col("text")
    n_redacted = F.lit(0).cast("long")
    for pat, token in patterns:
        n_redacted = n_redacted + F.regexp_count(scrubbed, F.lit(pat)).cast("long")
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return documents.select(
        "doc_id",
        n_redacted.alias("n_redacted"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
    )


COMPRESSION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("n_compressed", T.IntegerType(), False),
        T.StructField("compression_ratio", T.DoubleType(), False),
    ]
)


def compression_signals(documents: DataFrame, level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio — the classic cheap quality
    signal (highly repetitive / templated / boilerplate text compresses
    far below natural prose; near-random text barely compresses). Used
    alongside repetition_signals for Gopher-style filtering cuts.

    mapInPandas because zlib lives Python-side; the text dies inside
    the operator, only three numbers per document shuffle. Rows-only in
    the gate (DuckDB has no zlib) — invariants pinned by pytest."""
    import zlib

    from collections.abc import Iterator as _Iterator

    import pandas as _pd

    def run(batches: _Iterator[_pd.DataFrame]) -> _Iterator[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                raw = (t or "").encode("utf-8")
                comp = zlib.compress(raw, level)
                rows.append(
                    (
                        int(did),
                        len(raw),
                        len(comp),
                        (len(comp) / len(raw)) if raw else 1.0,
                    )
                )
            yield _pd.DataFrame(
                rows, columns=[f.name for f in COMPRESSION_SCHEMA.fields]
            )

    return (
        documents.select("doc_id", "text")
        .mapInPandas(run, COMPRESSION_SCHEMA)
        .orderBy("doc_id")
    )


HEAVY_HITTERS_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType(), False),
        T.StructField("approx_count", T.LongType(), False),
        T.StructField("max_count", T.LongType(), False),
    ]
)


def heavy_hitters(
    documents: DataFrame, k: int = 20, capacity: int = 400
) -> DataFrame:
    """Approximate top-k frequent tokens via Misra-Gries summaries —
    the bounded-memory alternative to a full token groupBy when the
    vocabulary doesn't fit (URLs, n-grams, user-ids at 100 TB).

    Each partition streams its tokens through a ``capacity``-counter
    Misra-Gries summary (strictly m counters, decrement-on-overflow),
    emitting ≤ capacity rows; summaries merge by token-sum, which keeps
    the MG guarantee: true_count − n/capacity ≤ approx ≤ true_count,
    where n is the total token count. Items with frequency above
    n/capacity can never be evicted everywhere, so no true heavy
    hitter is missed. Output: top-k by approx count with the
    per-token upper bound (approx + Σ per-partition deleted mass).

    Rows-only in the gate (the sketch is engine-specific); the
    containment + bound invariants vs the exact groupBy are pinned by
    tests/test_text_extras ``test_heavy_hitters_bounds``."""

    def run(batches):
        import pandas as _pd

        counters: dict[str, int] = {}
        deleted = 0
        for pdf in batches:
            for text in pdf["text"]:
                for tok in (text or "").lower().split():
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < capacity:
                        counters[tok] = 1
                    else:
                        # decrement all (the MG step); drop zeros
                        deleted += 1
                        dead = []
                        for t2 in counters:
                            counters[t2] -= 1
                            if counters[t2] == 0:
                                dead.append(t2)
                        for t2 in dead:
                            del counters[t2]
        yield _pd.DataFrame(
            {
                "token": list(counters.keys()) + ["\x00deleted"],
                "approx_count": list(counters.values()) + [deleted],
                "max_count": [0] * len(counters) + [0],
            }
        )

    parts = documents.select("text").mapInPandas(run, HEAVY_HITTERS_SCHEMA)
    merged = parts.groupBy("token").agg(
        F.sum("approx_count").alias("approx_count")
    ).localCheckpoint()
    # global slack: each decrement step removed one occurrence of EVERY
    # then-tracked token, so per-token undercount ≤ Σ partition deletes
    slack = (
        merged.filter(F.col("token") == "\x00deleted")
        .select(F.sum("approx_count"))
        .collect()[0][0]
        or 0
    )
    return (
        merged.filter(F.col("token") != "\x00deleted")
        .select(
            "token",
            F.col("approx_count").cast("long").alias("approx_count"),
            (F.col("approx_count") + F.lit(int(slack))).cast("long").alias("max_count"),
        )
        .orderBy(F.col("approx_count").desc(), "token")
        .limit(k)
    )


def hashed_embedding_features(documents: DataFrame, dim: int = 64) -> DataFrame:
    """Feature-hashing text vectorizer (HashingVectorizer / 'hashing
    trick'): every token hashes to one of ``dim`` buckets with a ±1
    sign, weights sum per (doc, bucket) — a model-free embedding that
    makes the WHOLE vector pipeline (LSH near-dup, ANN, semantic dedup)
    runnable from raw text with no external encoder.

    md5 family so DuckDB computes identical features (the MinHash
    precedent): bucket = (v1·16 + v2) mod dim and sign from v3 < 8,
    where v_i are the first md5 hex digits (char→value via instr —
    no conv(), which can hang whole-stage codegen). Long format
    (doc_id, bucket, weight) — exactly SQL-expressible; the array
    assembly for the similarity operators is ``hashed_embeddings``."""
    hexs = "0123456789abcdef"
    toks = documents.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    ).filter(F.col("t") != "")
    h = F.md5(F.col("t"))
    v = [
        F.instr(F.lit(hexs), F.substring(h, i, 1)) - 1  # 0-based hex value
        for i in (1, 2, 3)
    ]
    bucket = ((v[0] * 16 + v[1]) % dim).cast("int")
    sign = F.when(v[2] < 8, F.lit(1.0)).otherwise(F.lit(-1.0))
    return (
        toks.select("doc_id", bucket.alias("bucket"), sign.alias("s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").cast("double").alias("weight"))
        .orderBy("doc_id", "bucket")
    )


HASHED_FEATURES_SQL_TMPL = """WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
), feats AS (
  SELECT doc_id,
         ((instr('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 16
          + (instr('0123456789abcdef', substring(md5(t), 2, 1)) - 1)) % {dim} AS bucket,
         CASE WHEN instr('0123456789abcdef', substring(md5(t), 3, 1)) - 1 < 8
              THEN 1.0 ELSE -1.0 END AS s
  FROM toks WHERE t <> ''
)
SELECT doc_id, CAST(bucket AS INT) AS bucket, CAST(sum(s) AS DOUBLE) AS weight
FROM feats GROUP BY doc_id, bucket ORDER BY doc_id, bucket"""


def hashed_embeddings(documents: DataFrame, dim: int = 64) -> DataFrame:
    """Assemble the long-format hashed features into the
    (vec_id, embedding: array<double>) shape every similarity operator
    consumes — raw text becomes ANN-searchable with zero model
    dependencies. Missing buckets densify to 0.0 via a map lookup (one
    groupBy; no per-dimension joins)."""
    feats = hashed_embedding_features(documents, dim)
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("bucket"), F.col("weight")))
    )
    return (
        feats.groupBy("doc_id")
        .agg(m.alias("__m"))
        .select(
            F.col("doc_id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("__m"), i.cast("int")), F.lit(0.0)
                ),
            ).alias("embedding"),
        )
    )


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """Corpus-unigram language-model quality score per document — the
    perplexity-filtering proxy of CCNet/Wenzek et al. (2020): train a
    unigram LM on the corpus itself (token -> count / N) and score each
    document by its mean token log-probability; low scores (= high
    perplexity) flag gibberish, boilerplate, and off-distribution text.

    Float discipline (the gate hash-matches DuckDB): every value that
    leaves integer space is a single libm call on exact integers
    (ln(count), ln(N)), and the per-doc sum folds a SORTED array of
    per-distinct-token contributions sequentially — both engines add in
    the identical order, so the result is reproducible to the bit
    modulo libm ulps, absorbed by round(). This is the same
    sorted-sequential-fold discipline the deployed IVF-PQ ADC uses.

    Scale shape at 100 TB: the vocab is a groupBy(token) partial agg;
    the doc-side join is a hash equi-join on token (AQE broadcasts when
    the vocab fits); the corpus total arrives via a broadcast 1-row
    crossJoin (no collect); the fold is bounded by distinct tokens per
    document. Nothing is quadratic, nothing funnels to one task.
    """
    tok = documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    cnts = tok.groupBy("token").agg(F.count("*").cast("bigint").alias("c"))
    n_corpus = cnts.agg(F.sum("c").cast("double").alias("n_corpus"))
    per = tok.groupBy("doc_id", "token").agg(
        F.count("*").cast("bigint").alias("m")
    )
    terms = (
        per.join(cnts, "token")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("c", "m"))).alias("ts"),
            F.sum("m").cast("bigint").alias("n_tokens"),
        )
    )
    s = F.aggregate(
        F.transform(
            F.col("ts"),
            lambda t: t["m"].cast("double") * F.log(t["c"].cast("double")),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    avg = (
        s - F.col("n_tokens").cast("double") * F.log(F.col("n_corpus"))
    ) / F.col("n_tokens").cast("double")
    return (
        terms.crossJoin(F.broadcast(n_corpus))
        .select(
            "doc_id",
            "n_tokens",
            F.round(avg, 7).alias("avg_logprob"),
            F.round(F.exp(-avg), 4).alias("ppl_proxy"),
        )
        .orderBy("doc_id")
    )


def cms_token_freq(documents: DataFrame, depth: int = 4, width: int = 256) -> DataFrame:
    """Count-min sketch (Cormode–Muthukrishnan 2005) over corpus token
    frequencies, reported for the top tokens next to their exact
    counts. Completes the sketch triad: Misra-Gries heavy hitters
    UNDER-count (`text_heavy_hitters`), KMV estimates distincts
    (`stats_kmv_distinct`), CMS OVER-counts frequencies — est >= exact
    always (the pytest pin), with error bounded by collisions in a
    depth x width counter grid that stays a fixed 4x256 cells no matter
    how large the corpus grows.

    Determinism discipline: row r's column for a token is the first
    16 bits of md5("cms<r>:" || token) mod width — replayable in
    DuckDB, so both the estimate column and the exact column hash-match
    with zero tolerance (all-integer arithmetic end to end).

    Scale shape: token counts are a groupBy partial aggregate; the grid
    is built from DISTINCT tokens (depth rows each), so the sketch
    build shuffles at most depth x width cells; the estimate probe
    joins the 20-row top-token frame against the grid. Sketches of
    disjoint corpora merge by elementwise cell addition (pinned by
    pytest: merge == recompute), which is what makes this the
    streaming/rollup-friendly frequency monitor.
    """
    def rc_pairs(df: DataFrame, keep: list[str]) -> DataFrame:
        """Explode each token into its (row, col) grid coordinates."""
        rc = F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"cms{r}:"), F.col("token"))),
                                1,
                                4,
                            ),
                            16,
                            10,
                        ).cast("bigint")
                        % width
                    ).alias("col"),
                )
                for r in range(depth)
            ]
        )
        return df.select(*keep, F.explode(rc).alias("rc")).select(
            *keep, F.col("rc.r").alias("r"), F.col("rc.col").alias("col")
        )

    cnts = (
        documents.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint()  # feeds the grid, the top-k, and the probe
    )
    grid = (
        rc_pairs(cnts, ["c"])
        .groupBy("r", "col")
        .agg(F.sum("c").cast("bigint").alias("cell"))
    )

    top = cnts.orderBy(F.col("c").desc(), "token").limit(20)
    probe = rc_pairs(top, ["token", "c"])
    return (
        probe.join(F.broadcast(grid), ["r", "col"])
        .groupBy("token")
        .agg(
            F.max("c").alias("c_exact"),
            F.min("cell").alias("c_est"),
        )
        .select("token", "c_exact", "c_est")
        .orderBy(F.col("c_exact").desc(), "token")
    )


def _hll_rho(hexcol: Column) -> Column:
    """Position of the first 1-bit (rho, 1-based) in a 12-hex-char
    (48-bit) string, computed with string ops only — no log2, no
    engine-private bit intrinsics — so DuckDB replays it exactly.

    msb_pos of the 48-bit value = (hex digits after leading zeros − 1)·4
    + bits-in-leading-digit; rho = 49 − msb_pos; all-zero tail → 49.
    """
    stripped = F.regexp_replace(hexcol, "^0+", "")
    nz = F.length(stripped)
    lead = F.substring(stripped, 1, 1)
    lead_bits = (
        F.when(lead.isin(*"89abcdef"), 4)
        .when(lead.isin(*"4567"), 3)
        .when(lead.isin(*"23"), 2)
        .otherwise(1)
    )
    return F.when(nz == 0, F.lit(49)).otherwise(
        F.lit(49) - ((nz - F.lit(1)) * 4 + lead_bits)
    ).cast("int")


def hll_registers(
    items: DataFrame, col: str = "s", b: int = 8, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """HyperLogLog register frame (Flajolet et al. 2007) over a column
    of items: md5 splits into a register index (first ``b`` bits via
    2 hex chars) and a 48-bit tail whose first-1-bit position is the
    register's rank. Returns (reg, rho) with rho = max over the
    register's items — an m-row partial aggregate (map-side combine;
    only m = 2^b tiny rows ever shuffle, duplicates collapse for free
    because max over repeats is a no-op).

    Sketches of disjoint corpora merge by union + groupBy max (pinned
    by pytest: merge == recompute) — the property that lets 100 TB of
    partitions each ship 256 rows to a rollup.
    """
    if b != 8:
        raise ValueError("b=8 (2 hex chars) is the portable layout")
    h = F.md5(F.col(col))
    return (
        items.select(
            *group_cols,
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("reg"),
            _hll_rho(F.substring(h, 3, 12)).alias("rho_i"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho_i").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, m: int = 256, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Raw HLL estimate from a register frame: E = α_m·m²/Z with
    Z = Σ 2^−rho over all m registers (missing registers count rho=0).

    Determinism discipline: Z is carried as the exact integer
    Z·2^49 = Σ 2^(49−rho) (max m·2^49 = 2^57, BIGINT-safe), so the
    estimate is one literal-constant multiply-divide chain over exact
    integers — bit-identical IEEE arithmetic on any engine, no libm.
    Also emits ``hll_corrected``: the standard small-range branch
    (raw ≤ 2.5m and some register empty ⇒ linear counting
    m·ln(m/V), V = empty registers) that fixes raw HLL's heavy bias
    at low cardinalities. The BRANCH decision compares bit-identical
    values (raw, integer V), so engines can't disagree about which
    arm ran; the ln() arm itself passes through libm, so gates that
    can land in it must round (the `_round_cols` pattern) — gates in
    the raw regime (n ≫ 2.5m) stay zero-tolerance.
    """
    alpha = 0.7213 / (1.0 + 1.079 / m)
    aggs = [
        F.count("*").cast("bigint").alias("n_hit"),
        F.sum(F.expr("shiftleft(1L, 49 - rho)"))
        .cast("bigint")
        .alias("z_hit"),
    ]
    agg = (
        registers.groupBy(*group_cols).agg(*aggs) if group_cols else registers.agg(*aggs)
    )
    z = (
        F.col("z_hit")
        + (F.lit(m).cast("bigint") - F.col("n_hit")) * F.lit(1 << 49).cast("bigint")
    )
    raw = (
        F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(1 << 49))
        / z.cast("double")
    )
    v = F.lit(m).cast("bigint") - F.col("n_hit")  # empty registers
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        "n_hit",
        z.alias("z_scaled"),
        raw.alias("hll_estimate"),
        corrected.alias("hll_corrected"),
    )


def hll_distinct_ngrams(documents: DataFrame, n: int = 3) -> DataFrame:
    """HLL distinct-count of corpus word n-grams next to the exact
    count it estimates — the cardinality member of the sketch family
    (KMV k-smallest `stats_kmv_distinct`, CMS frequencies
    `stats_cms_freq`, Bloom membership `dedup_bloom_prefilter`,
    Misra-Gries heavy hitters).

    vs KMV: the HLL register file is fixed 256 rows and merges by
    elementwise max (KMV merges by union + re-rank of k rows) — the
    shape you want when millions of per-partition sketches roll up
    through a tree. Standard error 1.04/√m ≈ 6.5 % at m=256; the
    pytest pins |rel_err| within 3σ and merge == recompute.

    The exact count runs alongside as the oracle of the estimate (at
    100 TB you drop it and keep the 256-row sketch).
    """
    from sqlstreamstore_spark.analytics.dedup import exploded_shingles

    grams = exploded_shingles(documents, n, keys=()).localCheckpoint()  # feeds both the register build and the exact count
    est = hll_estimate(hll_registers(grams), m=256)
    exact = grams.agg(F.count_distinct("s").cast("bigint").alias("n_exact"))
    return (
        exact.join(est)  # two 1-row frames: trivial cross join
        .select(
            "n_exact",
            F.lit(256).cast("bigint").alias("m"),
            "n_hit",
            "z_scaled",
            "hll_estimate",
            "hll_corrected",
            (
                (F.col("hll_corrected") - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double")
            ).alias("rel_err"),
        )
    )


def bigram_logprob(documents: DataFrame) -> DataFrame:
    """Corpus-bigram language-model quality score with add-one (Laplace)
    smoothing — the next step up from :func:`unigram_logprob`: score
    each document by its mean ln P(cur | prev) where

        P(cur | prev) = (c(prev,cur) + 1) / (c(prev) + V)

    c(prev,cur) = corpus bigram count, c(prev) = corpus context count
    (sum of bigram counts starting at prev), V = corpus vocabulary
    size. Word-order-destroying corruption (shuffled text, template
    spam) scores far worse here than under the unigram model, which is
    blind to order.

    Float discipline (hash-matched vs DuckDB): every libm call takes
    exact integers (ln(c+1), ln(c_prev+V)) and the per-doc fold walks a
    SORTED array of integer-struct contributions — both engines add in
    identical order (the unigram_logprob discipline).

    Scale shape: bigrams come from a zip of two array slices (no
    shuffle, no self-join); counts are groupBy partial aggs keyed on
    (prev,cur) and prev; the doc-side joins are hash equi-joins; V and
    nothing else crosses as a 1-row broadcast. Bounded by distinct
    bigrams, never quadratic.
    """
    toks = documents.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    bg = (
        toks.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.expr("slice(w, 1, size(w) - 1)"),
                    F.expr("slice(w, 2, size(w) - 1)"),
                    lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur"))
    )
    vocab = (
        documents.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .agg(F.countDistinct("token").cast("bigint").alias("vocab"))
    )
    cbg = bg.groupBy("prev", "cur").agg(F.count("*").cast("bigint").alias("cb"))
    cctx = cbg.groupBy("prev").agg(F.sum("cb").cast("bigint").alias("cp"))
    per = bg.groupBy("doc_id", "prev", "cur").agg(
        F.count("*").cast("bigint").alias("m")
    )
    terms = (
        per.join(cbg, ["prev", "cur"])
        .join(cctx, "prev")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("cb", "cp", "m"))).alias("ts"),
            F.sum("m").cast("bigint").alias("n_bigrams"),
        )
    )
    s = F.aggregate(
        F.transform(
            F.col("ts"),
            lambda t: t["m"].cast("double")
            * (
                F.log(t["cb"].cast("double") + F.lit(1.0))
                - F.log((t["cp"] + F.col("vocab")).cast("double"))
            ),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    avg = s / F.col("n_bigrams").cast("double")
    return (
        terms.crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(avg, 7).alias("avg_logprob"),
            F.round(F.exp(-avg), 4).alias("ppl_proxy"),
        )
        .orderBy("doc_id")
    )


def kneser_ney_bigram(documents: DataFrame, discount: float = 0.75) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
    Chen & Goodman 1999 eq. 4.23) — the smoothing the CCNet-class
    perplexity filters actually use, one tier above the Laplace
    :func:`bigram_logprob`:

        P(cur | prev) = max(c(prev,cur) − D, 0) / c(prev)
                        + D·N1+(prev,·)/c(prev) · N1+(·,cur)/N1+(··)

    where N1+(prev,·) counts distinct continuations of ``prev``,
    N1+(·,cur) counts distinct CONTEXTS of ``cur`` (the continuation
    probability — "how novel are the places this word appears", the KN
    insight that demotes words frequent only inside one collocation),
    and N1+(··) is the total number of distinct bigram types. D = 0.75
    is the standard absolute discount (exactly representable in
    binary, so the arithmetic hash-matches the oracle).

    Scoring the corpus's own documents means every scored bigram has
    c ≥ 1 — the discounted term can hit zero but the continuation
    backoff never does, so ln is always defined.

    Float discipline: every input to the IEEE expression tree is an
    exact BIGINT (counts) or 0.75; the per-doc fold walks a SORTED
    array of integer-struct contributions — identical add order in
    both engines (the bigram_logprob discipline).

    Scale shape: identical to bigram_logprob — bigrams from a zip of
    two array slices (no shuffle), four partial-agg groupBys keyed on
    bigram/prev/cur (bounded by distinct types), hash equi-joins back
    to the doc axis, one 1-row broadcast (N1+(··)). Nothing quadratic,
    nothing driver-side."""
    toks = documents.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    bg = (
        toks.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.expr("slice(w, 1, size(w) - 1)"),
                    F.expr("slice(w, 2, size(w) - 1)"),
                    lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur"))
    )
    cbg = bg.groupBy("prev", "cur").agg(F.count("*").cast("bigint").alias("cb"))
    cctx = cbg.groupBy("prev").agg(
        F.sum("cb").cast("bigint").alias("cp"),
        F.count("*").cast("bigint").alias("n1p"),  # N1+(prev,·)
    )
    cont = cbg.groupBy("cur").agg(
        F.count("*").cast("bigint").alias("n1f")  # N1+(·,cur)
    )
    nbt = cbg.agg(F.count("*").cast("bigint").alias("nbt"))  # N1+(··)
    per = bg.groupBy("doc_id", "prev", "cur").agg(
        F.count("*").cast("bigint").alias("m")
    )
    terms = (
        per.join(cbg, ["prev", "cur"])
        .join(cctx, "prev")
        .join(cont, "cur")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("cb", "cp", "n1p", "n1f", "m"))
            ).alias("ts"),
            F.sum("m").cast("bigint").alias("n_bigrams"),
        )
    )
    d = F.lit(float(discount))

    def contrib(t):
        disc = F.greatest(t["cb"].cast("double") - d, F.lit(0.0)) / t[
            "cp"
        ].cast("double")
        lam = (d * t["n1p"].cast("double")) / t["cp"].cast("double")
        pcont = t["n1f"].cast("double") / F.col("nbt").cast("double")
        return t["m"].cast("double") * F.log(disc + lam * pcont)

    s = F.aggregate(
        F.transform(F.col("ts"), contrib), F.lit(0.0), lambda a, x: a + x
    )
    avg = s / F.col("n_bigrams").cast("double")
    return (
        terms.crossJoin(F.broadcast(nbt))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(avg, 7).alias("avg_logprob"),
            F.round(F.exp(-avg), 4).alias("ppl_proxy"),
        )
        .orderBy("doc_id")
    )


def collocations_pmi(
    documents: DataFrame, min_count: int = 5, k: int = 30
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over adjacent
    token pairs — the classic corpus-exploration signal (which word
    pairs co-occur far above chance), and the standard input to
    phrase-merging in tokenizer pipelines ("new york" → one unit).

    PMI is computed in bigram space: with N = total bigrams,
    c(a,·)/c(·,b) the start/end marginals and c(a,b) the pair count,
    PMI = ln( c(a,b)·N / (c(a,·)·c(·,b)) ).

    Determinism discipline: the RANKING key is the exact rational
    c(a,b)·N / (c(a,·)·c(·,b)) evaluated as one correctly-rounded
    double division of exact integer products (< 2^53) — identical in
    both engines, so top-k never flips on a libm ulp; ln() is applied
    once for display and rounded.

    Scale shape: two groupBy partial aggs over bigrams + two marginal
    aggs (vocab-bounded), equi-joins on single tokens, a 1-row N
    broadcast, and a global top-k (TakeOrderedAndProject — per-
    partition heaps, no full sort).
    """
    toks = documents.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    bg = (
        toks.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.expr("slice(w, 1, size(w) - 1)"),
                    F.expr("slice(w, 2, size(w) - 1)"),
                    lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
                )
            ).alias("b")
        )
        .select(F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur"))
    )
    cbg = bg.groupBy("prev", "cur").agg(F.count("*").cast("bigint").alias("cb"))
    cs = cbg.groupBy("prev").agg(F.sum("cb").cast("bigint").alias("cstart"))
    ce = cbg.groupBy("cur").agg(F.sum("cb").cast("bigint").alias("cend"))
    nb = cbg.agg(F.sum("cb").cast("bigint").alias("n_bigrams"))
    ratio = (F.col("cb") * F.col("n_bigrams")).cast("double") / (
        F.col("cstart") * F.col("cend")
    ).cast("double")
    return (
        cbg.filter(F.col("cb") >= min_count)
        .join(cs, "prev")
        .join(ce, "cur")
        .crossJoin(F.broadcast(nb))
        .select(
            "prev",
            "cur",
            "cb",
            ratio.alias("lift"),
            F.round(F.log(ratio), 7).alias("pmi"),
        )
        .orderBy(F.col("lift").desc(), "prev", "cur")
        .limit(k)
        .select("prev", "cur", "cb", F.round("lift", 9).alias("lift"), "pmi")
    )


def bm25_scores(
    documents: DataFrame,
    query_terms: tuple[str, ...] = ("spark", "table", "merge"),
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every matching document against a literal
    query — the lexical-retrieval scorer (Robertson/Spärck Jones
    probabilistic model, the BM25+ idf form ln(1 + (N−df+0.5)/(df+0.5))
    so scores stay positive). Output is EVERY matched doc ordered by
    doc_id, not a top-k: the score passes through ln(), and a top-k cut
    on a libm value could flip between engines on the last ulp — the
    cut belongs to the consumer (or re-rank rounded scores).

    Float discipline: idf inputs are exact integers ±0.5 (exact in
    binary64); the tf saturation term is IEEE-deterministic arithmetic
    on exact ints and literals; the per-doc fold walks a SORTED
    integer-struct array (the unigram_logprob discipline); round() on
    both engines absorbs libm ulps.

    Scale shape: the token explode filters to the query terms BEFORE
    any shuffle (a |terms|-size isin — the inverted-index probe, not a
    corpus scan per term); df and corpus stats are 1-row/|terms|-row
    broadcasts; per-doc state is bounded by |query_terms|.
    """
    toks = F.split(F.col("text"), " ")
    base = documents.filter(F.col("text").isNotNull()).select(
        "doc_id", toks.alias("w")
    )
    lens = base.select("doc_id", F.size("w").cast("bigint").alias("len_d"))
    stats = lens.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("len_d").cast("bigint").alias("total_len"),
    )
    tok = base.select("doc_id", F.explode("w").alias("t")).filter(
        F.col("t").isin(list(query_terms))
    )
    tf = tok.groupBy("doc_id", "t").agg(F.count("*").cast("bigint").alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count("*").cast("bigint").alias("df"))
    terms = (
        tf.join(F.broadcast(dfreq), "t")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "tf"))).alias("ts"),
            F.count("*").cast("bigint").alias("n_terms_matched"),
        )
    )
    joined = terms.join(lens, "doc_id").crossJoin(F.broadcast(stats))
    avg_len = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    denom_add = F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("len_d").cast("double") / avg_len
    )
    score = F.aggregate(
        F.transform(
            F.col("ts"),
            lambda t: F.log(
                F.lit(1.0)
                + (
                    (F.col("n_docs").cast("double") - t["df"].cast("double") + F.lit(0.5))
                    / (t["df"].cast("double") + F.lit(0.5))
                )
            )
            * (t["tf"].cast("double") * F.lit(k1 + 1.0))
            / (t["tf"].cast("double") + denom_add),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return joined.select(
        "doc_id",
        "n_terms_matched",
        F.round(score, 6).alias("bm25"),
    ).orderBy("doc_id")


def vocab_growth(documents: DataFrame, checkpoints: int = 50, n: int = 3) -> DataFrame:
    """Heaps-law vocabulary growth curve over word n-grams: how many
    NEW distinct grams each successive slice of the corpus contributes,
    and the cumulative vocabulary — the saturation signal ("is more
    data still buying new content?") curation teams read before
    extending a crawl. (Unit = 3-grams, the same novelty unit as
    `ngram_novelty`/KMV/HLL — single-word vocabularies saturate in the
    first slice of any corpus and carry no curve.)

    Each gram is attributed to its first document (min doc_id — one
    groupBy over the gram explode); first-docs bucket into
    ``checkpoints`` equal doc_id slices, so the running-total window is
    over a FIXED 50 rows at any corpus size (the cumulative_reach
    bounded-axis discipline — never a per-doc global window).
    All-integer, hash-exact.
    """
    from sqlstreamstore_spark.analytics.dedup import exploded_shingles

    nrows = documents.agg((F.max("doc_id") + 1).cast("bigint").alias("n"))
    firsts = (
        exploded_shingles(documents, n, alias="token")
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    per_bucket = (
        firsts.join(nrows)  # 1-row broadcast
        # integer floor-division on both engines (a double divide could
        # truncate differently at an exact-quotient boundary)
        .select(
            F.expr(f"(first_doc * {checkpoints}) DIV n").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_new_tokens"))
    )
    from pyspark.sql import Window

    wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per_bucket.select(
        "bucket",
        "n_new_tokens",
        F.sum("n_new_tokens").over(wc).cast("bigint").alias("vocab_cum"),
    ).orderBy("bucket")


def source_token_entropy(documents: DataFrame) -> DataFrame:
    """Per-source Shannon entropy of the token distribution, plus the
    ln(vocab)-normalized diversity index — the "is this source
    templated boilerplate" curation signal: a source whose pages are
    stamped from one template has low entropy relative to its
    vocabulary, however large it is.

    H = ln(N) − (Σ c·ln c)/N over the source's token counts; norm =
    H / ln(V) ∈ [0, 1] (V = vocabulary size; a single-token source
    maps to 0). Same float discipline as `unigram_logprob`: every libm
    call is on an exact integer, the per-source sum folds a SORTED
    array of per-token contributions sequentially, and the outputs
    round(7). Scale shape: one (source, token) partial agg, then a
    per-source fold bounded by the source's vocabulary (Heaps-bounded)
    — no joins, nothing global.
    """
    tok = documents.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    cnts = tok.groupBy("source", "token").agg(
        F.count("*").cast("bigint").alias("c")
    )
    terms = cnts.groupBy("source").agg(
        F.array_sort(F.collect_list(F.struct("c"))).alias("ts"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    s = F.aggregate(
        F.transform(
            F.col("ts"),
            lambda t: t["c"].cast("double") * F.log(t["c"].cast("double")),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    h = F.log(F.col("n_tokens").cast("double")) - s / F.col("n_tokens").cast(
        "double"
    )
    norm = F.when(F.col("vocab") > 1, h / F.log(F.col("vocab").cast("double"))).otherwise(
        F.lit(0.0)
    )
    return terms.select(
        "source",
        "n_tokens",
        "vocab",
        F.round(h, 7).alias("entropy"),
        F.round(norm, 7).alias("entropy_norm"),
    ).orderBy("source")


def js_divergence_by_source(
    documents: DataFrame, round_digits: int = 6
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source unigram
    distributions — the corpus-mixing diagnostic a training pipeline
    runs before weighting sources (JSD is symmetric, bounded by ln 2,
    and 0 iff the vocabularies match; KL alone blows up on any token
    one source lacks). JSD(P,Q) = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2;
    a token absent from one side contributes p·ln 2 exactly (its m is
    p/2), so no smoothing is needed.

    Exactness: token counts and totals are BIGINT; p, q are single
    divisions; the ln fold is rounded on both engines
    (stats_corr_regr). One shuffle keyed by (source, token); the pair
    join fans each token row out to the (tiny) source-pair set.

    Output: (source_a, source_b, n_tokens_union, jsd)."""
    tok = documents.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    counts = tok.groupBy("source", "token").agg(
        F.count("*").cast("bigint").alias("c")
    )
    totals = tok.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    a = counts.select(
        F.col("source").alias("source_a"), "token", F.col("c").alias("ca")
    )
    b = counts.select(
        F.col("source").alias("source_b"), "token", F.col("c").alias("cb")
    )
    # per-pair token UNION built explicitly — a plain full-outer on
    # token can't scope the union to each pair: every (pair, token)
    # with the token's count in each side (0 when absent)
    srcs = totals.select(F.col("source").alias("source_a"))
    pair_frame = (
        srcs.crossJoin(totals.select(F.col("source").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    toks_union = (
        counts.select("token").distinct().crossJoin(F.broadcast(pair_frame))
    )
    joined = (
        toks_union.join(
            a, ["source_a", "token"], "left"
        )
        .join(b, ["source_b", "token"], "left")
        .select(
            "source_a", "source_b", "token",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .filter((F.col("ca") > 0) | (F.col("cb") > 0))
    )
    ta = totals.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    tb = totals.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    x = joined.join(F.broadcast(ta), "source_a").join(F.broadcast(tb), "source_b")
    p = F.col("ca").cast("double") / F.col("na").cast("double")
    q = F.col("cb").cast("double") / F.col("nb").cast("double")
    m = (p + q) / F.lit(2.0)
    term = (
        F.when(F.col("ca") > 0, F.lit(0.5) * p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("cb") > 0, F.lit(0.5) * q * F.log(q / m)).otherwise(F.lit(0.0))
    )
    return (
        x.groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens_union"),
            F.round(F.sum(term), round_digits).alias("jsd"),
        )
        .orderBy("source_a", "source_b")
    )


def textrank_keywords(
    documents: DataFrame,
    window: int = 2,
    iters: int = 3,
    damping: float = 0.85,
    k: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    PageRank over the corpus-level word co-occurrence graph — words are
    nodes, an edge's weight is how often the two words appear within
    ``window`` positions in a document — then the top-k words by score.
    The graph-analytics composition: text.* builds the edges,
    graph.pagerank's power-method shape ranks them (weighted variant
    inlined here because TextRank normalizes by weighted out-degree,
    not edge count).

    Scale shape: the edge build is one self-join of the (doc, pos,
    token) frame on doc with a bounded position band (fan-out ≤ 2·window
    per token — never all-pairs), aggregated to the |V|² -bounded edge
    list; each of the fixed ``iters`` power iterations is one
    broadcast-scale join + groupBy over the vocabulary-sized graph.
    Scores are rounded on both engines (float fold order), and the
    top-k cut orders by (rounded score DESC, word) — total, so the cut
    set is deterministic.

    Output: (word, score, rk)."""
    from pyspark.sql import Window as W

    tokpos = documents.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )
    a = tokpos.select("doc_id", F.col("pos").alias("pa"), F.col("w").alias("wa"))
    b = tokpos.select("doc_id", F.col("pos").alias("pb"), F.col("w").alias("wb"))
    co = (
        a.join(b, "doc_id")
        .filter(
            (F.col("pb") > F.col("pa"))
            & (F.col("pb") <= F.col("pa") + window)
            & (F.col("wa") != F.col("wb"))
        )
        .groupBy(F.col("wa").alias("src"), F.col("wb").alias("dst"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    # undirected: symmetrize, merging both directions' counts
    edges = (
        co.select("src", "dst", "cnt")
        .unionByName(co.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "cnt"))
        .groupBy("src", "dst")
        .agg(F.sum("cnt").cast("double").alias("wgt"))
        .localCheckpoint()
    )
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n_nodes = nodes.count()
    wdeg = edges.groupBy("src").agg(F.sum("wgt").alias("wdeg"))
    weighted = edges.join(wdeg, "src").select(
        "src", "dst", (F.col("wgt") / F.col("wdeg")).alias("w")
    ).localCheckpoint()
    teleport = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    for _ in range(iters):
        contrib = (
            weighted.join(ranks, weighted.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w")).alias("mass"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))).alias("pr"),
            )
            .localCheckpoint()
        )
    w_rk = W.orderBy(F.desc("score"), F.col("word"))
    return (
        ranks.select(
            F.col("node").alias("word"),
            F.round("pr", round_digits).alias("score"),
        )
        .withColumn("rk", F.row_number().over(w_rk).cast("int"))
        .filter(F.col("rk") <= k)
        .orderBy("rk")
    )


def contamination_matrix(documents: DataFrame, n: int = 3) -> DataFrame:
    """Pairwise cross-source n-gram contamination: for every unordered
    source pair, the exact overlap of their distinct word n-gram sets —
    |A∩B|, directional containments, and Jaccard. This is the
    decontamination audit run between corpus slices (train vs eval
    crawls, vendor A vs vendor B) before mixing them into a training
    set; `text_jsd_sources` measures distributional drift, this
    measures literal shared text.

    Scale shape: the pair counts come from an inverted-index equi-join
    on the gram (each gram contributes #sources-containing-it choose 2
    pair rows, never |docs|²), partial-agg'd on (src_a, src_b). The
    per-source set sizes are one groupBy. Both joins key on bounded
    keys; at 100 TB the gram join's hot keys are boilerplate grams —
    cap them with the `max_shingle_df` discipline of
    `dedup.containment_pairs` if the corpus has template spam.

    All reported ratios are single IEEE divides of exact BIGINTs —
    zero-tolerance oracle.
    """
    from sqlstreamstore_spark.analytics.dedup import exploded_shingles

    sg = (
        exploded_shingles(with_min_parallelism(documents), n, alias="g", keys=("source",))
        .distinct()
        .localCheckpoint()  # feeds sizes AND the pair join — scan once
    )
    sizes = sg.groupBy("source").agg(F.count("*").cast("long").alias("n_grams"))
    a, b = sg.alias("a"), sg.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("source", "src_a").withColumnRenamed("n_grams", "n_a"), "src_a")
        .join(sizes.withColumnRenamed("source", "src_b").withColumnRenamed("n_grams", "n_b"), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_inter",
            (F.col("n_inter").cast("double") / F.col("n_a")).alias("contain_a_in_b"),
            (F.col("n_inter").cast("double") / F.col("n_b")).alias("contain_b_in_a"),
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


def stupid_backoff_scores(documents: DataFrame, alpha: float = 0.4) -> DataFrame:
    """Trigram language-model scoring with Stupid Backoff (Brants et
    al. 2007 — the LM built for corpus-scale MapReduce counting, no
    normalization, no discounting): score held-out documents against
    counts from the rest of the corpus,

        S(w3|w1w2) = c(w1w2w3)/c(w1w2)            if c(w1w2w3) > 0
                   = α · c(w2w3)/c(w2)            elif c(w2w3) > 0
                   = α² · (c(w3)+1)/(N+V)         otherwise (add-one,
                                                  so unseen w3 is finite)

    Split: doc_id % 5 == 0 is the held-out slice, the rest train the
    counts — deterministic in both engines, and the held-out docs DO
    hit the backoff tiers (self-scoring never would: every trigram
    would be its own evidence). Per-doc output = mean ln S plus the
    tier histogram — the LM-quality filter shape used to rank crawl
    snapshots before training.

    Float discipline: ln() only ever takes exact integers or the
    literal α; the per-doc fold walks a SORTED array of integer-struct
    contributions (the `bigram_logprob` discipline), so both engines
    add identical doubles in identical order.

    Scale shape: counting is three partial-agg shuffles (trigram,
    bigram, unigram keys); scoring is equi-joins of the eval trigrams
    against those count tables (inverted-index probes, never
    quadratic); N and V cross as a one-row broadcast.
    """
    toks = documents.select(
        "doc_id", (F.col("doc_id") % 5 == 0).alias("held_out"), F.split(F.col("text"), " ").alias("w")
    )
    tri = toks.filter(F.size("w") >= 3).select(
        "doc_id",
        "held_out",
        F.explode(
            F.zip_with(
                F.expr("slice(w, 1, size(w) - 2)"),
                F.zip_with(
                    F.expr("slice(w, 2, size(w) - 2)"),
                    F.expr("slice(w, 3, size(w) - 2)"),
                    lambda b, c: F.struct(b.alias("w2"), c.alias("w3")),
                ),
                lambda a, bc: F.struct(
                    a.alias("w1"), bc["w2"].alias("w2"), bc["w3"].alias("w3")
                ),
            )
        ).alias("t"),
    ).select("doc_id", "held_out", "t.w1", "t.w2", "t.w3")
    bi = toks.filter(F.size("w") >= 2).select(
        "held_out",
        F.explode(
            F.zip_with(
                F.expr("slice(w, 1, size(w) - 1)"),
                F.expr("slice(w, 2, size(w) - 1)"),
                lambda a, b: F.struct(a.alias("b1"), b.alias("b2")),
            )
        ).alias("b"),
    ).select("held_out", "b.b1", "b.b2")
    uni = toks.select("held_out", F.explode("w").alias("u"))

    c3 = (
        tri.filter(~F.col("held_out"))
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").cast("long").alias("c123"))
    )
    c2 = (
        bi.filter(~F.col("held_out"))
        .groupBy("b1", "b2")
        .agg(F.count("*").cast("long").alias("cb"))
    )
    c1 = (
        uni.filter(~F.col("held_out"))
        .groupBy("u")
        .agg(F.count("*").cast("long").alias("cu"))
    )
    scal = uni.filter(~F.col("held_out")).agg(
        F.count("*").cast("long").alias("n_train"),
        F.countDistinct("u").cast("long").alias("vocab"),
    )

    ev = (
        tri.filter(F.col("held_out"))
        .groupBy("doc_id", "w1", "w2", "w3")
        .agg(F.count("*").cast("long").alias("m"))
        .join(c3, ["w1", "w2", "w3"], "left")
        .join(
            c2.select(F.col("b1").alias("w1"), F.col("b2").alias("w2"), F.col("cb").alias("c12")),
            ["w1", "w2"],
            "left",
        )
        .join(
            c2.select(F.col("b1").alias("w2"), F.col("b2").alias("w3"), F.col("cb").alias("c23")),
            ["w2", "w3"],
            "left",
        )
        .join(c1.select(F.col("u").alias("w2"), F.col("cu").alias("cw2")), ["w2"], "left")
        .join(c1.select(F.col("u").alias("w3"), F.col("cu").alias("cw3")), ["w3"], "left")
        .select(
            "doc_id",
            "m",
            F.coalesce("c123", F.lit(0)).alias("c123"),
            F.coalesce("c12", F.lit(0)).alias("c12"),
            F.coalesce("c23", F.lit(0)).alias("c23"),
            F.coalesce("cw2", F.lit(0)).alias("cw2"),
            F.coalesce("cw3", F.lit(0)).alias("cw3"),
        )
    )
    per = ev.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("c123", "c12", "c23", "cw2", "cw3", "m"))
        ).alias("ts"),
        F.sum("m").cast("long").alias("n_trigrams"),
        F.sum(F.when(F.col("c123") > 0, F.col("m")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_tier1"),
        F.sum(
            F.when((F.col("c123") == 0) & (F.col("c23") > 0), F.col("m")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_tier2"),
        F.sum(
            F.when((F.col("c123") == 0) & (F.col("c23") == 0), F.col("m")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_tier3"),
    )
    la = F.log(F.lit(float(alpha)))
    contrib = lambda t: t["m"].cast("double") * (
        F.when(
            t["c123"] > 0,
            F.log(t["c123"].cast("double")) - F.log(t["c12"].cast("double")),
        )
        .when(
            t["c23"] > 0,
            la + F.log(t["c23"].cast("double")) - F.log(t["cw2"].cast("double")),
        )
        .otherwise(
            F.lit(2.0) * la
            + F.log(t["cw3"].cast("double") + F.lit(1.0))
            - F.log((F.col("n_train") + F.col("vocab")).cast("double"))
        )
    )
    s = F.aggregate(
        F.transform(F.col("ts"), contrib), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        per.crossJoin(F.broadcast(scal))
        .select(
            "doc_id",
            "n_trigrams",
            "n_tier1",
            "n_tier2",
            "n_tier3",
            F.round(s / F.col("n_trigrams").cast("double"), 7).alias("avg_logscore"),
        )
        .orderBy("doc_id")
    )


def kmv_jaccard_pairs(documents: DataFrame, k: int = 32, n: int = 3) -> DataFrame:
    """Sketch set-ALGEBRA: estimate the pairwise Jaccard similarity of
    every two sources' n-gram sets from their k-minimum-values sketches
    alone, next to the exact answer. This is the property that makes
    KMV the working sketch for corpus governance: `kmv_*_by_source`
    showed the sketches union; here they INTERSECT — J ≈ |{h ∈ A_k ∩
    B_k : h ≤ τ}| / k with τ the k-th smallest of A_k ∪ B_k (Beyer et
    al. 2007). At 100 TB you compare every pair of crawl snapshots
    from 20 × k hashes without rescanning anything; the exact column
    exists only as the oracle of the estimate.

    When the merged sketch holds fewer than k hashes the pair's domain
    is small enough that the sketch IS the union — the estimator falls
    back to the exact small-set ratio.

    Everything is md5-hex ordering + integer counts + one divide per
    ratio: deterministic in both engines, zero-tolerance oracle.
    """
    from pyspark.sql import Window

    from sqlstreamstore_spark.analytics.dedup import exploded_shingles

    hs = (
        exploded_shingles(with_min_parallelism(documents), n, alias="g", keys=("source",))
        .select("source", F.md5(F.col("g")).alias("h"))
        .distinct()
        .localCheckpoint()  # feeds sketches AND exact pair counts
    )
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        hs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        # barrier (r12 optimization): the k-sketch (k rows per source)
        # is referenced by both union sides, both common sides and the
        # pair spine — one rank pass instead of five
        .localCheckpoint(eager=False)
    )

    # exact pair overlap (the oracle target): inverted-index join on h
    a, b = hs.alias("a"), hs.alias("b")
    exact = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sizes = hs.groupBy("source").agg(F.count("*").cast("long").alias("n_set"))

    # sketch-side: per-pair union of the two k-sketches
    sa, sb = sk.alias("sa"), sk.alias("sb")
    pairs = (
        sa.select(F.col("source").alias("src_a"))
        .distinct()
        .join(sb.select(F.col("source").alias("src_b")).distinct())
        .filter(F.col("src_a") < F.col("src_b"))
    )
    u = pairs.join(sk.withColumnRenamed("source", "src_a"), "src_a").select(
        "src_a", "src_b", "h"
    ).unionByName(
        pairs.join(sk.withColumnRenamed("source", "src_b"), "src_b").select(
            "src_a", "src_b", "h"
        )
    )
    wu = Window.partitionBy("src_a", "src_b").orderBy("h")
    ranked = u.distinct().withColumn("rn", F.row_number().over(wu))
    tau = ranked.groupBy("src_a", "src_b").agg(
        F.max(F.when(F.col("rn") <= k, F.col("h"))).alias("tau"),
        F.count("*").cast("long").alias("n_union_sk"),
    )
    common = (
        sa.join(
            sb,
            (F.col("sa.h") == F.col("sb.h")) & (F.col("sa.source") < F.col("sb.source")),
        )
        .select(
            F.col("sa.source").alias("src_a"),
            F.col("sb.source").alias("src_b"),
            F.col("sa.h").alias("h"),
        )
        .join(tau, ["src_a", "src_b"])
        .filter(F.col("h") <= F.col("tau"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_common_le_tau"))
    )
    j_est = F.when(
        F.col("n_union_sk") < k,
        F.col("n_common_le_tau").cast("double") / F.col("n_union_sk"),
    ).otherwise(F.col("n_common_le_tau").cast("double") / F.lit(float(k)))
    j_exact = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        tau.join(common, ["src_a", "src_b"], "left")
        .withColumn("n_common_le_tau", F.coalesce("n_common_le_tau", F.lit(0)))
        .join(exact, ["src_a", "src_b"], "left")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0)))
        .join(sizes.select(F.col("source").alias("src_a"), F.col("n_set").alias("n_a")), "src_a")
        .join(sizes.select(F.col("source").alias("src_b"), F.col("n_set").alias("n_b")), "src_b")
        .select(
            "src_a",
            "src_b",
            F.lit(k).cast("long").alias("k"),
            "n_common_le_tau",
            j_est.alias("j_est"),
            j_exact.alias("j_exact"),
            (j_est - j_exact).alias("err"),
        )
        .orderBy("src_a", "src_b")
    )


def log_odds_enrichment(documents: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Which tokens are characteristic of each language slice — the
    Monroe/Colaresi/Quinn "Fightin' Words" log-odds ratio with a
    Dirichlet prior (uninformative α here), the statistically-grounded
    replacement for raw tf-idf contrast when curating per-language
    corpus mixes:

        δ_iw = ln( (y_iw+α) / (n_i+αV − y_iw−α) )
             − ln( (y_w−y_iw+α) / (n−n_i+αV − (y_w−y_iw)−α) )
        z_iw = δ_iw / sqrt( 1/(y_iw+α) + 1/(y_w−y_iw+α) )

    (y_iw token count in slice i, n_i slice total, y_w corpus count,
    n corpus total, V vocab size.) Emitted for every PRESENT
    (lang, token) pair — no top-k cut on a libm value (the BM25 ulp
    discipline); δ and z round to 6 dp on both engines.

    Scale shape: three partial-agg count shuffles (lang×token, lang,
    token) + equi-joins back; n and V cross as a one-row broadcast.
    The output axis is |langs| × |vocab| — the bounded contrast
    matrix, never document-scale.
    """
    tok = documents.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    y_iw = tok.groupBy("lang", "token").agg(F.count("*").cast("long").alias("y_iw"))
    n_i = tok.groupBy("lang").agg(F.count("*").cast("long").alias("n_i"))
    y_w = tok.groupBy("token").agg(F.count("*").cast("long").alias("y_w"))
    scal = tok.agg(
        F.count("*").cast("long").alias("n_tot"),
        F.countDistinct("token").cast("long").alias("v"),
    )
    a = F.lit(float(alpha))
    av = a * F.col("v")
    rest = F.col("y_w") - F.col("y_iw")
    delta = (
        F.log((F.col("y_iw") + a) / (F.col("n_i") + av - F.col("y_iw") - a))
        - F.log(
            (rest + a) / (F.col("n_tot") - F.col("n_i") + av - rest - a)
        )
    )
    var = F.lit(1.0) / (F.col("y_iw") + a) + F.lit(1.0) / (rest + a)
    return (
        y_iw.join(n_i, "lang")
        .join(y_w, "token")
        .crossJoin(F.broadcast(scal))
        .select(
            "lang",
            "token",
            "y_iw",
            rest.alias("y_rest"),
            F.round(delta, 6).alias("log_odds"),
            F.round(delta / F.sqrt(var), 6).alias("z"),
        )
        .orderBy("lang", "token")
    )


def zipf_fit(documents: DataFrame) -> DataFrame:
    """Zipf's-law diagnostic: OLS fit of ln(freq) against ln(rank)
    over the token frequency table — natural corpora fit a slope near
    −1; template spam, dedup failures, and synthetic filler bend the
    curve (too flat = suspiciously uniform vocabulary, too steep =
    few tokens dominating). One row: vocab size, fitted slope,
    intercept, and r².

    Determinism: ranks are exact (count desc, token tie-break — never
    a cut on a libm value), ln() takes exact BIGINTs, and the five
    OLS moment sums fold over ONE sorted struct array so both engines
    add identical doubles in identical order; the fit rounds to 6 dp.

    Scale shape: the count shuffle is vocab-keyed; the rank pass and
    the moment fold operate on the VOCAB table, not the corpus — at
    100 TB vocab is millions of rows, at which point the collected
    fold should hand off to the two-phase cumsum rank (the
    with_dense_global_index path) — bounded here by the profiled
    vocabulary either way."""
    from pyspark.sql import Window

    counts = (
        documents.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = Window.orderBy(F.desc("c"), F.col("token"))
    ranked = counts.select(
        F.row_number().over(w).cast("long").alias("rank"), "c"
    )
    folded = ranked.agg(
        F.array_sort(F.collect_list(F.struct("rank", "c"))).alias("ts"),
        F.count("*").cast("long").alias("vocab"),
    )
    x = lambda t: F.log(t["rank"].cast("double"))
    y = lambda t: F.log(t["c"].cast("double"))
    s = lambda f: F.aggregate(
        F.col("ts"), F.lit(0.0), lambda acc, t: acc + f(t)
    )
    m = folded.select(
        "vocab",
        s(x).alias("sx"),
        s(y).alias("sy"),
        s(lambda t: x(t) * y(t)).alias("sxy"),
        s(lambda t: x(t) * x(t)).alias("sxx"),
        s(lambda t: y(t) * y(t)).alias("syy"),
    )
    n = F.col("vocab").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "vocab",
        F.round(cov / varx, 6).alias("slope"),
        F.round((F.col("sy") - (cov / varx) * F.col("sx")) / n, 6).alias("intercept"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
    )


def token_burstiness(documents: DataFrame) -> DataFrame:
    """Per-token burstiness (Church & Gale): the Fano factor
    var/mean of the token's per-document count, zeros included.
    Content words are bursty (they recur within the documents that
    mention them, F >> 1); function words and template boilerplate are
    Poisson-ish (F ≈ 1) — a signal the tf-idf/stopword heuristics
    approximate and this measures exactly.

    All accumulations are BIGINT (Σc, Σc² over per-doc counts; zeros
    contribute nothing to either, so only present (doc, token) pairs
    are scanned); mean/var/fano are fixed-shape IEEE expressions on
    those exact sums — zero-tolerance oracle, no rounding.

    Scale shape: one (doc, token) partial agg, one token-keyed agg, a
    one-row broadcast for N. Output is vocab-bounded."""
    per_doc = (
        documents.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    n_docs = documents.agg(F.count("*").cast("long").alias("n_docs"))
    mean = F.col("total").cast("double") / F.col("n_docs")
    var = F.col("sum_sq").cast("double") / F.col("n_docs") - mean * mean
    return (
        per_doc.groupBy("token")
        .agg(
            F.sum("c").cast("long").alias("total"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
            F.count("*").cast("long").alias("df"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "total",
            "df",
            mean.alias("mean_count"),
            var.alias("var_count"),
            (var / mean).alias("fano"),
        )
        .orderBy("token")
    )


def trending_tokens(documents: DataFrame, min_total: int = 5) -> DataFrame:
    """Heavy-hitter CHANGE detection between two corpus epochs — what
    moved, not what's big (the static top-k is text_heavy_hitters):
    docs split into epochs by doc_id parity (deterministic, oracle-
    replayable; swap in an ingest-date column on real data), per-token
    counts contrasted with the add-one log-ratio

        score = ln((c1 + 1) / (c0 + 1))

    positive = trending up in the later epoch. Counts are exact
    BIGINTs; the ratio is double(int)/double(int); ln is the one libm
    call, rounded at 9 (cross-libm last-bit discipline). Low-volume
    noise is cut by a TOTAL-count floor — a threshold on exact
    integers, not on the float score, so the row set is engine-
    independent.

    Shape: one explode + one (token, epoch) partial agg pivoted to the
    vocab-bounded axis."""
    toks = documents.select(
        (F.col("doc_id") % 2).alias("epoch"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    )
    g = toks.groupBy("token").agg(
        F.sum(F.when(F.col("epoch") == 0, 1).otherwise(0)).cast("long").alias("c0"),
        F.sum(F.when(F.col("epoch") == 1, 1).otherwise(0)).cast("long").alias("c1"),
    )
    return (
        g.filter(F.col("c0") + F.col("c1") >= min_total)
        .select(
            "token",
            "c0",
            "c1",
            F.round(
                F.log(
                    (F.col("c1") + 1).cast("double") / (F.col("c0") + 1).cast("double")
                ),
                9,
            ).alias("trend_score"),
        )
        .orderBy("token")
    )


def vocab_coverage(documents: DataFrame, ks: tuple = (10, 100, 500)) -> DataFrame:
    """Vocabulary coverage curve over corpus BIGRAMS — the tokenizer-
    sizing question ("how much of the corpus do the top-k entries
    cover?") answered exactly: bigram frequencies ranked descending
    (count desc, gram asc — a total order), cumulative coverage via
    the two-phase global cumsum, reported at the requested k cut
    points. Coverage ratios are exact BIGINT divides — zero-tolerance
    oracle.

    Scale shape: one explode + partial agg onto the bigram vocab, then
    the rank and running totals are BOTH two-phase range-partitioned
    passes over the vocab table (never a single-partition window over
    a 100 TB-derived vocabulary)."""
    from sqlstreamstore_spark.operators.positions import (
        with_global_rank_and_cumsum,
    )

    w = F.split(F.col("text"), " ")
    # zip_with over two slices, NOT transform+element_at: per-index
    # element_at re-walks the array (O(n^2) per doc) and measured 5.7x
    # slower at sf0.1; the 1-token guard also avoids slice(len-1 = 0)
    grams = documents.filter(F.size(w) >= 2).select(
        F.explode(
            F.zip_with(
                F.slice(w, 1, F.size(w) - 1),
                F.slice(w, 2, F.size(w) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("gram")
    )
    freq = grams.groupBy("gram").agg(F.count("*").cast("long").alias("cnt"))
    order = [F.col("cnt").desc(), F.col("gram")]
    # rank + running total over the SAME order in one two-phase pass
    cum = with_global_rank_and_cumsum(freq, order, "cnt", "ix", "covered")
    totals = freq.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count("*").cast("long").alias("vocab_size"),
    )
    return (
        cum.filter((F.col("ix") + 1).isin(*ks))
        .crossJoin(F.broadcast(totals))
        .select(
            (F.col("ix") + 1).cast("long").alias("k"),
            "vocab_size",
            "covered",
            "total",
            (F.col("covered").cast("double") / F.col("total")).alias("coverage"),
        )
        .orderBy("k")
    )


def lexical_richness(documents: DataFrame) -> DataFrame:
    """Per-source lexical richness — the corpus-health numbers a data
    curator compares across sources before mixing them: token count,
    type (distinct-token) count, type-token ratio, and hapax share
    (fraction of types seen exactly once — high hapax = rich or noisy,
    near-zero = templated/boilerplate). All exact integers + two
    divides — zero-tolerance oracle.

    Shape: one explode + (source, token) partial agg; the type/hapax
    rollup lands on the bounded source axis."""
    toks = documents.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    st = toks.groupBy("source", "token").agg(
        F.count("*").cast("long").alias("cnt")
    )
    return (
        st.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            (F.col("n_types").cast("double") / F.col("n_tokens")).alias("ttr"),
            (F.col("n_hapax").cast("double") / F.col("n_types")).alias(
                "hapax_share"
            ),
        )
        .orderBy("source")
    )


def hill_tail_index(documents: DataFrame, k: int = 50) -> DataFrame:
    """Hill estimator of the token-frequency tail index — the
    principled check on the Zipf OLS fit (text_zipf_fit): for the
    top-k order statistics f_(1) >= ... >= f_(k) with threshold
    f_(k+1),

        alpha_hill = k / sum_{i<=k} ln(f_(i) / f_(k+1))

    Power-law tails give alpha ~= the Zipf slope's inverse; agreement
    between the two estimators is the corpus-shape sanity test. Top-k
    selection is rank-exact (two-phase dense index — never a global
    sort); the one float fold is a k-term ln sum, rounded at 9 (the
    cross-engine partial-sum discipline).

    Frequencies are BIGRAM counts (the unigram vocab is a closed
    31-word set on the fixture — no tail to estimate; bigrams give a
    ~900-type distribution with a real tail). Output: one row
    (k, f_threshold, alpha_hill)."""
    from sqlstreamstore_spark.operators.positions import with_dense_global_index

    w = F.split(F.col("text"), " ")
    freq = (
        documents.filter(F.size(w) >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(w, 1, F.size(w) - 1),
                    F.slice(w, 2, F.size(w) - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("f"))
    )
    ranked = with_dense_global_index(
        freq, [F.col("f").desc(), F.col("token")], "ix"
    )
    thresh = F.broadcast(
        ranked.filter(F.col("ix") == k).select(
            F.col("f").alias("f_threshold")
        )
    )
    top = ranked.filter(F.col("ix") < k).crossJoin(thresh)
    return top.agg(
        F.count("*").cast("long").alias("k"),
        F.max("f_threshold").alias("f_threshold"),
        F.round(
            F.count("*")
            / F.sum(F.log(F.col("f").cast("double") / F.col("f_threshold"))),
            9,
        ).alias("alpha_hill"),
    )


def tokenizer_fertility(documents: DataFrame) -> DataFrame:
    """Tokenizer fertility per source — the cost model behind every
    token-budget decision: how many (BPE-ish regex) tokens the
    tokenizer emits per whitespace word, and how many characters ride
    in each token. High-fertility sources (code, non-English,
    symbol-heavy text) consume budget faster than their word counts
    suggest; this report is the per-source correction factor.

    One partial-agg groupBy onto the bounded source axis; all sums are
    exact BIGINT, each reported ratio one IEEE divide — zero-tolerance
    oracle."""
    words = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-zA-Z]+"), 0))
    numbers = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]+"), 0))
    symbols = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^a-zA-Z0-9\s]"), 0))
    bpeish = (words + numbers + symbols).cast("long")
    g = documents.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(_tokens()).cast("long")).cast("long").alias("ws_tokens"),
        F.sum(words.cast("long")).cast("long").alias("word_tokens"),
        F.sum(bpeish).cast("long").alias("bpeish_tokens"),
        F.sum(F.length("text").cast("long")).cast("long").alias("n_chars"),
    )
    return g.select(
        "source",
        "n_docs",
        "ws_tokens",
        "word_tokens",
        "bpeish_tokens",
        "n_chars",
        (F.col("bpeish_tokens").cast("double") / F.col("word_tokens").cast("double"))
        .alias("fertility"),
        (F.col("n_chars").cast("double") / F.col("bpeish_tokens").cast("double"))
        .alias("chars_per_token"),
        (F.col("bpeish_tokens").cast("double") / F.col("ws_tokens").cast("double"))
        .alias("bpe_per_ws_token"),
    ).orderBy("source")


def sif_hashed_features(
    documents: DataFrame, dim: int = 64, a: float = 1e-3
) -> DataFrame:
    """SIF-weighted feature hashing (Arora et al., "A Simple but
    Tough-to-Beat Baseline for Sentence Embeddings", ICLR 2017): the
    hashing-trick vectorizer with every token downweighted by
    w(t) = a/(a + p(t)) — frequent tokens (stopwords) contribute
    almost nothing, rare content words dominate, which is what makes
    SIF vectors a strong model-free retrieval baseline. Same md5
    bucket/sign family as :func:`hashed_embedding_features`, so the
    whole ANN stack runs on the weighted vectors unchanged.

    Exactness: the per-token weight is INTEGER-SCALED —
    floor(10⁶·w(t)), a deterministic scalar on both engines — so the
    per-(doc, bucket) accumulation is an EXACT BIGINT sum (immune to
    float partial-sum order) and one divide per output cell restores
    the scale: zero-tolerance oracle despite float weights. Scale
    shape: the weight table is VOCABULARY-sized and broadcasts (the
    tf-idf precedent); token explode collapses map-side into
    (doc, bucket) partials."""
    hexs = "0123456789abcdef"
    toks = documents.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    ).filter(F.col("t") != "")
    freq = toks.groupBy("t").agg(F.count("*").cast("long").alias("tf"))
    tot = toks.agg(F.count("*").cast("long").alias("__tot"))
    ws = (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "t",
            F.floor(
                F.lit(1_000_000.0)
                * F.lit(float(a))
                / (
                    F.lit(float(a))
                    + F.col("tf").cast("double") / F.col("__tot").cast("double")
                )
            )
            .cast("long")
            .alias("ws"),
        )
    )
    h = F.md5(F.col("t"))
    v = [
        F.instr(F.lit(hexs), F.substring(h, i, 1)) - 1
        for i in (1, 2, 3)
    ]
    bucket = ((v[0] * 16 + v[1]) % dim).cast("int")
    sign = F.when(v[2] < 8, F.lit(1)).otherwise(F.lit(-1)).cast("long")
    return (
        toks.join(F.broadcast(ws), "t")
        .select("doc_id", bucket.alias("bucket"), (sign * F.col("ws")).alias("c"))
        .groupBy("doc_id", "bucket")
        .agg(
            (F.sum("c").cast("double") / F.lit(1_000_000.0)).alias("weight")
        )
        .orderBy("doc_id", "bucket")
    )


# --------------------------------------------------- round-10b tier


def readability_by_source(documents: DataFrame) -> DataFrame:
    """Flesch reading-ease per source with a vowel-group syllable
    proxy — the classic curation heuristic (very low scores flag
    boilerplate/code, implausibly high ones flag token soup): 206.835
    − 1.015·(words/sentences) − 84.6·(syllables/words), sentences from
    the [.!?]+ terminator count (min 1), syllables = [aeiouy]+ group
    count. All exact BIGINT sums per source + single divides and the
    identical literal expression tree in the oracle — zero-tolerance.
    Scale: one regexp pass per doc, one bounded-axis groupBy."""
    toks = _tokens()
    per = documents.select(
        "source",
        F.size(toks).cast("long").alias("w"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)),
            F.lit(1),
        ).cast("long").alias("s"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), 0)
        ).cast("long").alias("syl"),
    )
    g = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("words"),
        F.sum("s").cast("long").alias("sentences"),
        F.sum("syl").cast("long").alias("syllables"),
    )
    wps = F.col("words").cast("double") / F.col("sentences").cast("double")
    spw = F.col("syllables").cast("double") / F.col("words").cast("double")
    return g.select(
        "source", "n_docs", "words", "sentences", "syllables",
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias(
            "flesch"
        ),
    ).orderBy("source")
