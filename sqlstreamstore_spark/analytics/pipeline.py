"""End-to-end training-data corpus cleaning — the composition a real
pipeline runs, as one declarative plan:

    quality gate  →  exact dedup (md5 keeper)  →  near-dup removal
    (n-gram Jaccard pairs, keep-lowest-id)     →  surviving doc ids

Every stage is a DataFrame transform on the previous stage's output, so
Catalyst sees one plan: the quality predicate prunes before any shuffle,
the dedup group-by shuffles 16-byte digests (never text), and the
near-dup stage's shingle self-join only receives survivors. Greedy
keep-lowest-id pair removal (drop every doc that appears as the higher
id of a qualifying pair) is the deterministic, SQL-expressible variant
of near-dup pruning; component-based clustering is dedup.
connected_components / near_dup_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sqlstreamstore_spark.analytics.dedup import ngram_jaccard_pairs
from sqlstreamstore_spark.analytics.text import _tokens


def clean_corpus(
    documents: DataFrame,
    min_tokens: int = 5,
    min_distinct_ratio: float = 0.3,
    jaccard_threshold: float = 0.5,
    ngram: int = 3,
) -> DataFrame:
    """Returns the surviving (doc_id) set, ordered. See module doc."""
    toks = _tokens()
    n_tokens = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens.cast("double")

    quality = documents.filter(
        (n_tokens >= min_tokens) & (distinct_ratio >= min_distinct_ratio)
    )

    w = Window.partitionBy("__h").orderBy("doc_id")
    exact_keepers = (
        quality.withColumn("__h", F.md5(F.col("text")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
        # r12 (guide §2.1): referenced by BOTH n-gram self-join sides
        # and the final anti-join — the quality+first-wins subtree ran
        # three times per consumer (retention_by_source doubled it
        # again); one lazy barrier, all branches read it
        .localCheckpoint(eager=False)
    )

    pairs = ngram_jaccard_pairs(exact_keepers, n=ngram, threshold=jaccard_threshold)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        exact_keepers.join(losers, "doc_id", "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


def decontaminate_report(
    documents: DataFrame,
    key: str = "doc_id",
    n: int = 8,
    train_fraction: float = 0.9,
    broadcast_held_out: bool = True,
) -> DataFrame:
    """Benchmark decontamination: which train-split documents share any
    word n-gram with a held-out (val) document, and how many distinct
    n-grams leak. The standard pre-training hygiene pass — the actual
    filter is an anti-join of train against this report.

    Shape: hash split → shingle both sides → equi-join on the n-gram →
    per-doc distinct-leak count. The held-out side is a benchmark
    corpus — dim-sized at any data scale — so its distinct shingles
    broadcast and the train-side shingles never shuffle (pass
    ``broadcast_held_out=False`` for the shuffled equi-join if the
    held-out set is genuinely large).
    """
    from sqlstreamstore_spark.analytics.dedup import exploded_shingles
    from sqlstreamstore_spark.analytics.sampling import hash_split

    split = hash_split(documents, key, train_fraction)
    train = split.filter(F.col("split") == "train")
    held_out = split.filter(F.col("split") == "val")
    tr_sh = exploded_shingles(train, n).select(
        F.col("doc_id").alias("train_doc_id"), "s"
    )
    te_sh = exploded_shingles(held_out, n, keys=()).distinct()
    if broadcast_held_out:
        te_sh = F.broadcast(te_sh)
    return (
        tr_sh.join(te_sh, "s")
        .groupBy("train_doc_id")
        .agg(F.count("*").alias("n_leaked_ngrams"))
        .orderBy("train_doc_id")
    )


def build_ngram_index(benchmark: DataFrame, path: str, n: int = 8) -> None:
    """Materialize the benchmark suite's DISTINCT n-gram digests
    (16-byte md5 rows) — the decontamination side table a crawl
    pipeline builds ONCE per eval-suite release and probes with every
    ingest delta (:func:`decontaminate_incremental`). Eval suites are
    dim-sized at any corpus scale, so the index is broadcastable by
    construction."""
    from sqlstreamstore_spark.analytics.dedup import exploded_shingles

    (
        exploded_shingles(benchmark, n, keys=())
        .select(F.md5("s").alias("g"))
        .distinct()
        .write.mode("overwrite")
        .parquet(path)
    )


def decontaminate_incremental(
    spark,
    path: str,
    incoming: DataFrame,
    n: int = 8,
    broadcast_index: bool = True,
) -> DataFrame:
    """Decontamination-ON-INGEST (round 9) — the incremental twin of
    :func:`decontaminate_report`: which INCOMING documents share any
    word n-gram with the MATERIALIZED benchmark index
    (:func:`build_ngram_index`), and how many distinct n-grams leak.
    A crawl pipeline runs this on every delta so benchmark text never
    enters the training corpus; the actual filter is a left-anti join
    of the delta against this report's doc_ids.

    Scale shape: the delta's distinct per-doc grams collapse to 16-byte
    digests before the join; the index side (dim-sized — an eval
    suite, not a corpus) BROADCASTS, so the delta never shuffles and
    the work is one map-side hash probe per delta gram. Per-doc counts
    are a partial-aggregable groupBy on doc_id. Work ∝ delta tokens,
    never corpus or benchmark scan cost (the index was materialized
    once)."""
    from sqlstreamstore_spark.analytics.dedup import exploded_shingles

    idx = spark.read.parquet(path)
    if broadcast_index:
        idx = F.broadcast(idx)
    inc = exploded_shingles(incoming, n).select(
        "doc_id", F.md5("s").alias("g")
    )
    return (
        inc.join(idx, "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_leaked_ngrams"))
        .orderBy("doc_id")
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    shard_rows: int = 100_000,
    order_cols: list[str] | None = None,
) -> dict[str, int]:
    """Write the corpus as deterministic fixed-size training shards:
    rows sorted by ``order_cols`` (default: all columns' stable key is
    the first column), assigned shard_id = global_rank // shard_rows,
    written as ``shard_id=N/`` parquet partitions.

    Deterministic: the same input always produces byte-identical shard
    membership (dense global rank via the two-phase index — no
    single-partition funnel, operators/positions.py). A training job
    then reads ``path`` with partition pruning on shard_id, or streams
    shards in order.

    Returns {"n_rows": ..., "n_shards": ...}.
    """
    from sqlstreamstore_spark.operators.positions import dense_global_index_pinned

    order_cols = order_cols or [df.columns[0]]
    indexed, pinned = dense_global_index_pinned(df, list(order_cols), index_col="__rank")
    sharded = indexed.withColumn(
        "shard_id", (F.col("__rank") / F.lit(shard_rows)).cast("long")
    ).drop("__rank")
    try:
        (
            sharded.repartition("shard_id")
            .write.mode("overwrite")
            .partitionBy("shard_id")
            .parquet(path)
        )
    finally:
        if pinned is not None:
            pinned.unpersist()
    spark = df.sparkSession
    out = spark.read.parquet(path)
    n_rows = out.count()
    n_shards = out.select("shard_id").distinct().count()
    return {"n_rows": n_rows, "n_shards": n_shards}


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    shard_rows: int = 100_000,
    order_cols: list[str] | None = None,
) -> dict:
    """JSONL twin of export_training_shards — the interchange format
    downstream training stacks consume. Rows serialize to one JSON
    object per line (`to_json(struct(...))`, JVM-side) and land as
    text files under ``shard_id=N/`` partitions; a driver-written
    ``_manifest.json`` records per-shard row counts and an
    order-insensitive content fingerprint (sum of each line's 60-bit
    md5 prefix — recomputable by any engine to verify a shard without
    trusting file order), so consumers can integrity-check and resume
    shard-by-shard.

    Deterministic like its parquet twin: shard membership comes from
    the dense global rank (two-phase index, no single-partition
    funnel); same input → identical shards and fingerprints.
    """
    import json as _json
    import os as _os

    from sqlstreamstore_spark.operators.positions import dense_global_index_pinned

    order_cols = order_cols or [df.columns[0]]
    line = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    indexed, pinned = dense_global_index_pinned(df, list(order_cols), index_col="__rank")
    sharded = indexed.select(
        (F.col("__rank") / F.lit(shard_rows)).cast("long").alias("shard_id"),
        line.alias("value"),
    )
    try:
        stats = (
            sharded.groupBy("shard_id")
            .agg(
                F.count("*").alias("n_rows"),
                # DECIMAL(38,0) accumulation: exact and overflow-free
                # for any shard size (a long sum of 60-bit terms
                # overflows past ~8k rows under ANSI)
                F.sum(
                    F.conv(F.substring(F.md5(F.col("value")), 1, 15), 16, 10)
                    .cast("decimal(38,0)")
                ).cast("decimal(38,0)").alias("fingerprint"),
            )
            .collect()
        )
        (
            sharded.repartition("shard_id")
            .write.mode("overwrite")
            .partitionBy("shard_id")
            .text(path)
        )
    finally:
        if pinned is not None:
            pinned.unpersist()
    manifest = {
        "format": "jsonl",
        "order_cols": list(order_cols),
        "shard_rows": shard_rows,
        "columns": list(df.columns),
        "shards": {
            str(r.shard_id): {"n_rows": r.n_rows, "fingerprint": str(r.fingerprint)}
            for r in stats
        },
    }
    # underscore-prefixed like _SUCCESS: Spark readers ignore it, so
    # spark.read.json(path) sees only the shard lines (a bare
    # manifest.json would infer a _corrupt_record column into every
    # consumer's schema)
    with open(_os.path.join(path, "_manifest.json"), "w") as f:
        _json.dump(manifest, f, indent=1, sort_keys=True)
    return {
        "n_rows": sum(r.n_rows for r in stats),
        "n_shards": len(stats),
        "manifest": manifest,
    }


def pack_sequences(documents: DataFrame, token_budget: int = 512) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences by
    contiguous packing: documents in deterministic doc_id order fill
    sequence k = floor(tokens_before / budget) — the assignment step of
    sequence packing for LLM pretraining (each sequence then
    concatenates its documents, long documents span a boundary and are
    split at tokenization time).

    Scale shape: the global running token total comes from the
    two-phase cumulative sum (operators/positions.py with_global_cumsum
    — range partition + in-partition cumsum + broadcast prefix totals),
    never a single-partition window. Exactly the SQL
    ``SUM(n_tokens) OVER (ORDER BY doc_id)`` — integer arithmetic, so
    the DuckDB oracle matches bit-for-bit.
    """
    from sqlstreamstore_spark.operators.positions import with_global_cumsum

    toks = documents.select(
        "doc_id", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    cum = with_global_cumsum(toks, ["doc_id"], "n_tokens", out_col="__cum")
    b = int(token_budget)
    # DIV, not floor(/): Spark's `/` is double division, and a floored
    # double quotient can diverge from BIGINT division once global
    # offsets approach 2^53 (ADVICE r8 #2). DIV stays integral.
    return (
        cum.select(
            "doc_id",
            "n_tokens",
            F.expr(f"(__cum - n_tokens) DIV {b}").cast("long").alias("seq_id"),
            F.expr(f"(__cum - n_tokens) % {b}").cast("long").alias("offset_in_seq"),
        )
        .orderBy("doc_id")
    )


def pack_sequences_spans(documents: DataFrame, token_budget: int = 512) -> DataFrame:
    """ZERO-WASTE sequence packing: the span-level refinement of
    :func:`pack_sequences`. Documents fill the global token stream in
    doc_id order; every training sequence is EXACTLY ``token_budget``
    tokens (except the last), and a document crossing a boundary emits
    one row per sequence it touches with its in-document token span —
    the (doc_id, seq_id, tok_start, tok_end) quadruple a packed-batch
    loader actually materializes (tok_end exclusive). This is how
    production pretraining packs: no padding waste, documents split at
    sequence boundaries, span provenance kept for attention masking.

    Pure integer arithmetic on the two-phase global cumsum: a doc
    occupying global interval [cum−n, cum) intersects sequences
    floor((cum−n)/B) .. floor((cum−1)/B); the explode is bounded by
    ceil(n/B)+1 rows per doc (tokens, not pairs — linear at any
    scale). Exact in BIGINT on both engines — zero-tolerance oracle.

    Columns: doc_id, seq_id, offset_in_seq (where the span starts
    inside its sequence), tok_start/tok_end (the doc-local slice),
    span_tokens."""
    toks = documents.select(
        "doc_id", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    return _pack_spans(toks, ["doc_id"], token_budget)


def _pack_spans(
    toks: DataFrame,
    order_cols: list,
    token_budget: int,
    keep: tuple = (),
) -> DataFrame:
    """Span-packing core shared by :func:`pack_sequences_spans`
    (doc_id order) and :func:`curriculum_pack` (curriculum order):
    global cumsum over ``order_cols``, bounded per-doc explode, pure
    BIGINT span arithmetic. ``keep`` columns ride along into the
    output (they must be present on ``toks``)."""
    from sqlstreamstore_spark.operators.positions import with_global_cumsum

    cum = with_global_cumsum(toks, list(order_cols), "n_tokens", out_col="__cum")
    bi = int(token_budget)
    b = F.lit(bi).cast("long")
    start = F.col("__cum") - F.col("n_tokens")  # global first-token index
    # integral DIV on both seq-id bounds (ADVICE r8 #2): floor(x / y) on
    # doubles loses exactness past 2^53 global tokens — the very scale
    # this operator advertises; DuckDB's `//` twin is exact BIGINT.
    first_seq = F.expr(f"(__cum - n_tokens) DIV {bi}").cast("long")
    last_seq = F.expr(f"(__cum - 1) DIV {bi}").cast("long")
    spans = cum.select(
        "doc_id",
        *keep,
        "n_tokens",
        start.alias("__gs"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * b
    tok_start = F.greatest(F.lit(0).cast("long"), seq_lo - F.col("__gs"))
    tok_end = F.least(
        F.col("n_tokens"), seq_lo + b - F.col("__gs")
    )
    return (
        spans.select(
            "doc_id",
            *keep,
            "seq_id",
            F.greatest(F.lit(0).cast("long"), F.col("__gs") - seq_lo)
            .alias("offset_in_seq"),
            tok_start.alias("tok_start"),
            tok_end.alias("tok_end"),
            (tok_end - tok_start).alias("span_tokens"),
        )
        .orderBy(*order_cols, "seq_id")
    )


def curriculum_pack(
    documents: DataFrame, token_budget: int = 512, stages: int = 4
) -> DataFrame:
    """The curriculum → packing COMPOSITION a pretraining data loader
    actually consumes: documents scheduled easy→hard by
    :func:`curriculum_order`, then packed into exact-budget training
    sequences along THAT order by the :func:`pack_sequences_spans`
    span arithmetic — early sequences hold the easiest documents, and
    every stage boundary falls at a deterministic sequence index. One
    extra column pair (train_order, stage) rides the span rows so the
    loader can also resolve stage-scoped sampling.

    Same scale shape as its two parents: one dense two-phase rank +
    one two-phase cumsum; pure BIGINT — zero-tolerance oracle."""
    cur = curriculum_order(documents, stages=stages)
    toks = cur.select("doc_id", "train_order", "stage", "n_tokens")
    return _pack_spans(
        toks, ["train_order"], token_budget, keep=("train_order", "stage")
    )


def interleave_sources(documents: DataFrame) -> DataFrame:
    """Domain-interleaved training order: rank documents WITHIN each
    source (deterministic doc_id order), then order globally by
    (rank_in_source, source) — a round-robin across sources, so every
    training window sees a domain MIX instead of the source-sorted
    runs a curated-by-domain corpus naturally arrives in (the
    determinism-preserving stand-in for a global shuffle; compose
    with `curriculum_order` by swapping doc_id for the difficulty
    rank).

    Scale shape (round-9 self-audit fix): a per-source row_number
    window would funnel EACH ENTIRE SOURCE through one task — with a
    handful of sources over 100 TB that is the single-partition
    hazard wearing a disguise. Instead the per-source rank is derived
    from the dense two-phase GLOBAL index over (source, doc_id):
    rank_in_source = global_rank − (source's first global rank) + 1,
    where the per-source minima are a bounded groupBy broadcast back.
    Identical values, no per-source funnel.

    Pin lifecycle: the two-phase index persists its range-partitioned
    input (the layout barrier). Callers that invoke this repeatedly in
    one session wrap each call + its action in
    ``operators.positions.pin_scope()`` (harnesses use
    ``release_pins()``) so cached partitions don't accumulate."""
    from sqlstreamstore_spark.operators.positions import with_dense_global_index

    ranked = with_dense_global_index(
        documents.select("doc_id", "source"),
        ["source", "doc_id"],
        index_col="__g",
    )
    starts = ranked.groupBy("source").agg(F.min("__g").alias("__g0"))
    return (
        ranked.join(F.broadcast(starts), "source")
        .select(
            "doc_id",
            "source",
            (F.col("__g") - F.col("__g0") + F.lit(1)).cast("long").alias(
                "rank_in_source"
            ),
        )
        .orderBy("rank_in_source", "source")
    )


def curriculum_order(documents: DataFrame, stages: int = 4) -> DataFrame:
    """Curriculum data ordering (Bengio et al., "Curriculum Learning",
    ICML 2009): schedule training data easy→hard. Difficulty here is
    document length in whitespace tokens — the classic deterministic
    proxy (short documents first); production swaps in any scored
    column. Documents are globally ranked by (difficulty, doc_id) and
    divided into ``stages`` equal-count curriculum phases:
    stage = rank·stages DIV N — pure integer arithmetic, no
    percentile estimation, so the DuckDB twin matches exactly and
    stage populations differ by at most one document.

    Scale shape: the global rank is the dense two-phase index
    (operators/positions.py — range partition + in-partition
    row_number + broadcast prefix counts), never a single-partition
    window; N arrives as a broadcast one-row aggregate. Output is the
    training order a data loader consumes.

    Pin lifecycle: the two-phase index persists its range-partitioned
    input; looping callers scope each call + action with
    ``operators.positions.pin_scope()`` (harnesses use
    ``release_pins()``)."""
    from sqlstreamstore_spark.operators.positions import with_dense_global_index

    toks = documents.select(
        "doc_id", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    ranked = with_dense_global_index(
        toks, ["n_tokens", "doc_id"], index_col="train_order"
    )
    total = toks.agg(F.count("*").cast("long").alias("__n"))
    s = int(stages)
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            F.col("train_order").cast("long").alias("train_order"),
            F.expr(f"(train_order * {s}) DIV __n").cast("long").alias("stage"),
            "doc_id",
            "n_tokens",
        )
        .orderBy("train_order")
    )


def chunk_documents(
    documents: DataFrame, size: int = 200, stride: int = 150
) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks —
    the retrieval / context-window prep step (chunk k covers
    [k*stride, k*stride+size)). Returns one row per chunk with its md5
    and length, so downstream joins ship 16-byte digests, not text.

    Scale shape: sequence + posexplode are narrow (no shuffle); a doc's
    chunks stay in its partition, and the text column dies inside the
    projection. Chunk count = ceil(len/stride) (min 1, so empty docs
    keep one empty chunk and are never silently dropped).
    """
    n = F.length("text")
    k = F.greatest(F.lit(1), F.ceil(n / F.lit(float(stride))).cast("int"))
    chunk = F.substring(F.col("text"), F.col("chunk_idx") * stride + 1, size)
    return (
        documents.select(
            "doc_id",
            F.posexplode(F.sequence(F.lit(0), k - 1)).alias("chunk_idx", "__i"),
            "text",
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.md5(chunk).alias("chunk_md5"),
            F.length(chunk).cast("long").alias("chunk_len"),
        )
    )


def quality_percentile_gate(
    docs: DataFrame, q: float = 0.5, accuracy: int = 10_000
) -> DataFrame:
    """Per-source quality gate: keep each source's documents whose
    lexical-diversity score (distinct-token ratio) is at or above that
    SOURCE's q-quantile — the "keep the top half of every domain"
    curation step, which a single global threshold gets wrong because
    domains have different score distributions.

    Scale shape: thresholds come from GROUPED ``percentile_approx`` (GK
    sketch — bounded state, partial-aggregable, one row per source), the
    |sources|-row threshold table broadcasts back, and the filter is a
    pure column comparison. No per-source global sort, no WindowExec
    anywhere (pinned in tests/test_plans.py).

    ``accuracy``: GK rank error <= N/accuracy; at accuracy >= N_source
    the sketch is rank-exact (returns the value at sorted rank
    ceil(q*N)), which makes the whole gate DuckDB-replayable by rank
    selection — the stats_ntile_deciles_approx precedent. The production
    default 10_000 keeps the identical bounded-state plan.
    """
    toks = F.split(F.col("text"), " ")
    score = F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast(
        "double"
    )
    # NULL-text rows carry no score: drop them BEFORE the quantile so
    # the sketch's N matches a rank-selection replay (which would
    # otherwise count NULL rows into ceil(q*N))
    scored = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", "source", score.alias("score")
    )
    thr = scored.groupBy("source").agg(
        F.percentile_approx("score", F.lit(float(q)), F.lit(accuracy)).alias(
            "threshold"
        )
    )
    return (
        scored.join(F.broadcast(thr), "source")
        .filter(F.col("score") >= F.col("threshold"))
        .select("doc_id", "source", "score", "threshold")
        .orderBy("doc_id")
    )


def quantile_normalize_scores(docs: DataFrame) -> DataFrame:
    """Cross-source score CALIBRATION by quantile normalization: map
    each document's per-source quantile position onto the POOLED score
    distribution, so "calibrated >= t" means the same thing in every
    domain — the fix for the per-domain distribution shift that makes a
    single global threshold over-prune some sources and under-prune
    others (quality_percentile_gate solves the same problem by moving
    the threshold; this one moves the SCORES, so downstream consumers
    keep one threshold).

        calibrated(doc) = pooled value at rank ceil(((r_s − 0.5)/N_s)·N_p)

    with r_s the doc's rank within its source (score, then doc_id — a
    deterministic tie-break), N_s the source size, N_p the pooled count.
    All rank arithmetic is exact-integer-in-double (< 2^53), so both
    engines compute identical ranks; calibrated values are members of
    the pooled score set — the gate hash-matches with NO rounding.

    Scale shape — no single-partition window anywhere:
      1. per-source rank: window partitioned by source;
      2. pooled rank→value table: per-VALUE counts + the two-phase
         global cumsum (distinct-value cardinality, the ks_drift rule);
      3. the rank lookup (first pooled value with cum >= k) is the
         global as-of: one union + ``with_global_last_carry`` over the
         DESCENDING axis — range partition + broadcast prefix fills,
         never a funnel. The collects ship one row per partition.
    """
    from sqlstreamstore_spark.operators.positions import (
        with_global_cumsum,
        with_global_last_carry,
    )

    toks = F.split(F.col("text"), " ")
    score = F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast(
        "double"
    )
    scored = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", "source", score.alias("score")
    )
    w = Window.partitionBy("source").orderBy("score", "doc_id")
    sizes = scored.groupBy("source").agg(F.count("*").cast("long").alias("ns"))
    npool = scored.agg(F.count("*").cast("long").alias("npool"))
    ranked = (
        scored.withColumn("r", F.row_number().over(w))
        .join(F.broadcast(sizes), "source")
        .crossJoin(F.broadcast(npool))
    )
    k = F.ceil(
        (
            (F.col("r").cast("double") - F.lit(0.5))
            / F.col("ns").cast("double")
        )
        * F.col("npool").cast("double")
    ).cast("long")
    queries = ranked.select(
        "doc_id",
        "source",
        "score",
        k.alias("axis"),
        F.lit(None).cast("double").alias("bval"),
        F.lit(1).alias("isq"),
    )
    pv = scored.groupBy("score").agg(F.count("*").cast("long").alias("c"))
    cum = with_global_cumsum(pv, ["score"], "c", "cum")
    bounds = cum.select(
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("double").alias("score"),
        F.col("cum").alias("axis"),
        F.col("score").alias("bval"),
        F.lit(0).alias("isq"),
    )
    # DESCENDING axis walk: each query carries the nearest boundary with
    # cum >= k; at equal axis the boundary sorts first (isq asc) so a
    # query at k == cum picks it (the interval [cum−c+1, cum] is
    # inclusive on the right).
    carried = with_global_last_carry(
        queries.unionByName(bounds),
        [(F.col("axis"), False), (F.col("isq"), True)],
        "bval",
        out_col="calibrated",
    )
    return (
        carried.filter(F.col("isq") == 1)
        .select("doc_id", "source", "score", "calibrated")
        .orderBy("doc_id")
    )


def classifier_score(documents: DataFrame) -> DataFrame:
    """Apply a trained linear text classifier at corpus scale — the
    fastText-style quality-filter inference pass (score = mean token
    weight, keep if positive). The weight table is virtual: each
    token's weight is derived from a content hash (md5 → int in
    [-500, 500]), standing in for broadcast-joined learned weights
    while keeping both engines bit-identical with NO weight file.

    Scale shape: zero shuffles. The per-doc score folds over the token
    array map-side (F.aggregate — integer sum, order-free); a real
    deployment swaps the hash for a broadcast map_from_entries lookup
    and keeps the same plan. The only division is one IEEE divide of
    two exact BIGINTs at the end, so the gate hash-matches with zero
    tolerance."""
    toks = F.split(F.col("text"), " ")
    w = lambda t: (
        F.conv(F.substring(F.md5(F.concat(F.lit("clf:"), t)), 1, 8), 16, 10)
        .cast("long")
        % 1001
        - 500
    )
    return (
        documents.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + w(t)).alias(
                "score_num"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            "score_num",
            (F.col("score_num") / F.col("n_tokens")).alias("score"),
            F.when(F.col("score_num") > 0, F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("verdict"),
        )
        .orderBy("doc_id")
    )


def e2e_corpus_pipeline(
    documents: DataFrame,
    embeddings: DataFrame,
    min_tokens: int = 5,
    min_distinct_ratio: float = 0.3,
    jaccard_threshold: float = 0.2,
    cosine_threshold: float = 0.35,
    lsh_bits: int = 6,
    default_budget: int = 5000,
    token_budget: int = 512,
    n_shards: int = 16,
    quality_model: str = "static",
    keep_q: float = 0.5,
) -> DataFrame:
    """The FLAGSHIP end-to-end curation pipeline as one operator
    (r6 verdict #7): raw -> quality clean -> exact dedup -> fuzzy
    (MinHash-LSH) dedup -> semantic (embedding-LSH) dedup ->
    token-budget mixture sample -> sequence packing -> shard
    assignment, returning the per-stage LINEAGE COUNTS — the run
    report a production corpus build logs, proving the stages compose
    without a driver-side seam.

    Every stage reuses the exact operator the individual gates pin
    (clean predicates, md5 first-wins, minhash_dedup_pairs,
    cosine_near_dup_pairs_lsh, selected_by_budget, pack_sequences), so
    this row is the composition test, not a re-implementation.
    Documents without an embedding row pass the semantic stage
    untouched (they have no neighbors to lose to) — stated, not
    hidden. ``lsh_bits`` is EXPLICIT here (not the auto rule) so the
    unrolled SQL twin replays the identical bucketing.

    ``quality_model='trained'`` (r7 verdict #5) swaps the static
    predicate for the FULL FastText-style loop: the in-engine trainer
    (:func:`logreg_train_quality`) learns the weights, trained-weight
    inference (:func:`classifier_infer_trained`) scores every raw doc,
    and the quality stage keeps docs at or above the corpus
    ``keep_q``-quantile of the trained score — train -> score ->
    filter -> dedup -> sample -> pack as ONE lineage row. Scores use the ROUNDED published weights, so the
    stage replays from the weight artifact alone.

    Scale shape + EXECUTION CONTRACT (round 8, ADVICE r7 #3 — the
    documented-eager option, chosen on measurement): each stage pins
    a localCheckpoint barrier, and because Spark materializes query
    stages when the checkpoint RDD is created, CONSTRUCTING this
    DataFrame EXECUTES the stage chain up front — only the eight count
    aggregates defer to the first action. This is deliberate and
    measured: the pure-lazy variant (no barriers) re-runs all
    pre-exchange map work per count branch (400 parquet scans in the
    executed plan — AQE reuses the exchanges but not the map work
    feeding them) at 11.3 s warm; persist() barriers avoid build-time
    work but race cache population across the branches of the single
    union job at 10.0 s; the checkpoint chain is 7.4 s (sf0.1,
    local[32]) AND is the honest production shape — a real 100 TB
    build writes stage tables between passes. Trained mode adds one
    more barrier on the quality frame (the T-iteration trainer's
    crossJoin tree inlined into eight branches explodes plan analysis
    — driver OOM at any data size). The heavy passes (minhash
    banding, LSH bucket join, budget thresholds) keep their own
    audited sub-quadratic shapes.
    """
    from sqlstreamstore_spark.analytics.dedup import minhash_dedup_pairs
    from sqlstreamstore_spark.analytics.sampling import _hash_bucket, selected_by_budget
    from sqlstreamstore_spark.analytics.similarity import cosine_near_dup_pairs_lsh

    toks = _tokens()
    n_toks = F.size(toks)
    if quality_model == "trained":
        # Keep docs at or above the corpus ``keep_q``-quantile of the
        # trained score: an absolute cut is degenerate when the learned
        # scores cluster (5 GD steps barely move off the prior), while
        # the rank cut always keeps the top (1-q) — the FastText-recipe
        # shape ("keep the best half by classifier score"). The
        # threshold is rank-exact percentile_approx at gate scale
        # (value at sorted rank ceil(q*N) — DuckDB-replayable by rank
        # selection, the quality_percentile_gate precedent); at 100 TB
        # the same plan is the bounded-state GK sketch.
        # r12 wave 10: scored embeds the whole train+infer plan and
        # feeds BOTH the threshold agg and the keep filter — barrier it
        # so the trainer runs once, not once per consumer
        scored = classifier_infer_trained(documents).localCheckpoint(eager=False)
        thr = scored.agg(
            F.percentile_approx(
                "p_keep", F.lit(float(keep_q)), F.lit(1_000_000)
            ).alias("__thr")
        )
        keep = (
            scored.crossJoin(F.broadcast(thr))
            .filter(F.col("p_keep") >= F.col("__thr"))
            .select("doc_id")
        )
        # ONE lineage barrier, trained mode only: the T-iteration
        # trainer is a deep crossJoin tree; inlined into all 8 stage
        # branches it explodes plan analysis/codegen (driver OOM at any
        # data size). The static path needs no barrier — AQE's runtime
        # exchange reuse computes each stage's shuffle once.
        quality = documents.join(keep, "doc_id", "left_semi").localCheckpoint(
            eager=False
        )
    else:
        quality = documents.filter(
            (n_toks >= min_tokens)
            & (
                F.size(F.array_distinct(toks)).cast("double") / n_toks.cast("double")
                >= min_distinct_ratio
            )
        )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    exact = (
        quality.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=False)
    )
    fuzzy_losers = (
        minhash_dedup_pairs(exact, threshold=jaccard_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    fuzzy = exact.join(fuzzy_losers, "doc_id", "left_anti").localCheckpoint(
        eager=False
    )
    emb = embeddings.join(
        fuzzy.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    sem_losers = (
        cosine_near_dup_pairs_lsh(emb, cosine_threshold, bits=lsh_bits, sort=False)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    semantic = fuzzy.join(sem_losers, "doc_id", "left_anti").localCheckpoint(
        eager=False
    )
    sampled = selected_by_budget(semantic, {}, default_budget).localCheckpoint(
        eager=False
    )
    # NOT barriered (r12, measured): packed feeds the stage count and
    # the shard projection, but a 5th nested lazy checkpoint costs
    # +9 s COLD (fresh-process A/B: 11.6 -> 20.7 s) against ~0 warm
    # gain — the duplicated cumsum is budget-sized (post-sample), so
    # recompute is cheaper than another barrier materialization level.
    packed = pack_sequences(sampled, token_budget)
    shards = packed.select(
        (_hash_bucket(F.col("seq_id")) % n_shards).alias("shard_id")
    ).distinct()

    def stage_count(no: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_rows")).select(
            F.lit(no).alias("stage_no"), F.lit(name).alias("stage"), "n_rows"
        )

    out = stage_count(0, "raw", documents)
    for no, name, df in (
        (1, "quality", quality),
        (2, "exact_dedup", exact),
        (3, "fuzzy_dedup", fuzzy),
        (4, "semantic_dedup", semantic),
        (5, "budget_sample", sampled),
        (6, "packed", packed.select("seq_id").distinct()),
        (7, "sharded", shards),
    ):
        out = out.unionByName(stage_count(no, name, df))
    return out.orderBy("stage_no")


def e2e_incremental_pipeline(
    spark,
    incoming: DataFrame,
    corpus: DataFrame,
    incoming_emb: DataFrame,
    mh_index_path: str,
    ivf_index_path: str,
    centroids: list[tuple[int, list[float]]] | None = None,
    min_tokens: int = 5,
    min_distinct_ratio: float = 0.3,
    jaccard_threshold: float = 0.2,
    cosine_threshold: float = 0.35,
    default_budget: int = 5000,
    token_budget: int = 512,
    n_shards: int = 16,
    corpus_digest_path: str | None = None,
) -> DataFrame:
    """The INCREMENTAL flagship (VERDICT r8 #4) — the daily-crawl twin
    of :func:`e2e_corpus_pipeline`: instead of re-curating the standing
    corpus, a DELTA of new documents is checked against the corpus's
    MATERIALIZED indexes and only the survivors are budgeted, packed
    and sharded. This is the shape a production crawl pipeline runs
    every day; total work is ∝ delta (plus index probes), never the
    corpus.

    Stages, each reusing the exact operator its individual gate pins:

      0 delta_raw       the incoming crawl delta
      1 quality         static clean predicates (e2e stage 1)
      2 exact_dedup     md5 first-wins WITHIN the delta
      3 exact_new       digest anti-join against the corpus
                        (dedup.new_against_corpus's shape: the corpus
                        side collapses to DISTINCT 16-byte digests;
                        pass ``corpus_digest_path`` — a
                        dedup.build_digest_index materialization — so
                        a daily run reads the digest INDEX instead of
                        re-hashing the corpus, completing the
                        index-once lifecycle on all three tiers)
      4 fuzzy_new       dedup.minhash_dedup_incremental — delta bands
                        probe the materialized banded LSH index;
                        survivors have no corpus near-dup at
                        ``jaccard_threshold``
      5 semantic_new    similarity.near_dup_against_ivf_index — delta
                        embeddings probe the cluster-partitioned IVF
                        index (size-adaptive probe join); docs without
                        an embedding pass untouched
      6 budget_sample   token-budget mixture sample (HUGEINT-exact
                        thresholds)
      7 packed          distinct training sequences (two-phase cumsum)
      8 sharded         distinct shard ids

    Returns the 9-row lineage frame (stage_no, stage, n_rows) — the run
    report an incremental ingest logs.

    Correctness note: stages 4 and 5 probe with their stage's SURVIVORS
    (delta-minimal work), which is value-identical to probing the whole
    delta and intersecting afterwards — both indexes hold only CORPUS
    entries, so each new doc's verdict is independent of every other
    new doc. The DuckDB twin exploits exactly that equivalence (it
    replays the full cross-side pair sets, then applies them to the
    survivor chain).

    Scale shape: every per-stage frame is delta-sized; the only
    corpus-sized inputs are (a) the digest side of stage 3 (16
    bytes/row — and with ``corpus_digest_path`` a MATERIALIZED index
    read, not a corpus re-hash), (b) the map-side index probe of
    stage 4 (no index
    shuffle; verify stage semi-join-prunes the corpus to candidate
    old_docs before shingling), and (c) the partition-pruned IVF scan
    of stage 5. Same documented-eager lineage contract as the full
    flagship: stage barriers are lazy localCheckpoints."""
    from sqlstreamstore_spark.analytics.dedup import minhash_dedup_incremental
    from sqlstreamstore_spark.analytics.sampling import _hash_bucket, selected_by_budget
    from sqlstreamstore_spark.analytics.similarity import near_dup_against_ivf_index

    toks = _tokens()
    n_toks = F.size(toks)
    quality = incoming.filter(
        (n_toks >= min_tokens)
        & (
            F.size(F.array_distinct(toks)).cast("double") / n_toks.cast("double")
            >= min_distinct_ratio
        )
    )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    # barriered (r12): the window feeds the digest probe's construction
    # job (distinct-prefix collect), the stage-2 count AND the probe's
    # anti-join — without a barrier the tokenize-filter + window runs
    # once per reference
    exact = (
        quality.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=False)
    )
    if corpus_digest_path:
        # r12: partition-pruned index probe — the delta's distinct
        # 2-hex digest prefixes become literal partition filters, so
        # the index read is O(delta-prefix share), not O(index)
        from sqlstreamstore_spark.analytics.dedup import probe_digest_index

        exact_new = probe_digest_index(
            spark, corpus_digest_path, exact
        ).localCheckpoint(eager=False)
    else:
        corpus_digests = corpus.select(F.md5("text").alias("__h")).distinct()
        exact_new = (
            exact.withColumn("__h", F.md5("text"))
            .join(corpus_digests, "__h", "left_anti")
            .drop("__h")
            .localCheckpoint(eager=False)
        )
    fuzzy_losers = (
        minhash_dedup_incremental(
            spark, mh_index_path, exact_new, corpus, threshold=jaccard_threshold
        )
        .select(F.col("new_doc").alias("doc_id"))
        .distinct()
    )
    fuzzy = exact_new.join(fuzzy_losers, "doc_id", "left_anti").localCheckpoint(
        eager=False
    )
    emb_delta = incoming_emb.join(
        fuzzy.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    sem_losers = (
        near_dup_against_ivf_index(
            spark,
            ivf_index_path,
            emb_delta,
            threshold=cosine_threshold,
            centroids=centroids,
        )
        .select(F.col("new_vec").alias("doc_id"))
        .distinct()
    )
    semantic = fuzzy.join(sem_losers, "doc_id", "left_anti").localCheckpoint(
        eager=False
    )
    sampled = selected_by_budget(semantic, {}, default_budget).localCheckpoint(
        eager=False
    )
    # NOT barriered (r12, measured): see e2e_corpus_pipeline — another
    # nested lazy checkpoint level costs cold-compile seconds against a
    # budget-sized duplicated cumsum.
    packed = pack_sequences(sampled, token_budget)
    shards = packed.select(
        (_hash_bucket(F.col("seq_id")) % n_shards).alias("shard_id")
    ).distinct()

    def stage_count(no: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_rows")).select(
            F.lit(no).alias("stage_no"), F.lit(name).alias("stage"), "n_rows"
        )

    out = stage_count(0, "delta_raw", incoming)
    for no, name, df in (
        (1, "quality", quality),
        (2, "exact_dedup", exact),
        (3, "exact_new", exact_new),
        (4, "fuzzy_new", fuzzy),
        (5, "semantic_new", semantic),
        (6, "budget_sample", sampled),
        (7, "packed", packed.select("seq_id").distinct()),
        (8, "sharded", shards),
    ):
        out = out.unionByName(stage_count(no, name, df))
    return out.orderBy("stage_no")


def _quality_features(documents: DataFrame, with_id: bool = False) -> DataFrame:
    """The quality classifier's feature projection (shared by the
    trainer and trained-weight inference): label y = (lang = 'en'),
    x0 bias, x1 length/256, x2 distinct-token ratio, x3 n_chars/1000.
    Exact integer inputs, two IEEE divides — identical in DuckDB."""
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks).cast("double")
    cols = [
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
        F.lit(1.0).alias("x0"),
        (n_toks / F.lit(256.0)).alias("x1"),
        (F.size(F.array_distinct(toks)).cast("double") / n_toks).alias("x2"),
        (F.col("n_chars").cast("double") / F.lit(1000.0)).alias("x3"),
    ]
    if with_id:
        cols.insert(0, F.col("doc_id"))
    return documents.select(*cols)


def classifier_infer_trained(
    documents: DataFrame, iters: int = 5, eta: float = 0.5
) -> DataFrame:
    """Score every document with the weights the IN-ENGINE trainer just
    learned — the literal train→infer composition closing the curation
    loop (:func:`logreg_train_quality` is the train half;
    :func:`classifier_score` is the hash-weight stand-in this
    replaces once training runs in-engine). One lazy plan: the trained
    1-row weight frame broadcast-crossJoins the per-doc feature
    projection; p_keep = sigmoid(w.x).

    Inference uses the ROUNDED (6-decimal) weights — the same values
    the train gate emits — so the scores are reproducible from the
    published weight artifact alone, and both engines compute sigmoid
    on identical doubles (round-6 doubles are exactly representable
    cross-engine; the only libm call is the final exp, absorbed by the
    output round)."""
    w = logreg_train_quality(documents, iters=iters, eta=eta).select(
        "w_bias", "w_len", "w_rich", "w_chars"
    )
    feats = _quality_features(documents, with_id=True)
    z = (
        F.col("w_bias") * F.col("x0")
        + F.col("w_len") * F.col("x1")
        + F.col("w_rich") * F.col("x2")
        + F.col("w_chars") * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return (
        feats.crossJoin(F.broadcast(w))
        .select(
            "doc_id",
            F.col("y").cast("long").alias("label"),
            F.round(p, 6).alias("p_keep"),
        )
        .orderBy("doc_id")
    )


def logreg_train_quality(
    documents: DataFrame, iters: int = 5, eta: float = 0.5
) -> DataFrame:
    """Train the quality classifier IN-ENGINE — full-batch logistic
    regression by gradient descent, closing the curation loop whose
    inference half is :func:`classifier_score` (r6 verdict #4). The
    FastText/DSIR-style quality-filter recipe: label y = (lang = 'en'),
    features per document
        x0 = 1 (bias), x1 = n_tokens/256, x2 = distinct-token ratio
        (lexical richness), x3 = n_chars/1000,
    fixed iteration count T and step eta (no tolerance early-exit), so
    the run is deterministic and replayable step-for-step.

    Each iteration is the textbook monoid shape: the gradient
        g_j = avg((sigmoid(w.x) - y) * x_j)
    is a map-side partial aggregate (sum+count combine), and the
    weight update w_j <- w_j - eta*g_j rides a one-row frame
    broadcast-crossJoined into the next pass. The WHOLE T-iteration
    trainer is ONE lazy DataFrame plan — T+1 chained scans, each a
    partial agg; no driver-side collect anywhere (the module's lazy
    contract), and only model-sized (1-row) frames ever cross stage
    boundaries. A final pass scores the train log-loss at the learned
    weights.

    Scale shape: per-iteration cost is one scan of the MATERIALIZED
    feature projection (r12 wave 10: the lazy plan re-tokenized the
    corpus — split + array_distinct per doc — once per iteration, T+2
    times in all; the projection is 5 doubles/row, so the lazy
    localCheckpoint barrier costs ~40 B/row once and the T loop scans
    that) + d partial sums — cost tracks FEATURES, not rows collected.
    Floats: sigmoid/exp pass through libm, so the gate projection
    rounds weights and loss to 6 (the stats_corr_regr discipline);
    every integer input (token counts, n_chars, label sums) is exact
    in both engines.
    """
    feats = _quality_features(documents).localCheckpoint(eager=False)
    cur = feats.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("n_pos"),
        *[F.min(F.lit(0.0)).alias(f"w{j}") for j in range(4)],
    )
    z = sum(F.col(f"w{j}") * F.col(f"x{j}") for j in range(4))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    for _ in range(iters):
        cur = (
            feats.crossJoin(F.broadcast(cur))
            .agg(
                F.max("n_docs").alias("n_docs"),
                F.max("n_pos").alias("n_pos"),
                *[
                    (F.max(f"w{j}") - F.lit(eta) * F.avg((p - F.col("y")) * F.col(f"x{j}")))
                    .alias(f"w{j}")
                    for j in range(4)
                ],
            )
        )
    # final pass: train log-loss at the learned weights
    final = feats.crossJoin(F.broadcast(cur)).agg(
        F.max("n_docs").alias("n_docs"),
        F.max("n_pos").alias("n_pos"),
        *[F.max(f"w{j}").alias(f"w{j}") for j in range(4)],
        F.avg(
            -(F.col("y") * F.log(p) + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p))
        ).alias("loss"),
    )
    return final.select(
        "n_docs",
        "n_pos",
        F.round("w0", 6).alias("w_bias"),
        F.round("w1", 6).alias("w_len"),
        F.round("w2", 6).alias("w_rich"),
        F.round("w3", 6).alias("w_chars"),
        F.round("loss", 6).alias("log_loss"),
    )


def sentence_dedup(documents: DataFrame, chunk_tokens: int = 8) -> DataFrame:
    """C4-style sub-document dedup: drop every repeated text CHUNK
    across the whole corpus, keeping only its first occurrence
    (ordered by doc_id, then position), and rebuild each document from
    its surviving chunks in original order. Lee et al. dedup at
    substring granularity finds the spans; THIS pass actually removes
    boilerplate the way C4's "discard duplicated three-sentence
    windows" rule does. The fixture corpus has no punctuation, so the
    splitter chunks on fixed ``chunk_tokens`` windows — swap in a
    sentence splitter on real text; the machinery (global
    first-occurrence + position-preserving reconstruction) is
    identical.

    Scale shape: one chunk-keyed window (rank over (doc_id, pos) —
    hot boilerplate chunks are exactly the heavy keys, their group
    state is one running min), then a doc-keyed rebuild whose state is
    bounded by document length. Exact string equality end-to-end —
    zero-tolerance oracle.
    """
    from pyspark.sql import Window

    # split projected ONCE below the chunk transform (r12 wave 10 —
    # the _shingles_arr rule: an inline split re-evaluates per chunk)
    tk = F.col("_toks")
    n_chunks = F.ceil(F.size(tk) / F.lit(chunk_tokens)).cast("long")
    chunks = documents.select(
        "doc_id", F.split(F.col("text"), " ").alias("_toks")
    ).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(tk, i * chunk_tokens + 1, chunk_tokens), " "
                ),
            )
        ).alias("pos", "chunk"),
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    marked = chunks.withColumn("rk", F.row_number().over(w))
    totals = chunks.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_chunks"))
    kept = (
        marked.filter(F.col("rk") == 1)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("kept_text"),
        )
    )
    return (
        totals.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
        .orderBy("doc_id")
    )


def length_bucket_batches(documents: DataFrame, batch_size: int = 32) -> DataFrame:
    """Length-bucketed batching — the padding-waste minimizer every
    tokenize/embed/eval pass over a corpus runs: sort documents by
    token length (doc_id tiebreak), cut the sorted order into
    fixed-count batches, and pad each batch to ITS max instead of the
    corpus max. Reports per-batch padding waste, so the gate's output
    doubles as the measurement that justifies the sort (near-zero
    waste inside length-homogeneous batches).

    Scale shape: the sorted position is the dense two-phase global
    index (never a single-partition window); batch_id = position DIV
    batch_size, then one partial-agg groupBy onto bounded batch rows.
    waste_frac is one exact BIGINT division per row — zero-tolerance
    oracle.

    Pin lifecycle: the two-phase index persists its range-partitioned
    input; looping callers scope each call + action with
    ``operators.positions.pin_scope()`` (harnesses use
    ``release_pins()``)."""
    from sqlstreamstore_spark.operators.positions import with_dense_global_index

    toks = documents.select(
        "doc_id", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    ranked = with_dense_global_index(
        toks, ["n_tokens", "doc_id"], index_col="__pos"
    )
    b = int(batch_size)
    batches = ranked.select(
        F.expr(f"__pos DIV {b}").cast("long").alias("batch_id"), "n_tokens"
    )
    padded = F.col("batch_max") * F.col("n_docs")
    return (
        batches.groupBy("batch_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("n_tokens").cast("long").alias("batch_max"),
            F.sum("n_tokens").cast("long").alias("batch_tokens"),
        )
        .select(
            "batch_id",
            "n_docs",
            "batch_max",
            "batch_tokens",
            (padded - F.col("batch_tokens")).alias("padded_waste"),
            (
                (padded - F.col("batch_tokens")).cast("double")
                / padded.cast("double")
            ).alias("waste_frac"),
        )
        .orderBy("batch_id")
    )


def retention_by_source(documents: DataFrame) -> DataFrame:
    """Curation accounting per source — the report a data lead reads
    after every pipeline run: how many documents and tokens each
    source brought in, how many survived :func:`clean_corpus`
    (quality gate → exact dedup → near-dup removal), and the
    doc/token retention rates. A source whose retention collapses is
    either low-quality or heavily duplicated upstream — this is the
    feedback signal for crawl prioritization.

    Exact BIGINT counts + single IEEE divides; the survivor set is
    clean_corpus's own plan, so this gate doubles as a per-source
    re-verification of the flagship's first three stages."""
    raw = documents.groupBy("source").agg(
        F.count("*").cast("long").alias("n_raw"),
        F.sum(F.size(_tokens()).cast("long")).cast("long").alias("tokens_raw"),
    )
    surv = clean_corpus(documents).join(documents, "doc_id")
    kept = surv.groupBy("source").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum(F.size(_tokens()).cast("long")).cast("long").alias("tokens_kept"),
    )
    return (
        raw.join(kept, "source", "left")
        .select(
            "source",
            "n_raw",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            "tokens_raw",
            F.coalesce(F.col("tokens_kept"), F.lit(0)).cast("long").alias(
                "tokens_kept"
            ),
            (
                F.coalesce(F.col("n_kept"), F.lit(0)).cast("double")
                / F.col("n_raw").cast("double")
            ).alias("doc_retention"),
            (
                F.coalesce(F.col("tokens_kept"), F.lit(0)).cast("double")
                / F.col("tokens_raw").cast("double")
            ).alias("token_retention"),
        )
        .orderBy("source")
    )


def dataset_card(documents: DataFrame) -> DataFrame:
    """One-row dataset card — the release-notes summary block every
    published training corpus ships (docs, tokens, vocabulary axes,
    language/source composition, duplication): the numbers a consumer
    reads before anything else. All exact counts + single IEEE
    divides, computed in ONE pass over the corpus (a single groupBy().
    agg() — every column is partial-aggregable, including the
    distinct-digest dup rate which ships 16-byte digests only).

    Columns: n_docs, n_tokens, n_sources, n_langs, pct_en,
    dup_rate (1 − distinct md5/text docs), mean_tokens_per_doc,
    max_tokens, total_chars."""
    toks = F.size(_tokens()).cast("long")
    return documents.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        (
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("pct_en"),
        (
            F.lit(1.0)
            - F.countDistinct(F.md5("text")).cast("double")
            / F.count("*").cast("double")
        ).alias("dup_rate"),
        (F.sum(toks).cast("double") / F.count("*").cast("double")).alias(
            "mean_tokens_per_doc"
        ),
        F.max(toks).cast("long").alias("max_tokens"),
        F.sum(F.length("text").cast("long")).cast("long").alias("total_chars"),
    )


def mix_entropy(documents: DataFrame) -> DataFrame:
    """Training-mix diagnostics (round 10): Shannon entropy of the
    source distribution in docs AND tokens, the effective source count
    exp(H), and the dominant share — the one-row summary a mixture
    designer reads next to `budget_mixture_sample`'s plan (a corpus
    can have 30 sources and the diversity of 3). Exactness: counts
    are exact BIGINTs and H uses the sum identity
    −Σ p·ln p = ln(T) − (Σ n·ln n)/T, so the only float aggregation is
    a plain SUM of per-source n·ln(n) terms over the bounded source
    axis — rounded 6 on both engines (the stats_corr_regr sum
    discipline)."""
    toks = F.size(_tokens()).cast("long")
    per = documents.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
    )
    nlogn = lambda c: F.col(c).cast("double") * F.log(  # noqa: E731
        F.col(c).cast("double")
    )
    g = per.agg(
        F.count("*").cast("long").alias("n_sources"),
        F.sum("n_docs").cast("long").alias("tot_docs"),
        F.sum("n_tokens").cast("long").alias("tot_tokens"),
        F.max("n_docs").cast("long").alias("max_docs"),
        F.sum(nlogn("n_docs")).alias("sd"),
        F.sum(nlogn("n_tokens")).alias("st"),
    )
    hd = F.log(F.col("tot_docs").cast("double")) - F.col("sd") / F.col(
        "tot_docs"
    ).cast("double")
    ht = F.log(F.col("tot_tokens").cast("double")) - F.col("st") / F.col(
        "tot_tokens"
    ).cast("double")
    return g.select(
        "n_sources",
        "tot_docs",
        "tot_tokens",
        F.round(hd, 6).alias("doc_entropy"),
        F.round(F.exp(hd), 6).alias("effective_sources_docs"),
        F.round(ht, 6).alias("token_entropy"),
        F.round(F.exp(ht), 6).alias("effective_sources_tokens"),
        (F.col("max_docs").cast("double") / F.col("tot_docs").cast("double"))
        .alias("max_doc_share"),
    )


def domain_reweight(
    documents: DataFrame,
    eta: float = 1.0,
    loss_col: str | None = None,
) -> DataFrame:
    """DoReMi-style domain mixture reweighting (Xie et al., "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    NeurIPS 2023) — ONE multiplicative-weights step: domains whose
    loss exceeds the corpus baseline get up-weighted

        w_new_s ∝ w_old_s · exp(η · max(loss_s − baseline, 0))

    with w_old the document-count share. ``loss_col`` names a per-doc
    proxy-loss column; when None the gate-friendly default is mean
    document length in kilochars (a deterministic stand-in whose
    arithmetic both engines replay exactly — production passes the
    reference-model loss). In production the step iterates with a
    proxy-model retrain between steps (the part that cannot live in
    one query); each step is exactly this operator.

    Float discipline: per-domain loss and baseline are single IEEE
    divisions of exact BIGINT sums; exp is one libm call on identical
    doubles; the normalizer folds the tilted weights in SOURCE ORDER
    (sorted-collect fold over the bounded domain axis — the text.py
    handoff pattern), so the DuckDB twin replays the identical IEEE
    sequence. Scale: one partial-agg groupBy onto the bounded source
    axis; nothing data-sized past the first aggregate."""
    if loss_col is None:
        per = documents.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("__mass"),
        )
        loss = (
            F.col("__mass").cast("double") / F.col("n_docs").cast("double")
        ) / F.lit(1000.0)
        base_loss_expr = (
            F.col("__tot_mass").cast("double") / F.col("__tot_docs").cast("double")
        ) / F.lit(1000.0)
    else:
        per = documents.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col(loss_col)).alias("__mass"),
        )
        loss = F.col("__mass") / F.col("n_docs").cast("double")
        base_loss_expr = F.col("__tot_mass") / F.col("__tot_docs").cast("double")
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("__tot_docs"),
        F.sum("__mass").alias("__tot_mass"),
    )
    tilted = (
        per.crossJoin(F.broadcast(tot))
        .withColumn("loss", loss)
        .withColumn("baseline", base_loss_expr)
        .withColumn("excess", F.greatest(F.col("loss") - F.col("baseline"), F.lit(0.0)))
        .withColumn(
            "w_old",
            F.col("n_docs").cast("double") / F.col("__tot_docs").cast("double"),
        )
        .withColumn("__tilt", F.col("w_old") * F.exp(F.lit(float(eta)) * F.col("excess")))
    )
    # normalizer: sorted fold over the bounded domain axis — the
    # deterministic-summation handoff (identical order in the oracle)
    z = tilted.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "__tilt"))),
            F.lit(0.0),
            lambda acc, s: acc + s.getField("__tilt"),
        ).alias("__z")
    )
    return (
        tilted.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            F.round("w_old", 9).alias("w_old"),
            F.round("loss", 9).alias("loss"),
            F.round("excess", 9).alias("excess"),
            F.round(F.col("__tilt") / F.col("__z"), 9).alias("w_new"),
        )
        .orderBy("source")
    )
