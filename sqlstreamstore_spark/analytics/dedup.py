"""Deduplication operators over `documents` — exact and near-dup, the
shapes a 100 TB training-data pipeline needs.

Scale design notes:
  - exact: one hash-groupBy on md5(text) — partial agg map-side; the
    digest (16 bytes) shuffles, never the text.
  - n-gram Jaccard: explode shingles → self-join on shingle → count
    intersections. The shuffle key is the shingle; hot shingles (stop
    phrases) skew the join — mitigate by dropping top-frequency
    shingles (`max_shingle_df`), the standard trick, which also
    removes noise pairs. AQE skew-join handles the residue.
  - MinHash/LSH: signatures via xxhash64 (JVM-side, k permutations),
    banded into buckets; candidate pairs only within buckets — the
    classic sub-quadratic path. Verification joins candidates back to
    exact Jaccard.
  - SimHash: 64-bit signature from per-token xxhash64 bit-votes;
    near-dup = small Hamming distance on a 64-bit int.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a text column (built-in transform over
    the token array — no UDF)."""
    toks = F.split(col, " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)]),
        )
    )


def exact_dedup_groups(documents: DataFrame, limit: int = 500) -> DataFrame:
    """Exact duplicate groups by content hash; keeper = min doc_id.

    Oracle: GROUP BY md5(text) in DuckDB (identical digests). Only the
    16-byte digest shuffles, never the text.
    """
    return (
        documents.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
        .orderBy("keep_doc_id")
        .limit(limit)
    )


def exact_dedup_keepers(documents: DataFrame) -> DataFrame:
    """Deduplicated corpus: one representative (min doc_id) per distinct
    text — the actual dedup transform a pipeline applies."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    return (
        documents.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All document pairs with word-n-gram Jaccard similarity >= threshold.

    doc-shingle explode → equi-join on shingle → per-pair intersection
    count; |A∪B| from per-doc distinct counts. Jaccard is an exact
    int/int division (bit-identical in the oracle).
    """
    sh = documents.select(
        "doc_id", F.explode(_shingles(F.col("text"), n)).alias("s")
    )
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("s").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("s")
        )
        sh = sh.join(rare, "s")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def minhash_signatures(documents: DataFrame, k: int = 32, n: int = 3) -> DataFrame:
    """k-permutation MinHash signature per document.

    h_i(s) = xxhash64(s, seed=i) — k independent 64-bit hash families,
    all JVM-side. Signature = array of per-family minima over the
    shingle set (aggregate over the exploded shingles: one shuffle on
    doc_id with partial min combine).
    """
    sh = documents.select("doc_id", F.explode(_shingles(F.col("text"), n)).alias("s"))
    mins = [F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"h{i}") for i in range(k)]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(k)]).alias("signature")
    )


def minhash_lsh_candidates(
    documents: DataFrame, k: int = 32, bands: int = 8, n: int = 3
) -> DataFrame:
    """LSH candidate pairs: split the k-wide signature into `bands`
    bands of k/bands rows; docs sharing any band-hash are candidates.
    Sub-quadratic: the join key is (band_id, band_hash)."""
    assert k % bands == 0
    r = k // bands
    sig = minhash_signatures(documents, k=k, n=n)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(*[F.col("signature")[bi * r + j] for j in range(r)]).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "e.band", "e.bh")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def minhash_dedup_pairs(
    documents: DataFrame,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates verified with exact n-gram Jaccard — the full
    sub-quadratic near-dup pipeline. At scale the candidate set is
    orders of magnitude smaller than the pair space; the verify join
    touches only candidates."""
    cands = minhash_lsh_candidates(documents, k=k, bands=bands, n=n)
    exact = ngram_jaccard_pairs(documents, n=n, threshold=threshold)
    return cands.join(exact, ["doc_a", "doc_b"]).orderBy("doc_a", "doc_b")


def connected_components(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """Duplicate-cluster labeling: connected components over a near-dup
    pair graph by iterative min-label propagation (the standard
    distributed CC — each round every node takes the min label in its
    closed neighborhood; converges in O(graph diameter) rounds).

    Input: edges(doc_a, doc_b). Output: (doc_id, component) where
    component = min doc_id reachable — the cluster's canonical keeper.

    Scale notes: each round is one shuffle keyed by node id; the label
    frontier is localCheckpoint'ed per round — iterative DataFrame
    algorithms MUST truncate lineage, or the plan (and analysis cost)
    grows exponentially with rounds. The loop exits on a metric count
    (changed == 0). Diameter of near-dup clusters is tiny in practice
    (dup groups are near-cliques), so rounds ≈ 2-4. For adversarial
    chain-shaped graphs switch to large-star/small-star, which
    converges in O(log n) rounds with the same per-round shape.
    """
    sym = (
        edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), "comp").orderBy("doc_id")


def near_dup_components(
    documents: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Full near-dup clustering: n-gram Jaccard pairs → connected
    components → (doc_id, component-keeper) labels."""
    pairs = ngram_jaccard_pairs(documents, n=n, threshold=threshold).select("doc_a", "doc_b")
    return connected_components(pairs)


def simhash_signatures(documents: DataFrame) -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, each bit votes
    +1/−1 weighted by token frequency; sign of the vote sum sets the bit.

    Pure built-ins: explode tokens → groupBy(doc, bit) is avoided by
    aggregating all 64 bit-votes as an array sum — one shuffle on
    doc_id."""
    tok = F.explode(F.split(F.col("text"), " ")).alias("t")
    toks = documents.select("doc_id", tok)
    h = F.xxhash64(F.col("t"))
    votes = F.array(
        *[
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
            for i in range(64)
        ]
    )
    summed = (
        toks.select("doc_id", votes.alias("v"))
        .groupBy("doc_id")
        .agg(*[F.sum(F.col("v")[i]).alias(f"b{i}") for i in range(64)])
    )
    # bit i of the signature = (vote sum for bit i) > 0; bit 63 is the
    # sign bit of the two's-complement long.
    terms = [
        F.when(F.col(f"b{i}") > 0, F.lit(-(1 << 63) if i == 63 else (1 << i)).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    sig = terms[0]
    for t in terms[1:]:
        sig = sig + t
    return summed.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(documents: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded on the four
    16-bit quarters (a pair within Hamming<=... shares at least one
    quarter by pigeonhole when distance < 4 bits per band — used as the
    candidate filter, then exact popcount verify)."""
    sig = simhash_signatures(documents)
    quarters = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright(F.col("simhash"), q * 16).bitwiseAND(F.lit(0xFFFF)).alias("qh"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "simhash", "e.q", "e.qh")
    a, b = quarters.alias("a"), quarters.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    hamming = F.bit_count(xor)
    return (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.qh") == F.col("b.qh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )
