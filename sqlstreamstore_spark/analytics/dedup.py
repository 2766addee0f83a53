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
  - MinHash/LSH: signatures via k independent hash families (md5 by
    default — DuckDB computes identical digests, so the gate oracles
    the whole pipeline; xxhash64 family available for production),
    banded into buckets; candidate pairs only within buckets — the
    classic sub-quadratic path. Verification joins candidates back to
    exact Jaccard.
  - SimHash: 64-bit signature (16 hex chars) from per-token md5
    bit-votes; near-dup = small Hamming distance, quarter-banded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _shingles_arr(toks: Column, n: int = 3) -> Column:
    """:func:`_shingles` over a PRE-SPLIT token-array column (r12 wave
    9, guide §1.6): referencing ``split(text)`` inside the transform
    lambda re-evaluates the split once PER GRAM under interpreted
    expression eval — callers project the split once and shingle the
    array (identical expression tree below the split → identical
    grams; measured 2.7× on the full-corpus gram explode)."""
    # slice + array_join beats n element_at calls ~5x: one ranged copy
    # per gram instead of n independent bounds-checked lookups.
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
        lambda i: F.array_join(F.slice(toks, i + F.lit(1), n), " "),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a text column (built-in transform over
    the token array — no UDF). Documents with fewer than n tokens yield
    an empty set — guarded with a CASE branch because
    ``sequence(0, size-n)`` runs DESCENDING when size < n and the
    out-of-range ``element_at`` then throws under ANSI mode (Spark 4
    default); the oracle twin's ``WHERE len(w) >= n`` has the same
    semantics. Hot call sites pre-split and use :func:`_shingles_arr`
    directly."""
    return _shingles_arr(F.split(col, " "), n)


def exploded_shingles(
    documents: DataFrame, n: int = 3, alias: str = "s",
    keys: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(keys…, gram) explode with the split projected ONCE below the
    Generate (r12 wave 9 — see :func:`_shingles_arr`)."""
    return documents.select(
        *keys, F.split(F.col("text"), " ").alias("_toks")
    ).select(*keys, F.explode(_shingles_arr(F.col("_toks"), n)).alias(alias))


def shingle_sets(
    documents: DataFrame, n: int = 3, alias: str = "ss",
    keys: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(keys…, gram-set) projection with the split projected ONCE
    below the shingle transform (r12 wave 9)."""
    return documents.select(
        *keys, F.split(F.col("text"), " ").alias("_toks")
    ).select(*keys, _shingles_arr(F.col("_toks"), n).alias(alias))


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


def derive_shingle_df_cap(n_docs: int, floor: int = 64) -> int:
    """Default hot-shingle document-frequency cap: max(floor, ceil(√N)).

    Rationale (the derive_lsh_bits pattern applied to the shingle join):
    the shingle equi-join's mass is Σ df², so one boilerplate shingle
    appearing in d documents contributes d² candidate pairs — the skew
    blow-up that turns the join all-pairs on real corpora. Capping df at
    √N bounds any single shingle's contribution to N pairs (linear), so
    total mass stays O(V·N) instead of O(N²), while the floor keeps the
    cap a no-op on small/closed-vocabulary corpora (the gate fixture's
    max df is 25). A shingle shared by more than √N documents is
    boilerplate by construction — dropping it loses only pairs that
    other, rarer shingles still witness (VERDICT r5 #4)."""
    import math

    return max(floor, math.isqrt(max(0, n_docs - 1)) + 1)


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None | str = "auto",
    pin_shingles: bool = True,
) -> DataFrame:
    """All document pairs with word-n-gram Jaccard similarity >= threshold.

    doc-shingle explode → equi-join on shingle → per-pair intersection
    count; |A∪B| from per-doc distinct counts. Jaccard is an exact
    int/int division (bit-identical in the oracle).

    The shingle frame feeds three plan branches (both join sides +
    sizes); ``pin_shingles`` localCheckpoints it so the explode runs
    once instead of per-branch (~2× at sf0.1). localCheckpoint, not
    persist: its blocks are GC-reclaimed with the plan, while a
    DataFrame persist stays pinned in the cache manager until an
    explicit unpersist — the leak pattern flagged in round 1. Set False
    to keep the plan fully lazy (e.g. when the input itself is huge and
    recompute is cheaper than materializing the exploded corpus).
    """
    if max_shingle_df == "auto":
        # one count job, the derive_lsh_bits pattern: default-safe on
        # skewed corpora, no-op on the closed-vocabulary fixture
        max_shingle_df = derive_shingle_df_cap(documents.count())
    from sqlstreamstore_spark.operators.partitioning import with_min_parallelism

    sh = exploded_shingles(with_min_parallelism(documents), n)
    if pin_shingles:
        sh = sh.localCheckpoint(eager=False)
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


def jaccard_prefix_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """AllPairs/PPJoin-style prefix-filtered exact Jaccard self-join —
    the same output as ngram_jaccard_pairs, without the full shingle
    self-join.

    Prefix filter (Bayardo et al., WWW'07): under a global shingle
    ordering, a pair with Jaccard ≥ t must share at least one shingle
    inside each side's PREFIX — its |S| − ⌈t·|S|⌉ + 1 globally-rarest
    shingles (J ≥ t ⇒ |A∩B| ≥ t·|A∪B| ≥ t·|A|; if the prefix were
    disjoint, at most ⌈t·|A|⌉ − 1 < t·|A| shingles could match).
    Candidates therefore come from an equi-join of prefixes only, and
    rarest-first ordering makes the surviving join keys low-frequency —
    the hot-shingle skew that dominates the plain self-join at 100 TB
    is filtered out by construction, not salted around. Verification
    joins candidates back to per-doc shingle SETS (array_intersect on
    linear state), exactly like minhash_dedup_pairs — but unlike LSH
    this path is EXACT: recall 1.0 by the filter theorem, no tuning.

    Global ordering = (document frequency ASC, shingle ASC), realized
    per-doc with a window — no global rank materialization, so nothing
    single-partition at any scale.

    Regime (measured, sf0.1, BASELINE.md §3d): the prefix cut shrinks
    the join mass Σdf² 2.8× here (2.79M→0.99M), but on THIS fixture the
    plain self-join's mass is already trivial, so the extra df-join +
    window + distinct make the prefix path ~3× slower wall-clock. The
    crossover favors prefix filtering when the mass is the bottleneck:
    real corpora grow vocabulary with N (Heaps' law), keeping each
    doc's rarest shingles rare — prefix mass stays near-linear while
    the plain join's Zipf head explodes quadratically. The fixture's
    31-word vocabulary is the adversarial case: every shingle's df
    grows linearly with N, so both paths are quadratic and only the
    constant separates them. Production rule: prefix-filter when
    df-quantiles shift with corpus growth (open vocabulary); plain
    join + `max_shingle_df` hot-key drop when vocabulary is closed.
    """
    from pyspark.sql import Window

    sh = exploded_shingles(documents, n).localCheckpoint(eager=False)
    df = sh.groupBy("s").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    ranked = (
        sh.join(df, "s")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_sh", F.count("*").over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    ).select("doc_id", "s")
    cands = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sets = shingle_sets(documents, n)
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b"))
    n_inter = F.size(F.array_intersect(F.col("ss_a"), F.col("ss_b"))).cast("bigint")
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            n_inter.alias("n_inter"),
            F.size(F.col("ss_a")).cast("bigint").alias("n_a"),
            F.size(F.col("ss_b")).cast("bigint").alias("n_b"),
        )
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def minhash_signatures(
    documents: DataFrame, k: int = 32, n: int = 3, family: str = "md5"
) -> DataFrame:
    """k-permutation MinHash signature per document.

    Hash families:
      - ``md5`` (default): h_i(s) = md5(f"{i}:{s}") as a lowercase hex
        STRING; the per-family minimum is the lexicographic min — a
        valid MinHash because md5 is uniform over the hex-string order.
        Chosen because DuckDB computes the identical digest, so the
        whole LSH pipeline is oracle-checkable end to end.
      - ``xxhash64``: h_i(s) = xxhash64(s, seed=i) as int64 — cheaper
        (no digest, 8-byte shuffle vs 32) for production runs where
        cross-engine verification isn't needed.

    Either way all hashing is JVM-side built-ins; signature = array of
    per-family minima over the shingle set (one shuffle on doc_id with
    partial min combine).
    """
    from sqlstreamstore_spark.operators.partitioning import with_min_parallelism

    # the shingle explode + k-way partial min is the heavy MAP phase —
    # don't let a single-file input serialize it (no-op at scale)
    documents = with_min_parallelism(documents)
    sh = exploded_shingles(documents, n)
    if family == "md5":
        mins = [
            F.min(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("s")))).alias(f"h{i}")
            for i in range(k)
        ]
    else:
        mins = [F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"h{i}") for i in range(k)]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(k)]).alias("signature")
    )


def minhash_lsh_candidates(
    documents: DataFrame, k: int = 32, bands: int = 8, n: int = 3, family: str = "md5"
) -> DataFrame:
    """LSH candidate pairs: split the k-wide signature into `bands`
    bands of k/bands rows; docs sharing any band-hash are candidates.
    Sub-quadratic: the join key is (band_id, band_hash)."""
    banded = _banded_rows(documents, k=k, bands=bands, n=n, family=family)
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
    family: str = "md5",
) -> DataFrame:
    """LSH candidates verified with exact n-gram Jaccard — the full
    sub-quadratic near-dup pipeline.

    The verify step touches ONLY candidates: each (doc_a, doc_b) pair is
    joined back to the two documents' distinct-shingle SETS (kept as
    arrays, one row per doc — linear state, never exploded) and Jaccard
    is computed with ``array_intersect``/``size`` per pair. The
    full-corpus shingle self-join — the quadratic blow-up LSH exists to
    avoid — never runs; the only corpus-wide shuffles are the linear
    signature/banding passes and one doc_id-keyed join per pair side.
    The intersection arithmetic is the same int/int division as
    ngram_jaccard_pairs, so the md5-family oracle stays bit-identical.
    """
    from sqlstreamstore_spark.operators.partitioning import with_min_parallelism

    cands = minhash_lsh_candidates(documents, k=k, bands=bands, n=n, family=family)
    # the per-doc shingle-SET build (transform + slice + array_join +
    # array_distinct over every token) is the verify side's heavy map —
    # spread it like the signature pass (r12; no-op at scale)
    sets = shingle_sets(with_min_parallelism(documents), n)
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b"))
    n_inter = F.size(F.array_intersect(F.col("ss_a"), F.col("ss_b"))).cast("bigint")
    n_a = F.size(F.col("ss_a")).cast("bigint")
    n_b = F.size(F.col("ss_b")).cast("bigint")
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_inter.alias("n_inter"),
            n_a.alias("n_a"),
            n_b.alias("n_b"),
        )
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def connected_components(
    edges: DataFrame, max_iters: int = 25, driver_edge_limit: int = 2_000_000
) -> DataFrame:
    """Duplicate-cluster labeling: connected components over a near-dup
    pair graph by iterative min-label propagation (the standard
    distributed CC — each round every node takes the min label in its
    closed neighborhood; converges in O(graph diameter) rounds).

    Input: edges(doc_a, doc_b). Output: (doc_id, component) where
    component = min doc_id reachable — the cluster's canonical keeper.

    Adaptive small-graph fast path: the edge list after LSH candidate
    generation is orders of magnitude smaller than the corpus (it's the
    duplicate graph, not the data), so when it fits the
    ``driver_edge_limit`` gate (default 2M edges ≈ 32 MB) the component
    labels come from one collect + union-find on the driver — the same
    model-sized-state-on-the-driver regime as the k-means centroids.
    One Spark job instead of 3 per propagation round, identical output.

    Scale notes (distributed path, above the gate): each round is one
    shuffle keyed by node id; the label frontier is localCheckpoint'ed
    per round — iterative DataFrame algorithms MUST truncate lineage,
    or the plan (and analysis cost) grows exponentially with rounds.
    The loop exits on a metric count (changed == 0). Diameter of
    near-dup clusters is tiny in practice (dup groups are near-cliques),
    so rounds ≈ 2-4. For adversarial chain-shaped graphs switch to
    large-star/small-star, which converges in O(log n) rounds with the
    same per-round shape.
    """
    if driver_edge_limit > 0:
        head = (
            edges.select(
                F.col("doc_a").cast("long").alias("u"),
                F.col("doc_b").cast("long").alias("v"),
            )
            .limit(driver_edge_limit + 1)
            .toPandas()
        )
        if len(head) <= driver_edge_limit:
            return _driver_union_find(edges.sparkSession, head)
    sym = (
        edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("u").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=False)
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
            .localCheckpoint(eager=False)
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


def extend_components(
    labels: DataFrame,
    new_edges: DataFrame,
    max_iters: int = 25,
    driver_edge_limit: int = 2_000_000,
) -> DataFrame:
    """INCREMENTAL connected-components maintenance (round 9): given
    the corpus's existing ``(doc_id, comp)`` labeling (comp = min
    reachable doc_id, the :func:`connected_components` contract) and
    NEW edges from an ingest delta — (new, old) index-probe pairs plus
    delta-internal pairs — relabel ONLY the affected subgraph instead
    of re-running CC over the whole corpus graph.

    Contraction argument: replace each edge endpoint by its current
    component id (or itself for unlabeled/new nodes) and run CC on
    that CONTRACTED graph — one node per affected component + the new
    nodes, edge count ≤ |new_edges|, orders smaller than the corpus.
    A contracted component's min node id equals the merged component's
    true min doc_id (old comp ids ARE their components' min ids; new
    node ids participate directly), so the relabeled output is
    IDENTICAL to a full recompute over the union graph — pinned by
    the gate oracle and pytest. New-node ids must not collide with
    corpus ids (true for any ingest: ids are fresh).

    Returns the updated labeling covering every previously labeled
    node plus every node appearing in ``new_edges`` (callers fill
    never-seen singletons with comp = own id, as semantic_clusters
    does).

    Scale shape: two broadcast-ish lookups of the label frame on the
    delta edges (the label side is corpus-sized but joins by key —
    shuffled equi-join at scale), CC on the contracted graph (delta-
    bounded — almost always the driver union-find fast path), then ONE
    broadcast relabel join of the affected-comp map against the corpus
    labels. No corpus-wide iteration, ever."""
    # barriers (r12 optimization): the delta edge set is referenced by
    # the contraction AND both new-node projections, and the label
    # frame by four branches (two contraction lookups, the relabel,
    # the anti-join) — without them each reference re-ran the upstream
    # LSH probes / label derivation (measured: the incremental
    # semantic-components gate re-executed its index probe ~4x)
    new_edges = new_edges.localCheckpoint(eager=False)
    labels = labels.localCheckpoint(eager=False)
    la = labels.select(F.col("doc_id").alias("doc_a"), F.col("comp").alias("__ca"))
    lb = labels.select(F.col("doc_id").alias("doc_b"), F.col("comp").alias("__cb"))
    contracted = (
        new_edges.join(la, "doc_a", "left")
        .join(lb, "doc_b", "left")
        .select(
            F.coalesce("__ca", "doc_a").alias("doc_a"),
            F.coalesce("__cb", "doc_b").alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )
    comp_map = connected_components(
        contracted, max_iters=max_iters, driver_edge_limit=driver_edge_limit
    ).select(F.col("doc_id").alias("rep"), F.col("comp").alias("newcomp"))
    relabeled = (
        labels.join(
            F.broadcast(comp_map), labels.comp == comp_map.rep, "left"
        )
        .select("doc_id", F.coalesce("newcomp", "comp").alias("comp"))
    )
    new_nodes = (
        new_edges.select(F.col("doc_a").alias("doc_id"))
        .union(new_edges.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .join(labels.select("doc_id"), "doc_id", "left_anti")
    )
    new_labeled = (
        new_nodes.join(
            F.broadcast(comp_map), new_nodes.doc_id == comp_map.rep, "left"
        )
        .select("doc_id", F.coalesce("newcomp", F.col("doc_id")).alias("comp"))
    )
    return relabeled.unionByName(new_labeled)


def _driver_union_find(spark, edges_pdf) -> DataFrame:
    """Union-find with path compression over a collected edge frame;
    labels every node with the min id of its component (the exact
    output contract of the distributed loop)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(edges_pdf["u"].tolist(), edges_pdf["v"].tolist()):
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min id so every root is its component's minimum
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    rows = sorted((n, find(n)) for n in parent)
    # Arrow ship (r12 optimization): the label frame is re-shipped to
    # the JVM on EVERY downstream reference; the pickled-row path paid
    # that per-row, the pandas input goes as one Arrow batch.
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "comp"]).astype("int64")
    return spark.createDataFrame(pdf, "doc_id long, comp long")


def near_dup_components(
    documents: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Full near-dup clustering: n-gram Jaccard pairs → connected
    components → (doc_id, component-keeper) labels."""
    pairs = ngram_jaccard_pairs(documents, n=n, threshold=threshold).select("doc_a", "doc_b")
    return connected_components(pairs)


_HEX = "0123456789abcdef"


def _hex_digit(col: Column, p: int) -> Column:
    """Value 0-15 of the 1-based p-th hex char of a lowercase hex string.

    instr over a literal alphabet — DuckDB's ``instr`` computes the
    identical value, which is why the SimHash pipeline below is
    oracle-checkable (unlike a native 64-bit hash family).
    """
    return F.instr(F.lit(_HEX), F.substring(col, p, 1)) - F.lit(1)


def simhash_signatures(documents: DataFrame) -> DataFrame:
    """64-bit SimHash per document as a 16-char lowercase hex string.

    Per-token md5 → first 16 hex chars = 64 bits; each bit votes +1/−1
    weighted by token frequency; sign of the vote sum sets the bit. Bit
    (p, b) lives at hex char p (1-based), sub-bit b — the output digit
    at char p repacks its own 4 majority bits, so the signature is
    position-aligned with the per-token hashes.

    Pure built-ins: explode tokens → 64 sums in ONE groupBy on doc_id
    (partial agg map-side). md5 (not xxhash64) so DuckDB computes
    bit-identical signatures for the oracle.
    """
    # r12: hash in the explode projection — one md5 per token by
    # construction (the 64 vote expressions then read hex chars of the
    # materialized column instead of leaning on codegen CSE inside the
    # partial aggregate), and the token string drops before the agg
    toks = documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).select("doc_id", F.md5(F.col("t")).alias("__h"))
    h = F.col("__h")
    # bit b of hex char p via a branch-free character translate (one
    # table lookup per vote; an instr+shift+mask formulation costs ~2x
    # in the per-token hot loop)
    bit_tables = {
        b: "".join("1" if (int(c, 16) >> b) & 1 else "0" for c in _HEX) for b in range(4)
    }
    votes = [
        F.when(
            F.translate(F.substring(h, p, 1), _HEX, bit_tables[b]) == "1", F.lit(1)
        ).otherwise(F.lit(-1))
        for p in range(1, 17)
        for b in range(4)
    ]
    summed = toks.groupBy("doc_id").agg(
        *[F.sum(votes[i]).alias(f"v{i}") for i in range(64)]
    )
    hex_alphabet = F.array(*[F.lit(c) for c in _HEX])
    out_digits = [
        sum(
            (F.when(F.col(f"v{p * 4 + b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)) for b in range(4)),
            start=F.lit(0),
        )
        for p in range(16)
    ]
    sig = F.concat(*[F.element_at(hex_alphabet, d + 1) for d in out_digits])
    return summed.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(documents: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded on the four
    16-bit (4-hex-char) quarters: a pair within Hamming <= 3·4 shares at
    least one quarter by pigeonhole — used as the candidate filter, then
    exact per-digit popcount verify."""
    # r12 (guide §2.1): both quarter-banded self-join sides read the
    # signature frame — barrier it so the 64-vote aggregate runs once
    sig = simhash_signatures(documents).localCheckpoint(eager=False)
    quarters = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.substring(F.col("simhash"), q * 4 + 1, 4).alias("qh"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "simhash", "e.q", "e.qh")
    a, b = quarters.alias("a"), quarters.alias("b")
    hamming = sum(
        (
            F.bit_count(
                _hex_digit(F.col("a.simhash"), p).bitwiseXOR(_hex_digit(F.col("b.simhash"), p))
            )
            for p in range(1, 17)
        ),
        start=F.lit(0),
    )
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
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def minhash_lsh_recall(
    documents: DataFrame,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    family: str = "md5",
) -> DataFrame:
    """LSH quality verification: one row with the exact near-dup pair
    count, the candidate count, how many true pairs the candidates hit,
    and the recall — the measurement a pipeline owner watches when
    tuning (k, bands). Fully oracle-checkable with the md5 family."""
    # three counts below would otherwise recompute each side twice
    exact = (
        ngram_jaccard_pairs(documents, n=n, threshold=threshold)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    cands = minhash_lsh_candidates(
        documents, k=k, bands=bands, n=n, family=family
    ).localCheckpoint(eager=False)
    hit = exact.join(cands, ["doc_a", "doc_b"])
    n_exact = exact.count()
    n_cands = cands.count()
    n_hit = hit.count()
    recall = float(n_hit) / n_exact if n_exact else 1.0
    spark = documents.sparkSession
    return spark.createDataFrame(
        [(n_exact, n_cands, n_hit, recall)],
        "n_exact bigint, n_candidates bigint, n_hit bigint, recall double",
    )


# Layout sidecar for materialized indexes whose probe/upsert need a
# build-time parameter (the banded-LSH bucket count): a tiny JSON next
# to the data (underscore-prefixed — Spark's file index ignores it).
# Written via the Hadoop FS so it works on any scheme.
LAYOUT_FILE = "_INDEX_LAYOUT.json"


def write_index_layout(spark, path: str, layout: dict) -> None:
    import json

    from sqlstreamstore_spark.sources.hadoopfs import fs_write_text

    fs_write_text(
        spark, path.rstrip("/") + "/" + LAYOUT_FILE, json.dumps(layout)
    )


def read_index_layout(spark, path: str) -> dict | None:
    import json

    from sqlstreamstore_spark.sources.hadoopfs import fs_exists, fs_read_text

    p = path.rstrip("/") + "/" + LAYOUT_FILE
    if not fs_exists(spark, p):
        return None
    return json.loads(fs_read_text(spark, p))


def _bb_col(bh_buckets: int) -> Column:
    # works for both families: bh is a hex string (md5) or a bigint
    # (xxhash64); pmod keeps the bucket id non-negative
    return F.pmod(F.xxhash64("bh"), F.lit(bh_buckets))


def build_minhash_index(
    documents: DataFrame,
    path: str,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    family: str = "md5",
    bh_buckets: int | None = None,
) -> None:
    """Materialize the corpus's banded MinHash-LSH index: one row per
    (doc_id, band, band_hash), written partitioned BY BAND — the
    index-once shape for INCREMENTAL fuzzy dedup (a daily crawl checks
    its delta against this instead of re-signaturing the corpus).
    Signature/banding is exactly :func:`minhash_lsh_candidates`'s, so
    a delta join against the stored rows reproduces the self-join's
    candidates restricted to (new, old) pairs.

    ``bh_buckets=B`` (round 12, VERDICT r11 #2) sub-partitions each
    band by ``pmod(xxhash64(bh), B)`` — band × B directories — so an
    incremental probe can PRUNE its index scan to the delta's own
    buckets (a bounded ≤B-literal partition filter) instead of reading
    every band file. The bucket count is recorded in a layout sidecar;
    upserts and probes self-configure from it, so a build/upsert
    modulus mismatch (which would silently MISS duplicates) cannot
    happen.

    At 100 TB: the build is the same one-pass signature aggregation
    the self-join already pays, amortized across every future delta;
    probing broadcasts the delta's band rows so the index side is a
    map-side join over a pruned (band, bh, doc_id) projection — no
    index shuffle."""
    banded = _banded_rows(documents, k=k, bands=bands, n=n, family=family)
    if bh_buckets:
        (
            banded.withColumn("bb", _bb_col(bh_buckets))
            .repartition(F.col("band"), F.col("bb"))
            .write.partitionBy("band", "bb")
            .mode("overwrite")
            .parquet(path)
        )
        write_index_layout(
            documents.sparkSession, path,
            {"kind": "minhash_bands", "bh_buckets": bh_buckets},
        )
    else:
        banded.repartition("band").write.partitionBy("band").mode(
            "overwrite"
        ).parquet(path)


def upsert_minhash_index(
    new_docs: DataFrame,
    path: str,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    family: str = "md5",
) -> None:
    """Incremental index maintenance: signature ONLY the new docs and
    append their band rows into the partitioned layout — work is
    O(delta); existing files are never rewritten (the
    upsert_ivf_index monoid pattern: append is the merge, and
    merge == rebuild is pytest-pinned). Bucketed layouts (see
    ``build_minhash_index(bh_buckets=...)``) are detected from the
    sidecar and preserved; pointer-mode roots append into the live
    version dir."""
    from sqlstreamstore_spark.sources.hadoopfs import resolved

    spark = new_docs.sparkSession
    live = resolved(spark, path)
    layout = read_index_layout(spark, path) or read_index_layout(spark, live)
    banded = _banded_rows(new_docs, k=k, bands=bands, n=n, family=family)
    if layout and layout.get("bh_buckets"):
        (
            banded.withColumn("bb", _bb_col(int(layout["bh_buckets"])))
            .repartition(F.col("band"), F.col("bb"))
            .write.partitionBy("band", "bb")
            .mode("append")
            .parquet(live)
        )
    else:
        banded.repartition("band").write.partitionBy("band").mode(
            "append"
        ).parquet(live)


def _banded_rows(
    documents: DataFrame, k: int, bands: int, n: int, family: str
) -> DataFrame:
    """(doc_id, band, bh) rows — the LSH join key material, shared by
    the self-join candidates and the materialized index."""
    assert k % bands == 0
    r = k // bands
    sig = minhash_signatures(documents, k=k, n=n, family=family)
    if family == "md5":
        band_hash = lambda bi: F.md5(  # noqa: E731
            F.concat_ws("|", *[F.col("signature")[bi * r + j] for j in range(r)])
        )
    else:
        band_hash = lambda bi: F.xxhash64(  # noqa: E731
            *[F.col("signature")[bi * r + j] for j in range(r)]
        )
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bi).alias("band"), band_hash(bi).alias("bh"))
                    for bi in range(bands)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "e.band", "e.bh")


def minhash_dedup_incremental(
    spark,
    index_path: str,
    incoming: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.5,
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    family: str = "md5",
) -> DataFrame:
    """Fuzzy INCREMENTAL dedup — the production daily-crawl shape:
    check a delta of new documents against the MATERIALIZED corpus
    LSH index (:func:`build_minhash_index`) instead of re-running the
    corpus self-join. Work ∝ delta signatures + index probe + exact
    verify of the candidates; the corpus is never re-signatured.

    Steps: (1) band the delta (one aggregation over delta shingles);
    (2) candidates = delta bands ⋈ stored index on (band, bh) — the
    delta side BROADCASTS, so the index side is a map-side join, no
    index shuffle; (3) exact n-gram Jaccard verify joins each
    candidate pair back to the two documents' distinct-shingle SETS
    (arrays — linear state, exactly minhash_dedup_pairs' verify), old
    side taken from ``corpus`` so only candidate texts are shingled.

    Output: (new_doc, old_doc, n_inter, n_new, n_old, jaccard ≥
    threshold) ordered — "which incoming documents are near-dups of
    something already in the corpus", the decision input for a
    keep/drop-on-ingest policy. New-vs-new pairs are out of scope by
    contract (run the self-join on the delta for those).

    Exact int/int Jaccard arithmetic — the md5 family replays
    bit-identically in the DuckDB oracle."""
    from sqlstreamstore_spark.sources.hadoopfs import resolved

    inc_bands = _banded_rows(incoming, k=k, bands=bands, n=n, family=family)
    live = resolved(spark, index_path)
    layout = read_index_layout(spark, index_path) or read_index_layout(
        spark, live
    )
    idx = spark.read.parquet(live)
    if layout and layout.get("bh_buckets") and "bb" in idx.columns:
        # bucketed layout (r12): prune the index scan to the delta's
        # own buckets — the delta's distinct bucket ids are a bounded
        # collect (≤bh_buckets ints) that becomes a literal partition
        # filter. Checkpoint the delta's band rows so signaturing runs
        # once, not once per consumer.
        nb = int(layout["bh_buckets"])
        inc_bands = inc_bands.localCheckpoint()
        bbs = [
            r[0]
            for r in inc_bands.select(_bb_col(nb).alias("bb")).distinct().collect()
        ]
        idx = idx.filter(F.col("bb").isin(bbs))
    idx = idx.select(F.col("doc_id").alias("old_doc"), "band", "bh")
    cands = (
        idx.join(
            F.broadcast(inc_bands.withColumnRenamed("doc_id", "new_doc")),
            ["band", "bh"],
        )
        # self-pair guard (ADVICE r8 #3): in the documented maintenance
        # flow (upsert_minhash_index appends the delta, the NEXT delta
        # probes) a re-ingested doc is already in the index and would
        # report itself as a jaccard=1.0 near-dup, poisoning a
        # keep/drop-on-ingest policy
        .filter(F.col("new_doc") != F.col("old_doc"))
        .select("new_doc", "old_doc")
        .distinct()
        # one shared InMemoryRelation for the verify join AND the
        # corpus prune below: the candidate probe join computes once
        # (persist marks the plan without running it — localCheckpoint
        # would force AQE stage materialization at build)
        .persist()
    )
    new_sets = incoming.select(
        F.col("doc_id").alias("new_doc"),
        F.split(F.col("text"), " ").alias("_toks"),
    ).select("new_doc", _shingles_arr(F.col("_toks"), n).alias("ss_new"))
    # VERDICT r8 #1: semi-join-prune the corpus to candidate old_docs
    # BEFORE shingling — the verify stage pays O(candidate texts), not a
    # full corpus scan+tokenize per delta (which would defeat the
    # materialized index at 100 TB). The shingle projection sits ABOVE
    # the semi-join (plan-pinned in tests/test_plans.py).
    cand_old = cands.select(F.col("old_doc").alias("doc_id")).distinct()
    old_sets = corpus.join(F.broadcast(cand_old), "doc_id", "left_semi").select(
        F.col("doc_id").alias("old_doc"),
        F.split(F.col("text"), " ").alias("_toks"),
    ).select("old_doc", _shingles_arr(F.col("_toks"), n).alias("ss_old"))
    n_inter = F.size(F.array_intersect(F.col("ss_new"), F.col("ss_old"))).cast(
        "bigint"
    )
    n_new = F.size(F.col("ss_new")).cast("bigint")
    n_old = F.size(F.col("ss_old")).cast("bigint")
    jac = F.col("n_inter").cast("double") / (
        F.col("n_new") + F.col("n_old") - F.col("n_inter")
    ).cast("double")
    return (
        cands.join(new_sets, "new_doc")
        .join(old_sets, "old_doc")
        .select(
            "new_doc",
            "old_doc",
            n_inter.alias("n_inter"),
            n_new.alias("n_new"),
            n_old.alias("n_old"),
        )
        .select("new_doc", "old_doc", "n_inter", "n_new", "n_old", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("new_doc", "old_doc")
    )


def incremental_new_docs(
    documents: DataFrame, key: str = "doc_id", existing_fraction: float = 0.9
) -> DataFrame:
    """Incremental-ingest exact dedup: which incoming documents carry
    content the existing corpus has never seen. The deterministic hash
    split stands in for corpus/batch (existing = the ``train`` side);
    production passes two real DataFrames to ``new_against_corpus``.

    Scale shape: the corpus side collapses to DISTINCT 16-byte digests
    before the anti-join — the only thing that shuffles; the incoming
    batch is typically a day's ingest and arrives pre-hashed. A 100 TB
    corpus is ~billions of digests: still a plain shuffled anti-join,
    or a broadcast when the corpus digest set is dim-sized.
    """
    from sqlstreamstore_spark.analytics.sampling import hash_split

    split = hash_split(documents, key, existing_fraction)
    existing = split.filter(F.col("split") == "train")
    incoming = split.filter(F.col("split") == "val")
    return new_against_corpus(incoming, existing)


def new_against_corpus(incoming: DataFrame, corpus: DataFrame) -> DataFrame:
    """Anti-join incoming docs against the corpus's content digests."""
    corpus_digests = corpus.select(F.md5("text").alias("__h")).distinct()
    return (
        incoming.withColumn("__h", F.md5("text"))
        .join(corpus_digests, "__h", "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


# Digest indexes are PARTITIONED by the digest's first two hex chars
# (256 dirs): a delta's probe then prunes the scan to the partitions
# its own digests can live in — O(min(|delta|, 256)/256 · index) read
# instead of O(index) (VERDICT r11 #2: the last O(corpus)-per-batch
# term in the streaming sink). The length is a fixed constant, not a
# knob: build, upsert and probe must agree, and the `hp` column's
# presence alone signals the layout (legacy flat indexes keep working,
# just unpruned). At 100 TB, 256 dirs over ~billions of 16-byte rows
# is ~4M digests per partition — one or a few row groups each.
DIGEST_PREFIX_LEN = 2


def build_digest_index(corpus: DataFrame, path: str) -> None:
    """Materialize the corpus's DISTINCT content digests (16-byte md5
    rows) — the exact-dedup side table for incremental ingest: a daily
    delta anti-joins this instead of re-hashing the corpus (round 9 —
    the same index-once lifecycle as build_minhash_index, one tier
    down). Written partitioned by the 2-hex-char digest prefix so
    probes partition-prune (see DIGEST_PREFIX_LEN). At 100 TB the
    index is ~billions of 16-byte rows; a probe reads only the
    prefixes its delta hashes to."""
    (
        corpus.select(F.md5("text").alias("__h"))
        .distinct()
        .withColumn("hp", F.substring("__h", 1, DIGEST_PREFIX_LEN))
        .repartition(F.col("hp"))
        .write.partitionBy("hp")
        .mode("overwrite")
        .parquet(path)
    )


DIGEST_TAIL_DIR = "_tail"


def _has_prefix_layout(spark, live: str) -> bool:
    """One directory listing (O(partition dirs), never O(files)): does
    the index carry hp= partition directories?"""
    from sqlstreamstore_spark.sources.hadoopfs import _fs_for, _jpath

    jp = _jpath(spark, live)
    fs = _fs_for(spark, jp)
    if not fs.exists(jp):
        return False
    for st in fs.listStatus(jp):
        if st.getPath().getName().startswith("hp="):
            return True
    return False


def upsert_digest_index(new_docs: DataFrame, path: str) -> None:
    """Append the new docs' digests — O(delta); duplicate digest rows
    are harmless (membership semantics, the anti-join is set-valued).

    Prefix-partitioned indexes get the LSM shape (r12 — the first
    sink_horizon rerun showed why): appending a micro-batch's digests
    INTO 256 hp= dirs writes one tiny file per touched prefix (~115
    files per 150-doc batch — 6k files over a 50-batch horizon, and
    every probe pays the listing+footer tax). Instead the delta lands
    as ONE flat file in ``live/_tail`` (underscore → invisible to the
    partitioned read); probes scan pruned-main ∪ tail, and
    :func:`roll_digest_tail` folds the tail into the partitions when
    it exceeds a file budget — exactly a Delta/Iceberg-style delta log
    over the base layout. Legacy flat indexes keep the direct append
    (their readers scan the root unpartitioned)."""
    from sqlstreamstore_spark.sources.hadoopfs import resolved

    spark = new_docs.sparkSession
    live = resolved(spark, path)
    digests = new_docs.select(F.md5("text").alias("__h")).distinct()
    if _has_prefix_layout(spark, live):
        digests.coalesce(1).write.mode("append").parquet(
            live.rstrip("/") + "/" + DIGEST_TAIL_DIR
        )
    else:
        digests.write.mode("append").parquet(live)


def _tail_dir_of(spark, live: str) -> str | None:
    from sqlstreamstore_spark.sources.hadoopfs import fs_exists

    t = live.rstrip("/") + "/" + DIGEST_TAIL_DIR
    return t if fs_exists(spark, t) else None


def read_digest_index(spark, path: str) -> DataFrame:
    """The index's full digest set (``__h`` column): partitioned main ∪
    un-rolled tail. Use this — not a bare ``read.parquet`` — whenever
    you need every member; the bare read silently skips ``_tail``."""
    from sqlstreamstore_spark.sources.hadoopfs import resolved

    live = resolved(spark, path)
    out = spark.read.parquet(live).select("__h")
    tail = _tail_dir_of(spark, live)
    if tail:
        out = out.unionByName(spark.read.parquet(tail).select("__h"))
    return out


def roll_digest_tail(spark, path: str, max_tail_files: int = 64) -> bool:
    """Fold the tail into the hp= partitions once it holds more than
    ``max_tail_files`` files (≈ that many upsert batches). One job ∝
    tail rows; crash-safe by append-then-delete (a crash leaves
    duplicate membership rows — harmless by set semantics). Returns
    True when a roll ran. Probe cost stays O(pruned main + tail), and
    total file count stays O(256 + tail budget) instead of growing by
    ~touched-prefixes per batch."""
    from sqlstreamstore_spark.sources.hadoopfs import (
        _fs_for,
        _jpath,
        fs_delete,
        resolved,
    )

    live = resolved(spark, path)
    tail = _tail_dir_of(spark, live)
    if tail is None:
        return False
    jp = _jpath(spark, tail)
    fs = _fs_for(spark, jp)
    n_files = sum(
        1
        for st in fs.listStatus(jp)
        if st.getPath().getName().endswith(".parquet")
    )
    if n_files <= max_tail_files:
        return False
    (
        spark.read.parquet(tail)
        .select("__h")
        .distinct()
        .withColumn("hp", F.substring("__h", 1, DIGEST_PREFIX_LEN))
        .coalesce(1)
        .write.partitionBy("hp")
        .mode("append")
        .parquet(live)
    )
    fs_delete(spark, tail)
    return True


def probe_digest_index(
    spark,
    path: str,
    delta: DataFrame,
    text_col: str = "text",
    keep_digest: bool = False,
) -> DataFrame:
    """``delta`` rows whose content digest is NOT in the index — the
    index-backed :func:`new_against_corpus`, with the scan PRUNED to
    the partitions the delta's own digests hash to: the delta's
    distinct 2-hex prefixes (a bounded collect, ≤256 strings) become
    literal partition filters, so per-batch read cost is
    O(min(|delta|, 256)/256 · index) instead of O(index). Returns the
    delta's columns unchanged (plus the ``__h`` digest when
    ``keep_digest`` — callers that window on the digest next, e.g. the
    streaming sink's first-wins step, reuse it instead of re-hashing).
    Legacy flat indexes (no ``hp`` column) fall back to the full
    anti-join — same results, no pruning."""
    from sqlstreamstore_spark.sources.hadoopfs import resolved

    live = resolved(spark, path)
    idx = spark.read.parquet(live)
    delta_h = delta.withColumn("__h", F.md5(text_col))
    if "hp" in idx.columns:
        prefixes = [
            r[0]
            for r in delta_h.select(
                F.substring("__h", 1, DIGEST_PREFIX_LEN).alias("hp")
            )
            .distinct()
            .collect()
        ]
        idx = idx.filter(F.col("hp").isin(prefixes))
    members = idx.select("__h")
    tail = _tail_dir_of(spark, live)
    if tail:  # un-rolled recent upserts: few flat files, full scan
        members = members.unionByName(spark.read.parquet(tail).select("__h"))
    out = delta_h.join(members, "__h", "left_anti")
    return out if keep_digest else out.drop("__h")


def compact_index(
    spark,
    path: str,
    partition_by: str | list[str] | None = None,
    target_partitions: int | None = None,
) -> None:
    """Compact a materialized index after many upserts — the third
    verb of the index lifecycle (build → upsert → COMPACT). Upserts
    append small files, and a re-sent delta appends rows that already
    exist (the digest/band upserts are idempotent by SET semantics,
    not by storage); compaction collapses exact duplicate rows and
    rewrites each partition as few large files, restoring scan
    efficiency without touching probe results.

    Works on the SET-SEMANTICS index layouts: banded-LSH rows
    partitioned by ``band``, flat digest sets, and the IVF layouts in
    :mod:`similarity` (pass ``partition_by="list_id"``). It is
    explicitly UNSUPPORTED for counter-valued indexes such as the
    (token, tf, df) term index (`text.build_term_index`): those hold
    legitimately identical partial rows from different batches whose
    duplicates carry count mass, and ``distinct()`` would silently
    corrupt the merged sums — use `text.compact_term_index` (a
    groupBy-sum rewrite) instead. A schema guard below refuses such
    paths.

    Filesystem: the retire-then-swap goes through the Hadoop
    FileSystem resolved from the path's scheme
    (:mod:`sqlstreamstore_spark.sources.hadoopfs`), so it works on
    ``file:``/HDFS/object stores alike; see that module's atomicity
    note (S3A rename is copy-based — constant-time swaps at scale
    layer a manifest pointer on top).

    At 100 TB: one distinct (shuffle on the index row, which is
    hash-sized — never document text) + one write clustered by the
    partition column so every output partition directory lands as a
    single large file per reducer. The rewrite goes to a sibling
    directory and is swapped in only after it completes, so a crashed
    compaction leaves the live index untouched."""
    from sqlstreamstore_spark.sources.hadoopfs import (
        next_version_dir,
        pointer_commit,
        pointer_resolve,
        prune_pointer_versions,
        recover_retired,
        retire_swap,
    )

    ptr = pointer_resolve(spark, path)
    if ptr is None:
        # crash recovery (ADVICE r9 #1): a crash between the swap
        # renames leaves the complete pre-compaction index at
        # .__retired__ and nothing at `path` — restore it on entry so
        # no data is ever stranded and a re-run starts from a live
        # index. (Pointer mode needs no recovery: the pointer always
        # names a complete version.)
        recover_retired(spark, path)
    src = path if ptr is None else ptr[1]
    layout = read_index_layout(spark, path)

    df = spark.read.parquet(src)
    # digest-index tail (r12 LSM shape): the bare read skips the
    # underscore-prefixed _tail dir — fold un-rolled digests in so
    # compaction never drops membership
    tail = _tail_dir_of(spark, src)
    if tail and "__h" in df.columns:
        df = df.unionByName(
            spark.read.parquet(tail)
            .select("__h")
            .withColumn("hp", F.substring("__h", 1, DIGEST_PREFIX_LEN)),
            allowMissingColumns=True,
        )
    df = df.distinct()
    # refuse counter-valued layouts (ADVICE r9 #3): distinct() on a
    # (token, tf, df) term index would collapse identical partial rows
    # whose duplicates carry count mass.
    banned = {"tf", "df"}
    if banned & set(df.columns):
        raise ValueError(
            f"compact_index is set-semantics only; {sorted(banned & set(df.columns))} "
            "columns indicate a counter-valued index — use "
            "text.compact_term_index instead"
        )
    if partition_by is None and target_partitions is None:
        # preserve the known partitioned layouts (r12): a bare compact
        # of a prefix-partitioned digest index or a bucketed band index
        # must not silently flatten the prune-enabling directories.
        if "hp" in df.columns:
            partition_by = ["hp"]
        elif "bb" in df.columns:
            partition_by = ["band", "bb"]
    part_cols = (
        [partition_by] if isinstance(partition_by, str) else list(partition_by or [])
    )
    if part_cols:
        df = df.repartition(*[F.col(c) for c in part_cols])
    elif target_partitions:
        df = df.repartition(target_partitions)

    if ptr is None:
        tmp = path.rstrip("/") + ".__compacting__"
        writer = df.write.mode("overwrite")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(tmp)
        # the sidecar rides INSIDE the rewrite so the swap carries it
        # atomically (a crash can't leave a bucketed index without its
        # layout record)
        if layout:
            write_index_layout(spark, tmp, layout)
        # retire-then-swap (Hadoop FS): the no-index window shrinks to
        # two renames, and a crash at any point leaves a COMPLETE index
        # (old at .__retired__ before the promote, new at `path` after)
        # — only cleanup is ever lost (the entry-time recovery above
        # restores a stranded .__retired__).
        retire_swap(spark, path, tmp)
    else:
        # POINTER MODE (VERDICT r11 #4): write the rewrite DIRECTLY
        # into the next version dir — no data rename at all — and
        # commit by replacing the one-line _CURRENT. Constant-time on
        # every scheme including raw object stores.
        v, vdir = next_version_dir(spark, path)
        writer = df.write.mode("overwrite")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(vdir)
        pointer_commit(spark, path, v, f"v{v}")
        prune_pointer_versions(spark, path, keep=2)


def substring_dup_spans(documents: DataFrame, k: int = 8) -> DataFrame:
    """Cross-document duplicated substring spans at token granularity —
    the exact-substring dedup signal of Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (2022), re-expressed
    relationally instead of via a suffix array: a position is
    *duplicated* when the k-token gram starting there also occurs in at
    least one OTHER document; runs of duplicated starts with gap <= k
    merge into maximal spans (an exact interval union under that break
    rule, since a gram at p covers [p, p+k-1] and a successor within k
    starts at or before p+k).

    Returns one row per document that carries at least one duplicated
    span: span count, tokens covered, longest span, covered-token
    ratio. A pipeline drops or trims the high-ratio tail.

    Scale shape at 100 TB: grams shuffle once keyed by md5(gram)
    (16 bytes — the text never shuffles); the cross-doc test is a
    min!=max partial aggregate per digest; the join back is a linear
    equi-join on the digest; span merging is a per-document window
    bounded by document length. No pair joins, no suffix structures,
    nothing all-pairs. Within-doc-only repeats are intentionally NOT
    counted (they are `repetition_signals`' job); this operator isolates
    the inter-document contamination the dedup pass must remove.
    """
    from pyspark.sql import Window

    # positional grams: struct(pos, digest); guarded by size >= k because
    # sequence(0, size-k) runs DESCENDING when size < k (ANSI gotcha, see
    # _shingles). The split is projected ONCE below the gram transform
    # (r12 wave 10 — the _shingles_arr rule: an inline split re-evaluates
    # once per gram).
    tk = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tk) - F.lit(k)),
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(F.array_join(F.slice(tk, i + F.lit(1), k), " ")).alias("h"),
        ),
    )
    from sqlstreamstore_spark.operators.partitioning import with_min_parallelism

    # pg feeds both the cross-doc aggregate and the join back — pin it so
    # the explode+md5 runs once (the ngram_novelty discipline;
    # localCheckpoint, not persist: blocks die with the plan). The
    # explode+md5 is the heavy MAP phase — spread a single-file input
    # first (no-op at scale).
    pg = (
        with_min_parallelism(documents)
        .select("doc_id", F.split(F.col("text"), " ").alias("_toks"))
        .filter(F.size(tk) >= k)
        .select("doc_id", F.explode(grams).alias("t"))
        .select("doc_id", F.col("t.pos").alias("pos"), F.col("t.h").alias("h"))
        .localCheckpoint(eager=False)
    )
    cross_doc = (
        pg.groupBy("h")
        .agg(F.min("doc_id").alias("__mn"), F.max("doc_id").alias("__mx"))
        .filter(F.col("__mn") != F.col("__mx"))
        .select("h")
    )
    dp = pg.join(cross_doc, "h").select("doc_id", "pos")

    w = Window.partitionBy("doc_id").orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w)
    island = F.sum(F.when(gap > k, 1).otherwise(0)).over(w)
    spans = (
        dp.withColumn("__g", island)
        .groupBy("doc_id", "__g")
        .agg(F.min("pos").alias("s"), (F.max("pos") + F.lit(k - 1)).alias("e"))
    )
    agg = spans.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("n_dup_tokens"),
        F.max(F.col("e") - F.col("s") + 1).cast("bigint").alias("longest_dup_span"),
    )
    base = documents.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    return (
        agg.join(base, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_dup_spans",
            "n_dup_tokens",
            "longest_dup_span",
            (
                F.col("n_dup_tokens").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("dup_token_ratio"),
        )
        .orderBy("doc_id")
    )


def bloom_prefilter(
    corpus: DataFrame, incoming: DataFrame, m_bits: int = 4096, k: int = 4
) -> DataFrame:
    """Bloom-filter membership prefilter for incremental dedup: build an
    m-bit Bloom filter over the corpus's content digests (k hash
    positions per digest), probe each incoming document, and report the
    maybe-seen verdict next to the exact one. `maybe_dup` is a strict
    superset of `exact_dup` (Bloom's no-false-negative guarantee — the
    pytest pin); the payoff at 100 TB is that the 100-TB corpus
    compresses to m/8 bytes of filter, so the common case (a genuinely
    new document) is decided by a broadcast lookup without ever joining
    against the corpus — only the maybe-dups proceed to the exact
    digest anti-join (`new_against_corpus`).

    Determinism discipline: the j-th bit position is the j-th 16-bit
    slice of md5(text) mod m (hex chars 4j+1..4j+4) — replayable
    bit-for-bit in DuckDB, so the gate hash-matches both verdict
    columns with zero tolerance, false positives included.

    Scale shape: the filter is a groupBy(word_idx).bit_or(mask) partial
    aggregate over corpus digests — at most m/32 rows regardless of
    corpus size — then explicitly broadcast to the probe side; the
    probe is k word lookups per document and a bool-and. Text never
    shuffles; 16-byte digests only.
    """
    def positions(df: DataFrame, keep: list[str]) -> DataFrame:
        h = F.md5(F.col("text"))
        pos = F.array(
            *[
                F.conv(F.substring(h, 4 * j + 1, 4), 16, 10).cast("bigint")
                % m_bits
                for j in range(k)
            ]
        )
        return df.select(*keep, F.explode(pos).alias("__bit")).select(
            *keep,
            (F.col("__bit") / 32).cast("bigint").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__bit % 32 AS INT))").alias(
                "mask"
            ),
        )

    corpus_digests = corpus.select(F.md5(F.col("text")).alias("h")).distinct()
    words = (
        positions(corpus, [])
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )

    probe = positions(incoming, ["doc_id"])
    hit = (
        probe.join(F.broadcast(words), "word_idx", "left")
        .withColumn(
            "__set",
            F.coalesce(
                (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")).cast(
                    "int"
                ),
                F.lit(0),
            ),
        )
        .groupBy("doc_id")
        .agg(F.min("__set").cast("bigint").alias("maybe_dup"))
    )
    exact = incoming.select(
        "doc_id", F.md5(F.col("text")).alias("h")
    ).join(
        corpus_digests.select("h", F.lit(1).alias("__in")), "h", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("__in"), F.lit(0)).cast("bigint").alias("exact_dup"),
    )
    return (
        hit.join(exact, "doc_id")
        .select("doc_id", "maybe_dup", "exact_dup")
        .orderBy("doc_id")
    )


def winnow_fingerprints(documents: DataFrame, k: int = 4, w: int = 5) -> DataFrame:
    """MOSS winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003,
    "Winnowing: Local Algorithms for Document Fingerprinting") at word
    granularity: hash every k-token gram, then in every window of w
    consecutive gram hashes select the minimum — rightmost on ties —
    and fingerprint the document with the distinct selected hashes.
    Guarantee: any match of at least k+w-1 consecutive tokens between
    two documents yields at least one SHARED fingerprint, while only
    ~2/(w+1) of all grams are kept.

    The rightmost-min tie rule is packed into one BIGINT so a single
    windowed min() implements it exactly: key = h·2^20 + (2^20−1−pos)
    (40-bit md5-prefix hash, documents bounded at 2^20 grams — 1M
    tokens; raise the split for longer docs). min(key) picks the
    smallest hash and, among ties, the LARGEST position. Both engines
    recover h with integer division, so the selection is replayed
    bit-for-bit in the oracle.

    Scale shape: gram hashing is a per-row array transform (no
    shuffle); the windowed min is partitioned by doc_id (bounded by
    document length); output is the distinct (doc, h) set — the text
    itself never shuffles.
    """
    from pyspark.sql import Window

    # split projected ONCE below the gram transform (r12 wave 10 —
    # the _shingles_arr rule: an inline split re-evaluates per gram)
    tk = F.col("_toks")
    grams = F.transform(
        # ascending only when size >= k — guaranteed by the filter below
        F.sequence(F.lit(0), F.size(tk) - F.lit(k)),
        lambda i: F.struct(
            i.alias("pos"),
            F.conv(
                F.substring(
                    F.md5(F.array_join(F.slice(tk, i + F.lit(1), k), " ")),
                    1,
                    10,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        ),
    )
    base = (
        # at least one FULL window of w grams: n_grams = n−k+1 >= w
        documents.select("doc_id", F.split(F.col("text"), " ").alias("_toks"))
        .filter(F.size(tk) >= F.lit(k + w - 1))
        .select("doc_id", F.explode(grams).alias("t"))
        .select(
            "doc_id",
            F.col("t.pos").alias("pos"),
            (
                F.col("t.h") * F.lit(1048576)
                + (F.lit(1048575) - F.col("t.pos"))
            ).alias("key"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    return (
        base.select("doc_id", "pos", F.min("key").over(win).alias("kmin"))
        .filter(F.col("pos") >= w - 1)
        .select("doc_id", F.expr("kmin DIV 1048576").alias("h"))
        .distinct()
    )


def winnow_shared_pairs(
    documents: DataFrame, k: int = 4, w: int = 5, min_shared: int = 2
) -> DataFrame:
    """Cross-document containment report over winnowing fingerprints:
    pairs sharing at least ``min_shared`` selected hashes, with the
    shared count — the plagiarism/boilerplate-contamination signal the
    winnowing guarantee makes sound (a k+w-1-token verbatim overlap
    CANNOT be missed).

    Scale shape: the join is an equi-join on the fingerprint hash over
    the WINNOWED set (~2/(w+1) of grams), so join mass is Σdf² over
    fingerprints, not grams; on skewed corpora drop boilerplate hashes
    above a df cap first (the max_shingle_df recipe from the Jaccard
    family) — exactness degrades only for pairs already above every
    realistic containment threshold.
    """
    fps = winnow_fingerprints(documents, k, w)
    a = fps.select(F.col("doc_id").alias("doc_a"), "h")
    b = fps.select(F.col("doc_id").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy("doc_a", "doc_b")
    )


def containment_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None | str = "auto",
) -> DataFrame:
    """DIRECTIONAL near-dup: ordered pairs where shingle-set containment
    |A∩B| / |A| >= threshold — "document A is mostly inside B". Jaccard
    misses exactly this case (a quote or boilerplate block embedded in a
    much longer document scores low symmetric similarity but ~1.0
    containment), which is why dedup pipelines run both: Jaccard for
    twins, containment for subsets.

    Output: (doc_sub, doc_sup, n_inter, n_sub, containment), both
    directions of a pair emitted independently when they qualify.
    Containment is an exact int/int division — bit-identical in the
    oracle. Same scale shape as ngram_jaccard_pairs (shingle equi-join,
    never all-pairs); ``max_shingle_df`` drops boilerplate shingles on
    skewed corpora.
    """
    if max_shingle_df == "auto":
        # derive_shingle_df_cap: max(64, ceil(√N)) — bounds any one
        # shingle's join mass to N pairs; no-op on the gate fixture
        max_shingle_df = derive_shingle_df_cap(documents.count())
    from sqlstreamstore_spark.operators.partitioning import with_min_parallelism

    sh = exploded_shingles(with_min_parallelism(documents), n).localCheckpoint(
        eager=False
    )
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("s").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("s")
        )
        sh = sh.join(rare, "s")
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_sub"), F.col("b.doc_id").alias("doc_sup")
        )
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    cont = F.col("n_inter").cast("double") / F.col("n_sh").cast("double")
    return (
        inter.join(sizes, inter.doc_sub == sizes.doc_id)
        .select(
            "doc_sub",
            "doc_sup",
            "n_inter",
            F.col("n_sh").alias("n_sub"),
            cont.alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
        .orderBy("doc_sub", "doc_sup")
    )


def golden_records(documents: DataFrame) -> DataFrame:
    """Survivorship (golden-record) merge over duplicate clusters — the
    MDM step after duplicate DETECTION: for every cluster sharing a
    canonical content key, pick one survivor by an explicit rule
    (longest text wins, lowest doc_id breaks ties) and merge the
    cluster's provenance (sorted distinct sources). The cluster key is
    the md5 of the sorted distinct lowercase token set — an order- and
    multiplicity-invariant content fingerprint, so shuffled or
    repeated-word variants of one document land in one cluster (the
    same vocabulary-fingerprint family the near-dup ops target).

    Scale shape: ONE shuffle on the cluster key; the window rank and
    the merge aggregate stack on the same partitioning. Clusters of
    size 1 are dropped before the window ranks anything heavy; output
    is O(#duplicate clusters)."""
    key = F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " "))),
            " ",
        )
    )
    keyed = documents.select(
        key.alias("cluster_key"), "doc_id", "n_chars", "source"
    )
    w_cnt = Window.partitionBy("cluster_key")
    w_rank = Window.partitionBy("cluster_key").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        keyed.withColumn("n_members", F.count("*").over(w_cnt))
        .filter(F.col("n_members") > 1)
        .withColumn("rn", F.row_number().over(w_rank))
        .groupBy("cluster_key")
        .agg(
            F.max("n_members").cast("long").alias("n_members"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("survivor_doc_id"),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars"))).alias("survivor_chars"),
            F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources"),
        )
        .orderBy("cluster_key")
    )


def duplication_profile(documents: DataFrame, chunk_tokens: int = 8) -> DataFrame:
    """Corpus duplication PROFILE — the one-page summary of how
    duplicated the corpus is, built on the same global first-
    occurrence chunk pass as `pipeline.sentence_dedup`: each doc's
    duplicate share (1 - kept/total chunks) bucketed into deciles,
    one row per decile with doc counts and chunk totals. The curve a
    curation team reads before choosing dedup aggressiveness.

    All-integer (the decile index is floor(10*dup/total) on exact
    BIGINTs via integer cross-multiplication — no float boundary);
    zero-tolerance oracle."""
    from sqlstreamstore_spark.analytics.pipeline import sentence_dedup

    per_doc = sentence_dedup(documents, chunk_tokens).select(
        "doc_id",
        "n_chunks",
        (F.col("n_chunks") - F.col("n_kept")).alias("n_dup"),
    )
    # decile = floor(10 * dup / total), with the all-dup doc capped at 9
    decile = F.least(
        F.lit(9).cast("long"),
        F.floor((F.lit(10) * F.col("n_dup")) / F.col("n_chunks")).cast("long"),
    )
    return (
        per_doc.groupBy(decile.alias("dup_decile"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chunks").cast("long").alias("n_chunks"),
            F.sum("n_dup").cast("long").alias("n_dup_chunks"),
        )
        .orderBy("dup_decile")
    )
