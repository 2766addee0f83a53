"""Embedding similarity search over `embeddings` (FIXTURES.md §C:
vec_id, embedding: array<float> (64-dim), label).

Two paths, per the standard ANN playbook:
  - brute-force cosine top-k: exact baseline. The dot product is a
    built-in ``aggregate(zip_with(...))`` over the two arrays — JVM-side,
    no UDF, embarrassingly parallel; top-k is TakeOrderedAndProject
    (per-partition heaps + driver merge of k rows), never a global sort.
  - LSH-bucketed (random hyperplanes / SimHash-for-vectors): each vector
    gets a b-bit signature from sign(v·r_i) against deterministic
    pseudo-random hyperplanes; candidates share a bucket (optionally
    multi-probe across bands). At 100 TB the bucket join replaces the
    all-pairs scan; the exact cosine re-rank touches candidates only.

Float discipline for the oracle: cosine is computed in DOUBLE with
left-to-right summation in both engines (Spark ``aggregate`` and DuckDB
``list_dot_product`` both fold sequentially), so scores hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _live(spark, path: str) -> str:
    """The parquet dir to scan for an index path: resolves pointer-mode
    roots (hadoopfs manifest-pointer layout, r12) to the live version
    dir; flat paths pass through. One exists-check per probe."""
    from sqlstreamstore_spark.sources.hadoopfs import resolved

    return resolved(spark, path)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# --- SQL-string expression builders -----------------------------------
# Model-as-literal operators (PQ codebooks, IVF centroids, LSH planes)
# embed hundreds of float literals in one expression. Building that tree
# through the PySpark Column API costs one py4j round-trip PER NODE
# (~3 s per pq_encode at m=8 × 16 codes — measured), so these helpers
# emit the SAME expression as ONE SQL string for F.expr: string build is
# microseconds, the JVM parses it in ~ms. Semantics are identical — the
# SQL parser produces the same aggregate/zip_with fold tree, so results
# stay bit-for-bit hash-oracle-compatible.

def _dlit(x: float) -> str:
    """Exact double literal: repr round-trips binary64 through the SQL
    string cast."""
    return f"CAST('{x!r}' AS DOUBLE)"


def _arr_sql(vec) -> str:
    return "array(" + ",".join(_dlit(float(x)) for x in vec) + ")"


def _dot_sql(a: str, b: str) -> str:
    """SQL twin of _dot — the same sequential fold, same casts."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm_sql(a: str) -> str:
    """SQL twin of _norm — same fold, same zero→1.0 guard."""
    n = (
        f"sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    return f"CASE WHEN {n} = CAST(0.0 AS DOUBLE) THEN CAST(1.0 AS DOUBLE) ELSE {n} END"


def _norm(a: Column) -> Column:
    """L2 norm; an all-zero vector maps to 1.0 (cosine 0 against
    anything) — the same convention as the driver-side ``math_norm``
    twin, and required under ANSI mode where the division would
    otherwise throw DIVIDE_BY_ZERO on the first zero embedding (padding
    rows / failed encoders in a real corpus)."""
    n = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return F.when(n == 0.0, F.lit(1.0)).otherwise(n)


def cosine_topk_bruteforce(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.
    Deterministic tie-break (score DESC, vec_id ASC)."""
    # r12 (guide §4): one bit-identical Arrow pass for the corpus scan
    scored = cosine_literal_exact_arrow(
        embeddings.select("vec_id", "embedding"), query_vec
    )
    return (
        scored.select("vec_id", "cosine")
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def knn_join_bruteforce(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """k-NN join: for every query vector, its k nearest corpus vectors.
    Broadcast the (small) query side; per-query top-k via partitioned
    window. At scale: chunk the query side and iterate, or use the LSH
    path below."""
    from pyspark.sql import Window

    n = max(1, embeddings.sparkSession.sparkContext.defaultParallelism)
    c = embeddings.repartition(n).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"),
        _norm(F.col("embedding")).alias("cn"),
    )
    qd = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
                        _norm(F.col("embedding")).alias("qn"))
    cand = c.crossJoin(F.broadcast(qd)).filter(F.col("cid") != F.col("qid")).select(
        "qid", "cid", "cvec", "cn", "qvec", "qn"
    )
    # r12 (guide §4): N·Q exact scores in one bit-identical Arrow pass
    scored = pair_cosine_exact_arrow(
        cand, a_col="cvec", b_col="qvec", na_col="cn", nb_col="qn"
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("qid", "rk")
    )


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs — the
    oracle baseline; the LSH-bucketed variant below is the scale path:
    same output, candidates restricted to shared buckets)."""
    e = embeddings.select(F.col("vec_id"), F.col("embedding"))
    # The < theta-join compiles to BroadcastNestedLoopJoin whose task
    # count is the LEFT side's partition count; a small parquet file
    # arrives as 1 partition and would serialize the O(N²) scoring.
    # Spread the streamed side across the cluster first (cheap narrow
    # exchange vs N²·dim double multiplies).
    n = max(1, e.sparkSession.sparkContext.defaultParallelism)
    # Precompute each vector's norm ONCE per side — inside the pair score
    # it would be re-evaluated N times per vector (O(N²·dim) extra work).
    a = e.repartition(n).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        _norm(F.col("embedding")).alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        _norm(F.col("embedding")).alias("nb"),
    )
    score = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        # explicit broadcast of the 1-partition side: left to its own
        # size estimates Spark sometimes broadcasts the REPARTITIONED
        # side instead and streams the single-partition one, putting
        # the whole O(N²) loop back on one task (measured 9.8 s -> 2 s
        # on the recall report, same shape)
        # r12 note: the Arrow pair twin was MEASURED SLOWER here
        # (1.5 -> 2.3 s warm) — the nested-loop join scores inline
        # without materializing the N²/2 pair arrays, so the Arrow
        # boundary pays full-array shipping for the whole cross
        # product; expression scoring stays (guide §1.6/§4)
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def semantic_decontaminate(
    embeddings: DataFrame, n_heldout: int = 20, threshold: float = 0.35
) -> DataFrame:
    """Embedding-space decontamination: flag every corpus vector
    (vec_id >= ``n_heldout``) whose cosine to ANY held-out benchmark
    vector (vec_id < ``n_heldout``) reaches ``threshold`` — the
    semantic complement of the n-gram `pipeline.decontaminate` (which
    misses paraphrased/reworded test leakage; embedding cosine is the
    standard second net, e.g. the phrasing-robust decontamination pass
    in open LLM data pipelines).

    100 TB shape: the held-out suite is SMALL BY DEFINITION (a
    benchmark, not a corpus) — it is collected once (bounded model
    axis: the Bradley-Terry win-matrix / SQ8-min-max precedent) and
    shipped into ONE Arrow corpus pass (r12 wave 9, guide §4): no
    join, no shuffle, the tests×dim score matrix accumulated in
    dimension order per batch. Rows out: only the contaminated ids +
    their nearest test vector.

    Output: (vec_id, test_id, cosine) for flagged rows, vec_id order;
    ties on bit-equal cosine break to the smallest test_id. Cosines
    fold in DOUBLE left-to-right in both engines (module float
    discipline), so the gate hash-matches at zero tolerance."""
    import numpy as np

    from pyspark.sql import types as T

    rows = (
        embeddings.filter(F.col("vec_id") < n_heldout)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    # r12 wave 9 (guide §4): the probe used to be ONE interpreted SQL
    # expression per corpus row — a transform over n_heldout structs,
    # each a 2·dim HOF fold (tests × dim × corpus interpreted-eval
    # multiplies). Same math in one Arrow pass: per (row, test) the
    # cosine accumulates IN DIMENSION ORDER (outer-product partial sums
    # — each cell is the same left fold), norms carry the same zero→1.0
    # guard, denominator keeps the (norm_v * norm_t) operand order, and
    # the argmax takes the FIRST max over tests in ascending-tid order
    # — exactly the SQL fold's `s.c > acc.c` first-wins semantics. Same
    # doubles, same rows; still map-only, no join, no shuffle.
    tids = np.array([int(r["vec_id"]) for r in rows], dtype=np.int64)
    Tm = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    tn2 = np.zeros(len(tids))
    for d in range(Tm.shape[1]):
        tn2 = tn2 + Tm[:, d] * Tm[:, d]
    tn = np.sqrt(tn2)
    tn[tn == 0.0] = 1.0
    thr = float(threshold)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("test_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            B = len(pdf)
            if not B:
                continue
            X = _pdf_mat_f64(pdf["embedding"])
            n2 = np.zeros(B)
            for d in range(X.shape[1]):
                n2 = n2 + X[:, d] * X[:, d]
            xn = np.sqrt(n2)
            xn[xn == 0.0] = 1.0
            C = np.zeros((B, Tm.shape[0]))
            for d in range(X.shape[1]):
                C = C + np.outer(X[:, d], Tm[:, d])
            C = C / (xn[:, None] * tn[None, :])
            bj = np.argmax(C, axis=1)
            bc = C[np.arange(B), bj]
            keep = bc >= thr
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[keep],
                    "test_id": tids[bj[keep]],
                    "cosine": bc[keep],
                }
            )

    return (
        embeddings.filter(F.col("vec_id") >= n_heldout)
        .select("vec_id", "embedding")
        .mapInPandas(run, schema)
        .orderBy("vec_id")
    )


def semantic_decontaminate_oracle_sql(
    n_heldout: int = 20, threshold: float = 0.35
) -> str:
    """DuckDB twin of :func:`semantic_decontaminate`: brute cross join
    of corpus × held-out (oracle-scale only — production takes the
    broadcast-literal map-only path), same DOUBLE fold, argmax via the
    mirrored (cosine DESC, test_id ASC) window order."""
    return f"""
WITH q AS (SELECT vec_id AS tid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {n_heldout}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id >= {n_heldout}),
scored AS (
  SELECT c.vec_id, q.tid,
         list_dot_product(cv, qv)
           / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv)))
           AS cosine
  FROM c, q),
best AS (
  SELECT vec_id, tid, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, tid) AS rk
  FROM scored)
SELECT vec_id, tid AS test_id, cosine FROM best
WHERE rk = 1 AND cosine >= {threshold!r}
ORDER BY vec_id
"""


def mmr_rerank(
    embeddings: DataFrame,
    query_vec: list[float],
    n_candidates: int = 20,
    n_select: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein,
    SIGIR'98): from the exact top-``n_candidates`` by cosine to the
    query, greedily select ``n_select`` items maximizing

        mmr(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} cos(c, s)

    (max over the empty set = 0, so rank 1 scores λ·rel) — the
    diversity-aware exemplar selector a pipeline runs after ANN
    retrieval (diverse few-shot pools, dedup-aware context packing).
    Ties break (score DESC, vec_id ASC); selection is greedy-exact,
    matching the unrolled-CTE oracle step for step.

    100 TB shape: MMR only ever reranks a BOUNDED candidate list
    (whatever top-k the ANN tier returned), so every step is
    candidate-sized regardless of corpus size: the corpus-scale work
    is the one exact top-k scan (or any indexed tier above), and the
    ``n_select`` greedy steps join the shrinking pool against the
    ≤ n_select-row selected frame. No driver-side math — scores stay
    in the same JVM fold the oracle mirrors.

    Output: (rk, vec_id, relevance, mmr_score), rk = 1..n_select."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = F.col("embedding")
    rel = _dot(emb, q) / (_norm(emb) * _norm(q))
    cand = (
        embeddings.filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding", rel.alias("rel"))
        .orderBy(F.col("rel").desc(), F.col("vec_id"))
        .limit(n_candidates)
        .localCheckpoint(eager=False)
    )
    lam = float(lam)
    mmr0 = F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.lit(0.0)
    sel = (
        cand.select(
            F.lit(1).cast("long").alias("rk"), "vec_id", "embedding",
            F.col("rel").alias("relevance"), mmr0.alias("mmr_score"),
        )
        .orderBy(F.col("mmr_score").desc(), F.col("vec_id"))
        .limit(1)
    )
    pair = _dot(F.col("embedding"), F.col("sv")) / (
        _norm(F.col("embedding")) * _norm(F.col("sv"))
    )
    for step in range(2, n_select + 1):
        pool = cand.join(sel.select("vec_id"), "vec_id", "left_anti")
        ms = (
            pool.crossJoin(
                F.broadcast(sel.select(F.col("embedding").alias("sv")))
            )
            .groupBy("vec_id")
            .agg(F.max(pair).alias("max_sim"))
        )
        score = F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("max_sim")
        nxt = (
            pool.join(ms, "vec_id")
            .select(
                F.lit(step).cast("long").alias("rk"), "vec_id", "embedding",
                F.col("rel").alias("relevance"), score.alias("mmr_score"),
            )
            .orderBy(F.col("mmr_score").desc(), F.col("vec_id"))
            .limit(1)
        )
        sel = sel.unionByName(nxt).localCheckpoint(eager=False)
    return sel.select("rk", "vec_id", "relevance", "mmr_score").orderBy("rk")


def mmr_rerank_oracle_sql(
    n_candidates: int = 20, n_select: int = 5, lam: float = 0.7
) -> str:
    """Unrolled-greedy DuckDB twin of :func:`mmr_rerank` for query
    vec_id = 0 (CTEs MATERIALIZED — the label-propagation precedent).
    Same DOUBLE expression tree: rel and pairwise cosines are
    sequential list_dot_product folds, mmr = λ·rel − (1−λ)·max_sim
    with λ as the identical repr literal, ties (score DESC, id)."""
    lam = float(lam)
    cos_cq = (
        "list_dot_product(c.cv, q.qv) / (sqrt(list_dot_product(c.cv, c.cv))"
        " * sqrt(list_dot_product(q.qv, q.qv)))"
    )
    cos_ps = (
        "list_dot_product(p.cv, s.cv) / (sqrt(list_dot_product(p.cv, p.cv))"
        " * sqrt(list_dot_product(s.cv, s.cv)))"
    )
    parts = [
        f"""WITH q AS MATERIALIZED (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
cand AS MATERIALIZED (
  SELECT vec_id, cv, rel FROM (
    SELECT c.vec_id, c.cv, {cos_cq} AS rel
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings WHERE vec_id <> 0) c, q)
  ORDER BY rel DESC, vec_id LIMIT {n_candidates}),
sel1 AS MATERIALIZED (
  SELECT CAST(1 AS BIGINT) AS rk, vec_id, cv, rel,
         {lam!r} * rel - {1.0 - lam!r} * 0.0 AS mmr
  FROM cand ORDER BY {lam!r} * rel - {1.0 - lam!r} * 0.0 DESC, vec_id
  LIMIT 1)"""
    ]
    for i in range(2, n_select + 1):
        parts.append(
            f"""ms{i} AS MATERIALIZED (
  SELECT p.vec_id, max({cos_ps}) AS max_sim
  FROM cand p JOIN sel{i - 1} s ON true
  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
  GROUP BY p.vec_id),
pick{i} AS MATERIALIZED (
  SELECT CAST({i} AS BIGINT) AS rk, p.vec_id, p.cv, p.rel,
         {lam!r} * p.rel - {1.0 - lam!r} * m.max_sim AS mmr
  FROM cand p JOIN ms{i} m ON p.vec_id = m.vec_id
  ORDER BY mmr DESC, p.vec_id LIMIT 1),
sel{i} AS MATERIALIZED (
  SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM pick{i})"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT rk, vec_id, rel AS relevance, mmr AS mmr_score
FROM sel{n_select} ORDER BY rk"""
    )


def kcenter_coreset(
    embeddings: DataFrame, m: int = 5, seed_id: int = 0
) -> DataFrame:
    """Greedy farthest-point k-center coreset (Gonzalez 1985, the
    2-approximation): seed at ``seed_id``, then ``m−1`` times pick the
    vector maximizing its MINIMUM cosine distance (1 − cos) to the
    selected set — the classic diverse-subset selector for
    training-data curation (maximally-spread exemplars, cluster-seed
    initialization, eval-set carving). Ties break (distance DESC,
    vec_id ASC); the seed emits distance 0.0.

    Scale shape: the honest algorithm IS m passes — each step is one
    map-side scan of the corpus against the ≤m-row selected frame
    (broadcast), a (vec_id)-keyed partial-agg min, and a global top-1
    (TakeOrderedAndProject, k=1 — per-partition max + driver merge,
    never a sort). m is a model-sized constant, so total work is
    m·|corpus| with no pairwise term. The oracle replays the greedy
    chain step for step (unrolled MATERIALIZED CTEs).

    Output: (rk 1..m, vec_id, dist) — dist = the max-min distance at
    the moment of selection (the k-center radius curve; unrounded
    doubles ride the hash, the sim_knn_join precedent).

    r12: norms are computed ONCE into the base frame (same ``_norm``
    fold, so every per-pair quotient sees the identical operands)
    instead of per pair row per step, and the next center is fetched
    by joining only the top-1 row back to base instead of re-joining
    the whole pool. The per-step dot stays the HOF expression — an
    Arrow twin was measured SLOWER here (m per-step Python boundaries
    over a corpus-sized scan don't amortize; the wave-3/4 rule)."""
    base = embeddings.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("__nrm")
    ).localCheckpoint(eager=False)
    sel = base.filter(F.col("vec_id") == seed_id).select(
        F.lit(1).cast("long").alias("rk"), "vec_id", "embedding", "__nrm",
        F.lit(0.0).alias("dist"),
    )
    pair = F.lit(1.0) - _dot(F.col("embedding"), F.col("sv")) / (
        F.col("__nrm") * F.col("svn")
    )
    for step in range(2, m + 1):
        pool = base.join(sel.select("vec_id"), "vec_id", "left_anti")
        md = (
            pool.crossJoin(
                F.broadcast(
                    sel.select(
                        F.col("embedding").alias("sv"),
                        F.col("__nrm").alias("svn"),
                    )
                )
            )
            .groupBy("vec_id")
            .agg(F.min(pair).alias("mind"))
        )
        top1 = md.orderBy(F.col("mind").desc(), F.col("vec_id")).limit(1)
        nxt = (
            base.join(F.broadcast(top1), "vec_id")
            .select(
                F.lit(step).cast("long").alias("rk"), "vec_id", "embedding",
                "__nrm", F.col("mind").alias("dist"),
            )
        )
        sel = sel.unionByName(nxt).localCheckpoint(eager=False)
    return sel.select("rk", "vec_id", "dist").orderBy("rk")


def kcenter_coreset_oracle_sql(m: int = 5, seed_id: int = 0) -> str:
    """Unrolled-greedy DuckDB twin of :func:`kcenter_coreset` (CTEs
    MATERIALIZED — the label-propagation precedent). Same DOUBLE tree:
    dist = 1.0 − the sequential list_dot_product cosine fold; min over
    the selected set is order-independent; ties (dist DESC, id)."""
    cos_ps = (
        "list_dot_product(p.cv, s.cv) / (sqrt(list_dot_product(p.cv, p.cv))"
        " * sqrt(list_dot_product(s.cv, s.cv)))"
    )
    parts = [
        f"""WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
sel1 AS MATERIALIZED (
  SELECT CAST(1 AS BIGINT) AS rk, vec_id, cv, 0.0 AS dist
  FROM e WHERE vec_id = {seed_id})"""
    ]
    for i in range(2, m + 1):
        parts.append(
            f"""md{i} AS MATERIALIZED (
  SELECT p.vec_id, min(1.0 - ({cos_ps})) AS mind
  FROM e p JOIN sel{i - 1} s ON true
  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
  GROUP BY p.vec_id),
pick{i} AS MATERIALIZED (
  SELECT CAST({i} AS BIGINT) AS rk, p.vec_id, p.cv, m.mind AS dist
  FROM e p JOIN md{i} m ON p.vec_id = m.vec_id
  ORDER BY m.mind DESC, p.vec_id LIMIT 1),
sel{i} AS MATERIALIZED (
  SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM pick{i})"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT rk, vec_id, dist FROM sel{m} ORDER BY rk"
    )


def derive_lsh_bits(n: int, target_bucket: int = 32, floor: int = 4, cap: int = 24) -> int:
    """bits ≈ log2(N / target_bucket) — the rule that keeps the banded
    self-join sub-quadratic as the corpus grows (2^bits buckets must
    track N, else the bucket join degrades toward all-pairs; measured:
    20k vectors at bits=4 → 71.7 s vs bits=10 → 2.3 s). Floor keeps
    tiny fixtures deterministic (N=500 → 4); cap bounds the hyperplane
    literal tree."""
    import math

    if n <= target_bucket:
        return floor
    return max(floor, min(cap, math.ceil(math.log2(n / target_bucket))))


def cosine_near_dup_pairs_lsh(
    embeddings: DataFrame, threshold: float = 0.35, dim: int = 64,
    bits: int | None = None, seed: int = 42, sort: bool = True,
) -> DataFrame:
    """LSH-bucketed near-dup: candidates share a random-hyperplane
    bucket; exact cosine verifies. Sub-quadratic ONLY while the bucket
    count tracks the corpus: with b bits there are 2^b buckets, so at
    fixed b the bucket self-join degrades toward all-pairs as N grows.
    ``bits=None`` (the default) derives bits ≈ log2(N / 32) from one
    cheap count() — parquet footer metadata, no data scan — so the
    DEFAULT stays linear at any corpus size instead of hiding the rule
    in a docstring. Measured (scale probe, 20k vectors): bits=4 →
    71.7 s, bits=10 (what auto picks) → 2.3 s, with every
    exact-duplicate clique still intact (identical vectors share every
    bucket). Recall < 1 for long-range near-dups by construction —
    pass explicit bits down / add multi-probe when recall matters more
    than cost. ``sort=False`` skips the presentation-only global sort
    for internal consumers (CC, recall counting)."""
    if bits is None:
        bits = derive_lsh_bits(embeddings.count())
    # r12 (guide §4): signatures + norms in ONE bit-identical Arrow pass
    # behind a lazy barrier — before, each self-join side re-ran the
    # interpreted b-plane HOF folds; spread first so the map pass and
    # the barrier carry >= cores partitions (no-op at scale)
    from sqlstreamstore_spark.operators.partitioning import with_min_parallelism

    sigs = lsh_sigs_norm_exact_arrow(
        with_min_parallelism(embeddings), dim=dim, bits=bits, seed=seed
    ).localCheckpoint(eager=False)
    # r12 wave 10: id-only bucket join + broadcast-matrix verify when
    # the vector table fits the ceiling (no window here, so nothing
    # like the rank-limit pushdown is lost — unlike knn_join_ivf_static
    # where the same swap measured slower); identical folds → identical
    # cosines, join fallback above the ceiling
    cand_ids = (
        sigs.select(F.col("vec_id").alias("id_a"), F.col("bucket").alias("ba"))
        .join(
            sigs.select(F.col("vec_id").alias("id_b"), F.col("bucket").alias("bb")),
            (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
    )
    out = pair_cosine_by_id_exact_bcast(
        cand_ids, embeddings, a_id="id_a", b_id="id_b"
    )
    if out is None:
        a = sigs.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
                        F.col("norm").alias("na"), F.col("bucket").alias("ba"))
        b = sigs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
                        F.col("norm").alias("nb"), F.col("bucket").alias("bb"))
        cand = (
            a.join(b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
            .select("id_a", "id_b", "va", "vb", "na", "nb")
        )
        # candidate verify: the same exact cosine, one Arrow pass per batch
        out = pair_cosine_exact_arrow(cand)
    out = out.filter(F.col("cosine") >= threshold)
    return out.orderBy("id_a", "id_b") if sort else out


def cosine_near_dup_pairs_lsh_multiprobe(
    embeddings: DataFrame, threshold: float = 0.35, dim: int = 64, bits: int | None = None,
    seed: int = 42, probe_hamming: int = 1, sort: bool = True,
) -> DataFrame:
    """Multi-probe LSH near-dup: candidates' buckets may differ by up
    to ``probe_hamming`` bits — each vector probes its bucket's k-bit
    Hamming neighborhood (exploded probe rows joined against plain
    buckets), recovering the near-dups a few sign flips hid from the
    exact-bucket join. Measured on the fixture at bits=4: recall vs
    the exact baseline climbs 0.13 → 0.49 → 0.83 for probe 0/1/2,
    while candidates grow only ~(1 + Σ C(bits, i)) per vector — the
    recall/cost knob that works WITHOUT retuning the bit count.
    Verification is the same exact cosine on candidates only; output
    schema matches cosine_near_dup_pairs_lsh (incl. bits=None ⇒
    auto-derived from a count).
    """
    from itertools import combinations

    if bits is None:
        bits = derive_lsh_bits(embeddings.count())

    # r12 (guide §4): one bit-identical Arrow pass for signatures+norms
    # behind a lazy barrier (both the probe explode and the plain bucket
    # side read it), and the candidate verify scored in one Arrow pass
    # AFTER the id-pair dedup (a pair reached through several probe
    # buckets is scored once — cosine is functionally determined by the
    # pair, so dedup-then-score equals score-then-dedup)
    from sqlstreamstore_spark.operators.partitioning import with_min_parallelism

    sigs = lsh_sigs_norm_exact_arrow(
        with_min_parallelism(embeddings), dim=dim, bits=bits, seed=seed
    ).localCheckpoint(eager=False)
    masks = [0]
    for k in range(1, probe_hamming + 1):
        masks += [
            sum(1 << i for i in c) for c in combinations(range(bits), k)
        ]
    probes = sigs.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        F.col("norm").alias("na"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("pb"),
    )
    b = sigs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
                    F.col("norm").alias("nb"), F.col("bucket").alias("bb"))
    cand = (
        probes.join(b, (F.col("pb") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", "va", "vb", "na", "nb")
        .dropDuplicates(["id_a", "id_b"])
    )
    out = pair_cosine_exact_arrow(cand).filter(F.col("cosine") >= threshold)
    return out.orderBy("id_a", "id_b") if sort else out


def _arrow_mat_f64(col) -> "object":
    """Arrow list<float> column → (B, dim) float64 matrix with ZERO
    per-row Python work (r12 wave 10, guide §4): ``flatten()`` hands
    back the list array's contiguous values buffer (offset/slice
    aware), one vectorized float32→float64 widening (exact), one
    reshape. The twins' per-row ``np.asarray`` comprehensions cost
    more than their folds at pair-scorer row counts."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.flatten().to_numpy(zero_copy_only=False)
    return vals.astype(np.float64, copy=False).reshape(len(col), -1)


def _pdf_mat_f64(series) -> "object":
    """pandas object-series of per-row float arrays → (B, dim) float64
    (r12 wave 10): np.concatenate iterates the row arrays in C instead
    of a Python comprehension (measured 1.6× on 500k rows); identical
    float64 widening → identical matrices."""
    import numpy as np

    vals = series.to_numpy()
    return np.concatenate(vals).astype(np.float64, copy=False).reshape(
        len(vals), -1
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (driver-side
    constant, broadcast as literals — tiny)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_sigs_norm_exact_arrow(
    embeddings: DataFrame, dim: int = 64, bits: int = 16, seed: int = 42
) -> DataFrame:
    """BIT-IDENTICAL Arrow twin of ``lsh_bucket_signatures`` + ``_norm``
    in one pass (r12, guide §4): the b per-plane sign dots and the norm
    are interpreted HOF folds that never enter codegen, and the LSH
    self-join paths evaluate them on BOTH join sides. Like
    :func:`ivfpq_encode_exact_arrow`, this twin vectorizes over ROWS
    and iterates DIMENSIONS in order, so every intermediate double
    equals the SQL left fold; ``dot >= 0`` then flips the same bits and
    the bucket (a sum of distinct powers of two) is integer-exact, and
    the norm carries the same zero→1.0 guard. Output: (vec_id,
    embedding, bucket, norm) — the ``lsh_bucket_signatures`` contract
    plus the norm."""
    import numpy as np

    from pyspark.sql import types as T

    planes = _hyperplanes(dim, bits, seed)
    embeddings = embeddings.select("vec_id", "embedding")
    schema = T.StructType(
        list(embeddings.schema.fields)
        + [T.StructField("bucket", T.LongType()),
           T.StructField("norm", T.DoubleType())]
    )

    def run(batches):
        for pdf in batches:
            B = len(pdf)
            if not B:
                continue
            X = _pdf_mat_f64(pdf["embedding"])
            bucket = np.zeros(B, dtype=np.int64)
            for i, p in enumerate(planes):
                dot = np.zeros(B)
                for d in range(dim):
                    dot = dot + X[:, d] * p[d]
                bucket = bucket + np.where(
                    dot >= 0.0, np.int64(1 << i), np.int64(0)
                )
            n2 = np.zeros(B)
            for d in range(dim):
                n2 = n2 + X[:, d] * X[:, d]
            nrm = np.sqrt(n2)
            nrm[nrm == 0.0] = 1.0
            out = pdf.copy()
            out["bucket"] = bucket
            out["norm"] = nrm
            yield out

    return embeddings.mapInPandas(run, schema)


def pair_cosine_exact_arrow(
    pairs: DataFrame,
    a_col: str = "va",
    b_col: str = "vb",
    na_col: str | None = "na",
    nb_col: str | None = "nb",
    out: str = "cosine",
) -> DataFrame:
    """BIT-IDENTICAL Arrow twin of the post-join pair score
    ``_dot(a, b) / (na * nb)`` (r12, guide §4): candidate scoring is
    the dominant cost of every verify/re-rank join (LSH buckets, IVF
    probe lists, brute-force baselines) and the interpreted
    ``aggregate(zip_with(...))`` fold never enters codegen. Sequential
    dimension-order fold (see :func:`ivfpq_encode_exact_arrow`), then
    ``dot / (na * nb)`` with the same operand order as the SQL
    expression. ``na_col=None`` computes the norm from the array with
    the identical fold + zero→1.0 guard (same doubles as ``_norm``).
    Output: the input frame minus the array/norm columns, plus ``out``.

    r12 wave 10: runs through ``mapInArrow`` — the pandas conversion
    materialized one numpy object PER ROW PER ARRAY COLUMN before the
    twin even ran (~1M Python-level conversions per 500k-pair pass);
    the Arrow list column's values buffer reshapes to the (B, dim)
    matrix with zero per-row work. float32→float64 widening is exact
    and the folds are unchanged, so every cosine is the same double."""
    import numpy as np

    from pyspark.sql import types as T

    drop = {a_col, b_col, na_col, nb_col} - {None}
    keep = [f for f in pairs.schema.fields if f.name not in drop]
    keep_names = [f.name for f in keep]
    schema = T.StructType(keep + [T.StructField(out, T.DoubleType())])

    def _seq_norm(M: "np.ndarray") -> "np.ndarray":
        n2 = np.zeros(M.shape[0])
        for d in range(M.shape[1]):
            n2 = n2 + M[:, d] * M[:, d]
        n = np.sqrt(n2)
        n[n == 0.0] = 1.0
        return n

    def run(batches):
        import pyarrow as pa

        for rb in batches:
            B = rb.num_rows
            if not B:
                continue
            cols = {n: i for i, n in enumerate(rb.schema.names)}
            A = _arrow_mat_f64(rb.column(cols[a_col]))
            Bm = _arrow_mat_f64(rb.column(cols[b_col]))
            dot = np.zeros(B)
            for d in range(A.shape[1]):
                dot = dot + A[:, d] * Bm[:, d]
            na = (
                rb.column(cols[na_col]).to_numpy(zero_copy_only=False)
                if na_col
                else _seq_norm(A)
            )
            nb = (
                rb.column(cols[nb_col]).to_numpy(zero_copy_only=False)
                if nb_col
                else _seq_norm(Bm)
            )
            o = dot / (na * nb)
            arrays = [rb.column(cols[n]) for n in keep_names] + [
                pa.array(o, type=pa.float64())
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=keep_names + [out])

    return pairs.mapInArrow(run, schema)


# Ceiling for the broadcast-matrix pair scorer: vectors × dim × 8 B
# must stay a small task-side broadcast (65 536 × 64 dims ≈ 32 MB).
# Above it the callers keep the general join + Arrow-pair path.
PAIR_BCAST_MAX_VECS = 65536


def pair_cosine_by_id_exact_bcast(
    pairs: DataFrame,
    embeddings: DataFrame,
    a_id: str = "cid",
    b_id: str = "qid",
    out: str = "cosine",
) -> DataFrame | None:
    """BIT-IDENTICAL twin of ``join vectors then pair_cosine_exact_arrow``
    for id-keyed pairs (r12 wave 9, guide §4/§2.2): the pair frames of
    the kNN-graph family ship two 64-double arrays per candidate row
    through the Python boundary (~1 KB/row for 16 B of ids). When the
    VECTOR TABLE fits a task-side broadcast (``PAIR_BCAST_MAX_VECS``),
    ship the matrix once, send ONLY the int id-pairs through Arrow, and
    gather+fold inside the worker: the same sequential dimension-order
    fold over the same doubles (gather is exact), the same ``_norm``
    zero→1.0 guard, the same ``dot / (na * nb)`` operand order — so
    every cosine is the identical double. Returns ``None`` when the
    vector table exceeds the ceiling (caller falls back to the join
    path — the probe_fits_broadcast pattern)."""
    import numpy as np

    from pyspark.sql import types as T

    rows = (
        embeddings.select("vec_id", "embedding")
        .limit(PAIR_BCAST_MAX_VECS + 1)
        .collect()
    )
    if len(rows) > PAIR_BCAST_MAX_VECS:
        return None
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    n2 = np.zeros(len(ids))
    for d in range(M.shape[1]):
        n2 = n2 + M[:, d] * M[:, d]
    nrm = np.sqrt(n2)
    nrm[nrm == 0.0] = 1.0
    bc = pairs.sparkSession.sparkContext.broadcast((ids, M, nrm))
    schema = T.StructType(
        list(pairs.schema.fields) + [T.StructField(out, T.DoubleType())]
    )

    def run(batches):
        bids, bM, bn = bc.value
        for pdf in batches:
            B = len(pdf)
            if not B:
                continue
            ai = np.searchsorted(bids, pdf[a_id].to_numpy())
            bi = np.searchsorted(bids, pdf[b_id].to_numpy())
            A, Bm = bM[ai], bM[bi]
            dot = np.zeros(B)
            for d in range(A.shape[1]):
                dot = dot + A[:, d] * Bm[:, d]
            o = pdf.copy()
            o[out] = dot / (bn[ai] * bn[bi])
            yield o

    return pairs.mapInPandas(run, schema)


def cosine_literal_exact_arrow(
    df: DataFrame,
    query_vec: list[float],
    emb_col: str = "embedding",
    norm_col: str | None = None,
    out: str = "cosine",
) -> DataFrame:
    """BIT-IDENTICAL Arrow twin of the literal-query score
    ``_dot(emb, q) / (_norm(emb) * _norm(q))`` (r12, guide §4) — the
    single-query re-rank in the ``cosine_topk_*`` family. Sequential
    dimension-order folds for the dot and the row norm (zero→1.0
    guard); the literal query's norm is the same Python left fold the
    SQL evaluates on the literal array (``math_norm``). Output: input
    columns minus the embedding/norm, plus ``out``."""
    import numpy as np

    from pyspark.sql import types as T

    q = [float(x) for x in query_vec]
    qn = math_norm(q)
    drop = {emb_col, norm_col} - {None}
    keep = [f for f in df.schema.fields if f.name not in drop]
    keep_names = [f.name for f in keep]
    schema = T.StructType(keep + [T.StructField(out, T.DoubleType())])

    def run(batches):
        for pdf in batches:
            B = len(pdf)
            if not B:
                continue
            X = _pdf_mat_f64(pdf[emb_col])
            dot = np.zeros(B)
            for d in range(len(q)):
                dot = dot + X[:, d] * q[d]
            if norm_col:
                ne = pdf[norm_col].to_numpy()
            else:
                n2 = np.zeros(B)
                for d in range(len(q)):
                    n2 = n2 + X[:, d] * X[:, d]
                ne = np.sqrt(n2)
                ne[ne == 0.0] = 1.0
            o = pdf[keep_names].copy()
            o[out] = dot / (ne * qn)
            yield o

    return df.mapInPandas(run, schema)


def lsh_bucket_signatures(
    embeddings: DataFrame, dim: int = 64, bits: int = 16, seed: int = 42
) -> DataFrame:
    """b-bit random-hyperplane signature per vector (sign of v·r_i)."""
    planes = _hyperplanes(dim, bits, seed)
    emb = F.col("embedding")
    sig = None
    for i, p in enumerate(planes):
        bit = F.when(_dot(emb, F.array(*[F.lit(x) for x in p])) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig + bit
    return embeddings.select("vec_id", "embedding", sig.alias("bucket"))


def kmeans_centroids(
    embeddings: DataFrame, n_clusters: int = 16, iters: int = 3
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd's k-means over the embedding column (the IVF
    coarse quantizer). Each iteration is ONE Arrow-batched numpy pass
    (mapInPandas): every batch cosine-assigns its vectors and emits
    per-cluster partial sums + counts, which combine driver-side into
    the new means. Only model-sized data (n_clusters × dim doubles)
    ever reaches the driver — the corpus stays distributed and never
    shuffles, so this scales to any corpus size.

    Deterministic: initialized from the first n_clusters vectors by
    vec_id; fixed iteration count (no tolerance-based early exit);
    numpy argmax breaks ties toward the lowest cluster_id.
    """
    import numpy as np

    from pyspark.sql import types as T

    # Iterated over: pin the embedding projection so each Lloyd's pass
    # reads the materialized columnar block, not the upstream lineage
    # (at scale: a few GB per executor, memory+disk).
    base = embeddings.select("vec_id", "embedding").persist()
    init = base.orderBy("vec_id").limit(n_clusters).select("embedding").collect()
    centroids = [(i, [float(x) for x in r.embedding]) for i, r in enumerate(init)]
    dim = len(centroids[0][1])
    partial_schema = T.StructType([
        T.StructField("cluster_id", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("sums", T.ArrayType(T.DoubleType())),
    ])
    try:
        for _ in range(iters):
            # one Arrow-batched numpy pass per iteration: cosine-argmax
            # assignment + per-cluster partial sums, ≤ n_clusters rows
            # per batch; model-sized combine driver-side (the literal-
            # expression ivf_assign stays the serving/oracle path — for
            # training it would recompile codegen every iteration)
            C = np.array([vec for _, vec in centroids])  # (k, dim)
            Cn = np.sqrt((C * C).sum(1))
            Cn[Cn == 0.0] = 1.0

            def run(batches, C=C, Cn=Cn):
                import pandas as pd

                for pdf in batches:
                    X = _pdf_mat_f64(pdf["embedding"])
                    if not len(X):
                        continue
                    Xn = np.sqrt((X * X).sum(1))
                    Xn[Xn == 0.0] = 1.0
                    # argmax of cosine, first-max tie-break = lowest id
                    cos = (X @ C.T) / (Xn[:, None] * Cn[None, :])
                    a = cos.argmax(1)
                    rows = []
                    for j in np.unique(a):
                        sel = X[a == j]
                        rows.append((int(j), len(sel), sel.sum(0).tolist()))
                    yield pd.DataFrame(rows, columns=["cluster_id", "n", "sums"])

            acc: dict[int, tuple[int, np.ndarray]] = {}
            for r in base.mapInPandas(run, partial_schema).collect():
                n0, s0 = acc.get(r.cluster_id, (0, np.zeros(dim)))
                acc[r.cluster_id] = (n0 + r.n, s0 + np.asarray(r.sums))
            centroids = [
                (cid, (acc[cid][1] / acc[cid][0]).tolist()) if acc.get(cid, (0,))[0] else (cid, vec)
                for cid, vec in centroids
            ]
    finally:
        base.unpersist()
    return centroids


def kmeans_lloyd_step(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """One Lloyd iteration with deterministic seeds (vectors vec_id < k),
    fully SQL-replayable — the oracled differential twin of the
    iterative :func:`kmeans_centroids` trainer (whose numpy loop is
    rows-only by nature). Returns per-cluster (cid, n_members, avg_d2,
    new_norm): the assignment census and the norm of the recomputed
    mean — enough to pin both halves of the Lloyd step (argmin
    assignment, centroid update) against an independent engine.

    Scale shape: the k centroids are LITERALS folded into a single
    map-side `array_min(array(struct(d2_i, cid_i)...))` — assignment
    costs ZERO shuffles and stays in whole-stage codegen; the only
    shuffle is ONE partial agg (per-cluster count/avg_d2 + dim per-dim
    component sums: k·(dim+2) cells out regardless of N). Squared distance
    is expanded as (|e|² − 2e·c) + |c|² with every dot a sequential
    fold, so the doubles are bit-identical in any engine that folds
    left-to-right (the `_dot`/list_dot_product contract) and ties in
    the (d2, cid) argmin cannot diverge.
    """
    seeds = (
        embeddings.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .collect()
    )  # bounded driver collect: k model-sized rows (the single-query-vector idiom)
    cents = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in seeds]
    e = F.col("embedding")

    dim = len(cents[0][1])

    # r12 wave 9 (guide §2.1 — one corpus pass, fewer stages): |e|² is
    # projected ONCE below the assignment (it used to re-fold inside
    # every cluster's d2 struct), each centroid's |c|² folds
    # driver-side with the same left fold over the same float64 values
    # (bit-identical literal), and the per-(cid, pos) component-mean
    # branch (posexplode + second corpus pass + join) collapses into
    # the SAME groupBy('cid') as dim per-dim sums: cval = sum/count is
    # Spark avg's own evaluation, and new_norm's square chain adds in
    # dimension order — the _dot fold's order. The round-9 gate
    # contract (both engines) absorbs partial-merge order, exactly as
    # it did for the old two-groupBy shape.
    def py_sq(cv: list[float]) -> float:
        acc = 0.0
        for x in cv:
            acc = acc + x * x
        return acc

    # whole expression tree as SQL strings (the module's _dot_sql
    # pattern — py4j charges one round trip per Column node, ~1 000
    # nodes here); the parsed tree is the Column API's, so the doubles
    # are unchanged. The choice struct is projected ONCE (__ch) — the
    # old shape re-evaluated the full k×dim assignment fold for each
    # of its two getField references.
    structs = ",".join(
        f"named_struct('d2', ((__ee - (CAST(2.0 AS DOUBLE) * "
        f"{_dot_sql('embedding', _arr_sql(cv))})) + {_dlit(py_sq(cv))}), "
        f"'cid', {int(cid)})"
        for cid, cv in cents
    )
    choice = f"array_min(array({structs}))"
    assigned = (
        embeddings.selectExpr(
            "embedding", f"{_dot_sql('embedding', 'embedding')} AS __ee"
        )
        .selectExpr("embedding", f"{choice} AS __ch")
        .selectExpr("embedding", "__ch.cid AS cid", "__ch.d2 AS d2")
    )
    per = assigned.groupBy("cid").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.avg("d2").alias("avg_d2"),
        *[
            F.expr(f"sum(CAST(element_at(embedding, {i + 1}) AS DOUBLE))").alias(
                f"__s{i}"
            )
            for i in range(dim)
        ],
    )
    sq_chain = "CAST(0.0 AS DOUBLE)"
    for i in range(dim):
        cv = f"(__s{i} / CAST(n_members AS DOUBLE))"
        sq_chain = f"({sq_chain} + ({cv} * {cv}))"
    return per.selectExpr(
        "cid", "n_members", "avg_d2", f"sqrt({sq_chain}) AS new_norm"
    ).orderBy("cid")


def ivf_assign(
    embeddings: DataFrame, centroids: DataFrame | list[tuple[int, list[float]]]
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine, adding
    ``cluster_id`` — the IVF inverted-list key (and the natural
    partitioning/bucketing column for the stored index).

    The centroid set is a *model*, small by definition, so the preferred
    path takes it as driver-side constants and compiles assignment to a
    single narrow map expression (array of scores → argmax): no join, no
    shuffle, stays in whole-stage codegen. A DataFrame argument falls
    back to broadcast-join + per-key argmax for huge centroid sets."""
    if isinstance(centroids, DataFrame):
        from pyspark.sql import Window

        score = _dot(F.col("embedding"), F.col("centroid")) / (
            _norm(F.col("embedding")) * _norm(F.col("centroid"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("__cscore").desc(), F.col("cluster_id"))
        return (
            embeddings.crossJoin(F.broadcast(centroids))
            .withColumn("__cscore", score)
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .drop("__rk", "__cscore", "centroid")
        )
    # One SQL string instead of ~n_clusters × dim py4j literal calls
    # (see the _dot_sql note above) — the parsed tree, and therefore the
    # hash-oracled values, are identical to the Column-API original.
    norm_e = _norm_sql("embedding")
    scores = "array(" + ",".join(
        f"{_dot_sql('embedding', _arr_sql(vec))} / ({norm_e} * {_dlit(math_norm(vec))})"
        for _, vec in centroids
    ) + ")"
    # argmax with ties to the lowest cluster_id (array_position finds the
    # first occurrence of the max — centroid order is ascending id).
    ids = "array(" + ",".join(str(int(cid)) for cid, _ in centroids) + ")"
    expr = (
        f"element_at({ids}, CAST(array_position({scores}, array_max({scores})) AS INT))"
    )
    return embeddings.withColumn("cluster_id", F.expr(expr))


def math_norm(vec: list[float]) -> float:
    import math

    return math.sqrt(sum(x * x for x in vec)) or 1.0


# Above this many centroids the literal-expression assign/probe paths
# stop being the right plan: n_clusters x dim literals make janino
# compile minutes-long trees (the codegen-hang gotcha), and the
# broadcast-crossJoin fallback multiplies the corpus by n_clusters.
# The Arrow path below is the production shape for large lists.
IVF_LITERAL_MAX_CLUSTERS = 64


def ivf_assign_arrow(
    embeddings: DataFrame, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """Arrow-batched numpy cluster assignment — the large-n_clusters
    twin of the literal-argmax ``ivf_assign`` (same cosine argmax, ties
    to the lowest cluster id via first-max). ONE mapInPandas pass, no
    shuffle, no per-centroid literal: the centroid matrix rides the
    closure (model-sized), each batch does a (B x dim)@(dim x K) GEMM.
    This is what keeps the IVF family linear when the n_clusters ≈
    N/list_size rule pushes K into the hundreds at 100x corpora
    (SCALE_PROBE sf10): K=781 literals would hang whole-stage codegen,
    and the broadcast-crossJoin fallback multiplies the corpus by K.

    Tie discipline (ADVICE r7 #2): the centroid list is SORTED by id
    here, so the stable argmax's first-max tie-break lands on the
    LOWEST cluster id regardless of caller ordering — matching the
    literal path's (score DESC, cid ASC). Caveat: the GEMM's summation
    order differs from the literal left-fold dot, so scores that tie
    only within a ULP of each other can still rank differently; exact
    ties (identical vectors) are safe."""
    import numpy as np

    from pyspark.sql import types as T

    centroids = sorted(centroids, key=lambda t: int(t[0]))
    C = np.array([vec for _, vec in centroids], dtype=np.float64)
    Cn = np.sqrt((C * C).sum(1))
    Cn[Cn == 0.0] = 1.0
    ids = np.array([int(cid) for cid, _ in centroids], dtype=np.int64)
    schema = T.StructType(
        list(embeddings.schema.fields) + [T.StructField("cluster_id", T.IntegerType())]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = _pdf_mat_f64(pdf["embedding"])
            Xn = np.sqrt((X * X).sum(1))
            Xn[Xn == 0.0] = 1.0
            cos = (X @ C.T) / (Xn[:, None] * Cn[None, :])
            pdf = pdf.copy()
            pdf["cluster_id"] = ids[cos.argmax(1)].astype("int32")
            yield pdf

    return embeddings.mapInPandas(run, schema)


def ivf_probe_lists_arrow(
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n_probe: int = 4,
) -> DataFrame:
    """Arrow-batched numpy twin of ``ivf_probe_lists`` for large
    centroid sets: per-query top-``n_probe`` lists via one GEMM +
    argpartition per batch, emitted as (qid, qvec, qn, pcid,
    probe_rank) rows — n_probe rows per query, computed map-side with
    no window, no explode of K literal structs.

    Tie discipline (ADVICE r7 #2): centroids are SORTED by id before
    the GEMM, so the stable argsort's tie-break is (score DESC, cid
    ASC) for any caller ordering — the literal path's rank. ULP-near
    score ties can still flip vs the literal left-fold dot (different
    summation order); exact ties are safe."""
    import numpy as np

    from pyspark.sql import types as T

    centroids = sorted(centroids, key=lambda t: int(t[0]))
    C = np.array([vec for _, vec in centroids], dtype=np.float64)
    Cn = np.sqrt((C * C).sum(1))
    Cn[Cn == 0.0] = 1.0
    ids = np.array([int(cid) for cid, _ in centroids], dtype=np.int64)
    npb = int(n_probe)
    schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("qvec", T.ArrayType(T.DoubleType())),
            T.StructField("qn", T.DoubleType()),
            T.StructField("pcid", T.IntegerType()),
            T.StructField("probe_rank", T.IntegerType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = _pdf_mat_f64(pdf["embedding"])
            Xn = np.sqrt((X * X).sum(1))
            Xn[Xn == 0.0] = 1.0
            cos = (X @ C.T) / (Xn[:, None] * Cn[None, :])
            # ties to lowest cluster id, matching the literal path's
            # (score DESC, cid ASC) rank: lexsort on (-score, id order
            # is implicit because argsort is stable over the id axis)
            order = np.argsort(-cos, axis=1, kind="stable")[:, :npb]
            rows = {
                "qid": np.repeat(pdf["vec_id"].to_numpy(), npb),
                "qvec": [v for v in pdf["embedding"] for _ in range(npb)],
                "qn": np.repeat(Xn, npb),
                "pcid": ids[order].reshape(-1).astype("int32"),
                "probe_rank": np.tile(np.arange(1, npb + 1), len(pdf)).astype(
                    "int32"
                ),
            }
            yield pd.DataFrame(rows)

    return queries.mapInPandas(run, schema)


def _seq_sq(vec: list[float]) -> float:
    """Driver-side twin of _dot_sql(lit, lit): the same left fold."""
    acc = 0.0
    for c in vec:
        acc = acc + float(c) * float(c)
    return acc


def ivfpq_encode_exact_arrow(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]] | None,
    codebooks: list[list[list[float]]] | None,
    with_norm: bool = False,
) -> DataFrame:
    """BIT-IDENTICAL Arrow twin of ``pq_encode(ivf_assign(...))`` —
    the r12 build-path optimization (guide §4: the HOF lambda
    (``aggregate``/``zip_with``/``transform``) scoring in the literal
    expressions never enters whole-stage codegen, so the per-codeword
    interpreted fold dominated every index build: measured 1.5 s → 0.3 s
    warm for the sf0.1 assign+encode pass, outputs verified identical).

    Unlike ``ivf_assign_arrow``/``ivf_probe_lists_arrow`` (GEMM — fast
    but with the documented ULP-tie caveat), this twin REPLAYS THE
    EXACT FLOAT FOLD of the literal expressions: it vectorizes over
    ROWS and iterates DIMENSIONS in order, so every intermediate double
    equals the SQL ``aggregate(zip_with(...), 0.0, acc+v)`` left fold
    — ((0+x₁y₁)+x₂y₂)+…, IEEE-identical elementwise — and numpy's
    first-occurrence argmin/argmax matches ``array_position`` on
    ``array_min``/``array_max`` (ties → lowest id, centroid/codeword
    order ascending). The hash-oracled gate values therefore cannot
    move; pytest pins equality against the expression path on the
    real fixtures.

    Pass ``centroids`` for ``cluster_id``, ``codebooks`` for ``codes``,
    or both for the fused single pass (one Python boundary instead of
    two interpreted HOF projections). ``with_norm=True`` additionally
    emits the row's L2 ``norm`` (the same sequential fold + zero→1.0
    guard as ``_norm`` — it is already computed for the assignment, so
    consumers that re-rank by cosine get it for free instead of paying
    the interpreted fold again)."""
    import numpy as np

    from pyspark.sql import types as T

    assert centroids is not None or codebooks is not None
    if centroids is not None:
        centroids = sorted(centroids, key=lambda t: int(t[0]))
        ids = [int(cid) for cid, _ in centroids]
        C = [[float(x) for x in v] for _, v in centroids]
        Cn = [math_norm(v) for v in C]
        dim = len(C[0])
    if codebooks is not None:
        m = len(codebooks)
        sub_dim = len(codebooks[0][0])
        cn2 = [[_seq_sq(cw) for cw in codebooks[s]] for s in range(m)]
        dim = m * sub_dim

    fields = list(embeddings.schema.fields)
    if centroids is not None:
        fields = fields + [T.StructField("cluster_id", T.IntegerType())]
    if codebooks is not None:
        fields = fields + [T.StructField("codes", T.ArrayType(T.IntegerType()))]
    if with_norm:
        fields = fields + [T.StructField("norm", T.DoubleType())]
    schema = T.StructType(fields)

    def run(batches):
        for pdf in batches:
            B = len(pdf)
            if not B:
                continue
            X = _pdf_mat_f64(pdf["embedding"])
            out = pdf.copy()
            ne = None
            if centroids is not None or with_norm:
                n2 = np.zeros(B)
                for i in range(dim):
                    n2 = n2 + X[:, i] * X[:, i]
                ne = np.sqrt(n2)
                ne[ne == 0.0] = 1.0
            if centroids is not None:
                scores = np.empty((B, len(C)))
                for ci, (cv, cn) in enumerate(zip(C, Cn)):
                    dot = np.zeros(B)
                    for i in range(dim):
                        dot = dot + X[:, i] * cv[i]
                    scores[:, ci] = dot / (ne * cn)
                amax = scores.argmax(axis=1)
                out["cluster_id"] = (
                    np.array(ids, dtype=np.int64)[amax].astype("int32")
                )
            if codebooks is not None:
                codes = np.empty((B, m), dtype="int32")
                for s in range(m):
                    off = s * sub_dim
                    xs2 = np.zeros(B)
                    for i in range(sub_dim):
                        xs2 = xs2 + X[:, off + i] * X[:, off + i]
                    d = np.empty((B, len(codebooks[s])))
                    for j, cw in enumerate(codebooks[s]):
                        dot = np.zeros(B)
                        for i in range(sub_dim):
                            dot = dot + X[:, off + i] * float(cw[i])
                        d[:, j] = xs2 - 2.0 * dot + cn2[s][j]
                    codes[:, s] = d.argmin(axis=1)
                out["codes"] = [codes[r].tolist() for r in range(B)]
            if with_norm:
                out["norm"] = ne
            yield out

    return embeddings.mapInPandas(run, schema)


def ivf_assign_exact_arrow(
    embeddings: DataFrame, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """``ivf_assign``'s bit-identical Arrow twin (see
    :func:`ivfpq_encode_exact_arrow`)."""
    return ivfpq_encode_exact_arrow(embeddings, centroids, None)


def pq_encode_exact_arrow(
    embeddings: DataFrame, codebooks: list[list[list[float]]]
) -> DataFrame:
    """``pq_encode``'s bit-identical Arrow twin (see
    :func:`ivfpq_encode_exact_arrow`)."""
    return ivfpq_encode_exact_arrow(embeddings, None, codebooks)


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    iters: int = 3,
) -> DataFrame:
    """IVF ANN top-k: train the coarse quantizer, probe the n_probe
    centroids nearest the query, exact-re-rank only vectors in those
    inverted lists (~N·n_probe/n_clusters candidates). In a deployed
    index the centroids + assignment are precomputed and the assignment
    column is the storage partition key, so a probe prunes partitions at
    scan time."""
    import math

    spark = embeddings.sparkSession
    centroids = kmeans_centroids(embeddings, n_clusters=n_clusters, iters=iters)

    def cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return d / (na * nb)

    probe = sorted(
        centroids, key=lambda c: (-cos(c[1], [float(x) for x in query_vec]), c[0])
    )[:n_probe]
    probe_ids = [cid for cid, _ in probe]
    # r12: bit-identical Arrow assign with norms in the same pass, then
    # an Arrow re-rank of the probed lists only (see
    # ivfpq_encode_exact_arrow / cosine_literal_exact_arrow)
    assigned = ivfpq_encode_exact_arrow(
        embeddings, centroids, None, with_norm=True
    ).filter(F.col("cluster_id").isin(probe_ids))
    scored = cosine_literal_exact_arrow(
        assigned.select("vec_id", "embedding", "norm"),
        query_vec,
        norm_col="norm",
    )
    return (
        scored.select("vec_id", "cosine")
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_clusters: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> list[tuple[int, list[float]]]:
    """Materialize the deployed IVF index: assign every vector to its
    nearest centroid once and write the corpus partitioned BY
    ``cluster_id`` (one directory per inverted list). Probing then
    prunes partitions at scan *planning* time — the 100 TB shape, where
    a 4-of-8-probe query reads half the files and an assignment is
    never recomputed per query (VERDICT r2 #5).

    Returns the centroid model to ship alongside the index."""
    cents = centroids or _static_centroids(dim=dim, n_clusters=n_clusters, seed=seed)
    # r12: the bit-identical Arrow twin — the interpreted-HOF literal
    # scoring was the dominant build cost (see ivfpq_encode_exact_arrow)
    assigned = ivf_assign_exact_arrow(embeddings, cents)
    # one file per inverted list at test scale; at 100 TB each partition
    # directory holds many files and pruning skips whole directories
    assigned.repartition("cluster_id").write.partitionBy("cluster_id").mode(
        "overwrite"
    ).parquet(path)
    return cents


def upsert_ivf_index(
    embeddings: DataFrame,
    path: str,
    centroids: list[tuple[int, list[float]]],
) -> None:
    """Incremental IVF index maintenance (r4 verdict #8): assign ONLY
    the new vectors to the shipped centroids and append them into the
    existing ``cluster_id``-partitioned layout. Work is O(new vectors);
    existing inverted lists are never rewritten, and the files land
    inside the partition directories, so scan-time pruning and every
    query path are unchanged — the ``incremental.py`` monoid pattern
    applied to the index (list-append is the merge; merge == rebuild is
    pinned by pytest and the gate's static-twin oracle).

    At 100 TB the same plan holds: one narrow assignment pass over the
    delta + a repartition by list. Steady upserting accretes small
    files per list — run a per-partition compaction (rewrite one
    inverted list's directory) on the usual small-file cadence; the
    centroids themselves are refreshed only by an offline retrain, as
    in any deployed IVF system."""
    assigned = ivf_assign_exact_arrow(embeddings, centroids)
    assigned.repartition("cluster_id").write.partitionBy("cluster_id").mode(
        "append"
    ).parquet(_live(embeddings.sparkSession, path))


def cosine_topk_ivf_index(
    spark,
    path: str,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Query the materialized IVF index from ``build_ivf_index``: rank
    centroids driver-side, filter on the ``cluster_id`` PARTITION column
    (shows up as PartitionFilters in the scan — directories outside the
    probe set are never opened), exact cosine re-rank inside the probed
    lists only. Identical results to cosine_topk_ivf_static at a
    fraction of the scan."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return d / (na * nb)

    probe_ids = [
        cid
        for cid, _ in sorted(
            centroids, key=lambda c: (-cos(c[1], [float(x) for x in query_vec]), c[0])
        )[:n_probe]
    ]
    df = spark.read.parquet(_live(spark, path))
    # r12 (guide §4): exact re-rank of the probed lists in one Arrow pass
    scored = cosine_literal_exact_arrow(
        df.filter(F.col("cluster_id").isin(probe_ids)).select(
            "vec_id", "embedding"
        ),
        query_vec,
    )
    return (
        scored.select("vec_id", "cosine")
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dim: int = 64,
    bits: int = 8,
    seed: int = 42,
    multi_probe: int = 0,
) -> DataFrame:
    """ANN top-k: restrict the exact re-rank to the query's LSH bucket.
    With b bits the candidate set is ~N/2^b; recall is tuned by b and
    `multi_probe` (Hamming-ring probing). Returns the same schema as the
    brute-force path."""
    import math

    planes = _hyperplanes(dim, bits, seed)
    qbucket = 0
    for i, p in enumerate(planes):
        if sum(px * qx for px, qx in zip(p, query_vec)) >= 0:
            qbucket |= 1 << i
    # Multi-probe: also search buckets within Hamming distance
    # `multi_probe` of the query's bucket (flip the least-confident bits
    # first in a full implementation; flipping each single bit is the
    # standard first ring). Raises recall without re-hashing the corpus.
    probes = {qbucket}
    ring = {qbucket}
    for _ in range(multi_probe):
        ring = {b ^ (1 << i) for b in ring for i in range(bits)}
        probes |= ring
    # r12 (guide §4): Arrow signature pass (norms ride along) + Arrow
    # re-rank of the probed buckets
    sigs = lsh_sigs_norm_exact_arrow(embeddings, dim=dim, bits=bits, seed=seed)
    scored = cosine_literal_exact_arrow(
        sigs.filter(F.col("bucket").isin([int(b) for b in probes])).select(
            "vec_id", "embedding", "norm"
        ),
        query_vec,
        norm_col="norm",
    )
    return (
        scored.select("vec_id", "cosine")
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def _static_centroids(dim: int = 64, n_clusters: int = 8, seed: int = 7) -> list[tuple[int, list[float]]]:
    """Deterministic pseudo-random centroids — the 'deployed index'
    configuration where the coarse quantizer is trained offline and
    shipped as constants (see cosine_topk_ivf's docstring). Literal
    centroids make the whole IVF probe/assign/re-rank pipeline
    oracle-expressible."""
    import random

    rng = random.Random(seed)
    return [(i, [rng.gauss(0.0, 1.0) for _ in range(dim)]) for i in range(n_clusters)]


def cosine_topk_ivf_static(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 8,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """IVF ANN top-k against a precomputed (literal) coarse quantizer:
    probe the n_probe centroids nearest the query, assignment compiled
    to a literal argmax map expression (no join, no shuffle), exact
    re-rank only within the probed inverted lists."""
    import math

    centroids = _static_centroids(dim=dim, n_clusters=n_clusters, seed=seed)

    def cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return d / (na * nb)

    probe_ids = [
        cid
        for cid, _ in sorted(
            centroids, key=lambda c: (-cos(c[1], [float(x) for x in query_vec]), c[0])
        )[:n_probe]
    ]
    # r12: bit-identical Arrow assign with norms in the same pass, then
    # an Arrow re-rank of the probed lists only (see
    # ivfpq_encode_exact_arrow / cosine_literal_exact_arrow)
    assigned = ivfpq_encode_exact_arrow(
        embeddings, centroids, None, with_norm=True
    ).filter(F.col("cluster_id").isin(probe_ids))
    scored = cosine_literal_exact_arrow(
        assigned.select("vec_id", "embedding", "norm"),
        query_vec,
        norm_col="norm",
    )
    return (
        scored.select("vec_id", "cosine")
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def embedding_dedup_keepers(
    embeddings: DataFrame, threshold: float = 0.35, dim: int = 64,
    bits: int | None = None, seed: int = 42
) -> DataFrame:
    """End-to-end embedding (semantic) deduplication: LSH-bucketed
    candidate pairs → exact cosine verify → connected components →
    one keeper per vector (the min vec_id of its duplicate cluster;
    unique vectors keep themselves). The assignment a pipeline joins
    back to drop semantic near-duplicates.

    Every stage is the already-scale-shaped operator it composes:
    bucket equi-join candidates (never all pairs), localCheckpoint'd
    min-label propagation for the clustering, one broadcast-ish join to
    label the full corpus."""
    from sqlstreamstore_spark.analytics.dedup import connected_components

    pairs = cosine_near_dup_pairs_lsh(
        embeddings, threshold, dim=dim, bits=bits, seed=seed, sort=False
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    comp = connected_components(pairs)
    labels = comp.select(
        F.col("doc_id").alias("vec_id"), F.col("comp").alias("__keeper")
    )
    return (
        embeddings.select("vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("__keeper"), F.col("vec_id")).cast("bigint").alias("keeper"),
        )
        .orderBy("vec_id")
    )


def embedding_lsh_recall(
    embeddings: DataFrame, threshold: float = 0.35, dim: int = 64, bits: int = 4,
    seed: int = 42, probe_hamming: int = 0,
) -> DataFrame:
    """LSH quality report for the embedding near-dup path (the cosine
    twin of dedup.minhash_lsh_recall): exact pair count, LSH-surviving
    pair count, hits, recall — what a pipeline owner watches when
    tuning bits/threshold.

    One O(N²) pass, not two: the LSH path verifies candidates with the
    SAME exact cosine + threshold, so its surviving pairs are exactly
    the exact pairs whose two vectors share a bucket — n_lsh ≡ n_hit.
    The report therefore scores all pairs once, carrying bucket
    equality as a flag, instead of running the exact join, the LSH
    join, and an intersection join (r2 shape: 3 jobs, 2 of them N²).
    """
    # r12 (guide §4): signatures + norms in one bit-identical Arrow
    # pass; pair scoring likewise (the O(N²) interpreted fold was the
    # whole cost of this report)
    sigs = lsh_sigs_norm_exact_arrow(embeddings, dim=dim, bits=bits, seed=seed)
    # spread the streamed side of the theta-join (see cosine_near_dup_pairs)
    n = max(1, embeddings.sparkSession.sparkContext.defaultParallelism)
    a = sigs.repartition(n).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        F.col("norm").alias("na"), F.col("bucket").alias("ba"),
    )
    b = sigs.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        F.col("norm").alias("nb"), F.col("bucket").alias("bb"),
    )
    # probe_hamming=0 ⇒ exact-bucket LSH; k ⇒ multi-probe over buckets
    # within Hamming distance k (the standard recall knob: probing the
    # 1-bit neighbors multiplies candidates by ~(1+bits) but recovers
    # the near-dups a single sign-flip hid)
    found = (
        F.bit_count(F.col("ba").bitwiseXOR(F.col("bb"))) <= probe_hamming
    )
    cand = (
        # broadcast the 1-partition side explicitly — else Spark may
        # stream IT and serialize the O(N²) loop on one task (the
        # cosine_near_dup_pairs note; measured 9.8 s -> ~2 s here)
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("va", "vb", "na", "nb", found.cast("long").alias("same_bucket"))
    )
    row = (
        pair_cosine_exact_arrow(cand)
        .filter(F.col("cosine") >= threshold)
        .agg(
            F.count("*").alias("n_exact"),
            F.coalesce(F.sum("same_bucket"), F.lit(0)).alias("n_hit"),
        )
        .first()
    )
    n_exact, n_hit = int(row.n_exact), int(row.n_hit)
    recall = float(n_hit) / n_exact if n_exact else 1.0
    return embeddings.sparkSession.createDataFrame(
        [(n_exact, n_hit, n_hit, recall)],
        "n_exact bigint, n_lsh bigint, n_hit bigint, recall double",
    )


# ------------------------------------------------------------------ PQ

def _static_codebooks(
    dim: int = 64, m: int = 8, n_codes: int = 16, seed: int = 11
) -> list[list[list[float]]]:
    """Deterministic pseudo-random PQ codebooks — the 'deployed index'
    configuration (trained offline, shipped as constants), which makes
    the whole encode/ADC/re-rank pipeline oracle-expressible.
    codebooks[s][j] = codeword j of subspace s (dim/m floats)."""
    import random

    rng = random.Random(seed)
    sub = dim // m
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(sub)] for _ in range(n_codes)]
        for _ in range(m)
    ]


def _sub(col: Column, s: int, sub_dim: int) -> Column:
    return F.slice(col, s * sub_dim + 1, sub_dim)


def pq_encode(embeddings: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """Product-quantization encode: split each vector into m subvectors,
    assign each to its nearest codeword by squared L2 — adds ``codes``
    (array<int>, one code per subspace). The entire assignment is one
    narrow literal-codebook map expression (the codebook is a model):
    no join, no shuffle, embarrassingly parallel.

    Float discipline: dist² = x·x − 2·x·c + ‖c‖², with both dot
    products computed by the same sequential fold the DuckDB oracle's
    list_dot_product uses and ‖c‖² a driver-side literal — so code
    assignment (incl. argmin ties → lowest j) is engine-identical.
    """
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    codes = []
    for s in range(m):
        vs = f"slice(embedding, {s * sub_dim + 1}, {sub_dim})"
        xs2 = _dot_sql(vs, vs)
        # one transform over the literal codeword matrix per subspace
        # (not n_codes named expressions — keeps analysis/codegen cost
        # linear in m, not m × n_codes)
        cb = "array(" + ",".join(_arr_sql(cw) for cw in codebooks[s]) + ")"
        dists = (
            f"transform({cb}, cw -> {xs2} - CAST(2.0 AS DOUBLE) * "
            f"{_dot_sql(vs, 'cw')} + {_dot_sql('cw', 'cw')})"
        )
        codes.append(
            f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)"
        )
    return embeddings.withColumn("codes", F.expr("array(" + ",".join(codes) + ")"))


def pq_train(
    embeddings: DataFrame, m: int = 8, n_codes: int = 16, iters: int = 2
) -> list[list[list[float]]]:
    """Train PQ codebooks with per-subspace Lloyd iterations. Each
    iteration is ONE Arrow-batched numpy pass (mapInPandas): every
    batch assigns its vectors to the nearest codeword per subspace and
    emits per-(subspace, code) partial sums + counts — ≤ m·n_codes rows
    per batch — which combine driver-side into the new means. Only
    model-sized data (m × n_codes × dim/m doubles) ever reaches the
    driver; the corpus never shuffles at all. (The literal-expression
    ``pq_encode`` stays the serving/oracle path — for training it would
    recompile its whole-stage-codegen megaexpression every iteration,
    which measured slower than the numpy pass.)

    Deterministic: initialized from the first n_codes vectors'
    subvectors (by vec_id), fixed iteration count; numpy argmin breaks
    ties toward the lowest code, like array_position(array_min)."""
    import numpy as np

    sample = (
        embeddings.orderBy("vec_id").limit(n_codes).select("embedding").collect()
    )
    dim = len(sample[0].embedding)
    sub_dim = dim // m
    codebooks = [
        [
            [float(x) for x in r.embedding[s * sub_dim : (s + 1) * sub_dim]]
            for r in sample
        ]
        for s in range(m)
    ]
    from pyspark.sql import types as T

    partial_schema = T.StructType([
        T.StructField("sub", T.IntegerType()),
        T.StructField("code", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("sums", T.ArrayType(T.DoubleType())),
    ])
    base = embeddings.select("embedding").persist()
    try:
        # no warm-up count: the first iteration's pass materializes the
        # cache; iteration 2+ reads it
        for _ in range(iters):
            C = np.array(codebooks)  # (m, n_codes, sub_dim)

            def run(batches, C=C):
                import pandas as pd

                for pdf in batches:
                    X = _pdf_mat_f64(pdf["embedding"])
                    if not len(X):
                        continue
                    rows = []
                    for s in range(m):
                        Xs = X[:, s * sub_dim : (s + 1) * sub_dim]
                        d2 = ((Xs[:, None, :] - C[s][None, :, :]) ** 2).sum(-1)
                        code = d2.argmin(1)
                        for j in np.unique(code):
                            sel = Xs[code == j]
                            rows.append((s, int(j), len(sel), sel.sum(0).tolist()))
                    yield pd.DataFrame(rows, columns=["sub", "code", "n", "sums"])

            partials = base.mapInPandas(run, partial_schema).collect()
            acc: dict[tuple[int, int], tuple[int, np.ndarray]] = {}
            for r in partials:
                key = (r.sub, r.code)
                n0, s0 = acc.get(key, (0, np.zeros(sub_dim)))
                acc[key] = (n0 + r.n, s0 + np.asarray(r.sums))
            for (s, j), (n, sums) in acc.items():
                if n:
                    codebooks[s][j] = (sums / n).tolist()
    finally:
        base.unpersist()
    return codebooks


def _pq_approx_cosine(query_vec: list[float], codebooks: list[list[list[float]]]) -> Column:
    """ADC (asymmetric distance computation) scoring column: the
    reconstruction x̂ = concat(codeword per subspace) gives
    cosine(q, x̂) from two literal lookup tables — q·codeword and
    ‖codeword‖² per (subspace, code) — indexed by the codes column.
    Per row: m element_at lookups + one division. The corpus vector is
    never touched: at scale the ADC scan reads ONLY the codes column
    (m bytes/vector vs dim·4 — a 32× scan reduction at m=8, dim=64)."""
    import math

    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    dot_terms = []
    n2_terms = []
    for s in range(m):
        qs = [float(x) for x in query_vec[s * sub_dim : (s + 1) * sub_dim]]
        lut_dot = _arr_sql(float(sum(a * b for a, b in zip(qs, cw))) for cw in codebooks[s])
        lut_n2 = _arr_sql(float(sum(x * x for x in cw)) for cw in codebooks[s])
        code = f"element_at(codes, {s + 1})"
        dot_terms.append(f"element_at({lut_dot}, {code} + 1)")
        n2_terms.append(f"element_at({lut_n2}, {code} + 1)")
    approx_dot = " + ".join(dot_terms)
    approx_n2 = " + ".join(n2_terms)
    recon_norm = f"sqrt({approx_n2})"
    guarded = (
        f"CASE WHEN {recon_norm} = CAST(0.0 AS DOUBLE) THEN CAST(1.0 AS DOUBLE) "
        f"ELSE {recon_norm} END"
    )
    return F.expr(f"({approx_dot}) / ({guarded} * {_dlit(qn)})")


def _pq_topk_from_codebooks(
    embeddings: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int,
    rerank: int,
) -> DataFrame:
    # r12: bit-identical Arrow encode (the interpreted-HOF literal
    # scoring dominated this serving pass; see ivfpq_encode_exact_arrow)
    enc = pq_encode_exact_arrow(embeddings, codebooks)
    approx = enc.select(
        "vec_id", "embedding", _pq_approx_cosine(query_vec, codebooks).alias("__approx")
    )
    cands = approx.orderBy(F.col("__approx").desc(), "vec_id").limit(rerank * k)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = F.col("embedding")
    exact = _dot(emb, q) / (_norm(emb) * _norm(q))
    return (
        cands.select("vec_id", exact.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(k)
    )


def cosine_topk_pq(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    rerank: int = 4,
) -> DataFrame:
    """PQ ANN top-k (trained): train codebooks (Lloyd per subspace),
    encode the corpus, rank by ADC approximate cosine, exact-re-rank
    the top rerank·k candidates. Completes the ANN triad next to LSH
    (cosine_topk_lsh) and IVF (cosine_topk_ivf): where IVF prunes the
    SCAN (partition pruning on cluster_id), PQ shrinks the BYTES
    (codes are m small ints per vector); a deployed index composes
    both (IVF-PQ)."""
    codebooks = pq_train(embeddings, m=m, n_codes=n_codes, iters=iters)
    return _pq_topk_from_codebooks(embeddings, query_vec, codebooks, k, rerank)


def cosine_topk_pq_static(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    rerank: int = 10,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """PQ ANN top-k against precomputed (literal) codebooks — the
    deployed-index twin of cosine_topk_pq, fully oracle-expressible
    (encode, ADC and re-rank are deterministic literal expressions)."""
    codebooks = _static_codebooks(dim=dim, m=m, n_codes=n_codes, seed=seed)
    return _pq_topk_from_codebooks(embeddings, query_vec, codebooks, k, rerank)


# -------------------------------------------------------------- IVF-PQ

def build_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_clusters: int = 8,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    dim: int = 64,
    seed: int = 7,
    codebooks: list[list[list[float]]] | None = None,
) -> tuple[list[tuple[int, list[float]]], list[list[list[float]]]]:
    """Materialize the composed IVF-PQ index — the standard deployed
    layout for billion-scale vector search: the coarse quantizer prunes
    the SCAN (cluster_id partition directories) and the PQ codes shrink
    the BYTES the surviving scan reads (the ADC pass touches only the
    m-int codes column; the embedding column is read only for the final
    re-rank of rerank·k candidates).

    Writes (vec_id, embedding, codes) partitioned by cluster_id and
    returns the (centroids, codebooks) model pair to ship with it.
    Coarse centroids are the deterministic deployed set (as
    build_ivf_index); codebooks are Lloyd-trained on the corpus.
    """
    cents = _static_centroids(dim=dim, n_clusters=n_clusters, seed=seed)
    if codebooks is None:
        # Lloyd-trained codebooks (iterative — pytest-pinned, not SQL);
        # pass pre-trained/static codebooks for the deployed-model
        # configuration, which the gate oracles end to end
        codebooks = pq_train(embeddings, m=m, n_codes=n_codes, iters=iters)
    # r12: fused bit-identical Arrow assign+encode — ONE Python
    # boundary replaces TWO interpreted-HOF projections (measured
    # 1.5 s → 0.3 s warm at sf0.1; see ivfpq_encode_exact_arrow)
    enc = ivfpq_encode_exact_arrow(embeddings, cents, codebooks)
    enc.select("vec_id", "embedding", "codes", "cluster_id").repartition(
        "cluster_id"
    ).write.partitionBy("cluster_id").mode("overwrite").parquet(path)
    return cents, codebooks


def cosine_topk_ivfpq(
    spark,
    path: str,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 10,
) -> DataFrame:
    """Query the materialized IVF-PQ index: rank centroids driver-side,
    prune partitions on cluster_id (PartitionFilters at plan time), ADC
    over the codes column inside the probed lists, exact re-rank of the
    top rerank·k. Column pruning means the ADC stage's scan reads
    (vec_id, codes) only."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return d / (na * nb)

    probe_ids = [
        cid
        for cid, _ in sorted(
            centroids, key=lambda c: (-cos(c[1], [float(x) for x in query_vec]), c[0])
        )[:n_probe]
    ]
    probed = spark.read.parquet(_live(spark, path)).filter(F.col("cluster_id").isin(probe_ids))
    cand_ids = (
        probed.select(
            "vec_id", _pq_approx_cosine(query_vec, codebooks).alias("__approx")
        )
        .orderBy(F.col("__approx").desc(), "vec_id")
        .limit(rerank * k)
        .select("vec_id")
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = F.col("embedding")
    exact = _dot(emb, q) / (_norm(emb) * _norm(q))
    return (
        probed.join(F.broadcast(cand_ids), "vec_id")
        .select("vec_id", exact.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(k)
    )


def hard_negatives(
    embeddings: DataFrame, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """Hard-negative mining for contrastive training data: for each
    query vector, the k corpus vectors with the HIGHEST cosine among
    those carrying a DIFFERENT label, plus the margin against the
    query's best same-label positive (best_pos − neg cosine; a small
    margin flags the negatives most likely to be label noise or the
    most informative training pairs).

    Scale shape: the query side is tiny and broadcast; each derivation
    (negatives rank, best positive) is one columnar corpus scan + a
    broadcast join — two cheap passes, no all-pairs corpus×corpus join
    ever forms. Per-query top-k uses WindowGroupLimit (top-k pushdown
    before the qid exchange), and the margin join ships n_queries rows.
    """
    from pyspark.sql import Window

    n = max(1, embeddings.sparkSession.sparkContext.defaultParallelism)
    c = embeddings.repartition(n).select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clabel"),
        F.col("embedding").alias("cvec"),
        _norm(F.col("embedding")).alias("cn"),
    )
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qvec"),
        _norm(F.col("embedding")).alias("qn"),
    )
    score = _dot(F.col("cvec"), F.col("qvec")) / (F.col("cn") * F.col("qn"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid", "qlabel", "cid", "clabel", score.alias("cosine")
    )
    best_pos = (
        scored.filter(
            (F.col("clabel") == F.col("qlabel")) & (F.col("cid") != F.col("qid"))
        )
        .groupBy("qid")
        .agg(F.max("cosine").alias("best_pos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    negs = (
        scored.filter(F.col("clabel") != F.col("qlabel"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
    return (
        negs.join(F.broadcast(best_pos), "qid")
        .select(
            "qid",
            "cid",
            F.col("clabel").alias("neg_label"),
            "cosine",
            "rk",
            (F.col("best_pos") - F.col("cosine")).alias("margin"),
        )
        .orderBy("qid", "rk")
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid summary — the embedding-space QC report a
    training pipeline runs before trusting labels: cluster size,
    centroid norm (near-zero ⇒ the label's vectors cancel out, i.e.
    no coherent direction), mean member-to-centroid cosine (label
    purity) and the worst member (outlier floor).

    Scale shape: one posexplode + (label, pos) partial agg — the only
    shuffle, and its output is |labels|×dim rows regardless of N; the
    centroid arrays re-assemble per label via collect_list (bounded by
    dim) and broadcast back to the member scan, where the cosine is
    pure map-side codegen over the original array column. No
    per-vector shuffle, no driver collect.
    """
    ex = embeddings.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "label", "pos", F.col("val").cast("double").alias("val"))
    comp = ex.groupBy("label", "pos").agg(F.avg("val").alias("cval"))
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s.getField("cval"),
        ).alias("cvec")
    )
    m = embeddings.join(F.broadcast(cent), "label")
    cos = _dot(F.col("embedding"), F.col("cvec")) / (
        _norm(F.col("embedding")) * _norm(F.col("cvec"))
    )
    return (
        m.select(
            "label",
            cos.alias("cos"),
            _norm(F.col("cvec")).alias("cnorm"),
        )
        .groupBy("label")
        .agg(
            # count(*) — keeps vec_id out of the member scan (ReadSchema
            # is then embedding+label only)
            F.count(F.lit(1)).alias("n_vecs"),
            F.first("cnorm").alias("centroid_norm"),
            F.avg("cos").alias("mean_cos_to_centroid"),
            F.min("cos").alias("min_cos_to_centroid"),
        )
        .orderBy("label")
    )


def ivf_probe_lists(
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n_probe: int = 4,
) -> DataFrame:
    """Per-query probe lists against a literal centroid model: one row
    per (query, probed cluster), ``n_probe`` rows per query. The
    centroid scores compile to ONE map expression (an exploded literal
    struct array — no join, no corpus scan); the per-query rank is a
    window over the small query side only.

    Output: qid, qvec, qn (query norm, reused by the re-rank), pcid
    (probed cluster id), probe_rank."""
    from pyspark.sql import Window

    norm_e = _norm_sql("embedding")
    structs = "array(" + ",".join(
        f"named_struct('cid', {int(cid)}, 'score', "
        f"{_dot_sql('embedding', _arr_sql(vec))} / ({norm_e} * {_dlit(math_norm(vec))}))"
        for cid, vec in centroids
    ) + ")"
    w = Window.partitionBy("qid").orderBy(F.desc("c.score"), F.asc("c.cid"))
    return (
        queries.select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            _norm(F.col("embedding")).alias("qn"),
            F.explode(F.expr(structs)).alias("c"),
        )
        .withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= n_probe)
        .select("qid", "qvec", "qn", F.col("c.cid").alias("pcid"), "probe_rank")
    )


def knn_join_ivf_static(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 7,
    broadcast_probes: bool = True,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Batched multi-query ANN through the IVF index (VERDICT r5 #2):
    a query DATAFRAME — not one literal vector — each query probing its
    ``n_probe`` nearest inverted lists, equi-joined against the
    cluster-assigned corpus on cluster_id, exact cosine re-rank and
    per-query top-k. This is how retrieval actually runs at 100 TB:
    queries arrive in batches, and one corpus pass serves all of them.

    Scale shape — contrast knn_join_bruteforce's crossJoin:
      - corpus assignment is the literal-argmax map expression
        (ivf_assign): no shuffle, stays in whole-stage codegen;
      - probe lists are Q×n_probe rows, BROADCAST to the corpus scan:
        the join is a BroadcastHashJoin on cluster_id — each corpus row
        is scored only against the queries probing its list, so the
        candidate fan-out is ~Q·n_probe/n_clusters per corpus row,
        never Q;
      - per-query top-k is rank-limit-pushed (WindowGroupLimit): each
        map task keeps k rows per query BEFORE the qid exchange, so the
        only shuffle in the whole plan moves ~Q·k rows.
    Against the materialized index (build_ivf_index) the same join
    triggers dynamic partition pruning — see knn_join_ivf_index.

    Self-matches are excluded (cid != qid), mirroring
    knn_join_bruteforce, the exact twin to measure recall against.

    ``broadcast_probes=False`` switches the candidate join to a plain
    shuffled equi-join on the cluster key — the corpus-as-queries
    regime (self-kNN graph): when Q ≈ N the probe side no longer fits a
    broadcast, but both sides hash-partition by cluster id, so each
    inverted list joins co-located, and the rank-limit pushdown still
    caps what leaves each task at k rows per query.

    ``centroids`` overrides the static hyperplane model with a caller-
    trained one (kmeans_centroids) — the recall-at-scale probe path;
    when given, ``n_clusters`` is taken from its length."""
    from pyspark.sql import Window

    if centroids is None:
        centroids = _static_centroids(dim=dim, n_clusters=n_clusters, seed=seed)
    else:
        n_clusters = len(centroids)
    # large centroid sets (the n_clusters ≈ N/list_size rule at big N)
    # switch to the Arrow GEMM assign/probe twins — literal trees past
    # ~64 clusters hang janino and aren't the plan you'd want anyway
    if n_clusters > IVF_LITERAL_MAX_CLUSTERS:
        probes = ivf_probe_lists_arrow(queries, centroids, n_probe=n_probe)
        assigned = ivf_assign_arrow(embeddings, centroids).select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cvec"),
            _norm(F.col("embedding")).alias("cn"),
            "cluster_id",
        )
    else:
        probes = ivf_probe_lists(queries, centroids, n_probe=n_probe)
        # r12 (guide §4): bit-identical Arrow assign, norm in the same
        # pass (ivf_assign + _norm were two interpreted HOF projections)
        assigned = ivfpq_encode_exact_arrow(
            embeddings, centroids, None, with_norm=True
        ).select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cvec"),
            F.col("norm").alias("cn"),
            "cluster_id",
        )
    if broadcast_probes:
        probes = F.broadcast(probes)
    # r12 note: the Arrow pair twin on the candidate join was MEASURED
    # SLOWER in the corpus-as-queries regime (semantic_clusters 3.8 ->
    # 4.1 s warm), and so was the wave-9 id-only broadcast-matrix
    # variant (2.62 -> 3.08 s warm) — the join scores inline in one
    # stage where the rank-limit pushdown prunes before anything
    # moves; expression scoring stays, only the assign+norm pass is
    # Arrow (guide §1.6/§4)
    score = _dot(F.col("cvec"), F.col("qvec")) / (F.col("cn") * F.col("qn"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        assigned.join(
            probes, assigned.cluster_id == probes.pcid, "inner"
        )
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid", score.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("qid", "rk")
    )


def knn_join_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Batched ANN against the MATERIALIZED cluster_id-partitioned IVF
    index (build_ivf_index): the broadcast equi-join between the probe
    lists and the index's partition column triggers Spark's dynamic
    partition pruning, so inverted-list directories no query probes are
    never opened — the scan-level pruning cosine_topk_ivf_index gets
    from a literal IN filter, generalized to a query batch (pinned by
    tests/test_similarity.py's dynamicpruning plan check)."""
    from pyspark.sql import Window

    probes = ivf_probe_lists(queries, centroids, n_probe=n_probe)
    idx = spark.read.parquet(_live(spark, path)).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
        "cluster_id",
    )
    cand = (
        idx.join(F.broadcast(probes), idx.cluster_id == probes.pcid, "inner")
        .filter(F.col("cid") != F.col("qid"))
        .select("qid", "cid", "cvec", "qvec", "qn")
    )
    # r12 (guide §4): exact re-rank in one Arrow pass; the corpus norm
    # is recomputed inside the twin (same fold + zero→1.0 guard as
    # _norm, so the doubles cannot move) — cheaper than an interpreted
    # per-row HOF norm on the scan side
    scored = pair_cosine_exact_arrow(
        cand, a_col="cvec", b_col="qvec", na_col=None, nb_col="qn"
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("qid", "rk")
    )


# one probe row per (query, probed list), each carrying the dim-double
# qvec: at dim 64 ≈ 0.5 KB/row, so 100k rows ≈ 50 MB — the measured
# broadcast ceiling shared by every size-adaptive probe-join picker
# (semantic_clusters measured 10.4 s → 1.7 s warm BELOW it at sf0.1,
# and the sf10 regime of 200k×4 probes ≈ 400 MB sits safely above)
PROBE_BROADCAST_MAX_ROWS = 100_000


def probe_fits_broadcast(n_queries: int, n_probe: int) -> bool:
    """Shared size-adaptive picker (VERDICT r8 #3): broadcast the probe
    frame only while its row count (queries × n_probe) fits the
    measured ceiling; above it, fall back to the shuffled co-located
    equi-join on the cluster key."""
    return n_queries * n_probe <= PROBE_BROADCAST_MAX_ROWS


def near_dup_against_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    threshold: float = 0.35,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_clusters: int = 8,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 7,
    broadcast_probes: bool | None = None,
) -> DataFrame:
    """Embedding-side INCREMENTAL near-dup — the semantic twin of
    dedup.minhash_dedup_incremental: check a delta of new vectors
    against the MATERIALIZED cluster-partitioned IVF index
    (build_ivf_index / upsert_ivf_index) instead of re-running the
    corpus self-join. Each new vector probes its ``n_probe`` nearest
    inverted lists; candidates are exact-cosine scored and pairs at or
    above ``threshold`` are reported as (new_vec, old_vec, cosine) —
    the keep/drop-on-ingest input for semantic dedup.

    Scale shape: the probe join is picked BY SIZE (round 9, VERDICT r8
    #3 — the same measured picker as semantic_clusters,
    :func:`probe_fits_broadcast`): a small delta's probe lists
    BROADCAST, so the stored index joins map-side with dynamic
    partition pruning (only probed cluster directories are read — the
    knn_join_ivf_index plan), no index shuffle; a LARGE crawl delta
    (N·n_probe rows × dim doubles past the ~50 MB ceiling) falls back
    to the shuffled co-located equi-join on cluster_id instead of a
    broadcast OOM. No top-k window either way (threshold semantics).
    Work ∝ delta × probed-list mass. Recall is the IVF probe's
    (n_probe the knob — SCALE_PROBE ivf_recall_at10).
    ``broadcast_probes=None`` (default) decides from one pruned
    delta count; pass a bool to skip the count."""
    cents = centroids or _static_centroids(dim=dim, n_clusters=n_clusters, seed=seed)
    if len(cents) > IVF_LITERAL_MAX_CLUSTERS:
        probes = ivf_probe_lists_arrow(queries, cents, n_probe=n_probe)
    else:
        probes = ivf_probe_lists(queries, cents, n_probe=n_probe)
    if broadcast_probes is None:
        broadcast_probes = probe_fits_broadcast(queries.count(), n_probe)
    if broadcast_probes:
        probes = F.broadcast(probes)
    idx = spark.read.parquet(_live(spark, path)).select(
        F.col("vec_id").alias("old_vec"),
        F.col("embedding").alias("cvec"),
        "cluster_id",
    )
    cand = (
        idx.join(probes, idx.cluster_id == probes.pcid, "inner")
        .filter(F.col("old_vec") != F.col("qid"))
        .select(F.col("qid").alias("new_vec"), "old_vec", "cvec", "qvec", "qn")
    )
    # r12 (guide §4): exact verify in one Arrow pass (index norm
    # recomputed in-twin — same fold as _norm, identical doubles)
    return (
        pair_cosine_exact_arrow(
            cand, a_col="cvec", b_col="qvec", na_col=None, nb_col="qn"
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
        .orderBy("new_vec", "old_vec")
    )


def knn_graph_lsh(
    embeddings: DataFrame, k: int = 5, bits: int = 4, dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Initial approximate kNN GRAPH from LSH buckets — per vector, its
    top-k exact-cosine neighbors among same-bucket vectors (the cheap
    seed graph NN-descent then refines). Vectors alone in their bucket
    get no edges (the descent step recovers them through reverse
    edges). Deterministic: seeded hyperplanes, exact scores, ties by
    cid. Scale: candidates only within buckets (the sub-quadratic LSH
    contract); per-vertex top-k via a window partitioned by qid."""
    from pyspark.sql import Window

    # r12 (guide §4): one bit-identical Arrow pass for sigs+norms behind
    # a lazy barrier (both self-join sides), Arrow pair scoring after
    sigs = lsh_sigs_norm_exact_arrow(
        embeddings, dim=dim, bits=bits, seed=seed
    ).localCheckpoint(eager=False)
    a = sigs.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
        F.col("norm").alias("qn"), "bucket",
    )
    b = sigs.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"),
        F.col("norm").alias("cn"), "bucket",
    )
    cand = (
        a.join(b, "bucket")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", "cvec", "cn", "qvec", "qn")
    )
    scored = pair_cosine_exact_arrow(
        cand, a_col="cvec", b_col="qvec", na_col="cn", nb_col="qn"
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def knn_graph_lsh_multi(
    embeddings: DataFrame, k: int = 5, bits: int = 4, dim: int = 64,
    seeds: tuple[int, ...] = (42, 7),
) -> DataFrame:
    """Union of :func:`knn_graph_lsh` edge lists over several seeds in
    ONE signature pass + ONE scoring pass (r12, guide §4/§2.1): the
    per-seed builds each paid an Arrow signature pass and an Arrow
    scoring pass over their full bucket-join candidate product, and the
    products overlap heavily across seeds. Here the single Arrow pass
    emits every seed's bucket (identical per-plane sign folds) + the
    norm; candidate (qid, cid) pairs are deduped ACROSS seeds before
    the vectors are attached, scored once (identical cosine fold), and
    each seed's top-k window runs over the shared scored frame — the
    same doubles through the same window order, so the returned edge
    set is bit-identical to unioning the per-seed builds. Returns
    distinct (qid, cid)."""
    import numpy as np

    from pyspark.sql import Window
    from pyspark.sql import types as T

    planes_by_seed = [_hyperplanes(dim, bits, s) for s in seeds]
    base = embeddings.select("vec_id", "embedding")
    bcols = [f"bucket_{i}" for i in range(len(seeds))]
    schema = T.StructType(
        list(base.schema.fields)
        + [T.StructField(c, T.LongType()) for c in bcols]
        + [T.StructField("norm", T.DoubleType())]
    )

    def run(batches):
        for pdf in batches:
            B = len(pdf)
            if not B:
                continue
            X = _pdf_mat_f64(pdf["embedding"])
            out = pdf.copy()
            for ci, planes in zip(bcols, planes_by_seed):
                bucket = np.zeros(B, dtype=np.int64)
                for i, p in enumerate(planes):
                    dot = np.zeros(B)
                    for d in range(dim):
                        dot = dot + X[:, d] * p[d]
                    bucket = bucket + np.where(
                        dot >= 0.0, np.int64(1 << i), np.int64(0)
                    )
                out[ci] = bucket
            n2 = np.zeros(B)
            for d in range(dim):
                n2 = n2 + X[:, d] * X[:, d]
            nrm = np.sqrt(n2)
            nrm[nrm == 0.0] = 1.0
            out["norm"] = nrm
            yield out

    sigs = base.mapInPandas(run, schema).localCheckpoint(eager=False)

    # per-seed candidate id-pairs (ints only — the arrays stay behind),
    # then one flag column per seed after the cross-seed dedup
    cand = None
    for i, ci in enumerate(bcols):
        a = sigs.select(F.col("vec_id").alias("qid"), F.col(ci).alias("bk"))
        b = sigs.select(F.col("vec_id").alias("cid"), F.col(ci).alias("bk"))
        pi = (
            a.join(b, "bk")
            .filter(F.col("qid") != F.col("cid"))
            .select("qid", "cid", F.lit(i).alias("src"))
        )
        cand = pi if cand is None else cand.unionByName(pi)
    flags = [
        F.max(F.when(F.col("src") == i, 1).otherwise(0)).alias(f"in_{i}")
        for i in range(len(seeds))
    ]
    dedup = cand.groupBy("qid", "cid").agg(*flags)

    # id-pairs only through the Python boundary when the vector table
    # fits the broadcast-matrix ceiling; join + Arrow-pair fallback
    scored = pair_cosine_by_id_exact_bcast(
        dedup, embeddings, a_id="cid", b_id="qid"
    )
    if scored is None:
        q = sigs.select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
            F.col("norm").alias("qn"),
        )
        c = sigs.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"),
            F.col("norm").alias("cn"),
        )
        scored = pair_cosine_exact_arrow(
            dedup.join(q, "qid").join(c, "cid")
            .select("qid", "cid", *[f"in_{i}" for i in range(len(seeds))],
                    "cvec", "cn", "qvec", "qn"),
            a_col="cvec", b_col="qvec", na_col="cn", nb_col="qn",
        )
    scored = scored.localCheckpoint(eager=False)

    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    edges = None
    for i in range(len(seeds)):
        ei = (
            scored.filter(F.col(f"in_{i}") == 1)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("qid", "cid")
        )
        edges = ei if edges is None else edges.unionByName(ei)
    return edges.distinct()


def knn_descent_step(
    embeddings: DataFrame, graph: DataFrame, k: int = 5
) -> DataFrame:
    """ONE NN-descent refinement iteration (Dong, Moses & Li, WWW
    2011) re-expressed relationally: a vertex's candidate set is its
    SYMMETRIZED neighborhood plus its symmetrized neighbors'
    neighbors ("a neighbor of my neighbor is probably my neighbor"),
    exact-cosine scored, per-vertex top-k kept. Returns (qid, cid,
    cosine, rk). MONOTONE by construction — the candidate set contains
    the current neighbors, so recall@k never drops; iterating this
    step to a fixed point is how production graph-ANN builds (NGT,
    NN-descent proper) converge without ever going all-pairs.

    Scale shape: two self-equi-joins of the edge list (|E| = N·k rows
    — never the vectors) to form candidates, one distinct, two hash
    joins back to the vector table for scoring (embeddings shuffle at
    most twice, keyed by id), one partitioned window for top-k.
    Work ∝ N·k² candidate rows; nothing quadratic in N, nothing
    driver-side."""
    from pyspark.sql import Window

    edges = graph.select("qid", "cid")
    sym = edges.unionByName(
        edges.select(F.col("cid").alias("qid"), F.col("qid").alias("cid"))
    )
    hop2 = (
        sym.alias("g1")
        .join(
            sym.alias("g2"),
            F.col("g1.cid") == F.col("g2.qid"),
        )
        .select(F.col("g1.qid").alias("qid"), F.col("g2.cid").alias("cid"))
    )
    cand = (
        sym.unionByName(hop2)
        .filter(F.col("qid") != F.col("cid"))
        .distinct()
    )
    # r12 (guide §4): the N·k² candidate scores in one Arrow pass;
    # wave 9: id-pairs only through the boundary when the vector table
    # fits the broadcast-matrix ceiling (same folds — identical doubles)
    scored = pair_cosine_by_id_exact_bcast(
        cand, embeddings, a_id="cid", b_id="qid"
    )
    if scored is None:
        q = embeddings.select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
            _norm(F.col("embedding")).alias("qn"),
        )
        c = embeddings.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"),
            _norm(F.col("embedding")).alias("cn"),
        )
        scored = pair_cosine_exact_arrow(
            cand.join(q, "qid").join(c, "cid")
            .select("qid", "cid", "cvec", "cn", "qvec", "qn"),
            a_col="cvec", b_col="qvec", na_col="cn", nb_col="qn",
        )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("qid", "rk")
    )


def build_lsh_bucket_index(
    embeddings: DataFrame, path: str, dim: int = 64, bits: int = 16,
    seed: int = 42,
) -> None:
    """Materialize the corpus's hyperplane-LSH signatures —
    (vec_id, embedding, bucket) written partitioned BY BUCKET — the
    index-once shape for incremental embedding near-dup when THRESHOLD
    semantics (not top-k) are wanted: a delta's single-bucket probe
    prunes to its own bucket directories, the exact twin of
    build_minhash_index on the embedding side. Signature expression is
    exactly :func:`lsh_bucket_signatures`'s, so a delta probe
    reproduces the self-join's pairs restricted to (new, old)."""
    # r12 (guide §4): bit-identical Arrow signature pass for the bulk
    # build (the norm column is dropped — the written schema is the
    # index contract); the delta upsert keeps the HOF expressions (a
    # handful of rows doesn't amortize a Python boundary)
    sigs = lsh_sigs_norm_exact_arrow(
        embeddings, dim=dim, bits=bits, seed=seed
    ).drop("norm")
    sigs.repartition("bucket").write.partitionBy("bucket").mode(
        "overwrite"
    ).parquet(path)


def upsert_lsh_bucket_index(
    new_vecs: DataFrame, path: str, dim: int = 64, bits: int = 16,
    seed: int = 42,
) -> None:
    """Incremental index maintenance: signature ONLY the new vectors
    and append into the bucket-partitioned layout — O(delta), no file
    rewrites (the upsert_minhash_index monoid pattern)."""
    sigs = lsh_bucket_signatures(new_vecs, dim=dim, bits=bits, seed=seed)
    sigs.repartition("bucket").write.partitionBy("bucket").mode(
        "append"
    ).parquet(path)


def near_dup_against_lsh_index(
    spark,
    path: str,
    queries: DataFrame,
    threshold: float = 0.35,
    dim: int = 64,
    bits: int = 16,
    seed: int = 42,
    broadcast_probes: bool | None = None,
) -> DataFrame:
    """Threshold near-dup of a delta against the MATERIALIZED LSH
    bucket index (:func:`build_lsh_bucket_index`): each new vector
    joins its single bucket's stored vectors, exact-cosine scored,
    pairs at/above ``threshold`` reported as (new_vec, old_vec,
    cosine). Because the bucket is a PER-VECTOR function, the result
    is exactly the full-set LSH self-join's pairs restricted to pairs
    touching the delta — the identity the incremental-components
    oracle replays.

    Scale shape: probe rows are delta-sized (ONE bucket per query —
    n_probe=1 by construction) and broadcast under the shared
    :func:`probe_fits_broadcast` ceiling, so the index joins map-side
    with dynamic partition pruning on the bucket directories; a large
    delta falls back to the shuffled co-located join on bucket."""
    probes = lsh_bucket_signatures(queries, dim=dim, bits=bits, seed=seed).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        _norm(F.col("embedding")).alias("qn"),
        F.col("bucket").alias("pbucket"),
    )
    if broadcast_probes is None:
        broadcast_probes = probe_fits_broadcast(queries.count(), 1)
    if broadcast_probes:
        probes = F.broadcast(probes)
    idx = spark.read.parquet(_live(spark, path)).select(
        F.col("vec_id").alias("old_vec"),
        F.col("embedding").alias("cvec"),
        "bucket",
    )
    # r12 (guide §4): exact verify in one Arrow pass (index norm
    # recomputed in-twin — same fold as _norm, identical doubles)
    cand = (
        idx.join(probes, idx.bucket == probes.pbucket, "inner")
        .filter(F.col("old_vec") != F.col("qid"))
        .select(F.col("qid").alias("new_vec"), "old_vec", "cvec", "qvec", "qn")
    )
    return (
        pair_cosine_exact_arrow(
            cand, a_col="cvec", b_col="qvec", na_col=None, nb_col="qn"
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
        .orderBy("new_vec", "old_vec")
    )


def semantic_clusters(
    embeddings: DataFrame,
    k: int = 4,
    threshold: float = 0.2,
    n_clusters: int = 8,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Semantic-cluster curation (VERDICT r5 #8, the SemDeDup shape —
    Abbas et al. 2023): build a kNN graph over the corpus embeddings via
    the batched IVF ANN pass (every vector is a query; edges are
    cosine-thresholded kNN matches), then label its connected components
    — the clusters a curation pipeline keeps one-per / caps / rebalances.

    Output: (vec_id, comp, comp_size), comp = min vec_id reachable;
    ISOLATED vectors (no edge at the threshold) form their own singleton
    component, so every corpus vector is labeled.

    Scale shape: the ANN pass runs corpus-as-queries, with the probe
    join picked BY SIZE (round 8): when the probe frame (N·n_probe
    rows, each carrying the dim-double qvec) fits a broadcast
    (≤ 100k rows ≈ 50 MB at dim 64) it broadcasts — measured 10.4 s →
    1.7 s warm at sf0.1's 2k vectors, where the shuffled join's
    exchange/sort overhead dwarfs the data — and above that it falls
    back to the shuffled equi-join: both sides hash-partition on the
    literal cluster assignment, each inverted list joins co-located
    (the sf10 regime: 200k×4 probes ≈ 400 MB, not broadcastable), and
    WindowGroupLimit caps the per-task output at k rows per query —
    edge count is ≤ N·k by construction, never N². The CANDIDATE mass,
    though, is Σ|list|·|queries probing list| ≈ N²·n_probe/n_clusters,
    so n_clusters must track the corpus exactly like LSH bits
    (derive_lsh_bits): pick n_clusters ≈ N/target_list_size, or the
    self-join degrades toward all-pairs — the default 8 is the
    gate-fixture/oracle configuration, not the production one (measured
    in SCALE_PROBE.json: 64 lists at 20k vectors). Components then run
    on the EDGE graph (orders smaller than the corpus): driver
    union-find under the 2M-edge gate, min-label propagation above it
    (dedup.connected_components). One more shuffle joins labels back to
    the corpus for the singleton fill."""
    from sqlstreamstore_spark.analytics.dedup import connected_components

    # Small-file parallelize hygiene: a single-file parquet corpus
    # arrives as ONE partition, and the per-query centroid scoring +
    # corpus assignment are map-side work that would serialize on that
    # one task (measured: 13.5 s -> 7.7 s at sf0.1 just from this). At
    # scale inputs carry >= cores partitions and this is a no-op.
    from sqlstreamstore_spark.operators.partitioning import with_min_parallelism

    embeddings = with_min_parallelism(embeddings)
    # size-adaptive probe join (see docstring): one pruned count decides
    n_vecs = embeddings.count()
    # r12 wave 9 note: the id-only bcast_vectors scoring path was
    # MEASURED SLOWER here too (2.62 -> 3.08 s warm at sf0.1's 2k
    # vectors) — like the Arrow pair twin before it, the inline
    # expression join keeps scoring inside the join stage where the
    # rank-limit pushdown prunes before anything moves; not passed.
    knn = knn_join_ivf_static(
        embeddings, embeddings, k=k, n_clusters=n_clusters, n_probe=n_probe,
        dim=dim, seed=seed,
        broadcast_probes=probe_fits_broadcast(n_vecs, n_probe),
    )
    edges = (
        knn.filter(F.col("cosine") >= threshold)
        .select(F.col("qid").alias("doc_a"), F.col("cid").alias("doc_b"))
    )
    labels = connected_components(edges).select(
        F.col("doc_id").alias("vec_id"), "comp"
    )
    full = (
        embeddings.select("vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("comp"), F.col("vec_id")).cast("long").alias("comp"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("comp")
    return (
        full.withColumn("comp_size", F.count("*").over(w).cast("long"))
        .orderBy("vec_id")
    )


def filtered_knn_ivf(
    embeddings: DataFrame,
    documents: DataFrame,
    queries: DataFrame,
    lang: str = "en",
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Metadata-FILTERED batched ANN — constrained retrieval, the
    production shape behind "top-k most similar ENGLISH docs": the
    predicate lands on the CORPUS side BEFORE the index probe
    (pre-filtering), so every query gets a full k from the allowed
    set. The tempting alternative — post-filtering a plain top-k —
    silently returns FEWER than k whenever the neighborhood is
    dominated by excluded vectors (the classic filtered-ANN trap this
    operator forecloses; at high selectivity real systems flip to a
    filtered brute-force over the survivors, the knn_join_bruteforce
    twin).

    Shape: a left-semi join pins the allowed ids (only ids shuffle;
    at scale the predicate pushes into the metadata scan), then the
    standard probe-list broadcast equi-join on cluster_id with the
    rank-limit-pushed per-query top-k."""
    allowed = documents.filter(F.col("lang") == lang).select(
        F.col("doc_id").alias("vec_id")
    )
    corpus = embeddings.join(allowed, "vec_id", "left_semi")
    return knn_join_ivf_static(
        corpus, queries, k=k, n_clusters=n_clusters, n_probe=n_probe,
        dim=dim, seed=seed,
    )


def embedding_centroid_drift(embeddings: DataFrame) -> DataFrame:
    """Embedding-space DRIFT monitor between two snapshots — the
    embedding-side companion of drift_psi/drift_ks: per label, the
    cosine between the two snapshots' centroids (direction drift) and
    their norm ratio (magnitude drift). An embedding-model update
    that rotates or rescales the space shows up here BEFORE any ANN
    index quietly goes stale — the signal that triggers an IVF/LSH
    index rebuild. The deterministic vec_id-parity split stands in
    for the two snapshots; production passes two real frames through
    the same per-side aggregation.

    Scale shape: one posexplode + (label, side, pos) partial agg —
    output is |labels|×2×dim rows regardless of N; centroids
    re-assemble per (label, side) via bounded collect_list and the
    final per-label join touches |labels| rows. Centroid components
    are float AVERAGES (partial-sum order), so both engines round to
    9 (the label_centroids pattern)."""
    ex = embeddings.select(
        "label",
        (F.col("vec_id") % 2).alias("side"),
        F.posexplode("embedding").alias("pos", "val"),
    ).select("label", "side", "pos", F.col("val").cast("double").alias("val"))
    comp = ex.groupBy("label", "side", "pos").agg(
        F.avg("val").alias("cval"), F.count("*").alias("__n")
    )
    cent = comp.groupBy("label", "side").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s.getField("cval"),
        ).alias("cvec"),
        F.max("__n").cast("long").alias("n_vecs"),
    )
    a = cent.filter(F.col("side") == 0).select(
        "label", F.col("cvec").alias("ca"), F.col("n_vecs").alias("n_a")
    )
    b = cent.filter(F.col("side") == 1).select(
        "label", F.col("cvec").alias("cb"), F.col("n_vecs").alias("n_b")
    )
    cos = _dot(F.col("ca"), F.col("cb")) / (
        _norm(F.col("ca")) * _norm(F.col("cb"))
    )
    return (
        a.join(b, "label")
        .select(
            "label",
            "n_a",
            "n_b",
            F.round(cos, 9).alias("centroid_cos"),
            F.round(_norm(F.col("ca")), 9).alias("norm_a"),
            F.round(_norm(F.col("cb")), 9).alias("norm_b"),
            F.round(_norm(F.col("cb")) / _norm(F.col("ca")), 9).alias("norm_ratio"),
        )
        .orderBy("label")
    )


# ------------------------------------------------ IVF index lifecycle
# (round 10, VERDICT r9 #5): upsert_ivf_index appends into FIXED lists,
# so after many deltas list sizes skew and the shipped centroids drift
# from the vectors they index — recall quietly degrades at constant
# n_probe. The health report below is the monitoring signal; the
# rebalance below is the repair verb (build → upsert → compact →
# REBALANCE completes the lifecycle).


def ivf_index_health(
    spark,
    path: str,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    """Skew + staleness report for a materialized IVF index: one row
    per shipped centroid with the list's current size, its share of
    the index, the cosine between the SHIPPED centroid and the list's
    CURRENT mean vector (per-list staleness — the per-list twin of
    :func:`embedding_centroid_drift`), and the index-wide list-size
    Gini coefficient (skew: 0 = perfectly balanced, → 1 = one hot
    list). Lists a production deployment alerts on: Gini above ~0.5
    or any populated list whose centroid_cos falls, trigger
    :func:`rebalance_ivf_index`.

    Float discipline: sizes / shares / Gini are exact (BIGINT counts,
    Gini's numerator 2·Σ rank·n − (k+1)·Σn is integer, ONE divide);
    the list means are float averages, so centroid_cos rounds to 9
    (the label_centroids rule). Scale shape: one partial-agg count per
    list + one |lists|×dim posexplode aggregate — output is
    model-sized regardless of index size; the rank window runs over
    the bounded centroid axis (k rows), never the data."""
    from pyspark.sql import Window

    idx = spark.read.parquet(_live(spark, path))
    k = len(centroids)
    cent_df = spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
        "cluster_id int, centroid array<double>",
    )
    sizes = idx.groupBy("cluster_id").agg(F.count("*").cast("long").alias("n_vecs"))
    comp = (
        idx.select("cluster_id", F.posexplode("embedding").alias("pos", "val"))
        .select("cluster_id", "pos", F.col("val").cast("double").alias("val"))
        .groupBy("cluster_id", "pos")
        .agg(F.avg("val").alias("cval"))
    )
    means = comp.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s.getField("cval"),
        ).alias("mvec")
    )
    rows = (
        cent_df.join(sizes, "cluster_id", "left")
        .join(means, "cluster_id", "left")
        .withColumn("n_vecs", F.coalesce(F.col("n_vecs"), F.lit(0)).cast("long"))
    )
    # bounded-axis (k rows) windows for the Gini rank and the totals
    wr = Window.orderBy("n_vecs", "cluster_id")
    wt = Window.partitionBy(F.lit(0))
    rows = rows.withColumn("__rk", F.row_number().over(wr).cast("long"))
    rows = rows.withColumn("__tot", F.sum("n_vecs").over(wt).cast("long"))
    rows = rows.withColumn(
        "__gnum",
        F.sum(F.col("__rk") * F.col("n_vecs")).over(wt).cast("long") * 2
        - F.lit(k + 1) * F.col("__tot"),
    )
    cos = _dot(F.col("centroid"), F.col("mvec")) / (
        _norm(F.col("centroid")) * _norm(F.col("mvec"))
    )
    return (
        rows.select(
            F.col("cluster_id").alias("list_id"),
            "n_vecs",
            # empty-index guard (ADVICE r10): __tot = 0 would make the
            # shares/Gini NaN — report zeros so the row stays diagnosable
            F.when(
                F.col("__tot") > 0,
                F.col("n_vecs").cast("double") / F.col("__tot").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("size_share"),
            F.when(F.col("n_vecs") > 0, F.round(cos, 9)).alias("centroid_cos"),
            F.when(
                F.col("__tot") > 0,
                F.col("__gnum").cast("double")
                / (F.lit(float(k)) * F.col("__tot").cast("double")),
            )
            .otherwise(F.lit(0.0))
            .alias("size_gini"),
        )
        .orderBy("list_id")
    )


def rebalance_ivf_index(
    spark,
    path: str,
    n_clusters: int = 8,
    iters: int = 3,
    sample_mod: int | None = None,
    max_share: float | None = None,
) -> list[tuple[int, list[float]]]:
    """Repair a skewed / stale IVF index: retrain the coarse quantizer
    with distributed Lloyd's (:func:`kmeans_centroids`) on the index's
    OWN vectors (``sample_mod=m`` trains on the deterministic
    ``vec_id % m == 0`` sample — at 100 TB the trainer needs only a
    model-accuracy sample, not the corpus), then rewrite the index
    assigned to the NEW centroids with the same retire-then-swap
    discipline as ``dedup.compact_index`` (crash leaves a complete
    index; entry-time recovery restores a stranded ``.__retired__``;
    the swap runs through the Hadoop FileSystem of the path's scheme —
    :mod:`sqlstreamstore_spark.sources.hadoopfs` — so it works on
    ``file:``/HDFS/object stores alike). Returns the new centroid
    model to ship alongside the index.

    The rewrite is ONE assignment pass + one clustered write — the
    same cost as the original build, paid on the rebalance cadence
    (after N upsert rounds), not per query. Contents are preserved
    exactly: only ``cluster_id`` changes (pytest pins the vec_id set;
    the gate oracles a full-probe query against brute force, which is
    centroid-independent).

    ``max_share``: optional SIZE-based hot-list split. Lloyd alone
    never splits a TIGHT hot ball (it is already low-distortion — the
    concentrated-crawl failure mode), but a hot list taxes every probe
    that touches it with its full scan mass. Any retrained list whose
    size exceeds ``max_share``·N is sub-clustered (a second Lloyd run
    on its members into ceil(size/cap) sublists with fresh centroid
    ids) — the classic balanced-IVF repair. The driver loop is over
    the few hot lists (bounded by 1/max_share), each a model-sized
    Lloyd run over one list's members."""
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
        recover_retired(spark, path)
    idx = spark.read.parquet(_live(spark, path)).drop("cluster_id")
    assigned, cents, pinned = _rebalance_core(
        spark, idx, n_clusters=n_clusters, iters=iters,
        sample_mod=sample_mod, max_share=max_share,
    )
    if ptr is None:
        tmp = path.rstrip("/") + ".__compacting__"
        assigned.repartition("cluster_id").write.partitionBy("cluster_id").mode(
            "overwrite"
        ).parquet(tmp)
        for frame in pinned:
            frame.unpersist()
        retire_swap(spark, path, tmp)
    else:
        # pointer mode (r12): the rewrite goes DIRECTLY into the next
        # version dir and commits via the one-line _CURRENT replace —
        # constant-time on object stores, no data rename ever.
        v, vdir = next_version_dir(spark, path)
        assigned.repartition("cluster_id").write.partitionBy("cluster_id").mode(
            "overwrite"
        ).parquet(vdir)
        for frame in pinned:
            frame.unpersist()
        pointer_commit(spark, path, v, f"v{v}")
        prune_pointer_versions(spark, path, keep=2)
    return cents


def _rebalance_core(
    spark,
    idx: DataFrame,
    n_clusters: int,
    iters: int,
    sample_mod: int | None,
    max_share: float | None,
) -> tuple[DataFrame, list[tuple[int, list[float]]], list]:
    """Retrain + reassign (+ optional hot-list split) over ``idx``
    (vec_id, embedding) — shared by the in-place rebalance and the
    out-of-band build. Returns (assigned frame, centroid model, list
    of persisted frames the CALLER must unpersist after materializing
    the write)."""
    import math

    train = idx if sample_mod is None else idx.filter(
        F.col("vec_id") % sample_mod == 0
    )
    cents = kmeans_centroids(train, n_clusters=n_clusters, iters=iters)
    # r12: bit-identical Arrow assign (see ivfpq_encode_exact_arrow)
    assigned = ivf_assign_exact_arrow(idx, cents)
    # every frame this op persists, unpersisted before return (ADVICE
    # r10 #2: earlier rounds pinned only the FIRST frame and leaked
    # each split pass's re-persist for the session lifetime)
    pinned: list = []
    if max_share is not None:
        # iterative size-capped split (bounded depth): a single Lloyd
        # sub-split can come out uneven, so re-check up to 3 passes.
        # The cap is BEST-EFFORT under geometric separability — a ball
        # of literal near-duplicates cannot be meaningfully split by a
        # cosine quantizer (and is the exact-dedup stage's job anyway).
        assigned = assigned.persist()
        pinned.append(assigned)
        next_id = max(c for c, _ in cents) + 1
        for _pass in range(3):
            sizes = {
                r["cluster_id"]: r["n"]
                for r in assigned.groupBy("cluster_id")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            total = sum(sizes.values())
            cap = max(1, int(max_share * total))
            hot = sorted(cid for cid, n in sizes.items() if n > cap)
            if not hot:
                break
            keep = assigned.filter(~F.col("cluster_id").isin(hot))
            parts = [keep]
            new_cents = [(c, v) for c, v in cents if c not in set(hot)]
            for cid in hot:
                members = assigned.filter(F.col("cluster_id") == cid).drop(
                    "cluster_id"
                )
                k_sub = min(
                    math.ceil(sizes[cid] / cap) + (1 if _pass else 0),
                    IVF_LITERAL_MAX_CLUSTERS,
                )
                sub = kmeans_centroids(members, n_clusters=k_sub, iters=iters)
                remap = [(next_id + i, vec) for i, (_j, vec) in enumerate(sub)]
                next_id += k_sub
                parts.append(ivf_assign(members, remap))
                new_cents.extend(remap)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            assigned = out.persist()
            # materialize the new pin, then release the superseded one
            # (the split filters above have already consumed it)
            assigned.count()
            pinned.append(assigned)
            pinned.pop(0).unpersist()
            cents = sorted(new_cents)
    return assigned, cents, pinned


def list_index_files(spark, path: str) -> list[str]:
    """The index's current parquet data files (recursive, sorted;
    metadata/_-prefixed files skipped) — the SNAPSHOT unit for
    out-of-band maintenance: an async rebuild reads a fixed file list
    while upserts keep appending NEW files, and finalize catches up
    exactly the difference."""
    from sqlstreamstore_spark.sources.hadoopfs import _fs_for, _jpath, resolved

    jp = _jpath(spark, resolved(spark, path))
    fs = _fs_for(spark, jp)
    out = []
    it = fs.listFiles(jp, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            out.append(st.getPath().toString())
    return sorted(out)


def rebalance_ivf_build(
    spark,
    snapshot_files: list[str],
    out_dir: str,
    n_clusters: int = 8,
    iters: int = 3,
    sample_mod: int | None = None,
    max_share: float | None = None,
) -> list[tuple[int, list[float]]]:
    """OUT-OF-BAND repair, phase 1 (round 12, VERDICT r11 #3): retrain
    the quantizer and rewrite a SNAPSHOT of the index (an explicit
    file list from :func:`list_index_files`) into ``out_dir`` —
    NO swap, the live index is untouched and fully probe-able
    throughout. Safe to run on a worker thread concurrently with a
    streaming sink that keeps probing AND upserting: appends only ever
    create new files, never mutate the snapshot's, and
    :func:`rebalance_finalize` re-assigns exactly the files that
    appeared after the snapshot before swapping. This moves the Lloyd
    retrain — the 25-49 s spikes the r11 sink_horizon measured inside
    repair micro-batches — off the ingest critical path; the batch
    that finalizes pays only a delta-sized catch-up plus the swap."""
    idx = spark.read.parquet(*snapshot_files).drop("cluster_id")
    assigned, cents, pinned = _rebalance_core(
        spark, idx, n_clusters=n_clusters, iters=iters,
        sample_mod=sample_mod, max_share=max_share,
    )
    assigned.repartition("cluster_id").write.partitionBy("cluster_id").mode(
        "overwrite"
    ).parquet(out_dir)
    for frame in pinned:
        frame.unpersist()
    return cents


def rebalance_finalize(
    spark,
    path: str,
    out_dir: str,
    cents: list[tuple[int, list[float]]],
    snapshot_files: list[str],
) -> None:
    """OUT-OF-BAND repair, phase 2 — run at a SAFE POINT (no
    concurrent probe/upsert; in a streaming sink that is the start of
    the serial foreachBatch handler): assign the files appended since
    the snapshot to the new centroids and append them into
    ``out_dir``, then swap it live (pointer commit on pointer-mode
    roots, retire-swap otherwise). Cost ∝ post-snapshot delta + one
    swap — never the corpus."""
    from sqlstreamstore_spark.sources.hadoopfs import (
        next_version_dir,
        pointer_commit,
        pointer_resolve,
        prune_pointer_versions,
        retire_swap,
    )

    seen = set(snapshot_files)
    delta = [f for f in list_index_files(spark, path) if f not in seen]
    if delta:
        late = spark.read.parquet(*delta).drop("cluster_id")
        ivf_assign(late, cents).repartition("cluster_id").write.partitionBy(
            "cluster_id"
        ).mode("append").parquet(out_dir)
    ptr = pointer_resolve(spark, path)
    if ptr is None:
        retire_swap(spark, path, out_dir)
    else:
        from sqlstreamstore_spark.sources.hadoopfs import fs_rename

        v, vdir = next_version_dir(spark, path)
        fs_rename(spark, out_dir, vdir)
        pointer_commit(spark, path, v, f"v{v}")
        prune_pointer_versions(spark, path, keep=2)


# --------------------------------------- SQ8 scalar quantization (r11)
# The third production ANN compression tier next to IVF (prune) and PQ
# (8x lossy codes): per-dimension uint8 scalar quantization — 4x
# smaller than float32, 8x than double, with NEAR-EXACT ranking (255
# levels per dim loses almost nothing at embedding scale). Unlike the
# Lloyd-trained PQ codebooks, the SQ model is two numbers per
# dimension from one partial aggregate, so the WHOLE pipeline —
# train, quantize, approx-score, exact rerank — is plain deterministic
# arithmetic and the gate hash-oracles at full value (no inequality
# needed). Reference parity: none (the reference has no vector ops);
# this is the FAISS SQ8 index shape re-expressed relationally.


def sq8_train(embeddings: DataFrame) -> list[tuple[float, float]]:
    """Per-dimension (min, max) quantization model: ONE posexplode
    partial aggregate onto the bounded dim axis — the model is
    dim-sized regardless of corpus size (the kmeans_centroids
    discipline; at 100 TB train on a sample the same way)."""
    rows = (
        embeddings.select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "x"
            )
        )
        .groupBy("pos")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    model: list[tuple[float, float]] = [(0.0, 0.0)] * len(rows)
    for r in rows:
        model[r["pos"]] = (float(r["lo"]), float(r["hi"]))
    return model


def sq8_quantize(embeddings: DataFrame, model: list[tuple[float, float]]) -> DataFrame:
    """uint8 codes: code_j = round(255·(x_j − lo_j)/(hi_j − lo_j)),
    constant dimensions → 0. Codes stay JVM-side ints (zip_with over
    broadcast literal arrays — no Python in the hot path)."""
    lo = F.array(*[F.lit(l) for l, _h in model])
    rng = F.array(*[F.lit(h - l) for l, h in model])
    shifted = F.zip_with(
        F.col("embedding").cast("array<double>"), lo, lambda x, l: x - l
    )
    codes = F.zip_with(
        shifted,
        rng,
        lambda d, rn: F.when(rn == F.lit(0.0), F.lit(0)).otherwise(
            F.round(F.lit(255.0) * d / rn, 0).cast("int")
        ),
    )
    return embeddings.select("vec_id", codes.alias("codes"))


def _sq8_decode(codes: Column, model: list[tuple[float, float]]) -> Column:
    """Decoded double vector: lo_j + code_j·(hi_j − lo_j)/255."""
    lo = F.array(*[F.lit(l) for l, _h in model])
    scale = F.array(*[F.lit((h - l) / 255.0) for l, h in model])
    dec = F.zip_with(codes, scale, lambda c, s: c.cast("double") * s)
    return F.zip_with(dec, lo, lambda d, l: d + l)


def cosine_topk_matryoshka(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    prefix_dim: int = 16,
    candidate_mult: int = 4,
) -> DataFrame:
    """Matryoshka prefix-dimension ANN (Kusupati et al., NeurIPS 2022):
    rank the corpus by cosine over only the FIRST ``prefix_dim``
    dimensions — MRL-trained embeddings pack coarse semantics into the
    prefix, so a 16-of-64 prefix scan reads a quarter of the vector
    bytes — then exact-rerank the top ``k·candidate_mult`` on full
    dimensions. The fourth compression tier next to IVF (prune), SQ8
    (narrow), PQ (lossy codes): this one cuts DIMENSIONS, composes
    with all three, and needs no training artifact at all at query
    time. Deterministic ties (score DESC, vec_id ASC) at both stages;
    output (vec_id, approx_cosine, cosine) — the prefix error rides
    in the gate hash.

    At 100 TB: store the prefix as its own parquet column (or rely on
    Parquet array-chunk pruning) and the candidate scan touches
    prefix_dim/dim of the vector bytes; the exact rerank reads a
    bounded broadcast set, never the corpus. Everything is plain
    deterministic arithmetic — fully hash-oracled like SQ8, unlike
    the Lloyd-trained tiers."""
    qp = F.array(*[F.lit(float(x)) for x in query_vec[:prefix_dim]])
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    pref = F.slice(F.col("embedding"), 1, prefix_dim)
    approx = _dot(pref, qp) / (_norm(pref) * _norm(qp))
    cand = (
        embeddings.select("vec_id", approx.alias("__approx"))
        .orderBy(F.col("__approx").desc(), "vec_id")
        .limit(k * candidate_mult)
    )
    emb = F.col("embedding")
    exact = _dot(emb, q) / (_norm(emb) * _norm(q))
    return (
        embeddings.join(F.broadcast(cand), "vec_id")
        .select(
            "vec_id",
            F.round(F.col("__approx"), 9).alias("approx_cosine"),
            F.round(exact, 9).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(k)
    )


def cosine_topk_sq8(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    candidate_mult: int = 4,
    model: list[tuple[float, float]] | None = None,
) -> DataFrame:
    """SQ8 ANN top-k: quantize the corpus to uint8 codes, rank by the
    DECODED-vector cosine (all whole-stage-codegen folds), keep the
    top ``k·candidate_mult`` candidates, exact-rerank them against the
    raw embeddings. Deterministic tie-break (score DESC, vec_id ASC)
    at both stages. Output: (vec_id, approx_cosine, cosine) — the
    approx column makes the quantization error visible in the gate.

    At 100 TB: the scan that matters touches only the 1-byte-per-dim
    codes column (4x the vectors per executor vs float32); the exact
    rerank reads ``k·candidate_mult`` full vectors via a broadcast
    semi-join — never the corpus."""
    model = model if model is not None else sq8_train(embeddings)
    codes = sq8_quantize(embeddings, model)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    dec = _sq8_decode(F.col("codes"), model)
    approx = _dot(dec, q) / (_norm(dec) * _norm(q))
    cand = (
        codes.select("vec_id", approx.alias("__approx"))
        .orderBy(F.col("__approx").desc(), "vec_id")
        .limit(k * candidate_mult)
    )
    emb = F.col("embedding")
    exact = _dot(emb, q) / (_norm(emb) * _norm(q))
    return (
        embeddings.join(F.broadcast(cand), "vec_id")
        .select(
            "vec_id",
            F.round(F.col("__approx"), 9).alias("approx_cosine"),
            F.round(exact, 9).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(k)
    )


def cosine_topk_ivfsq8_static(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 8,
    n_probe: int = 4,
    candidate_mult: int = 4,
    dim: int = 64,
    seed: int = 7,
    model: list[tuple[float, float]] | None = None,
) -> DataFrame:
    """IVF-SQ8 composed index (the FAISS IVF-SQ shape): coarse-
    quantizer partition prune (static literal centroids — no join,
    no shuffle for the assignment), SQ8 decoded-cosine rank WITHIN
    the probed inverted lists, exact rerank of the top
    ``k·candidate_mult``. The memory story compounds: the probed
    scan touches 1-byte-per-dim codes over ~n_probe/n_clusters of
    the corpus. And unlike the IVFPQ composition (Lloyd-trained
    codebooks → inequality gate), every stage here is deterministic
    arithmetic, so the composed index hash-oracles at FULL value.
    Output: (vec_id, approx_cosine, cosine), bruteforce tie-break."""
    import math

    centroids = _static_centroids(dim=dim, n_clusters=n_clusters, seed=seed)

    def cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return d / (na * nb)

    probe_ids = [
        cid
        for cid, _ in sorted(
            centroids,
            key=lambda c: (-cos(c[1], [float(x) for x in query_vec]), c[0]),
        )[:n_probe]
    ]
    model = model if model is not None else sq8_train(embeddings)
    # r12: bit-identical Arrow assign (see ivfpq_encode_exact_arrow)
    sub = ivf_assign_exact_arrow(embeddings, centroids).filter(
        F.col("cluster_id").isin(probe_ids)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    codes = sq8_quantize(sub, model)
    dec = _sq8_decode(F.col("codes"), model)
    approx = _dot(dec, q) / (_norm(dec) * _norm(q))
    cand = (
        codes.select("vec_id", approx.alias("__approx"))
        .orderBy(F.col("__approx").desc(), "vec_id")
        .limit(k * candidate_mult)
    )
    emb = F.col("embedding")
    exact = _dot(emb, q) / (_norm(emb) * _norm(q))
    return (
        embeddings.join(F.broadcast(cand), "vec_id")
        .select(
            "vec_id",
            F.round(F.col("__approx"), 9).alias("approx_cosine"),
            F.round(exact, 9).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(k)
    )


def build_sq8_index(
    embeddings: DataFrame,
    path: str,
    model: list[tuple[float, float]] | None = None,
) -> list[tuple[float, float]]:
    """Materialize the SQ8 codes column (vec_id, codes) — the deployed
    form: quantize ONCE, probe every query against the 1-byte-per-dim
    parquet (4x the vectors per scan vs float32). Returns the model to
    ship alongside, exactly like build_ivf_index returns centroids."""
    model = model if model is not None else sq8_train(embeddings)
    sq8_quantize(embeddings, model).write.mode("overwrite").parquet(path)
    return model


def cosine_topk_sq8_index(
    spark,
    path: str,
    embeddings: DataFrame,
    query_vec: list[float],
    model: list[tuple[float, float]],
    k: int = 10,
    candidate_mult: int = 4,
) -> DataFrame:
    """Probe a materialized SQ8 index: rank the stored codes by
    decoded cosine (scan touches ONLY the codes parquet), exact-rerank
    the k·candidate_mult winners against the raw ``embeddings`` table
    (the source-of-truth storage — FAISS-SQ keeps only codes too; the
    rerank reads a bounded broadcast set, never the corpus). Same
    output and same results as cosine_topk_sq8 by construction
    (build == quantize), so the gate shares its oracle."""
    codes = spark.read.parquet(_live(spark, path))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    dec = _sq8_decode(F.col("codes"), model)
    approx = _dot(dec, q) / (_norm(dec) * _norm(q))
    cand = (
        codes.select("vec_id", approx.alias("__approx"))
        .orderBy(F.col("__approx").desc(), "vec_id")
        .limit(k * candidate_mult)
    )
    emb = F.col("embedding")
    exact = _dot(emb, q) / (_norm(emb) * _norm(q))
    return (
        embeddings.join(F.broadcast(cand), "vec_id")
        .select(
            "vec_id",
            F.round(F.col("__approx"), 9).alias("approx_cosine"),
            F.round(exact, 9).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(k)
    )
