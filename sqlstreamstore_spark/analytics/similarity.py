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


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.
    Deterministic tie-break (score DESC, vec_id ASC)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = F.col("embedding")
    score = _dot(emb, q) / (_norm(emb) * _norm(q))
    return (
        embeddings.select("vec_id", score.alias("cosine"))
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

    c = embeddings.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    qd = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    score = _dot(F.col("cvec"), F.col("qvec")) / (_norm(F.col("cvec")) * _norm(F.col("qvec")))
    scored = c.crossJoin(F.broadcast(qd)).filter(F.col("cid") != F.col("qid")).select(
        "qid", "cid", score.alias("cosine")
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
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    score = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def cosine_near_dup_pairs_lsh(
    embeddings: DataFrame, threshold: float = 0.35, dim: int = 64, bits: int = 4, seed: int = 42
) -> DataFrame:
    """LSH-bucketed near-dup: candidates share a random-hyperplane
    bucket; exact cosine verifies. Sub-quadratic (the bucket join keys
    the shuffle); recall < 1 by construction — tune bits/multi-probe."""
    sigs = lsh_bucket_signatures(embeddings, dim=dim, bits=bits, seed=seed)
    a = sigs.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
                    F.col("bucket").alias("ba"))
    b = sigs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
                    F.col("bucket").alias("bb"))
    score = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", score.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (driver-side
    constant, broadcast as literals — tiny)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


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


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dim: int = 64,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: restrict the exact re-rank to the query's LSH bucket.
    With b bits the candidate set is ~N/2^b; recall is tuned by b (and
    multi-probe, not implemented here). Returns the same schema as the
    brute-force path."""
    import math

    planes = _hyperplanes(dim, bits, seed)
    qbucket = 0
    for i, p in enumerate(planes):
        if sum(px * qx for px, qx in zip(p, query_vec)) >= 0:
            qbucket |= 1 << i
    sigs = lsh_bucket_signatures(embeddings, dim=dim, bits=bits, seed=seed)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    emb = F.col("embedding")
    score = _dot(emb, q) / (_norm(emb) * _norm(q))
    return (
        sigs.filter(F.col("bucket") == F.lit(qbucket))
        .select("vec_id", score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )
