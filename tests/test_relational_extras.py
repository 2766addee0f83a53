"""Sketch-aggregate accuracy (the gate checks these rows-only since
HLL++/t-digest sketches are engine-specific) and multi-probe LSH recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlstreamstore_spark.analytics import relational, similarity
from sqlstreamstore_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_approx_sketches_close_to_exact(spark):
    orders = load_table(spark, SF_DIR, "orders").cache()
    approx = {r.o_orderstatus: r for r in relational.approx_order_stats(orders).collect()}
    exact = {
        r.o_orderstatus: r
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("nd"),
            F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("med"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        # HLL++ rsd defaults to 5%; t-digest with accuracy 10k is tight
        assert abs(approx[k].approx_customers - exact[k].nd) / max(exact[k].nd, 1) < 0.1
        assert abs(approx[k].approx_median_price - exact[k].med) / exact[k].med < 0.05


def test_multi_probe_lsh_recall_not_worse(spark):
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding]
    exact = [r.vec_id for r in similarity.cosine_topk_bruteforce(emb, qvec, k=10).collect()]
    r0 = {r.vec_id for r in similarity.cosine_topk_lsh(emb, qvec, k=10, bits=4).collect()}
    r2 = {
        r.vec_id
        for r in similarity.cosine_topk_lsh(emb, qvec, k=10, bits=4, multi_probe=2).collect()
    }
    rec0 = len(r0 & set(exact)) / 10
    rec2 = len(r2 & set(exact)) / 10
    assert rec2 >= rec0  # probing a Hamming ring can only widen candidates
    assert rec2 >= 0.5  # measured 0.8 on this fixture (0.3 unprobed)


def test_export_training_shards_deterministic(spark, tmp_path):
    """Sharded training export: fixed rows per shard, deterministic
    membership, readable back with partition pruning on shard_id."""
    from sqlstreamstore_spark.analytics.pipeline import export_training_shards
    from sqlstreamstore_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    p1 = str(tmp_path / "shards1")
    r1 = export_training_shards(docs, p1, shard_rows=120, order_cols=["doc_id"])
    assert r1 == {"n_rows": 500, "n_shards": 5}  # ceil(500/120)
    back = spark.read.parquet(p1)
    # shard 0 holds exactly the 120 lowest doc_ids
    s0 = sorted(r.doc_id for r in back.filter("shard_id = 0").collect())
    assert s0 == sorted(r.doc_id for r in docs.orderBy("doc_id").limit(120).collect())
    # deterministic: a second export produces identical membership
    p2 = str(tmp_path / "shards2")
    export_training_shards(docs, p2, shard_rows=120, order_cols=["doc_id"])
    a = sorted((r.shard_id, r.doc_id) for r in back.select("shard_id", "doc_id").collect())
    b = sorted((r.shard_id, r.doc_id) for r in
               spark.read.parquet(p2).select("shard_id", "doc_id").collect())
    assert a == b


def test_pack_sequences_contiguous_budget_assignment(spark):
    """pack_sequences invariants: sequences fill contiguously in doc_id
    order — offset_in_seq == tokens_before % budget, seq ids are
    non-decreasing, and every seq break happens exactly when the running
    total crosses a 512-token boundary."""
    from sqlstreamstore_spark.analytics.pipeline import pack_sequences
    from sqlstreamstore_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = pack_sequences(docs, token_budget=512).collect()
    assert [r.doc_id for r in rows] == sorted(r.doc_id for r in rows)
    cum = 0
    for r in rows:
        assert r.seq_id == cum // 512, (r, cum)
        assert r.offset_in_seq == cum % 512
        cum += r.n_tokens
    assert rows[-1].seq_id + 1 >= cum // 512  # last sequence exists


def test_pq_topk_recall_and_contract(spark):
    """PQ ANN: trained codebooks reach a recall floor the random static
    codebooks can't; both return exactly k exact-cosine-scored rows in
    descending order."""
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding]
    exact = [r.vec_id for r in similarity.cosine_topk_bruteforce(emb, qvec, k=10).collect()]
    trained = similarity.cosine_topk_pq(emb, qvec, k=10).collect()
    static = similarity.cosine_topk_pq_static(emb, qvec, k=10).collect()
    for rows in (trained, static):
        assert len(rows) == 10
        scores = [r.cosine for r in rows]
        assert scores == sorted(scores, reverse=True)
    recall = len({r.vec_id for r in trained} & set(exact)) / 10
    assert recall >= 0.6  # measured 0.7 on this fixture (static: 0.3)


def test_pq_encode_zero_vector_and_codes_shape(spark):
    """Zero vectors encode without ANSI errors (argmin -> the smallest-
    norm codeword) and every code is in range."""
    emb = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [1.0] * 64)], "vec_id long, embedding array<float>"
    )
    cbs = similarity._static_codebooks()
    rows = similarity.pq_encode(emb, cbs).collect()
    for r in rows:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)


def test_weighted_median_differential_and_dominance(spark):
    """Weighted (lower) median vs a pure-Python recompute, including a
    group where one heavy row outweighs many light ones — the case the
    unweighted median gets wrong by construction."""
    from sqlstreamstore_spark.analytics.relational import weighted_median

    rows = [
        # group a: value 10 x5 (w=1 each), value 1000 x1 (w=10): total 15,
        # half = 7.5 -> crossing inside the w=10 row => wmedian 1000
        *[("a", 10, "t " * 0 + "x") for _ in range(5)],
        ("a", 1000, " ".join(["y"] * 10)),
        # group b: symmetric weights, lower median on even split
        ("b", 1, "x x"), ("b", 2, "x x"), ("b", 3, "x x"), ("b", 4, "x x"),
    ]
    df = spark.createDataFrame(
        [(g, v, t) for g, v, t in rows], "source string, n_chars long, text string"
    )
    got = {
        r.source: (r.total_w, r.wmedian)
        for r in weighted_median(df).collect()
    }

    def py_wmedian(pairs):
        pairs = sorted(pairs)
        total = sum(w for _, w in pairs)
        cum = 0
        for v, w in pairs:
            cum += w
            if 2 * cum >= total:
                return total, v

    by_g = {}
    for g, v, t in rows:
        by_g.setdefault(g, []).append((v, len(t.split(" "))))
    for g, pairs in by_g.items():
        assert got[g] == py_wmedian(pairs), g
    assert got["a"][1] == 1000  # the heavy row dominates
    assert got["b"][1] == 2     # lower median of an even split
