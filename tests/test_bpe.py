"""BPE tokenizer (analytics/bpe.py): deterministic training, the
classic algorithm invariants, and a full differential between the
distributed mapInPandas application and the pure-Python twin."""

from __future__ import annotations

from sqlstreamstore_spark.analytics import bpe
from sqlstreamstore_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bpe_train_deterministic_and_classic():
    texts = ["low lower lowest", "new newer newest", "low low low"]
    m1 = bpe.bpe_train(texts, 10)
    m2 = bpe.bpe_train(texts, 10)
    assert m1 == m2 and len(m1) == 10
    # 'low' occurs 5x -> ('l','o') or ('o','w') dominates the first merges
    assert m1[0] in (("l", "o"), ("o", "w"))
    ranks = {p: i for i, p in enumerate(m1)}
    toks = bpe.bpe_encode_word("low", ranks)
    assert "".join(toks) == "low</w>"
    # frequent word fully merges into one symbol
    assert len(toks) == 1


def test_bpe_unseen_word_falls_back_to_chars():
    merges = bpe.bpe_train(["aaa bbb"], 5)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = bpe.bpe_encode_word("xyz", ranks)
    assert toks == ["x", "y", "z", "</w>"]


def test_bpe_distributed_matches_python_twin(spark):
    docs = load_table(spark, SF_DIR, "documents")
    sample = [r.text for r in docs.orderBy("doc_id").limit(64).select("text").collect()]
    merges = bpe.bpe_train(sample, 60)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: r for r in bpe.bpe_tokenize_counts(docs, merges).collect()}
    rows = docs.select("doc_id", "text").collect()
    assert len(got) == len(rows)
    for r in rows:
        toks = bpe.bpe_tokenize_text(r.text, ranks)
        words = bpe._words(r.text)
        g = got[r.doc_id]
        assert g.n_tokens == len(toks)
        assert g.n_words == len(words)
        if words:
            assert abs(g.tokens_per_word - len(toks) / len(words)) < 1e-12
    # at 60 merges on this corpus fertility is meaningfully above 1
    import statistics

    mean_fert = statistics.mean(g.tokens_per_word for g in got.values())
    assert mean_fert > 1.05


def test_compression_signals_invariants(spark):
    """zlib ratio discriminates: repetitive text compresses much harder
    than high-entropy text; values agree with driver-side zlib."""
    import zlib

    from sqlstreamstore_spark.analytics.text import compression_signals

    rep = "the same phrase again and again. " * 40
    import random

    rng = random.Random(7)
    noisy = "".join(chr(rng.randint(33, 126)) for _ in range(1200))
    docs = spark.createDataFrame(
        [(0, rep), (1, noisy), (2, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in compression_signals(docs).collect()}
    assert got[0].compression_ratio < 0.1 < got[1].compression_ratio
    assert got[1].compression_ratio < 1.1
    assert got[2].n_bytes == 0 and got[2].compression_ratio == 1.0
    for did, t in [(0, rep), (1, noisy)]:
        raw = t.encode()
        assert got[did].n_compressed == len(zlib.compress(raw, 6))


def test_heavy_hitters_bounds(spark):
    """Misra-Gries invariants vs the exact groupBy on the fixture
    corpus: approx <= exact <= max_count for every reported token, and
    with capacity >> distinct vocabulary the sketch is EXACT (no
    decrement ever fires)."""
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics.text import heavy_hitters

    docs = load_table(spark, SF_DIR, "documents")
    exact = {
        r.token: r.n
        for r in docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = heavy_hitters(docs, k=20, capacity=400).collect()
    assert got
    for r in got:
        assert r.approx_count <= exact[r.token] <= r.max_count, (
            r.token, r.approx_count, exact[r.token], r.max_count)
    # corpus vocabulary ~31 << 400: exact path, top-20 matches groupBy
    top_exact = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.token, r.approx_count) for r in got] == top_exact

    # tiny capacity on a skewed stream still finds the dominant token
    skewed = spark.createDataFrame(
        [(0, "x " * 500 + "a b c d e f g h i j k l m n o p q r s t u v w")],
        "doc_id long, text string",
    )
    hh = heavy_hitters(skewed, k=3, capacity=4).collect()
    assert hh[0].token == "x"
    assert hh[0].approx_count <= 500 <= hh[0].max_count


def test_hashed_embeddings_assembly_and_ann_composition(spark):
    """The array assembly matches the long format, and raw text becomes
    ANN-searchable: near-dup pairs over hashed embeddings find the
    planted duplicate document."""
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics import similarity
    from sqlstreamstore_spark.analytics.text import (
        hashed_embedding_features,
        hashed_embeddings,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    # plant an exact duplicate with a new id
    dup = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    corpus = docs.unionByName(dup)

    long_fmt = {
        (r.doc_id, r.bucket): r.weight
        for r in hashed_embedding_features(corpus).collect()
    }
    emb = hashed_embeddings(corpus)
    rows = emb.collect()
    assert len(rows) == 51
    for r in rows[:5]:
        for b, w in enumerate(r.embedding):
            assert w == long_fmt.get((r.vec_id, b), 0.0)

    pairs = similarity.cosine_near_dup_pairs_lsh(
        emb, threshold=0.95, bits=4, sort=False
    ).collect()
    assert any((p.id_a, p.id_b) == (0, 100_000) for p in pairs), pairs[:5]
