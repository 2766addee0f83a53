"""Connected-components dedup clustering: known graph shapes, and the
full near-dup pipeline composition (the gate also hash-matches these
against a DuckDB recursive CTE — see registry.py _CC_SQL)."""

from __future__ import annotations

from sqlstreamstore_spark.analytics.dedup import connected_components
from sqlstreamstore_spark.analytics.pipeline import clean_corpus


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {r.doc_id: r.comp for r in connected_components(df).collect()}


def test_cc_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_chain_converges(spark):
    # a path graph is the worst case for min-propagation (diameter rounds)
    got = _cc(spark, [(i, i + 1) for i in range(1, 9)])
    assert set(got.values()) == {1}


def test_cc_triangle_with_bridge(spark):
    got = _cc(spark, [(5, 6), (6, 7), (5, 7), (7, 20)])
    assert got == {5: 5, 6: 5, 7: 5, 20: 5}


def test_cc_driver_and_distributed_paths_agree(spark):
    """The small-graph union-find fast path and the distributed
    min-label loop are the same operator: identical labels on a random
    multi-component graph (driver_edge_limit=0 forces the loop)."""
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(0, 60) + 100 * c, rng.randrange(0, 60) + 100 * c)
        for c in range(3)
        for _ in range(40)
    ]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {r.doc_id: r.comp for r in connected_components(df).collect()}
    dist = {
        r.doc_id: r.comp
        for r in connected_components(df, driver_edge_limit=0).collect()
    }
    assert fast == dist and len(fast) > 50


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).collect() == []
    assert connected_components(df, driver_edge_limit=0).collect() == []


def test_clean_corpus_drops_exact_dups_and_junk(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
        (3, "a a a a a a a a"),  # fails distinct-ratio gate
        (4, "short"),  # fails min-tokens gate
        (5, "completely different content about spark query engines and logs"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = [r.doc_id for r in clean_corpus(docs).collect()]
    assert kept == [1, 5]


def test_shingle_operators_tolerate_short_documents(spark):
    """Documents shorter than n tokens must yield an empty shingle set,
    not an ANSI element_at error (sequence(0, size-n) runs descending
    when size < n) — every dedup/jaccard/decontamination operator would
    otherwise crash on the first short document in a real corpus."""
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics.dedup import (
        _shingles,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "one two three four"), (3, ""), (4, "x"),
         (5, "one two three four")],
        "doc_id long, text string",
    )
    sh = docs.select("doc_id", _shingles(F.col("text"), 3).alias("sh")).collect()
    by_id = {r.doc_id: r.sh for r in sh}
    assert by_id[1] == [] and by_id[3] == [] and by_id[4] == []
    assert by_id[2] == ["one two three", "two three four"]
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b) for r in pairs] == [(2, 5)]
    cands = minhash_lsh_candidates(docs).collect()
    assert [(r.doc_a, r.doc_b) for r in cands] == [(2, 5)]


def test_jaccard_prefix_equals_plain_self_join(spark):
    """The prefix-filtered path is exact (recall 1.0 by the filter
    theorem): identical rows to ngram_jaccard_pairs on the fixture at
    two thresholds."""
    from sqlstreamstore_spark.analytics.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )
    from sqlstreamstore_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for t in (0.2, 0.5):
        plain = ngram_jaccard_pairs(docs, threshold=t).collect()
        pref = jaccard_prefix_pairs(docs, threshold=t).collect()
        assert [tuple(r) for r in pref] == [tuple(r) for r in plain]


def test_jaccard_prefix_handles_tiny_and_identical_docs(spark):
    """Identical docs (Jaccard 1.0) survive: the prefix of each is the
    same rarest shingle, so the pair is always a candidate; docs below
    n tokens vanish from both paths."""
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics.dedup import jaccard_prefix_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),
            (3, "x y"),          # < n tokens: no shingles
            (4, "q r s t u v"),  # disjoint from everything
        ],
        "doc_id long, text string",
    )
    rows = jaccard_prefix_pairs(docs, threshold=0.9).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


def test_auto_shingle_df_cap_noop_on_fixture(spark):
    """VERDICT r5 #4: max_shingle_df defaults to 'auto' =
    max(64, ceil(sqrt(N))). On the closed-vocabulary fixture the cap is
    64 while max shingle df is single-digit, so the default MUST be a
    no-op — identical rows to the uncapped run — while still bounding
    any one shingle's join mass to N pairs on a skewed corpus."""
    from sqlstreamstore_spark.analytics.dedup import (
        containment_pairs,
        derive_shingle_df_cap,
        ngram_jaccard_pairs,
    )
    from sqlstreamstore_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    assert derive_shingle_df_cap(500) == 64       # floor wins
    assert derive_shingle_df_cap(50_000) == 224   # ceil(sqrt) wins
    assert derive_shingle_df_cap(49) == 64

    auto_j = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    none_j = ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=None).collect()
    assert auto_j == none_j and len(auto_j) > 0

    auto_c = containment_pairs(docs, threshold=0.5).collect()
    none_c = containment_pairs(docs, threshold=0.5, max_shingle_df=None).collect()
    assert auto_c == none_c and len(auto_c) > 0


def test_auto_shingle_df_cap_engages_on_skew(spark):
    """On a corpus where one boilerplate shingle appears in EVERY doc
    (df = N > cap), the auto cap drops it: pairs witnessed ONLY by the
    boilerplate disappear, pairs with rarer shared shingles survive."""
    from sqlstreamstore_spark.analytics.dedup import containment_pairs

    # 80 docs sharing the boilerplate trigram; docs 0/1 also share a
    # rare 5-token overlap
    rows = [(i, f"common boiler plate u{i} v{i} w{i} x{i}") for i in range(2, 80)]
    rows += [(0, "common boiler plate alpha beta gamma delta"),
             (1, "common boiler plate alpha beta gamma delta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = containment_pairs(docs, threshold=0.5, max_shingle_df=10)
    got = {(r.doc_sub, r.doc_sup) for r in capped.collect()}
    # boilerplate-only pairs are gone; the genuine near-dup remains
    assert (0, 1) in got and (1, 0) in got
    assert all({a, b} == {0, 1} for a, b in got), got
