"""Adversarial-input sweep: every analytics operator must tolerate the
edge rows a real corpus contains — empty documents, single-token
documents, exact duplicates, zero embeddings — without ANSI errors
(Spark 4 enables ANSI by default: out-of-range element_at, illegal
sequence boundaries and DIVIDE_BY_ZERO all throw)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from sqlstreamstore_spark.analytics import dedup, pipeline, sampling, similarity, text


@pytest.fixture(scope="module")
def adv_docs(spark):
    return spark.createDataFrame(
        [(1, "", "en", "web", 0), (2, "x", "en", "web", 1),
         (3, "same same same", "de", "book", 14), (4, "same same same", "de", "book", 14),
         (5, "one two three four five six seven eight nine", "en", "web", 40),
         (6, "héllo wörld 😀 héllo wörld 😀 tail", "fr", "web", 33)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture(scope="module")
def adv_emb(spark):
    return spark.createDataFrame(
        [(0, [0.0] * 64, "a"), (1, [1.0] + [0.0] * 63, "b"), (2, [1.0] + [0.0] * 63, "c")],
        "vec_id long, embedding array<float>, label string",
    )


@pytest.mark.parametrize(
    "name,build",
    [
        ("token_stats", lambda d: text.token_stats(d)),
        ("quality", lambda d: text.quality_score(d)),
        ("langid", lambda d: text.language_id(d)),
        ("fingerprint", lambda d: text.fingerprint(d)),
        ("rolling_hash", lambda d: text.rolling_hash_fingerprint(d)),
        ("regex_tokens", lambda d: text.regex_token_count(d)),
        ("vocabulary", lambda d: text.corpus_vocabulary(d)),
        ("tfidf", lambda d: text.tf_idf_top_terms(d, max_doc=10)),
        ("source_rollup", lambda d: text.source_quality_rollup(d)),
        ("exact_groups", lambda d: dedup.exact_dedup_groups(d)),
        ("exact_keepers", lambda d: dedup.exact_dedup_keepers(d)),
        ("jaccard", lambda d: dedup.ngram_jaccard_pairs(d, threshold=0.2)),
        ("minhash", lambda d: dedup.minhash_dedup_pairs(d, threshold=0.2)),
        ("minhash_recall", lambda d: dedup.minhash_lsh_recall(d, threshold=0.2)),
        ("simhash", lambda d: dedup.simhash_near_pairs(d)),
        ("components", lambda d: dedup.near_dup_components(d, threshold=0.2)),
        ("clean_corpus", lambda d: pipeline.clean_corpus(d)),
        ("decontaminate", lambda d: pipeline.decontaminate_report(d)),
        ("sample", lambda d: sampling.deterministic_sample(d, "doc_id", 0.5)),
        ("split", lambda d: sampling.hash_split(d, "doc_id")),
    ],
)
def test_document_operators_tolerate_edge_rows(adv_docs, name, build):
    build(adv_docs).collect()  # must not raise


def test_similarity_tolerates_zero_embeddings(adv_emb):
    rows = similarity.cosine_topk_bruteforce(adv_emb, [0.0] * 64, k=3).collect()
    assert all(r.cosine == 0.0 for r in rows)  # zero-vector convention
    pairs = similarity.cosine_near_dup_pairs(adv_emb, 0.1).collect()
    assert [(r.id_a, r.id_b, r.cosine) for r in pairs] == [(1, 2, 1.0)]
    lsh = similarity.cosine_near_dup_pairs_lsh(adv_emb, 0.1).collect()
    assert [(r.id_a, r.id_b, r.cosine) for r in lsh] == [(1, 2, 1.0)]


@pytest.mark.parametrize(
    "name,build",
    [
        ("repetition", lambda d: text.repetition_signals(d)),
        ("pack", lambda d: pipeline.pack_sequences(d, token_budget=7)),
        ("chunk", lambda d: pipeline.chunk_documents(d, size=5, stride=3)),
        ("scrub", lambda d: text.scrub_redact(d)),
        ("scrub_pii", lambda d: text.scrub_redact(d, patterns=text.PII_PATTERNS)),
        ("stratified", lambda d: sampling.stratified_sample_by_source(
            d, rates={"web": 0.5}, default_rate=0.25)),
        ("incremental", lambda d: dedup.incremental_new_docs(d, existing_fraction=0.5)),
    ],
)
def test_round3_operators_tolerate_edge_rows(adv_docs, name, build):
    build(adv_docs).collect()  # must not raise under ANSI


def test_repetition_signals_degenerate_values(adv_docs):
    """All-identical-word and single-token docs produce the expected
    degenerate ratios instead of errors: top_word_ratio 1.0 and
    dup_2gram_ratio 0.5 for 'same same same' (two bigrams, one
    distinct); null gram ratio for a 1-token doc."""
    rows = {r.doc_id: r for r in text.repetition_signals(adv_docs).collect()}
    assert rows[3].top_word_ratio == 1.0
    assert rows[3].dup_2gram_ratio == 0.5
    assert rows[2].dup_2gram_ratio is None  # 1 token -> no 2-grams
    assert rows[2].n_words == 1


def test_pack_sequences_spans_budget_boundaries(adv_docs):
    """Contiguous packing: a document crossing the budget boundary keeps
    one seq_id (split happens at tokenization); offsets stay exact."""
    rows = pipeline.pack_sequences(adv_docs, token_budget=7).collect()
    cum = 0
    for r in sorted(rows, key=lambda r: r.doc_id):
        assert (r.seq_id, r.offset_in_seq) == (cum // 7, cum % 7), r
        cum += r.n_tokens


def test_embedding_dedup_keepers_zero_and_dup_vectors(adv_emb):
    """Keeper labels on the degenerate corpus: the identical pair
    clusters to the min id; the zero vector keeps itself."""
    rows = {r.vec_id: r.keeper for r in
            similarity.embedding_dedup_keepers(adv_emb, 0.1).collect()}
    assert rows == {0: 0, 1: 1, 2: 1}
    rep = similarity.embedding_lsh_recall(adv_emb, 0.1).collect()[0]
    assert (rep.n_exact, rep.n_hit) == (1, 1) and rep.recall == 1.0


@pytest.mark.parametrize(
    "name,build",
    [
        ("substring_spans", lambda d: dedup.substring_dup_spans(d)),
        ("winnow_pairs", lambda d: dedup.winnow_shared_pairs(d, min_shared=1)),
        ("bigram_logprob", lambda d: text.bigram_logprob(d)),
        ("unigram_logprob", lambda d: text.unigram_logprob(d)),
        ("collocations", lambda d: text.collocations_pmi(d, min_count=1)),
        ("quality_gate", lambda d: pipeline.quality_percentile_gate(d)),
        ("group_split", lambda d: sampling.group_split(d, "source")),
    ],
)
def test_round5_operators_tolerate_edge_rows(adv_docs, name, build):
    """Empty/single-token/duplicate/unicode rows plus a NULL-text row
    must not raise under ANSI and must not leak NULL rows into scores."""
    docs = adv_docs.union(
        adv_docs.sparkSession.createDataFrame(
            [(99, None, "en", "web", 0)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    rows = build(docs).collect()  # must not raise
    if name != "group_split":  # assignment ops pass every row through
        for r in rows:
            if hasattr(r, "doc_id"):
                assert r.doc_id != 99


def test_sliding_window_drops_null_ts(spark):
    """NULL-ts events are excluded entirely (Spark and DuckDB disagree
    on NULL placement in window ORDER BY, so they must never enter a
    frame)."""
    import datetime as dt

    from sqlstreamstore_spark.analytics.events import sliding_value_window

    rows = [
        (1, 7, "a", dt.datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (2, 7, "a", None, 100.0),
        (3, 7, "a", dt.datetime(2024, 1, 1, 0, 30, 0), 2.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    out = {r.event_id: r for r in sliding_value_window(ev).collect()}
    assert set(out) == {1, 3}
    assert (out[3].n_window, out[3].sum_window) == (2, 3.0)
