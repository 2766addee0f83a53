"""Hypothesis properties for the round-9 operators: curriculum staging,
length-bucketed batching, epoch allocation conservation, and the
term-count monoid on arbitrary corpora/batch splits."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lens=st.lists(st.integers(1, 40), min_size=4, max_size=30),
    stages=st.integers(2, 6),
)
def test_curriculum_properties_random_corpora(spark, lens, stages):
    """For ANY length profile and stage count: dense 0-based order,
    difficulty monotone, stage populations differ by ≤1 and are
    non-increasing along the schedule, stage ids cover 0..stages-1
    exactly when n >= stages."""
    from collections import Counter

    from sqlstreamstore_spark.analytics.pipeline import curriculum_order

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    rows = curriculum_order(docs, stages=stages).collect()
    n = len(lens)
    assert [r.train_order for r in rows] == list(range(n))
    toks = [r.n_tokens for r in rows]
    assert toks == sorted(toks)
    sizes = Counter(r.stage for r in rows)
    if n >= stages:
        assert sorted(sizes) == list(range(stages))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    stages_seq = [r.stage for r in rows]
    assert stages_seq == sorted(stages_seq)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lens=st.lists(st.integers(1, 50), min_size=1, max_size=40),
    bs=st.integers(2, 9),
)
def test_length_batches_properties(spark, lens, bs):
    """Batches tile the sorted order; full batches except the tail;
    per-batch identities hold; total padded tokens == sum of
    batch_max·n_docs; waste is minimal per batch by construction
    (batch_max == max of its members)."""
    from sqlstreamstore_spark.analytics.pipeline import length_bucket_batches

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    rows = length_bucket_batches(docs, batch_size=bs).collect()
    n = len(lens)
    assert sum(r.n_docs for r in rows) == n
    assert [r.batch_id for r in rows] == list(range(len(rows)))
    assert all(r.n_docs == bs for r in rows[:-1])
    s = sorted(lens)
    for r in rows:
        chunk = s[r.batch_id * bs : r.batch_id * bs + bs]
        assert r.n_docs == len(chunk)
        assert r.batch_max == max(chunk)
        assert r.batch_tokens == sum(chunk)
        assert r.padded_waste == max(chunk) * len(chunk) - sum(chunk)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(1, 60)),
        min_size=3,
        max_size=30,
    ),
    budget=st.integers(10, 5000),
    cap=st.floats(0.5, 8.0),
)
def test_epoch_allocation_conservation(spark, data, budget, cap):
    """For ANY corpus/budget/cap: alloc = available·epochs exactly,
    epochs ≤ cap, deficit ≥ 0 iff capped (within float ulp), and
    total allocated tokens ≤ budget + ulp-slack."""
    from sqlstreamstore_spark.analytics.sampling import epoch_allocation

    docs = spark.createDataFrame(
        [
            (i, " ".join(["w"] * n), src)
            for i, (src, n) in enumerate(data)
        ],
        "doc_id long, text string, source string",
    )
    rows = epoch_allocation(docs, budget=budget, max_epochs=cap).collect()
    total_alloc = 0.0
    for r in rows:
        assert r.epochs <= cap
        assert r.alloc_tokens == r.tokens_available * r.epochs
        if r.epochs < cap:
            assert abs(r.deficit_tokens) < 1e-9 * max(1.0, budget)
        else:
            assert r.deficit_tokens >= -1e-9 * max(1.0, budget)
        total_alloc += r.alloc_tokens
    assert total_alloc <= budget * (1 + 1e-12) + 1e-9


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=20),
        min_size=2,
        max_size=16,
    ),
    cut=st.integers(1, 15),
)
def test_term_index_monoid_any_split(spark, tmp_path_factory, texts, cut):
    """merge == rebuild for ANY corpus and ANY disjoint batch split —
    the df-additivity contract holds because each doc lives in exactly
    one batch."""
    from sqlstreamstore_spark.analytics import text as T

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = docs.filter(f"doc_id < {cut}")
    b = docs.filter(f"doc_id >= {cut}")
    path = str(tmp_path_factory.mktemp("terms") / "idx")
    T.build_term_index(a, path)
    T.upsert_term_index(b, path)
    merged = T.vocabulary_from_index(spark, path, limit=100_000).collect()
    full = T.corpus_vocabulary(docs, limit=100_000).collect()
    assert merged == full
