"""Hypothesis properties for the round-8 operators: the zero-waste
span packer on arbitrary corpora, and DSIR resample selection-set
stability under input layout."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lens=st.lists(st.integers(1, 40), min_size=1, max_size=25),
    budget=st.integers(2, 17),
)
def test_pack_spans_properties_random_corpora(spark, lens, budget):
    """For ANY document-length profile and ANY budget:
    - per-sequence span totals == budget for every non-final sequence;
    - each doc's spans tile [0, n) contiguously across consecutive
      sequences;
    - total packed tokens == total corpus tokens (nothing lost/dup'd);
    - sequence ids are dense 0..ceil(total/B)-1."""
    from collections import defaultdict

    from sqlstreamstore_spark.analytics.pipeline import pack_sequences_spans

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    rows = pack_sequences_spans(docs, token_budget=budget).collect()
    total = sum(lens)
    n_seqs = -(-total // budget)
    by_seq = defaultdict(int)
    by_doc = defaultdict(list)
    for r in rows:
        by_seq[r.seq_id] += r.span_tokens
        by_doc[r.doc_id].append(r)
    assert sorted(by_seq) == list(range(n_seqs))
    for sid in range(n_seqs - 1):
        assert by_seq[sid] == budget
    assert by_seq[n_seqs - 1] == total - budget * (n_seqs - 1)
    assert sum(by_seq.values()) == total
    for doc_id, spans in by_doc.items():
        spans.sort(key=lambda r: r.seq_id)
        assert spans[0].tok_start == 0
        assert spans[-1].tok_end == lens[doc_id]
        for a, b in zip(spans, spans[1:]):
            assert (b.seq_id, b.tok_start) == (a.seq_id + 1, a.tok_end)
        assert spans[0].offset_in_seq == (
            sum(lens[:doc_id]) - spans[0].seq_id * budget
        )
