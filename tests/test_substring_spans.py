"""Pins for the round-5 late additions: cross-document substring-span
dedup (Lee-et-al-style exact-substring signal, token granularity) and
the corpus-unigram log-probability quality score. Both carry DuckDB
gate oracles; these tests pin the edges the row-level oracle can't
isolate (span boundaries, within-doc-only exclusion, the interval-union
merge rule, LM degenerate cases) plus pure-Python differentials over
random corpora."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sqlstreamstore_spark.analytics.dedup import substring_dup_spans
from sqlstreamstore_spark.analytics.text import unigram_logprob


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [(d, t) for d, t in docs], "doc_id long, text string"
    )


def _spans_py(docs, k):
    """Reference implementation: duplicated k-gram start positions →
    interval union with the gap>k break rule."""
    grams: dict[str, set[int]] = {}
    toks = {d: t.split(" ") for d, t in docs}
    for d, t in toks.items():
        for p in range(len(t) - k + 1):
            grams.setdefault(" ".join(t[p : p + k]), set()).add(d)
    out = {}
    for d, t in toks.items():
        pos = [
            p
            for p in range(len(t) - k + 1)
            if grams[" ".join(t[p : p + k])] - {d}
        ]
        if not pos:
            continue
        runs = []
        s = e = pos[0]
        for p in pos[1:]:
            if p - e <= k:
                e = p
            else:
                runs.append((s, e))
                s = e = p
        runs.append((s, e))
        ivals = [(a, b + k - 1) for a, b in runs]
        out[d] = (
            len(ivals),
            sum(b - a + 1 for a, b in ivals),
            max(b - a + 1 for a, b in ivals),
            len(t),
        )
    return out


def test_planted_shared_passage_span_boundaries(spark):
    shared = "q w e r t y u i o p"  # 10 tokens, k=3 grams all cross-doc
    docs = [
        (1, "a b c " + shared + " d e f"),
        (2, "z z x x " + shared + " m n"),
        (3, "unrelated words only here none shared at all"),
    ]
    rows = {
        r.doc_id: r
        for r in substring_dup_spans(_docs_df(spark, docs), k=3).collect()
    }
    assert set(rows) == {1, 2}  # doc 3 carries no cross-doc gram
    # doc 1: dup 3-gram starts at positions 3..10 → one span [3, 12]
    assert rows[1].n_dup_spans == 1
    assert rows[1].n_dup_tokens == 10
    assert rows[1].longest_dup_span == 10
    assert rows[1].n_tokens == 16
    assert rows[1].dup_token_ratio == pytest.approx(10 / 16)
    assert rows[2].n_dup_tokens == 10


def test_within_doc_repeats_not_counted(spark):
    # doc 1 repeats its own phrase; no other doc shares any 3-gram
    docs = [
        (1, "a b c x y a b c z w a b c"),
        (2, "totally different tokens in this document here"),
    ]
    assert substring_dup_spans(_docs_df(spark, docs), k=3).count() == 0


def test_exact_copies_cover_everything(spark):
    docs = [(1, "a b c d e f g h"), (2, "a b c d e f g h")]
    rows = substring_dup_spans(_docs_df(spark, docs), k=3).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_dup_spans == 1
        assert r.n_dup_tokens == r.n_tokens == 8
        assert r.dup_token_ratio == 1.0


def test_distant_matches_stay_separate_spans(spark):
    # two shared 3-grams far apart (gap > k) → two spans, not one
    docs = [
        (1, "s1 s2 s3 f1 f2 f3 f4 f5 f6 f7 f8 f9 t1 t2 t3"),
        (2, "s1 s2 s3 other stuff entirely t1 t2 t3"),
    ]
    rows = {
        r.doc_id: r
        for r in substring_dup_spans(_docs_df(spark, docs), k=3).collect()
    }
    assert rows[1].n_dup_spans == 2
    assert rows[1].n_dup_tokens == 6
    assert rows[1].longest_dup_span == 3


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("a b c".split()), min_size=0, max_size=24),
        min_size=2,
        max_size=5,
    )
)
def test_spans_match_python_twin(spark, corpora):
    docs = [(i, " ".join(t) if t else "") for i, t in enumerate(corpora)]
    want = _spans_py(docs, 3)
    got = {
        r.doc_id: (r.n_dup_spans, r.n_dup_tokens, r.longest_dup_span, r.n_tokens)
        for r in substring_dup_spans(_docs_df(spark, docs), k=3).collect()
    }
    assert got == want


def test_unigram_logprob_uniform_corpus_is_zero_surprise(spark):
    # every token identical → p(token) = 1 → avg_logprob 0, ppl 1
    docs = [(1, "x x x x"), (2, "x x")]
    rows = unigram_logprob(_docs_df(spark, docs)).collect()
    assert [r.avg_logprob for r in rows] == [0.0, 0.0]
    assert [r.ppl_proxy for r in rows] == [1.0, 1.0]


def test_unigram_logprob_rare_tokens_score_lower(spark):
    docs = [
        (1, "the the the the the the the the"),
        (2, "the the the the the the the rare"),
    ]
    rows = {r.doc_id: r for r in unigram_logprob(_docs_df(spark, docs)).collect()}
    assert rows[2].avg_logprob < rows[1].avg_logprob
    assert rows[2].ppl_proxy > rows[1].ppl_proxy


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("a b c d".split()), min_size=1, max_size=20),
        min_size=1,
        max_size=5,
    )
)
def test_unigram_logprob_matches_python_twin(spark, corpora):
    docs = [(i, " ".join(t)) for i, t in enumerate(corpora)]
    cnt = Counter(t for _, ts in corpora_tokens(docs) for t in ts)
    n = sum(cnt.values())
    want = {
        d: sum(math.log(cnt[t]) for t in ts) / len(ts) - math.log(n)
        for d, ts in corpora_tokens(docs)
    }
    got = {r.doc_id: r.avg_logprob for r in unigram_logprob(_docs_df(spark, docs)).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-6)


def corpora_tokens(docs):
    return [(d, t.split(" ")) for d, t in docs]


def test_winnowing_guarantee_and_python_differential(spark):
    """The winnowing theorem: a verbatim overlap of k+w-1 tokens (8 at
    the defaults) between two documents MUST yield a shared
    fingerprint. Plus a full pure-Python replay (md5 prefix hash,
    rightmost-min tie rule) on a handcrafted corpus."""
    import hashlib

    from sqlstreamstore_spark.analytics.dedup import (
        winnow_fingerprints,
        winnow_shared_pairs,
    )

    k, w = 4, 5
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = [
        (1, "one two three " + shared + " four five six"),
        (2, "seven eight " + shared + " nine ten eleven twelve"),
        (3, "completely different words entirely unrelated to both cases here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b) for r in winnow_shared_pairs(df, k, w, min_shared=1).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)

    # pure-python winnowing replay
    def fps(text):
        toks = text.split(" ")
        hs = []
        for i in range(len(toks) - k + 1):
            g = " ".join(toks[i : i + k])
            h = int(hashlib.md5(g.encode()).hexdigest()[:10], 16)
            hs.append(h * 1048576 + (1048575 - i))
        out = set()
        for j in range(w - 1, len(hs)):
            out.add(min(hs[j - w + 1 : j + 1]) // 1048576)
        return out

    got = {}
    for r in winnow_fingerprints(df, k, w).collect():
        got.setdefault(r.doc_id, set()).add(r.h)
    for did, text in docs:
        assert got.get(did, set()) == fps(text), did


def test_containment_catches_subset_jaccard_misses(spark):
    """A short quote embedded verbatim in a long document: containment
    of the quote is 1.0 while symmetric Jaccard is far below any
    dedup threshold — the directional operator's reason to exist."""
    from sqlstreamstore_spark.analytics.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler.upper())],
        "doc_id long, text string",
    )
    cont = {
        (r.doc_sub, r.doc_sup): r.containment
        for r in containment_pairs(docs, threshold=0.9).collect()
    }
    assert cont == {(1, 2): 1.0}
    assert ngram_jaccard_pairs(docs, threshold=0.2).count() == 0
