"""Pins for the round-5 sketch/sampling additions: Bloom prefilter
(no-false-negative containment, false-positive arithmetic), count-min
sketch (over-count bound, merge == recompute), and Efraimidis-Spirakis
weighted sampling (pure-Python md5-replay differential, weight
monotonicity). The row-level gate oracles replay the bit arithmetic;
these pin the structural guarantees the oracle can't isolate."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from sqlstreamstore_spark.analytics.dedup import bloom_prefilter
from sqlstreamstore_spark.analytics.sampling import weighted_sample_aes
from sqlstreamstore_spark.analytics.text import cms_token_freq


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [(d, t) for d, t in docs], "doc_id long, text string"
    )


# ------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives(spark):
    corpus = [(i, f"corpus document number {i} body") for i in range(50)]
    # incoming: 10 verbatim members + 10 novel docs
    incoming = [(100 + i, corpus[i][1]) for i in range(10)] + [
        (200 + i, f"novel text {i} never seen") for i in range(10)
    ]
    rows = {
        r.doc_id: r
        for r in bloom_prefilter(
            _docs_df(spark, corpus), _docs_df(spark, incoming)
        ).collect()
    }
    assert len(rows) == 20
    for r in rows.values():
        assert r.maybe_dup >= r.exact_dup  # no false negatives, ever
    for i in range(10):
        assert rows[100 + i].exact_dup == 1 and rows[100 + i].maybe_dup == 1


def test_bloom_false_positive_rate_bounded_by_parameters(spark):
    # tiny filter (m=64, k=2) + many corpus members → false positives
    # MUST appear on novel probes (the filter saturates), while the
    # containment invariant still holds — proving maybe_dup really is
    # the Bloom verdict, not a relabeled exact join.
    corpus = [(i, f"saturating member {i}") for i in range(200)]
    incoming = [(1000 + i, f"definitely novel probe {i}") for i in range(100)]
    rows = bloom_prefilter(
        _docs_df(spark, corpus), _docs_df(spark, incoming), m_bits=64, k=2
    ).collect()
    assert all(r.exact_dup == 0 for r in rows)
    assert sum(r.maybe_dup for r in rows) > 50  # saturated filter fires
    # and a roomy filter on the same data barely fires
    rows_big = bloom_prefilter(
        _docs_df(spark, corpus), _docs_df(spark, incoming), m_bits=1 << 16, k=4
    ).collect()
    assert sum(r.maybe_dup for r in rows_big) <= 2


def _bloom_py(corpus_texts, probe_text, m_bits, k):
    """Pure-Python replay of the bit arithmetic."""
    bits = set()
    for t in corpus_texts:
        h = hashlib.md5(t.encode()).hexdigest()
        for j in range(k):
            bits.add(int(h[4 * j : 4 * j + 4], 16) % m_bits)
    h = hashlib.md5(probe_text.encode()).hexdigest()
    return all(int(h[4 * j : 4 * j + 4], 16) % m_bits in bits for j in range(k))


def test_bloom_matches_python_bit_replay(spark):
    corpus = [(i, f"doc {i} alpha beta") for i in range(30)]
    incoming = [(100 + i, f"probe {i} gamma") for i in range(30)] + [
        (200, corpus[7][1])
    ]
    rows = {
        r.doc_id: r.maybe_dup
        for r in bloom_prefilter(
            _docs_df(spark, corpus), _docs_df(spark, incoming), m_bits=512, k=3
        ).collect()
    }
    texts = [t for _, t in corpus]
    for did, t in incoming:
        assert rows[did] == int(_bloom_py(texts, t, 512, 3)), (did, t)


# --------------------------------------------------------- count-min


def test_cms_never_undercounts_any_token(spark):
    docs = [(i, " ".join(f"w{j % 7}" for j in range(i + 1))) for i in range(40)]
    exact = Counter(t for _, txt in docs for t in txt.split(" "))
    rows = cms_token_freq(_docs_df(spark, docs), depth=2, width=4).collect()
    # width=4 forces heavy collisions; the estimate still never dips
    # below exact, and reported exacts agree with the Counter
    for r in rows:
        assert r.c_est >= r.c_exact
        assert r.c_exact == exact[r.token]


def test_cms_exact_when_grid_is_roomy(spark):
    docs = [(1, "a a a b b c"), (2, "a b c d d d d")]
    rows = cms_token_freq(_docs_df(spark, docs), depth=4, width=256).collect()
    # 4 distinct tokens in a 4x256 grid: collisions vanish, est == exact
    for r in rows:
        assert r.c_est == r.c_exact


def test_cms_merge_equals_recompute(spark):
    """Sketches of disjoint corpora merge by elementwise cell addition:
    grid(A) + grid(B) == grid(A ∪ B) — the property that makes the
    sketch a streaming/rollup-friendly monitor."""
    import pyspark.sql.functions as F

    a = [(i, f"tok{i % 5} tok{i % 3} shared") for i in range(20)]
    b = [(100 + i, f"tok{i % 4} other shared") for i in range(20)]

    def grid(docs, depth=3, width=8):
        cnts = (
            _docs_df(spark, docs)
            .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
            .groupBy("token")
            .count()
        )
        out: dict[tuple[int, int], int] = {}
        for row in cnts.collect():
            h = [
                int(
                    hashlib.md5(f"cms{r}:{row.token}".encode()).hexdigest()[:4],
                    16,
                )
                % width
                for r in range(depth)
            ]
            for r, col in enumerate(h):
                out[(r, col)] = out.get((r, col), 0) + row["count"]
        return out

    ga, gb, gu = grid(a), grid(b), grid(a + b)
    merged = Counter(ga)
    merged.update(gb)
    assert dict(merged) == gu


# ----------------------------------------------------- weighted A-ES


def _aes_py(docs, k):
    scored = []
    for did, text in docs:
        w = len(text.split(" "))
        v = int(hashlib.md5(f"wrs:{did}".encode()).hexdigest()[:12], 16)
        u = (v + 1) / float(1 << 48)
        scored.append((math.log(u) / w, -did))
    scored.sort(reverse=True)
    return sorted(-d for _, d in scored[:k])


def test_weighted_aes_matches_python_twin(spark):
    docs = [(i, " ".join(["tok"] * (1 + (i * 7) % 40))) for i in range(200)]
    got = sorted(
        r.doc_id for r in weighted_sample_aes(_docs_df(spark, docs), k=30).collect()
    )
    assert got == _aes_py(docs, 30)


def test_weighted_aes_heavier_docs_win_more(spark):
    # 100 light docs (1 token) vs 100 heavy docs (50 tokens): PPS means
    # the heavy half must dominate a k=40 sample decisively
    docs = [(i, "x") for i in range(100)] + [
        (100 + i, " ".join(["y"] * 50)) for i in range(100)
    ]
    got = weighted_sample_aes(_docs_df(spark, docs), k=40).collect()
    heavy = sum(1 for r in got if r.doc_id >= 100)
    assert heavy >= 30
    assert all(r.n_tokens in (1, 50) for r in got)


def test_weighted_aes_is_a_take_ordered_not_a_window(spark):
    """The plan must be TakeOrderedAndProject (per-partition k-heaps),
    never a single-partition global Window."""
    docs = _docs_df(spark, [(i, "a b c") for i in range(100)])
    plan = weighted_sample_aes(docs, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
