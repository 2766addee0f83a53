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


# ------------------------------------------------------------ HyperLogLog


def _hll_py(values):
    """Pure-Python HLL twin: same md5 split, same string-free rho."""
    regs = {}
    for v in values:
        h = hashlib.md5(v.encode()).hexdigest()
        reg = int(h[:2], 16)
        tail = int(h[2:14], 16)
        rho = 49 if tail == 0 else 49 - tail.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    z_scaled = sum(1 << (49 - r) for r in regs.values()) + (256 - len(regs)) * (
        1 << 49
    )
    alpha = 0.7213 / (1.0 + 1.079 / 256)
    return alpha * 65536.0 * float(1 << 49) / float(z_scaled)


def test_hll_rho_matches_bit_length_on_every_leading_pattern(spark):
    """The string-only rho (hex-strip + leading-digit CASE) must equal
    the arithmetic 49 - bit_length for tails exercising every leading
    hex digit class and the all-zero corner."""
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics.text import _hll_rho

    tails = [
        "000000000000",  # rho 49
        "000000000001",  # rho 48
        "100000000000",  # leading digit 1 → rho 4
        "800000000000",  # leading digit 8 → rho 1
        "400000000000",
        "200000000000",
        "0fffffffffff",
        "03b000000000",
        "021000000000",
        "000700000000",
    ]
    df = spark.createDataFrame([(t,) for t in tails], "tail string")
    got = {
        r.tail: r.rho
        for r in df.select("tail", _hll_rho(F.col("tail")).alias("rho")).collect()
    }
    for t in tails:
        v = int(t, 16)
        expect = 49 if v == 0 else 49 - v.bit_length()
        assert got[t] == expect, t


def test_hll_matches_python_twin_and_error_bound(spark):
    from sqlstreamstore_spark.analytics.text import hll_estimate, hll_registers

    vals = [f"item-{i}" for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    row = hll_estimate(hll_registers(df)).collect()[0]
    assert row.hll_estimate == pytest.approx(_hll_py(vals), abs=0.0)
    # 3 sigma at m=256: 3 * 1.04 / 16 = 19.5 %
    assert abs(row.hll_estimate - 5000) / 5000 < 0.195


def test_hll_merge_equals_recompute(spark):
    """Register files of disjoint halves merged by union+max must give
    the whole-corpus estimate exactly — the 100 TB rollup property."""
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics.text import hll_estimate, hll_registers

    vals = [f"doc-{i}" for i in range(4000)]
    df_a = spark.createDataFrame([(v,) for v in vals[:2000]], "s string")
    df_b = spark.createDataFrame([(v,) for v in vals[2000:]], "s string")
    merged = (
        hll_registers(df_a)
        .unionByName(hll_registers(df_b))
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )
    whole = spark.createDataFrame([(v,) for v in vals], "s string")
    got = hll_estimate(merged).collect()[0]
    want = hll_estimate(hll_registers(whole)).collect()[0]
    assert got.z_scaled == want.z_scaled
    assert got.hll_estimate == want.hll_estimate


def test_hll_duplicates_do_not_move_the_estimate(spark):
    """HLL counts distincts: replicating every item 5x must leave the
    register file byte-identical."""
    from sqlstreamstore_spark.analytics.text import hll_estimate, hll_registers

    vals = [f"v{i}" for i in range(1000)]
    once = spark.createDataFrame([(v,) for v in vals], "s string")
    five = spark.createDataFrame([(v,) for v in vals * 5], "s string")
    assert (
        hll_estimate(hll_registers(once)).collect()[0].z_scaled
        == hll_estimate(hll_registers(five)).collect()[0].z_scaled
    )


# --------------------------------------------- temperature mixture


def _tm_docs(spark, sizes):
    """sizes: {source: (n_docs, tokens_per_doc)}."""
    rows, i = [], 0
    for src, (nd, tpd) in sorted(sizes.items()):
        for _ in range(nd):
            rows.append((i, src, " ".join(["w"] * tpd)))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_temperature_alpha_flattens_the_mix(spark):
    """α < 1 upsamples low-resource sources: the selected-token share
    of the SMALL source must be strictly larger at α=0.3 than at α=1.0
    (and α=1.0 tracks the natural proportions)."""
    from sqlstreamstore_spark.analytics.sampling import temperature_mixture_sample

    docs = _tm_docs(spark, {"big": (400, 40), "small": (40, 40)})

    def shares(alpha):
        rows = {
            r.src: r
            for r in temperature_mixture_sample(
                docs, alpha=alpha, target_tokens=6_000
            ).collect()
        }
        tot = sum(r.tokens_selected for r in rows.values())
        return {s: r.tokens_selected / tot for s, r in rows.items()}, rows

    s_cold, _ = shares(1.0)
    s_hot, _ = shares(0.3)
    assert s_hot["small"] > s_cold["small"]
    # natural share of 'small' is 1/11; alpha=1 tracks it loosely
    assert abs(s_cold["small"] - 1 / 11) < 0.08


def test_temperature_rate_caps_at_one_and_is_deterministic(spark):
    """A tiny source whose computed rate exceeds 1 keeps everything
    (threshold caps at 65536); the selected doc set is identical on
    recompute (hash determinism)."""
    from sqlstreamstore_spark.analytics.sampling import temperature_mixture_sample

    docs = _tm_docs(spark, {"big": (300, 50), "tiny": (5, 10)})
    a = {r.src: r for r in temperature_mixture_sample(docs, alpha=0.2, target_tokens=20_000).collect()}
    assert a["tiny"].threshold == 65536
    assert a["tiny"].n_selected == a["tiny"].n_docs  # rate 1: keep all
    b = {r.src: r for r in temperature_mixture_sample(docs, alpha=0.2, target_tokens=20_000).collect()}
    assert {(r.src, r.n_selected, r.tokens_selected) for r in a.values()} == {
        (r.src, r.n_selected, r.tokens_selected) for r in b.values()
    }


# ------------------------------------------------------------ entropy


def test_source_entropy_matches_python_and_ranks_templates_low(spark):
    import math

    from sqlstreamstore_spark.analytics.text import source_token_entropy

    rows = []
    # 'template': same 5-word page stamped 30x  -> low normalized entropy
    for i in range(30):
        rows.append((i, "template", "buy now click here today"))
    # 'diverse': every page distinct words     -> high normalized entropy
    for i in range(30):
        rows.append((100 + i, "diverse", " ".join(f"w{i}_{j}" for j in range(5))))
    # 'single': one token only                  -> entropy 0, norm 0
    rows.append((999, "single", "x"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: r for r in source_token_entropy(df).collect()}

    def py_entropy(texts):
        from collections import Counter

        c = Counter(t for x in texts for t in x.split(" "))
        n = sum(c.values())
        h = math.log(n) - sum(v * math.log(v) for v in sorted(c.values())) / n
        return h, (h / math.log(len(c)) if len(c) > 1 else 0.0)

    by_src = {}
    for _, s, t in rows:
        by_src.setdefault(s, []).append(t)
    for s, texts in by_src.items():
        h, norm = py_entropy(texts)
        assert abs(got[s].entropy - h) < 1e-6, s
        assert abs(got[s].entropy_norm - norm) < 1e-6, s
    assert got["single"].entropy == 0.0 and got["single"].entropy_norm == 0.0
    # the template source's tokens are uniform over its tiny vocab, so
    # its RAW entropy is small while its normalized entropy is 1.0;
    # the useful comparison is raw entropy vs the diverse source
    assert got["template"].entropy < got["diverse"].entropy
