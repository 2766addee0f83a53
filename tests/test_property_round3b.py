"""Property-based differential tests for the round-3b operators: the
Spark implementation must agree with an independent pure-Python twin on
arbitrary inputs (one Spark job per hypothesis example — examples are
batched lists to keep the suite fast)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sqlstreamstore_spark.analytics.pipeline import chunk_documents
from sqlstreamstore_spark.analytics.sampling import stratified_sample_by_source

# printable-ish text incl. multibyte; newlines excluded (parquet-safe
# is not required here, createDataFrame handles anything)
_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=120,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_text, min_size=1, max_size=12), size=st.integers(2, 9),
       overlap=st.integers(0, 5))
def test_chunk_documents_matches_python_slicing(spark, texts, size, overlap):
    stride = max(1, size - overlap)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {}
    for r in chunk_documents(docs, size=size, stride=stride).collect():
        got.setdefault(r.doc_id, []).append(r)
    for doc_id, s in enumerate(texts):
        k = max(1, math.ceil(len(s) / stride))
        chunks = sorted(got[doc_id], key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(k))
        for i, c in enumerate(chunks):
            py = s[i * stride : i * stride + size]
            assert c.chunk_len == len(py)
            assert c.chunk_md5 == hashlib.md5(py.encode("utf-8")).hexdigest()
        # reconstruction: stride-prefixes concatenated + last chunk == s
        rebuilt = "".join(
            s[i * stride : i * stride + size][: stride] for i in range(k - 1)
        ) + s[(k - 1) * stride : (k - 1) * stride + size]
        assert rebuilt == s


def _py_bucket(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:4], 16) % 65536


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=40, unique=True),
    rates=st.dictionaries(
        st.sampled_from(["a", "b", "c"]), st.floats(0.0, 1.0), max_size=3
    ),
    default_rate=st.floats(0.0, 1.0),
)
def test_stratified_sample_matches_python_hash(spark, ids, rates, default_rate):
    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = {
        r.doc_id
        for r in stratified_sample_by_source(
            df, rates=rates, default_rate=default_rate
        ).collect()
    }
    expected = {
        i
        for i, src in rows
        if _py_bucket(str(i)) < int(rates.get(src, default_rate) * 65536)
    }
    assert kept == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=400),
    qs=st.lists(
        st.sampled_from([i / 10.0 for i in range(1, 10)]
                        + [i / 128 for i in range(1, 128, 17)]),
        min_size=1, max_size=5, unique=True,
    ),
)
def test_percentile_approx_rank_exact_at_high_accuracy(spark, vals, qs):
    """The r5 oracle-upgrade contract: with accuracy >= N the GK sketch
    keeps every sample (no merge can satisfy g_i+g_j+delta <= 2*eps*N
    < 2) and percentile_approx(q) returns EXACTLY the value at sorted
    rank ceil(q*N) — including ties, multiple partitions, and the
    float-product rank arithmetic. stats_ntile_deciles_approx and
    drift_ks_binned's DuckDB twins replay this rule by rank selection,
    so it must hold for arbitrary data, not just the fixtures."""
    import math

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(4)
    got = df.agg(
        F.percentile_approx(
            "v", F.array(*[F.lit(q) for q in qs]), F.lit(10_000_000)
        ).alias("b")
    ).collect()[0].b
    s = sorted(vals)
    want = [s[max(0, math.ceil(q * len(vals)) - 1)] for q in qs]
    assert list(got) == want, (vals, qs, got, want)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(0, 10_000),
    wide=st.booleans(),
    lo_frac=st.floats(0.0, 0.9),
    width_frac=st.floats(0.05, 0.5),
)
def test_zorder_pruning_superset_property(spark, tmp_path_factory, seed, wide,
                                          lo_frac, width_frac):
    """read_pruned's superset guarantee under RANDOM rectangles on
    random data, in both a small domain and a >2^53 wide domain (the
    r4-advice ULP regime): pruned-scan + filter == full-scan + filter,
    always."""
    import random

    from pyspark.sql import functions as F

    from sqlstreamstore_spark.sources.zorder import read_pruned, write_zordered

    rng = random.Random(seed)
    base = (1 << 62) if wide else 0
    rows = [(i, base + rng.randrange(0, 10_000), rng.randrange(0, 10_000))
            for i in range(300)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    path = str(tmp_path_factory.mktemp("zprop") / "z")
    write_zordered(df, path, "a", "b", n_buckets=8)

    span = 10_000
    a_lo = base + int(lo_frac * span)
    a_hi = a_lo + max(1, int(width_frac * span))
    pred = F.col("a").between(a_lo, a_hi)
    expect = sorted(r.k for r in df.filter(pred).collect())
    pruned, read, total = read_pruned(spark, path, a_range=(a_lo, a_hi))
    got = sorted(r.k for r in pruned.filter(pred).collect())
    assert got == expect, (seed, wide, a_lo, a_hi, read, total)
