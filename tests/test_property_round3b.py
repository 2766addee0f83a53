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
