"""Property-based differentials for the round-7 operators: the
in-engine logistic-regression trainer must replay a numpy GD twin
step-for-step on arbitrary small corpora, and the DOULION estimator
must be exact at p=1 and consistently hash-deterministic at p<1 on
random graphs (examples kept small so each Spark job stays fast)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.tuples(
            st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),
            st.booleans(),
        ),
        min_size=2,
        max_size=20,
    ),
    iters=st.integers(1, 6),
)
def test_logreg_train_random_corpora_match_numpy(spark, docs, iters):
    import numpy as np

    from sqlstreamstore_spark.analytics.pipeline import logreg_train_quality

    rows = [
        (i, " ".join(toks), "en" if is_en else "de", len(" ".join(toks)))
        for i, (toks, is_en) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    r = logreg_train_quality(df, iters=iters).collect()[0]

    X, y = [], []
    for _i, text, lang, n_chars in rows:
        toks = text.split(" ")
        X.append([1.0, len(toks) / 256.0, len(set(toks)) / len(toks), n_chars / 1000.0])
        y.append(1.0 if lang == "en" else 0.0)
    X = np.array(X)
    y = np.array(y)
    w = np.zeros(4)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - 0.5 * ((p - y)[:, None] * X).mean(0)
    p = 1.0 / (1.0 + np.exp(-(X @ w)))
    loss = float(-(y * np.log(p) + (1.0 - y) * np.log(1.0 - p)).mean())

    assert (r.n_docs, r.n_pos) == (len(rows), int(y.sum()))
    for g, e in zip([r.w_bias, r.w_len, r.w_rich, r.w_chars], w):
        assert abs(g - e) < 5.1e-7, (g, e)
    assert abs(r.log_loss - loss) < 5.1e-7


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
            lambda t: t[0] < t[1]
        ),
        min_size=1,
        max_size=40,
    )
)
def test_doulion_random_graphs(spark, edges):
    """p=1 reproduces the exact count on arbitrary graphs; p=1/2 keeps
    exactly the hash-selected subset (replayed in Python) and scales
    its sampled count by 8."""
    from sqlstreamstore_spark.analytics.graph import (
        triangle_count,
        triangle_count_doulion,
    )

    edf = spark.createDataFrame(sorted(edges), "src long, dst long")
    exact = triangle_count(edf).collect()[0].n_triangles
    full = triangle_count_doulion(edf, p=1.0).collect()[0]
    assert full.n_triangles_sampled == exact
    assert full.n_kept == len(edges)

    half = triangle_count_doulion(edf, p=0.5).collect()[0]
    # replay the content-hash coin
    kept = {
        (s, d)
        for s, d in edges
        if int(hashlib.md5(f"{s}|{d}".encode()).hexdigest()[:4], 16) % 65536 < 32768
    }
    assert half.n_kept == len(kept)
    # exact triangle recount on the kept subset
    adj = set(kept)
    tri = sum(
        1
        for a, b in adj
        for c in range(13)
        if (b, c) in adj and (a, c) in adj
    )
    assert half.n_triangles_sampled == tri
    assert half.n_triangles_est == tri * 8.0


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 9), st.floats(0.1, 100.0)),
        min_size=0,
        max_size=12,
    )
)
def test_ab_test_random_arms_never_nan(spark, vals):
    """ab_test_report on arbitrary (incl. degenerate) arm shapes:
    welch_t/welch_df are either finite or NULL — never NaN/inf — and
    NULL exactly when an arm has < 2 users."""
    import datetime as dt

    from sqlstreamstore_spark.analytics.evaluation import ab_test_report

    ts = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, ts, v) for u, v in vals] or [(None, None, None)],
        "user_id long, ts timestamp, value double",
    )
    r = ab_test_report(df).collect()[0]
    n_a = sum(1 for u, _ in vals if u % 2 == 0)
    n_b = len(vals) - n_a
    assert (r.n_a, r.n_b) == (n_a, n_b)
    # ADVICE r7 #4: all-constant arms (zero pooled variance) are now
    # GUARDED — welch_t/welch_df NULL, never inf/nan — so the test can
    # pin one behavior instead of tolerating non-finite values
    cents_a = {round(v * 100) for u, v in vals if u % 2 == 0}
    cents_b = {round(v * 100) for u, v in vals if u % 2 == 1}
    var_pos = len(cents_a) > 1 or len(cents_b) > 1
    testable = n_a > 1 and n_b > 1 and var_pos
    for col in (r.welch_t, r.welch_df):
        if testable:
            assert col is not None and math.isfinite(col), col
        else:
            assert col is None, col
