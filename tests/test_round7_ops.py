"""Round-7 additions: in-engine logistic-regression training (the
quality-classifier curation loop), end-to-end corpus pipeline, DOULION
triangle sampling — each checked against an independent numpy /
pure-Python replication on the real fixtures, plus plan-shape gates."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from sqlstreamstore_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = load_table(spark, SF, "documents").cache()
    df.count()
    return df


def _numpy_logreg(raw, iters=5, eta=0.5):
    """Fixed-iteration full-batch GD replayed step-for-step in numpy —
    the independent leg of the pipeline_classifier_train oracle."""
    import numpy as np

    X, y = [], []
    for lang, text, n_chars in raw:
        toks = text.split(" ")
        X.append(
            [1.0, len(toks) / 256.0, len(set(toks)) / len(toks), n_chars / 1000.0]
        )
        y.append(1.0 if lang == "en" else 0.0)
    X = np.array(X)
    y = np.array(y)
    w = np.zeros(4)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - eta * ((p - y)[:, None] * X).mean(0)
    p = 1.0 / (1.0 + np.exp(-(X @ w)))
    loss = float(-(y * np.log(p) + (1.0 - y) * np.log(1.0 - p)).mean())
    return w, loss, int(y.sum()), len(y)


def test_logreg_train_matches_numpy_twin(docs):
    from sqlstreamstore_spark.analytics.pipeline import logreg_train_quality

    raw = [
        (r.lang, r.text, r.n_chars)
        for r in docs.select("lang", "text", "n_chars").collect()
    ]
    w, loss, n_pos, n = _numpy_logreg(raw)
    r = logreg_train_quality(docs).collect()[0]
    assert (r.n_docs, r.n_pos) == (n, n_pos)
    got = [r.w_bias, r.w_len, r.w_rich, r.w_chars]
    for g, e in zip(got, w):
        # the gate projection rounds to 6 decimals; under it, engine
        # partial-sum order vs numpy vectorized sums drifts ~1e-15
        assert abs(g - e) < 5.1e-7, (got, w.tolist())
    assert abs(r.log_loss - loss) < 5.1e-7
    # the trainer actually descends: loss strictly below the
    # zero-weight start ln(2) after 5 fixed steps (the prior-entropy
    # bias-only optimum ~H(p_pos) needs more steps — monotonicity is
    # pinned separately below)
    assert r.log_loss < math.log(2.0)


def test_classifier_infer_trained_matches_numpy(docs):
    """Trained-weight inference: p_keep = sigmoid of the ROUNDED
    published weights dotted with the features, replayed in numpy."""
    from sqlstreamstore_spark.analytics.pipeline import classifier_infer_trained

    raw = [
        (r.doc_id, r.lang, r.text, r.n_chars)
        for r in docs.select("doc_id", "lang", "text", "n_chars").collect()
    ]
    w, _loss, _np_, _n = _numpy_logreg([(l, t, c) for _d, l, t, c in raw])
    wr = [round(x, 6) for x in w]
    got = {r.doc_id: (r.label, r.p_keep) for r in classifier_infer_trained(docs).collect()}
    assert set(got) == {d for d, *_ in raw}
    for doc_id, lang, text, n_chars in raw:
        toks = text.split(" ")
        x = [1.0, len(toks) / 256.0, len(set(toks)) / len(toks), n_chars / 1000.0]
        z = ((wr[0] * x[0] + wr[1] * x[1]) + wr[2] * x[2]) + wr[3] * x[3]
        p = 1.0 / (1.0 + math.exp(-z))
        label, p_keep = got[doc_id]
        assert label == (1 if lang == "en" else 0)
        assert abs(p_keep - p) < 5.1e-7, (doc_id, p_keep, p)


def test_logreg_train_iters_monotone_loss(docs):
    """More gradient steps never worsen full-batch train loss on this
    fixture (eta is well inside the stable region)."""
    from sqlstreamstore_spark.analytics.pipeline import logreg_train_quality

    l1 = logreg_train_quality(docs, iters=1).collect()[0].log_loss
    l5 = logreg_train_quality(docs, iters=5).collect()[0].log_loss
    l10 = logreg_train_quality(docs, iters=10).collect()[0].log_loss
    assert l5 <= l1 and l10 <= l5


def test_e2e_corpus_pipeline_lineage_composes(spark, docs):
    """The flagship chain's per-stage counts equal the counts from
    running each stage operator individually (no seam between stages),
    and the lineage obeys the pipeline's monotonicity invariants."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics.dedup import minhash_dedup_pairs
    from sqlstreamstore_spark.analytics.pipeline import (
        e2e_corpus_pipeline,
        pack_sequences,
    )
    from sqlstreamstore_spark.analytics.sampling import selected_by_budget
    from sqlstreamstore_spark.analytics.similarity import cosine_near_dup_pairs_lsh
    from sqlstreamstore_spark.analytics.text import _tokens

    emb = load_table(spark, SF, "embeddings")
    got = {
        r.stage: r.n_rows
        for r in e2e_corpus_pipeline(docs, emb, default_budget=800).collect()
    }
    assert set(got) == {
        "raw", "quality", "exact_dedup", "fuzzy_dedup", "semantic_dedup",
        "budget_sample", "packed", "sharded",
    }
    # monotone through the filter/dedup/sample stages
    order = ["raw", "quality", "exact_dedup", "fuzzy_dedup",
             "semantic_dedup", "budget_sample"]
    for a, b in zip(order, order[1:]):
        assert got[a] >= got[b], (a, b, got)
    assert got["sharded"] <= min(16, got["packed"])
    assert got["raw"] == docs.count()

    # replay stage-by-stage with the individual operators
    toks = _tokens()
    n_toks = F.size(toks)
    quality = docs.filter(
        (n_toks >= 5)
        & (F.size(F.array_distinct(toks)).cast("double") / n_toks.cast("double") >= 0.3)
    )
    assert quality.count() == got["quality"]
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    exact = (
        quality.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    assert exact.count() == got["exact_dedup"]
    losers = (
        minhash_dedup_pairs(exact, threshold=0.2)
        .select(F.col("doc_b").alias("doc_id")).distinct()
    )
    fuzzy = exact.join(losers, "doc_id", "left_anti")
    assert fuzzy.count() == got["fuzzy_dedup"]
    emb_f = emb.join(
        fuzzy.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    sem_losers = (
        cosine_near_dup_pairs_lsh(emb_f, 0.35, bits=6, sort=False)
        .select(F.col("id_b").alias("doc_id")).distinct()
    )
    semantic = fuzzy.join(sem_losers, "doc_id", "left_anti")
    assert semantic.count() == got["semantic_dedup"]
    sampled = selected_by_budget(semantic, {}, 800)
    assert sampled.count() == got["budget_sample"]
    assert (
        pack_sequences(sampled, 512).select("seq_id").distinct().count()
        == got["packed"]
    )


def test_dsir_weights_match_numpy_twin(docs):
    """DSIR log-importance-weights replicate an independent pure-Python
    hashed-ngram LM ratio on the real fixture, and the weights actually
    separate the target domain (mean weight of 'en' docs > others)."""
    import hashlib

    from sqlstreamstore_spark.analytics.sampling import dsir_importance_weights

    B = 8192
    raw = [
        (r.doc_id, r.text, r.lang)
        for r in docs.select("doc_id", "text", "lang").collect()
    ]

    def grams(text):
        toks = text.split(" ")
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % B

    c_s = Counter()
    c_t = Counter()
    per_doc = {}
    for doc_id, text, lang in raw:
        bs = [bucket(g) for g in grams(text)]
        per_doc[doc_id] = (bs, lang)
        for b in bs:
            c_s[b] += 1
            if lang == "en":
                c_t[b] += 1
    n_s = sum(c_s.values())
    n_t = sum(c_t.values())
    want = {}
    for doc_id, (bs, _lang) in per_doc.items():
        m = Counter(bs)
        w = sum(
            mm * (math.log(c_t[b] + 1) - math.log(c_s[b] + 1))
            for b, mm in m.items()
        )
        want[doc_id] = w + len(bs) * (math.log(n_s + B) - math.log(n_t + B))

    got = {
        r.doc_id: (r.n_grams, r.log_weight)
        for r in dsir_importance_weights(docs).collect()
    }
    assert set(got) == set(want)
    for doc_id, (n_grams, lw) in got.items():
        assert n_grams == len(per_doc[doc_id][0])
        assert abs(lw - want[doc_id]) < 5.1e-7 + 1e-9 * abs(want[doc_id])
    # separation: the target slice scores higher on average
    en = [got[d][1] for d, (_bs, lang) in per_doc.items() if lang == "en"]
    other = [got[d][1] for d, (_bs, lang) in per_doc.items() if lang != "en"]
    assert sum(en) / len(en) > sum(other) / len(other)


def test_doulion_estimator_bound_and_identity(spark):
    """DOULION at p=1 reproduces the exact triangle count identically;
    at p=1/2 the unbiased estimate lands within the concentration
    bound for this fixture graph (Tsourakakis'09: relative error
    O(1/sqrt(p^3 T)) — generous 3x slack pinned)."""
    from sqlstreamstore_spark.analytics.graph import (
        supplier_cooccurrence_edges,
        triangle_count,
        triangle_count_doulion,
    )

    edges = supplier_cooccurrence_edges(load_table(spark, SF, "lineitem")).cache()
    exact = triangle_count(edges).collect()[0].n_triangles
    full = triangle_count_doulion(edges, p=1.0).collect()[0]
    assert full.n_triangles_sampled == exact
    assert full.n_triangles_est == float(exact)
    assert full.n_kept == full.n_edges

    half = triangle_count_doulion(edges, p=0.5).collect()[0]
    assert 0 < half.n_kept < half.n_edges
    assert half.n_triangles_est == half.n_triangles_sampled * 8.0
    assert exact > 0
    rel_bound = 3.0 / math.sqrt(0.5**3 * exact)
    assert abs(half.n_triangles_est - exact) <= max(rel_bound * exact, 8.0), (
        half.n_triangles_est,
        exact,
    )
    edges.unpersist()


def test_ivf_arrow_twins_match_literal_path(spark):
    """The Arrow GEMM assign/probe twins (the large-n_clusters path the
    N/list_size rule needs at 100x corpora) agree with the literal-
    expression path row-for-row on the real fixture."""
    from sqlstreamstore_spark.analytics.similarity import (
        _static_centroids,
        ivf_assign,
        ivf_assign_arrow,
        ivf_probe_lists,
        ivf_probe_lists_arrow,
    )

    emb = load_table(spark, SF, "embeddings")
    cents = _static_centroids(dim=64, n_clusters=32, seed=7)
    lit = {r.vec_id: r.cluster_id for r in ivf_assign(emb, cents).collect()}
    arw = {r.vec_id: r.cluster_id for r in ivf_assign_arrow(emb, cents).collect()}
    assert lit == arw

    plit = {
        (r.qid, r.probe_rank): r.pcid
        for r in ivf_probe_lists(emb, cents, n_probe=4).collect()
    }
    parw = {
        (r.qid, r.probe_rank): r.pcid
        for r in ivf_probe_lists_arrow(emb, cents, n_probe=4).collect()
    }
    assert plit == parw
    # qn parity (feeds the re-rank): same norm both paths
    qn_l = {r.qid: r.qn for r in ivf_probe_lists(emb, cents, n_probe=1).collect()}
    qn_a = {
        r.qid: r.qn for r in ivf_probe_lists_arrow(emb, cents, n_probe=1).collect()
    }
    assert set(qn_l) == set(qn_a)
    for q in qn_l:
        assert abs(qn_l[q] - qn_a[q]) < 1e-9


def test_knn_ivf_static_large_k_switches_to_arrow(spark):
    """Above IVF_LITERAL_MAX_CLUSTERS the batched ANN uses the Arrow
    twins (plan shows a python-worker exchange instead of a K-literal
    codegen tree) and still returns exactly k neighbors per query."""
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics.similarity import knn_join_ivf_static

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    out = knn_join_ivf_static(emb, q, k=3, n_clusters=80, n_probe=8)
    rows = out.collect()
    per_q = Counter(r.qid for r in rows)
    assert set(per_q) == set(range(8))
    assert all(v == 3 for v in per_q.values())
    assert all(r.cid != r.qid for r in rows)


def test_logreg_train_plan_is_lazy_broadcast_partial_agg(spark):
    """Plan gate: the T-step trainer is ONE lazy DAG — broadcast
    (1-row) weight joins, partial HashAggregates, no driver collect at
    construction, and the scan prunes to the three feature columns."""
    from test_plans import plan_of

    from sqlstreamstore_spark.analytics.pipeline import logreg_train_quality

    # the docs fixture caches documents; drop it so the assertion reads
    # the real parquet scan, not an InMemoryTableScan (runs last in
    # this module — later tests re-derive what they need)
    spark.catalog.clearCache()
    df = load_table(spark, SF, "documents")  # uncached: check pruning
    p = plan_of(logreg_train_quality(df))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "HashAggregate" in p
    # column pruning on at least one parquet scan: only text/lang/
    # n_chars feed the features (doc_id/source unused). The trainer
    # itself now reads the materialized feature barrier (r12 wave 10:
    # a lazy localCheckpoint, so its plan leaf is an ExistingRDD scan,
    # not the parquet scan) — the pruning property lives in the
    # feature projection's OWN plan, asserted here.
    from sqlstreamstore_spark.analytics.pipeline import _quality_features

    fp = plan_of(_quality_features(df))
    assert "doc_id" not in fp.split("ReadSchema")[1][:400]
