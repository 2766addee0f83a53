"""Round-6 operator family: PSI drift, Benford audit, RFM segmentation,
pairwise source JSD, TextRank keywords — each checked against an
independent numpy/pure-Python replication on the real fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sqlstreamstore_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ev(spark):
    df = load_table(spark, SF, "events").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def docs(spark):
    df = load_table(spark, SF, "documents").cache()
    df.count()
    return df


def test_psi_matches_numpy(ev):
    from sqlstreamstore_spark.analytics.drift import psi_drift

    a = [r.value for r in ev.filter("event_type = 'click' AND value IS NOT NULL").collect()]
    b = [r.value for r in ev.filter("event_type = 'purchase' AND value IS NOT NULL").collect()]
    got = psi_drift(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        "value",
    ).collect()[0]
    assert got.n_ref == len(a) and got.n_cur == len(b)
    # replicate: ref-quantile bounds at rank ceil(i/10 * N), strict >
    sa = sorted(a)
    bounds = [sa[math.ceil(i / 10 * len(sa)) - 1] for i in range(1, 10)]

    def bin_of(v):
        return sum(1 for x in bounds if v > x)

    from collections import Counter

    nr, nc = Counter(map(bin_of, a)), Counter(map(bin_of, b))
    bins = sorted(set(nr) | set(nc))
    psi = 0.0
    for bn in bins:
        p = (nr.get(bn, 0) + 0.5) / (len(a) + 5.0)
        q = (nc.get(bn, 0) + 0.5) / (len(b) + 5.0)
        psi += (q - p) * math.log(q / p)
    assert got.n_bins == len(bins)
    assert abs(got.psi - psi) < 1e-6
    # self-drift is ~0 (identical populations)
    self_psi = psi_drift(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "click"),
        "value",
    ).collect()[0].psi
    assert abs(self_psi) < 1e-9


def test_benford_matches_python(spark):
    from sqlstreamstore_spark.analytics.quality import benford_first_digit

    orders = load_table(spark, SF, "orders")
    rows = benford_first_digit(orders, "o_totalprice").collect()
    from collections import Counter
    from decimal import Decimal

    vals = [r.o_totalprice for r in orders.select("o_totalprice").collect()]
    digits = Counter(
        int(str(abs(int(Decimal(str(v)).quantize(Decimal("0.01")) * 100)))[0])
        for v in vals if v is not None and v > 0
    )
    got = {r.digit: r.n for r in rows}
    assert got == dict(digits)
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert abs(r.benford_share - round(math.log10(1 + 1 / r.digit), 6)) < 1e-9
        assert r.chi2_term >= 0


def test_rfm_scores_and_exact_metrics(ev):
    from sqlstreamstore_spark.analytics.events import rfm_segments

    rows = rfm_segments(ev).collect()
    base = [
        r for r in ev.select("user_id", "ts", "value").collect()
        if r.ts is not None and r.user_id is not None
    ]
    from collections import defaultdict

    freq = defaultdict(int)
    money = defaultdict(int)
    for r in base:
        freq[r.user_id] += 1
        money[r.user_id] += 0 if r.value is None else round(r.value * 100)
    by_user = {r.user_id: r for r in rows}
    assert set(by_user) == set(freq)
    for u, r in by_user.items():
        assert r.frequency == freq[u]
        assert r.monetary_cents == money[u]
        for s in (r.r_score, r.f_score, r.m_score):
            assert 1 <= s <= 5
        assert r.segment == r.r_score * 100 + r.f_score * 10 + r.m_score
    # equal metric values share a tile
    from itertools import combinations

    for a, b in combinations(by_user.values(), 2):
        if a.frequency == b.frequency:
            assert a.f_score == b.f_score


def test_jsd_bounds_and_identity(spark, docs):
    from sqlstreamstore_spark.analytics.text import js_divergence_by_source

    rows = js_divergence_by_source(docs).collect()
    assert len(rows) > 0
    for r in rows:
        assert -1e-9 <= r.jsd <= math.log(2) + 1e-9
    # identical distributions -> JSD exactly 0
    tiny = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "b", "x y z")],
        "doc_id long, source string, text string",
    )
    r = js_divergence_by_source(tiny).collect()[0]
    assert r.jsd == 0.0 and r.n_tokens_union == 3


def test_textrank_mass_and_structure(spark, docs):
    from sqlstreamstore_spark.analytics.text import textrank_keywords

    rows = textrank_keywords(docs, k=1000).collect()
    # undirected co-occurrence graph has no dangling nodes -> PageRank
    # mass is conserved across iterations
    assert abs(sum(r.score for r in rows) - 1.0) < 1e-3
    assert [r.rk for r in rows[:5]] == [1, 2, 3, 4, 5]
    # a hub word (appears in many co-occurrence pairs) must outrank a
    # word injected to appear exactly once
    tiny = spark.createDataFrame(
        [(1, "hub one two"), (2, "hub three four"), (3, "hub five rare")],
        "doc_id long, text string",
    )
    tr = {r.word: r.score for r in textrank_keywords(tiny, k=100).collect()}
    assert tr["hub"] == max(tr.values())


def test_sentence_dedup_matches_python(docs):
    from sqlstreamstore_spark.analytics.pipeline import sentence_dedup

    rows = {r.doc_id: r for r in sentence_dedup(docs, chunk_tokens=8).collect()}
    # pure-Python replication: global first-occurrence of each 8-token
    # chunk in (doc_id, pos) order, docs rebuilt from survivors
    texts = {
        r.doc_id: r.text for r in docs.select("doc_id", "text").collect()
    }
    first = {}
    chunks_by_doc = {}
    for did in sorted(texts):
        toks = texts[did].split(" ")
        n = (len(toks) + 7) // 8
        cs = [" ".join(toks[i * 8 : i * 8 + 8]) for i in range(n)]
        chunks_by_doc[did] = cs
        for pos, c in enumerate(cs):
            first.setdefault(c, (did, pos))
    assert set(rows) == set(texts)
    for did, cs in chunks_by_doc.items():
        kept = [c for pos, c in enumerate(cs) if first[c] == (did, pos)]
        r = rows[did]
        assert r.n_chunks == len(cs)
        assert r.n_kept == len(kept)
        assert r.kept_text == " ".join(kept)
    # every chunk survives exactly once corpus-wide
    total_kept = sum(r.n_kept for r in rows.values())
    assert total_kept == len(first)


def test_sentence_dedup_removes_boilerplate(spark):
    from sqlstreamstore_spark.analytics.pipeline import sentence_dedup

    boiler = "subscribe to our newsletter now"
    tiny = spark.createDataFrame(
        [
            (1, boiler + " alpha beta"),
            (2, boiler + " gamma delta"),
            (3, "unique words only here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in sentence_dedup(tiny, chunk_tokens=5).collect()}
    # doc 1 keeps the boilerplate (first occurrence); doc 2 loses it
    assert rows[1].kept_text.startswith(boiler)
    assert boiler not in rows[2].kept_text
    assert rows[2].kept_text == "gamma delta"
    assert rows[3].kept_text == "unique words only here"


def test_rule_violations_matches_python(spark):
    from sqlstreamstore_spark.analytics.quality import rule_violations

    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    got = {r.rule: r for r in rule_violations(orders, lineitem).collect()}
    od = {r.o_orderkey: r.o_orderdate for r in orders.collect()}
    li = lineitem.collect()
    joined = [r for r in li if r.l_orderkey in od]
    exp = {
        "ship_before_order": sum(
            1 for r in joined if r.l_shipdate < od[r.l_orderkey]
        ),
        "qty_nonpositive": sum(1 for r in joined if r.l_quantity <= 0),
        "discount_gt_7pct": sum(1 for r in joined if r.l_discount > 0.07),
        "tax_out_of_range": sum(
            1 for r in joined if r.l_tax < 0 or r.l_tax > 0.06
        ),
        "price_nonpositive": sum(1 for r in joined if r.l_extendedprice <= 0),
    }
    assert set(got) == set(exp)
    n = len(joined)
    for rule, cnt in exp.items():
        assert got[rule].n_violations == cnt
        assert got[rule].n_rows == n
        assert got[rule].rate == cnt / n
    # the fixture must exercise both zero and non-zero rules
    assert exp["ship_before_order"] > 0 and exp["discount_gt_7pct"] > 0
    assert exp["qty_nonpositive"] == 0 and exp["price_nonpositive"] == 0
