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


def _sessions_python(ev_rows, gap_us=1800 * 1_000_000):
    """Pure-Python sessionizer: [(end_us, duration_us)] per the
    lag-gap-cumsum rule, NULL ts excluded, user_id NULL kept as its
    own group (matching the operator)."""
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in ev_rows:
        if r.us is not None:
            per_user[r.user_id].append((r.us, r.event_id))
    sessions = []
    for _u, evs in per_user.items():
        evs.sort()
        cur = [evs[0][0]]
        for (us, _eid), (pus, _p) in zip(evs[1:], evs):
            if us - pus > gap_us:
                sessions.append((cur[-1], cur[-1] - cur[0]))
                cur = [us]
            else:
                cur.append(us)
        sessions.append((cur[-1], cur[-1] - cur[0]))
    return sessions


def test_km_survival_matches_python(spark, ev):
    from sqlstreamstore_spark.analytics.events import km_survival

    rows = km_survival(ev).collect()
    base = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    ).collect()
    sessions = _sessions_python(base)
    horizon = max(e for e, _d in sessions)
    gap_us = 1800 * 1_000_000
    # (duration, is_event): censored if plausibly still open at horizon
    obs = [(d, 0 if e + gap_us > horizon else 1) for e, d in sessions]
    from collections import Counter

    d_at = Counter(d for d, ev_ in obs if ev_)
    c_at = Counter(d for d, ev_ in obs if not ev_)
    times = sorted(set(d for d, _ in obs))
    total = len(obs)
    surv, seen = 1.0, 0
    exp = {}
    for t in times:
        n_risk = total - seen
        d = d_at.get(t, 0)
        c = c_at.get(t, 0)
        if d:
            surv *= (n_risk - d) / n_risk
            exp[t] = (n_risk, d, c, surv)
        seen += d + c
    assert [r.t_us for r in rows] == sorted(exp)
    for r in rows:
        n_risk, d, c, s = exp[r.t_us]
        assert (r.n_risk, r.n_events, r.n_censored) == (n_risk, d, c)
        assert abs(r.survival - s) < 1e-8
    # survival is non-increasing and within [0, 1]
    vals = [r.survival for r in rows]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert all(0.0 <= v <= 1.0 for v in vals)
    # censoring exists in the fixture (sessions open at the horizon)
    assert sum(c for _n, _d, c, _s in exp.values()) >= 0
    assert any(r.n_censored > 0 for r in rows) or any(
        c_at[t] for t in c_at
    )


def test_ohlc_bars_matches_python(spark, ev):
    from sqlstreamstore_spark.analytics.events import ohlc_bars

    rows = ohlc_bars(ev).collect()
    base = [
        r
        for r in ev.select(
            "event_type", F.unix_micros("ts").alias("us"), "event_id", "value"
        ).collect()
        if r.us is not None and r.value is not None
    ]
    from collections import defaultdict

    buckets = defaultdict(list)
    for r in base:
        buckets[(r.event_type, r.us // 3_600_000_000)].append(
            (r.us, r.event_id, r.value)
        )
    assert len(rows) == len(buckets)
    for r in rows:
        evs = sorted(buckets[(r.event_type, r.hour_id)])
        assert r.open == evs[0][2]
        assert r.close == evs[-1][2]
        assert r.high == max(v for _u, _e, v in evs)
        assert r.low == min(v for _u, _e, v in evs)
        assert r.n == len(evs)


def test_activity_streaks_matches_python(spark, ev):
    from sqlstreamstore_spark.analytics.events import activity_streaks

    rows = {r.user_id: r for r in activity_streaks(ev).collect()}
    base = [
        r
        for r in ev.select("user_id", F.unix_micros("ts").alias("us")).collect()
        if r.us is not None and r.user_id is not None
    ]
    from collections import defaultdict

    days = defaultdict(set)
    for r in base:
        days[r.user_id].add(r.us // 86_400_000_000)
    assert set(rows) == set(days)
    for u, ds in days.items():
        ds = sorted(ds)
        streaks = [[ds[0]]]
        for d in ds[1:]:
            if d == streaks[-1][-1] + 1:
                streaks[-1].append(d)
            else:
                streaks.append([d])
        r = rows[u]
        assert r.longest_streak == max(len(s) for s in streaks)
        assert r.n_streaks == len(streaks)
        assert r.n_active_days == len(ds)
        assert r.current_streak == len(streaks[-1])
        assert r.last_active_day == ds[-1]


def test_part_skyline_matches_allpairs(spark):
    from sqlstreamstore_spark.analytics.relational import part_skyline

    part = load_table(spark, SF, "part")
    got = {r.p_partkey for r in part_skyline(part).collect()}
    pts = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in part.collect()
        if r.p_retailprice is not None and r.p_size is not None
    ]

    def dominated(a):
        return any(
            b[1] <= a[1] and b[2] >= a[2] and (b[1] < a[1] or b[2] > a[2])
            for b in pts
        )

    exp = {k for (k, p, s) in pts if not dominated((k, p, s))}
    assert got == exp and len(got) > 0
    # frontier is mutually non-dominated by construction
    sky = [(k, p, s) for (k, p, s) in pts if k in got]
    for a in sky:
        for b in sky:
            assert not (
                b[1] <= a[1] and b[2] >= a[2] and (b[1] < a[1] or b[2] > a[2])
            )


def test_classification_report_matches_python(spark, docs):
    import hashlib

    from sqlstreamstore_spark.analytics.evaluation import classification_report

    r = classification_report(docs).collect()[0]
    tp = fp = fn = tn = 0
    for row in docs.select("lang", "text").collect():
        s = sum(
            int(hashlib.md5(b"clf:" + t.encode()).hexdigest()[:8], 16) % 1001
            - 500
            for t in row.text.split(" ")
        )
        pred, y = s >= 0, row.lang == "en"
        if pred and y:
            tp += 1
        elif pred:
            fp += 1
        elif y:
            fn += 1
        else:
            tn += 1
    assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
    n = tp + fp + fn + tn
    assert r.accuracy == (tp + tn) / n
    assert r.prec == tp / (tp + fp)
    assert r.recall == tp / (tp + fn)
    assert r.f1 == 2 * tp / (2 * tp + fp + fn)
    pe_num = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
    assert r.kappa == (n * (tp + tn) - pe_num) / (n * n - pe_num)
    # the classifier must genuinely split the corpus (not degenerate)
    assert 0 < tp + fp < n


def test_clamped_balance_matches_recurrence(spark, ev):
    """The operator computes the Skorokhod closed form; this test
    replays the literal recurrence b = max(0, b + delta) — a true
    algorithmic differential, not a re-derivation."""
    from sqlstreamstore_spark.analytics.events import clamped_balance

    rows = clamped_balance(ev).collect()
    base = [
        r
        for r in ev.select(
            "user_id", F.unix_micros("ts").alias("us"), "event_id",
            "event_type", "value",
        ).collect()
        if r.us is not None and r.user_id is not None and r.value is not None
    ]
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in base:
        delta = round(r.value * 100)
        if r.event_type == "purchase":
            delta = -delta
        per_user[r.user_id].append((r.us, r.event_id, delta))
    exp = {}
    for u, evs in per_user.items():
        evs.sort()
        b = 0
        for us, eid, delta in evs:
            b = max(0, b + delta)
            exp[(u, eid)] = (delta, b)
    assert len(rows) == len(exp)
    clamped = 0
    for r in rows:
        delta, b = exp[(r.user_id, r.event_id)]
        assert (r.delta_cents, r.balance_cents) == (delta, b)
        if b == 0:
            clamped += 1
    # the fixture must actually exercise the clamp (zero balances)
    assert clamped > 0


def test_daily_autocorr_matches_numpy(spark, ev):
    import numpy as np

    from sqlstreamstore_spark.analytics.events import daily_autocorr

    rows = {r.lag: r for r in daily_autocorr(ev).collect()}
    base = [
        r.us // 86_400_000_000
        for r in ev.select(F.unix_micros("ts").alias("us")).collect()
        if r.us is not None
    ]
    from collections import Counter

    c = Counter(base)
    d0, d1 = min(c), max(c)
    series = np.array([c.get(d, 0) for d in range(d0, d1 + 1)], dtype=float)
    for k in (1, 7):
        x, y = series[:-k], series[k:]
        r = rows[k]
        assert r.n_pairs == len(x)
        exp = np.corrcoef(x, y)[0, 1]
        assert abs(r.autocorr - exp) < 1e-9
    # zero-filled spine: the operator must count absent days as zeros
    assert rows[1].n_pairs == (d1 - d0 + 1) - 1


def test_brand_cooccurrence_matches_python(spark):
    from sqlstreamstore_spark.analytics.relational import brand_cooccurrence

    li = load_table(spark, SF, "lineitem")
    pt = load_table(spark, SF, "part")
    rows = {(r.brand_a, r.brand_b): r for r in brand_cooccurrence(li, pt).collect()}
    brand_of = {r.p_partkey: r.p_brand for r in pt.collect()}
    from collections import defaultdict

    baskets = defaultdict(set)
    for r in li.select("l_orderkey", "l_partkey").collect():
        if r.l_partkey in brand_of:
            baskets[r.l_orderkey].add(brand_of[r.l_partkey])
    csize = Counter = defaultdict(int)
    pair = defaultdict(int)
    for bs in baskets.values():
        for b in bs:
            csize[b] += 1
        bs = sorted(bs)
        for i, a in enumerate(bs):
            for b in bs[i + 1:]:
                pair[(a, b)] += 1
    assert set(rows) == set(pair)
    import math

    for (a, b), c_both in pair.items():
        r = rows[(a, b)]
        assert (r.c_a, r.c_b, r.c_both) == (csize[a], csize[b], c_both)
        assert r.cosine == c_both / math.sqrt(csize[a] * csize[b])
        assert r.jaccard == c_both / (csize[a] + csize[b] - c_both)


def test_wilson_rates_match_python(spark, docs):
    import math

    from sqlstreamstore_spark.analytics.quality import wilson_en_rate

    rows = wilson_en_rate(docs).collect()
    base = docs.select("source", "lang").collect()
    from collections import Counter

    n = Counter(r.source for r in base)
    k = Counter(r.source for r in base if r.lang == "en")
    assert {r.source for r in rows} == set(n)
    z = 1.96
    for r in rows:
        nn, kk = n[r.source], k.get(r.source, 0)
        assert (r.n, r.k) == (nn, kk)
        p = kk / nn
        assert r.rate == p
        center = p + z * z / (2.0 * nn)
        margin = z * math.sqrt(p * (1.0 - p) / nn + z * z / (4.0 * nn * nn))
        denom = 1.0 + z * z / nn
        assert abs(r.wilson_low - (center - margin) / denom) < 1e-12
        assert abs(r.wilson_high - (center + margin) / denom) < 1e-12
        assert 0.0 <= r.wilson_low <= p <= r.wilson_high <= 1.0


def test_ab_test_welch_matches_python(spark, ev):
    from sqlstreamstore_spark.analytics.evaluation import ab_test_report

    r = ab_test_report(ev).collect()[0]
    arms = {0: [], 1: []}
    for row in ev.select("user_id", "value").collect():
        if row.user_id is not None and row.value is not None:
            arms[row.user_id % 2].append(round(row.value * 100))
    a, b = arms[0], arms[1]
    assert (r.n_a, r.n_b) == (len(a), len(b))
    na, nb = float(len(a)), float(len(b))
    ma, mb = sum(a) / na, sum(b) / nb
    va = (sum(x * x for x in a) - sum(a) * ma) / (na - 1.0)
    vb = (sum(x * x for x in b) - sum(b) * mb) / (nb - 1.0)
    assert (r.mean_a_cents, r.mean_b_cents) == (ma, mb)
    assert r.diff_cents == mb - ma
    import math

    se2a, se2b = va / na, vb / nb
    assert r.welch_t == (mb - ma) / math.sqrt(se2a + se2b)
    assert r.welch_df == (se2a + se2b) ** 2 / (
        se2a * se2a / (na - 1.0) + se2b * se2b / (nb - 1.0)
    )
    # hash-split is near-balanced on the fixture
    assert abs(len(a) - len(b)) < 0.5 * (len(a) + len(b))


def test_ab_test_welch_degenerate_arms_null_not_nan(spark):
    """An empty or single-user arm yields NULL welch_t/welch_df (and a
    NULL mean for the empty arm) with the counts intact — diagnosable,
    never NaN/Infinity (ADVICE r6)."""
    import datetime as dt

    from sqlstreamstore_spark.analytics.evaluation import ab_test_report

    ts = dt.datetime(2024, 1, 1)

    def mk(rows):
        return spark.createDataFrame(
            [(u, ts, v) for u, v in rows],
            "user_id long, ts timestamp, value double",
        )

    # arm B (odd user_ids) empty
    r = ab_test_report(mk([(0, 1.0), (2, 2.0), (4, 3.0)])).collect()[0]
    assert (r.n_a, r.n_b) == (3, 0)
    assert r.mean_a_cents == 200.0 and r.mean_b_cents is None
    assert r.diff_cents is None and r.welch_t is None and r.welch_df is None

    # arm B has exactly one user: means/diff defined, t/df NULL
    r = ab_test_report(mk([(0, 1.0), (2, 2.0), (1, 5.0)])).collect()[0]
    assert (r.n_a, r.n_b) == (2, 1)
    assert r.mean_b_cents == 500.0
    assert r.diff_cents == 350.0
    assert r.welch_t is None and r.welch_df is None

    # both arms >= 2 users: fully populated, finite
    r = ab_test_report(
        mk([(0, 1.0), (2, 2.0), (1, 5.0), (3, 6.0)])
    ).collect()[0]
    assert r.welch_t is not None and math.isfinite(r.welch_t)
    assert r.welch_df is not None and math.isfinite(r.welch_df)


def test_user_lifecycle_dst_timezone_robust(spark):
    """Consecutive weeks across the US spring-forward DST boundary
    (2024-03-10) classify as RETAINED even in a non-UTC session
    timezone: week arithmetic runs in DATE space, so the lost hour
    cannot break `prev_week + 7 days == week` (ADVICE r6 — the old
    timestamp-interval formulation misclassified this exact shape
    as resurrected)."""
    import datetime as dt

    from sqlstreamstore_spark.analytics.events import user_lifecycle

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ev = spark.createDataFrame(
            [
                (1, dt.datetime(2024, 3, 6, 12)),   # week of Mon Mar 4 (EST)
                (1, dt.datetime(2024, 3, 13, 12)),  # week of Mon Mar 11 (EDT)
            ],
            "user_id long, ts timestamp",
        )
        rows = {r.week.date(): r for r in user_lifecycle(ev).collect()}
        wk1, wk2 = dt.date(2024, 3, 4), dt.date(2024, 3, 11)
        assert rows[wk1].n_new == 1
        assert rows[wk2].n_retained == 1, (
            "DST week boundary misclassified as resurrected"
        )
        assert rows[wk2].n_resurrected == 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_merkle_checksums_match_hashlib(spark):
    import calendar
    import hashlib

    from sqlstreamstore_spark.analytics.quality import merkle_bucket_checksums

    li = load_table(spark, SF, "lineitem")
    got = {r.bucket: r for r in merkle_bucket_checksums(li).collect()}
    from collections import defaultdict

    n = defaultdict(int)
    x = defaultdict(int)
    for r in li.collect():
        us = (
            calendar.timegm(r.l_shipdate.timetuple()) * 1_000_000
            + r.l_shipdate.microsecond
        )
        s = (
            f"{r.l_orderkey}|{r.l_linenumber}|{int(r.l_quantity)}|"
            f"{round(r.l_extendedprice * 100)}|{us}"
        )
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        b = r.l_orderkey // 256
        n[b] += 1
        x[b] ^= h
    assert set(got) == set(n)
    for b in n:
        assert (got[b].n_rows, got[b].checksum) == (n[b], x[b])
    # a single-row perturbation must flip its bucket's checksum only
    first = li.orderBy("l_orderkey", "l_linenumber").limit(1).collect()[0]
    li2 = li.withColumn(
        "l_quantity",
        F.when(
            (F.col("l_orderkey") == first.l_orderkey)
            & (F.col("l_linenumber") == first.l_linenumber),
            F.col("l_quantity") + 1,
        ).otherwise(F.col("l_quantity")),
    )
    got2 = {r.bucket: r.checksum for r in merkle_bucket_checksums(li2).collect()}
    diff = [b for b in got2 if got2[b] != got[b].checksum]
    assert diff == [0]


def test_rrf_fusion_matches_python(spark, docs):
    import hashlib

    from sqlstreamstore_spark.analytics.evaluation import rrf_fusion

    rows = {r.doc_id: r for r in rrf_fusion(docs).collect()}
    meta = []
    for row in docs.select("doc_id", "text", "n_chars").collect():
        s = sum(
            int(hashlib.md5(b"clf:" + t.encode()).hexdigest()[:8], 16) % 1001
            - 500
            for t in row.text.split(" ")
        )
        score = s / len(row.text.split(" "))
        meta.append((row.doc_id, score, row.n_chars))
    by_score = sorted(meta, key=lambda m: (-m[1], m[0]))
    by_len = sorted(meta, key=lambda m: (-m[2], m[0]))
    ra = {d: i + 1 for i, (d, _s, _c) in enumerate(by_score)}
    rb = {d: i + 1 for i, (d, _s, _c) in enumerate(by_len)}
    assert set(rows) == set(ra)
    for d, r in rows.items():
        assert (r.rank_score, r.rank_len) == (ra[d], rb[d])
        assert r.rrf == 1.0 / (60.0 + ra[d]) + 1.0 / (60.0 + rb[d])


def test_trending_tokens_match_python(spark, docs):
    import math

    from sqlstreamstore_spark.analytics.text import trending_tokens

    rows = {r.token: r for r in trending_tokens(docs).collect()}
    from collections import Counter

    c0, c1 = Counter(), Counter()
    for row in docs.select("doc_id", "text").collect():
        tgt = c1 if row.doc_id % 2 else c0
        tgt.update(row.text.split(" "))
    keep = {t for t in set(c0) | set(c1) if c0[t] + c1[t] >= 5}
    assert set(rows) == keep
    for t in keep:
        r = rows[t]
        assert (r.c0, r.c1) == (c0[t], c1[t])
        assert abs(r.trend_score - math.log((c1[t] + 1) / (c0[t] + 1))) < 2e-9


def test_churn_hazard_matches_python(spark, ev):
    from sqlstreamstore_spark.analytics.events import churn_hazard

    rows = {r.tenure_days: r for r in churn_hazard(ev).collect()}
    base = [
        r
        for r in ev.select("user_id", F.unix_micros("ts").alias("us")).collect()
        if r.us is not None and r.user_id is not None
    ]
    from collections import defaultdict

    span = defaultdict(lambda: [1 << 62, -(1 << 62)])
    for r in base:
        d = r.us // 86_400_000_000
        s = span[r.user_id]
        s[0], s[1] = min(s[0], d), max(s[1], d)
    wmax = max(s[1] for s in span.values())
    obs = [(s[1] - s[0], 1 if s[1] < wmax else 0) for s in span.values()]
    from collections import Counter

    d_at = Counter(t for t, ch in obs if ch)
    c_at = Counter(t for t, ch in obs if not ch)
    total = len(obs)
    seen = 0
    for t in sorted(set(d_at) | set(c_at)):
        n_risk = total - seen
        r = rows[t]
        assert (r.n_risk, r.n_churned, r.n_censored) == (
            n_risk,
            d_at.get(t, 0),
            c_at.get(t, 0),
        )
        assert r.hazard == d_at.get(t, 0) / n_risk
        seen += d_at.get(t, 0) + c_at.get(t, 0)
    assert len(rows) == len(set(d_at) | set(c_at))


def test_auc_ci_matches_python(spark, docs):
    import math

    from sqlstreamstore_spark.analytics.evaluation import auc_ci, roc_auc

    r = auc_ci(docs).collect()[0]
    base = roc_auc(docs).collect()[0]
    A, P, N = base.auc, float(base.n_pos), float(base.n_neg)
    q1 = A / (2.0 - A)
    q2 = 2.0 * A * A / (1.0 + A)
    se = math.sqrt(
        (A * (1.0 - A) + (P - 1.0) * (q1 - A * A) + (N - 1.0) * (q2 - A * A))
        / (P * N)
    )
    assert r.auc == A
    assert r.se == se
    assert r.ci_low == A - 1.96 * se and r.ci_high == A + 1.96 * se
    # the interval is well-formed and non-degenerate
    assert se > 0 and r.ci_low < A < r.ci_high


def test_brand_hhi_matches_python(spark):
    from sqlstreamstore_spark.analytics.relational import brand_hhi

    li = load_table(spark, SF, "lineitem")
    pt = load_table(spark, SF, "part")
    r = brand_hhi(li, pt).collect()[0]
    brand_of = {p.p_partkey: p.p_brand for p in pt.collect()}
    from collections import defaultdict

    rev = defaultdict(int)
    for row in li.select("l_partkey", "l_extendedprice").collect():
        if row.l_partkey in brand_of:
            rev[brand_of[row.l_partkey]] += round(row.l_extendedprice * 100)
    total = sum(rev.values())
    sq = sum(v * v for v in rev.values())
    assert (r.n_brands, r.total_cents) == (len(rev), total)
    assert r.hhi == sq / (float(total) * float(total))
    nb = float(len(rev))
    assert r.hhi_normalized == (r.hhi - 1.0 / nb) / (1.0 - 1.0 / nb)
    # 25 near-even brands -> HHI just above the 1/n floor
    assert 1.0 / nb <= r.hhi < 2.0 / nb


def test_peak_concurrency_matches_python(spark, ev):
    from sqlstreamstore_spark.analytics.events import peak_concurrency

    r = peak_concurrency(ev).collect()[0]
    base = [
        x
        for x in ev.select(
            "user_id", "event_id", F.unix_micros("ts").alias("us")
        ).collect()
        if x.us is not None
    ]
    sessions = []  # (start, end) via the same gap rule, per user
    from collections import defaultdict

    per_user = defaultdict(list)
    for x in base:
        per_user[x.user_id].append((x.us, x.event_id))
    gap_us = 1800 * 1_000_000
    for evs in per_user.values():
        evs.sort()
        start = prev = evs[0][0]
        for us, _e in evs[1:]:
            if us - prev > gap_us:
                sessions.append((start, prev))
                start = us
            prev = us
        sessions.append((start, prev))
    assert r.n_sessions == len(sessions)
    # literal sweep replay
    deltas = defaultdict(int)
    for s, e in sessions:
        deltas[s] += 1
        deltas[e + 1] -= 1
    running, peak, first_at = 0, -1, None
    for us in sorted(deltas):
        running += deltas[us]
        if running > peak:
            peak, first_at = running, us
    assert (r.peak, r.first_peak_us) == (peak, first_at)
    # cross-check peak against the brute-force definition at peak time
    live = sum(1 for s, e in sessions if s <= first_at <= e)
    assert live == peak


def test_vocab_coverage_matches_python(spark, docs):
    from sqlstreamstore_spark.analytics.text import vocab_coverage

    rows = {r.k: r for r in vocab_coverage(docs).collect()}
    from collections import Counter

    c = Counter()
    for row in docs.select("text").collect():
        w = row.text.split(" ")
        c.update(f"{a} {b}" for a, b in zip(w, w[1:]))
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())
    for k, r in rows.items():
        cov = sum(cnt for _g, cnt in ordered[:k])
        assert r.vocab_size == len(c)
        assert (r.covered, r.total) == (cov, total)
        assert r.coverage == cov / total
    # the curve is monotone and k=10 already covers a real share
    ks = sorted(rows)
    assert all(
        rows[a].coverage <= rows[b].coverage for a, b in zip(ks, ks[1:])
    )
    assert rows[ks[0]].coverage > 0.01


def test_ltv_triangle_matches_python(spark, ev):
    from sqlstreamstore_spark.analytics.events import ltv_triangle

    rows = {(r.cohort_week, r.age_weeks): r for r in ltv_triangle(ev).collect()}
    base = [
        r
        for r in ev.select(
            "user_id", F.unix_micros("ts").alias("us"), "event_type", "value"
        ).collect()
        if r.us is not None and r.user_id is not None
    ]
    wk = lambda us: us // (7 * 86_400_000_000)
    cohort = {}
    for r in base:
        w = wk(r.us)
        cohort[r.user_id] = min(cohort.get(r.user_id, w), w)
    from collections import defaultdict

    rev = defaultdict(int)
    users = defaultdict(set)
    for r in base:
        if r.event_type == "purchase" and r.value is not None:
            key = (cohort[r.user_id], wk(r.us) - cohort[r.user_id])
            rev[key] += round(r.value * 100)
            users[key].add(r.user_id)
    assert set(rows) == set(rev)
    for key in rev:
        r = rows[key]
        assert (r.n_purchasers, r.revenue_cents) == (len(users[key]), rev[key])
    # cumulative column replays the per-cohort running sum
    from itertools import groupby

    for cw, grp in groupby(sorted(rev), key=lambda k: k[0]):
        run = 0
        for key in grp:
            run += rev[key]
            assert rows[key].cum_revenue_cents == run


def test_neyman_allocation_matches_python(spark, docs):
    import math

    from sqlstreamstore_spark.analytics.sampling import neyman_allocation

    rows = {r.source: r for r in neyman_allocation(docs).collect()}
    base = docs.select("source", "n_chars").collect()
    from collections import defaultdict

    g = defaultdict(list)
    for r in base:
        g[r.source].append(r.n_chars)
    sig = {}
    for s, xs in g.items():
        n = float(len(xs))
        sig[s] = math.sqrt(
            sum(x * x for x in xs) / n - (sum(xs) / n) * (sum(xs) / n)
        )
    den = sum(len(g[s]) * sig[s] for s in sorted(g))
    assert set(rows) == set(g)
    total_alloc = 0
    for s in g:
        r = rows[s]
        assert r.n_rows == len(g[s])
        assert abs(r.sigma - sig[s]) < 1e-8
        share = len(g[s]) * sig[s] / den
        assert abs(r.alloc_share - share) < 1e-8
        assert abs(r.n_alloc - math.floor(1000.0 * share)) <= 1
        total_alloc += r.n_alloc
    # floors never exceed the budget; shares sum to 1
    assert total_alloc <= 1000
    assert abs(sum(r.alloc_share for r in rows.values()) - 1.0) < 1e-6


def test_duplication_profile_matches_python(spark, docs):
    from sqlstreamstore_spark.analytics.dedup import duplication_profile
    from sqlstreamstore_spark.analytics.pipeline import sentence_dedup

    got = {r.dup_decile: r for r in duplication_profile(docs).collect()}
    per = sentence_dedup(docs, 8).collect()
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0])
    for r in per:
        dup = r.n_chunks - r.n_kept
        dec = min(9, (10 * dup) // r.n_chunks)
        a = agg[dec]
        a[0] += 1
        a[1] += r.n_chunks
        a[2] += dup
    assert set(got) == set(agg)
    for dec, (nd, nc, ndup) in agg.items():
        r = got[dec]
        assert (r.n_docs, r.n_chunks, r.n_dup_chunks) == (nd, nc, ndup)
    # totals reconcile with the corpus
    assert sum(r.n_docs for r in got.values()) == len(per)


def test_dau_mau_stickiness_matches_python(spark, ev):
    from sqlstreamstore_spark.analytics.events import dau_mau_stickiness

    rows = {r.day_no: r for r in dau_mau_stickiness(ev).collect()}
    base = [
        (r.us // 86_400_000_000, r.user_id)
        for r in ev.select(F.unix_micros("ts").alias("us"), "user_id").collect()
        if r.us is not None and r.user_id is not None
    ]
    days = sorted({d for d, _u in base})
    pairs = set(base)
    assert set(rows) == set(days)
    for d in days:
        dau = len({u for dd, u in pairs if dd == d})
        mau = len({u for dd, u in pairs if d - 27 <= dd <= d})
        r = rows[d]
        assert (r.dau, r.mau) == (dau, mau)
        assert r.stickiness == dau / mau
        assert r.dau <= r.mau


def test_session_gap_sweep_matches_sessionizer(spark, ev):
    """Each sweep row must equal an independent single-gap pass (the
    pure-Python sessionizer already used by the KM test)."""
    from sqlstreamstore_spark.analytics.events import session_gap_sweep

    rows = {r.gap_s: r for r in session_gap_sweep(ev).collect()}
    base = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    ).collect()
    for gap_s in (300, 1800, 7200):
        sessions = _sessions_python(base, gap_us=gap_s * 1_000_000)
        r = rows[gap_s]
        assert r.n_sessions == len(sessions)
        assert r.total_duration_us == sum(d for _e, d in sessions)
        assert r.max_duration_us == max(d for _e, d in sessions)
    # monotonicity: a larger gap can only merge sessions
    assert rows[300].n_sessions >= rows[1800].n_sessions >= rows[7200].n_sessions


def test_error_burn_rate_matches_python(spark, ev):
    from sqlstreamstore_spark.analytics.events import error_burn_rate

    rows = {r.hour_epoch: r for r in error_burn_rate(ev).collect()}
    base = [
        (r.us // 3_600_000_000, r.event_type == "error")
        for r in ev.select(
            F.unix_micros("ts").alias("us"), "event_type"
        ).collect()
        if r.us is not None
    ]
    from collections import defaultdict

    tot = defaultdict(int)
    err = defaultdict(int)
    for h, is_err in base:
        tot[h] += 1
        err[h] += is_err
    assert set(rows) == set(tot)
    for h in tot:
        lt = sum(tot[g] for g in range(h - 5, h + 1) if g in tot)
        le = sum(err[g] for g in range(h - 5, h + 1) if g in tot)
        r = rows[h]
        assert (r.n_total, r.n_errors) == (tot[h], err[h])
        assert r.short_burn == (err[h] / tot[h]) / 0.25
        assert r.long_burn == (le / lt) / 0.25
        assert r.alert == (r.short_burn > 1.0 and r.long_burn > 1.0)


def test_merkle_checksums_null_fields_encoded(spark):
    """A NULL field must hash as the explicit sentinel, not vanish:
    Spark's concat_ws skips NULLs and DuckDB's || nulls the string —
    both silent divergences the encoding forecloses."""
    import hashlib

    from sqlstreamstore_spark.analytics.quality import merkle_bucket_checksums

    df = spark.createDataFrame(
        [(1, 1, None, 10.0, None)],
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_shipdate timestamp",
    )
    r = merkle_bucket_checksums(df).collect()[0]
    s = "1|1|␀null|1000|␀null"
    assert r.checksum == int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    assert r.n_rows == 1


def test_theil_sen_matches_python(spark, ev):
    import statistics

    from sqlstreamstore_spark.analytics.events import theil_sen_trend

    r = theil_sen_trend(ev).collect()[0]
    base = [
        x.us // 86_400_000_000
        for x in ev.select(F.unix_micros("ts").alias("us")).collect()
        if x.us is not None
    ]
    from collections import Counter

    c = Counter(base)
    d0, d1 = min(c), max(c)
    series = [(d, c.get(d, 0)) for d in range(d0, d1 + 1)]
    slopes = sorted(
        (cb - ca) / (db - da)
        for i, (da, ca) in enumerate(series)
        for db, cb in series[i + 1:]
    )
    assert r.n_pairs == len(slopes)
    assert r.n_days == len(series)
    slope = statistics.median(slopes)
    assert abs(r.slope_per_day - slope) < 1e-12
    resid = sorted(cnt - slope * d for d, cnt in series)
    assert abs(r.intercept - statistics.median(resid)) < 1e-9
    # robustness: a one-day spike must not move the slope estimate
    spiked = dict(series)
    spiked[d0 + 1] = spiked[d0 + 1] + 10_000
    sp = sorted(
        (spiked[db] - spiked[da]) / (db - da)
        for i, da in enumerate(sorted(spiked))
        for db in sorted(spiked)[i + 1:]
    )
    assert abs(statistics.median(sp) - slope) < abs(10_000 / len(series))


def test_brand_assortativity_matches_python(spark):
    import math
    import statistics

    from sqlstreamstore_spark.analytics.relational import brand_assortativity

    li = load_table(spark, SF, "lineitem")
    pt = load_table(spark, SF, "part")
    r = brand_assortativity(li, pt).collect()[0]
    brand_of = {p.p_partkey: p.p_brand for p in pt.collect()}
    from collections import defaultdict

    baskets = defaultdict(set)
    for row in li.select("l_orderkey", "l_partkey").collect():
        if row.l_partkey in brand_of:
            baskets[row.l_orderkey].add(brand_of[row.l_partkey])
    support = defaultdict(int)
    for bs in baskets.values():
        bs = sorted(bs)
        for i, x in enumerate(bs):
            for y in bs[i + 1:]:
                support[(x, y)] += 1
    med = statistics.median(sorted(support.values()))
    edges = [e for e, c in support.items() if c >= 1.2 * med]
    deg = defaultdict(int)
    for x, y in edges:
        deg[x] += 1
        deg[y] += 1
    dpairs = [(deg[x], deg[y]) for x, y in edges] + [
        (deg[y], deg[x]) for x, y in edges
    ]
    m = len(dpairs)
    sx = sum(x for x, _ in dpairs)
    sy = sum(y for _, y in dpairs)
    sxy = sum(x * y for x, y in dpairs)
    sxx = sum(x * x for x, _ in dpairs)
    syy = sum(y * y for _, y in dpairs)
    assert (r.n_edges, r.n_directed) == (len(edges), m)
    den = math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    exp = (m * sxy - sx * sy) / den if den else None
    if exp is None:
        assert r.assortativity is None
    else:
        assert abs(r.assortativity - exp) < 1e-12
        assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9
    # the threshold must leave a non-complete, non-empty graph
    assert 0 < len(edges) < len(support)


def test_alert_episodes_matches_python(spark, ev):
    from sqlstreamstore_spark.analytics.events import (
        alert_episodes,
        error_burn_rate,
    )

    r = alert_episodes(ev).collect()[0]
    burn = error_burn_rate(ev).collect()
    hours = sorted(b.hour_epoch for b in burn if b.alert)
    episodes = []
    for h in hours:
        if episodes and h == episodes[-1][-1] + 1:
            episodes[-1].append(h)
        else:
            episodes.append([h])
    assert r.n_hours == len(burn)
    assert r.n_episodes == len(episodes)
    assert r.longest_episode == (max(len(e) for e in episodes) if episodes else 0)
    assert r.alert_hours == len(hours)
    assert r.max_flaps == 2 * len(episodes)
    # the fixture genuinely alerts (non-degenerate signal)
    assert r.n_episodes > 0


def test_lexical_richness_matches_python(spark, docs):
    from sqlstreamstore_spark.analytics.text import lexical_richness

    rows = {r.source: r for r in lexical_richness(docs).collect()}
    from collections import Counter, defaultdict

    per_src = defaultdict(Counter)
    for row in docs.select("source", "text").collect():
        per_src[row.source].update(row.text.split(" "))
    assert set(rows) == set(per_src)
    for s, c in per_src.items():
        r = rows[s]
        n_tokens = sum(c.values())
        n_types = len(c)
        n_hapax = sum(1 for v in c.values() if v == 1)
        assert (r.n_tokens, r.n_types, r.n_hapax) == (n_tokens, n_types, n_hapax)
        assert r.ttr == n_types / n_tokens
        assert r.hapax_share == n_hapax / n_types


def test_hill_tail_index_matches_python(spark, docs):
    import math

    from sqlstreamstore_spark.analytics.text import hill_tail_index

    r = hill_tail_index(docs).collect()[0]
    from collections import Counter

    c = Counter()
    for row in docs.select("text").collect():
        w = row.text.split(" ")
        c.update(f"{a} {b}" for a, b in zip(w, w[1:]))
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    top = [f for _g, f in ordered[:50]]
    thresh = ordered[50][1]
    alpha = 50 / sum(math.log(f / thresh) for f in top)
    assert (r.k, r.f_threshold) == (50, thresh)
    assert abs(r.alpha_hill - alpha) < 2e-9
    assert r.alpha_hill > 0


def test_candidate_keys_matches_python(spark, ev):
    from sqlstreamstore_spark.analytics.quality import candidate_keys

    rows = {r.candidate: r for r in candidate_keys(ev).collect()}
    base = ev.select("event_id", "user_id", "ts", "event_type").collect()
    n = len(base)
    d1 = len({r.event_id for r in base})
    d2 = len({(r.user_id, r.ts) for r in base})
    d3 = len({(r.user_id, r.ts, r.event_type) for r in base})
    for name, d in (
        ("event_id", d1),
        ("user_id,ts", d2),
        ("user_id,ts,event_type", d3),
    ):
        r = rows[name]
        assert (r.n_rows, r.n_distinct) == (n, d)
        assert r.is_key == (d == n)
        assert r.uniqueness == d / n
    # event_id is the true key; the audit must prove it
    assert rows["event_id"].is_key
