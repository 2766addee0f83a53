"""Property-based differentials for the round-6 operators: the
sweep-line backlog, exact ROC-AUC, activity Gini, lifecycle growth
accounting, and basket association rules must agree with independent
pure-Python twins on arbitrary inputs (examples kept small so each
Spark job stays fast)."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _day(n: int) -> dt.datetime:
    return dt.datetime(1995, 1, 1) + dt.timedelta(days=n)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ivs=st.lists(
        st.tuples(st.integers(0, 60), st.integers(1, 30)),  # (open day, len)
        min_size=1,
        max_size=30,
    )
)
def test_backlog_sweepline_random_intervals(spark, ivs):
    """Sweep-line == naive interval stabbing at every emitted day, and
    opened/shipped totals conserve."""
    from sqlstreamstore_spark.analytics.relational import open_lineitem_backlog

    orders = spark.createDataFrame(
        [(i, _day(o)) for i, (o, _l) in enumerate(ivs)],
        "o_orderkey long, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [(i, _day(o + l)) for i, (o, l) in enumerate(ivs)],
        "l_orderkey long, l_shipdate timestamp",
    )
    rows = open_lineitem_backlog(orders, lineitem).collect()
    for r in rows:
        d = r.day.date()
        want = sum(1 for o, l in ivs if _day(o).date() <= d < _day(o + l).date())
        assert r.open_backlog == want, (d, r.open_backlog, want)
    assert sum(r.n_opened for r in rows) == sum(r.n_shipped for r in rows) == len(ivs)
    assert rows[-1].open_backlog == 0


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.tuples(
            st.lists(st.sampled_from("abcdef"), min_size=1, max_size=6),  # tokens
            st.booleans(),  # positive label
        ),
        min_size=2,
        max_size=40,
    ).filter(lambda d: any(y for _t, y in d) and any(not y for _t, y in d))
)
def test_roc_auc_random_corpora(spark, docs):
    """Rank-sum AUC == O(P·N) literal AUC on random token corpora with
    heavy score ties."""
    import hashlib

    from sqlstreamstore_spark.analytics.evaluation import roc_auc

    df = spark.createDataFrame(
        [(i, " ".join(t), "en" if y else "de") for i, (t, y) in enumerate(docs)],
        "doc_id long, text string, lang string",
    )
    got = roc_auc(df).collect()[0]

    def score(toks):
        return sum(
            int(hashlib.md5(f"clf:{t}".encode()).hexdigest()[:8], 16) % 1001 - 500
            for t in toks
        ) / len(toks)

    pos = [score(t) for t, y in docs if y]
    neg = [score(t) for t, y in docs if not y]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(got.auc - want) < 1e-12
    assert 0.0 <= got.auc <= 1.0


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(counts=st.lists(st.integers(1, 50), min_size=1, max_size=30))
def test_gini_random_activity(spark, counts):
    """Gini == literal rank formula; 0 for uniform activity; bounded."""
    from sqlstreamstore_spark.analytics.events import power_users_gini

    rows = [(u, i) for u, c in enumerate(counts) for i in range(c)]
    ev = spark.createDataFrame(rows, "user_id long, event_id long")
    got = power_users_gini(ev).collect()[0]
    xs = sorted(counts)
    n = len(xs)
    want = 2.0 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * sum(xs)) - (n + 1) / n
    assert abs(got.gini - want) < 1e-12
    assert 0.0 <= got.gini < 1.0
    if len(set(counts)) == 1:
        assert abs(got.gini) < 1e-12


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pres=st.lists(
        st.tuples(st.integers(0, 5), st.sets(st.integers(0, 8), min_size=1, max_size=6)),
        min_size=1,
        max_size=10,
    )
)
def test_lifecycle_random_presence(spark, pres):
    """Growth accounting on arbitrary (user, week-set) shapes: statuses
    match the literal walk and the conservation law holds."""
    from sqlstreamstore_spark.analytics.events import user_lifecycle

    base = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        (u, base + dt.timedelta(weeks=w, days=2))
        for u, ws in pres
        for w in ws
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r.week.date(): (r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
        for r in user_lifecycle(ev).collect()
    }
    per = defaultdict(set)
    for u, ws in pres:
        per[u] |= ws
    want = defaultdict(lambda: [0, 0, 0, 0])
    max_w = max(w for ws in per.values() for w in ws)
    for _u, ws in per.items():
        seq = sorted(ws)
        for i, w in enumerate(seq):
            if i == 0:
                want[w][0] += 1
            elif seq[i - 1] + 1 == w:
                want[w][1] += 1
            else:
                want[w][2] += 1
            nxt = seq[i + 1] if i + 1 < len(seq) else None
            if (nxt is None or nxt > w + 1) and w + 1 <= max_w:
                want[w + 1][3] += 1
    as_dates = {
        (base + dt.timedelta(weeks=w)).date(): tuple(v) for w, v in want.items()
    }
    assert got == as_dates
    active = {w: v[0] + v[1] + v[2] for w, v in want.items()}
    for w, v in want.items():
        if w - 1 in active:
            assert v[3] == active[w - 1] - v[1]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    baskets=st.lists(
        st.sets(st.integers(0, 5), min_size=1, max_size=4),
        min_size=2,
        max_size=20,
    )
)
def test_assoc_rules_random_baskets(spark, baskets):
    """Rules match the literal Counter walk; lift is direction-
    symmetric; confidence ≥ support."""
    from sqlstreamstore_spark.analytics.relational import brand_assoc_rules

    lineitem = spark.createDataFrame(
        [(b, item) for b, items in enumerate(baskets) for item in items],
        "l_orderkey long, l_partkey long",
    )
    part = spark.createDataFrame(
        [(i, f"B{i}") for i in range(6)], "p_partkey long, p_brand string"
    )
    got = {(r.antecedent, r.consequent): r for r in brand_assoc_rules(lineitem, part).collect()}
    n = len(baskets)
    c_item, c_pair = Counter(), Counter()
    for items in baskets:
        names = sorted(f"B{i}" for i in items)
        c_item.update(names)
        c_pair.update(
            (a, b) for i, a in enumerate(names) for b in names[i + 1 :]
        )
    assert len(got) == 2 * len(c_pair)
    for (a, b), cb in c_pair.items():
        ra, rb = got[(a, b)], got[(b, a)]
        assert ra.c_both == rb.c_both == cb
        assert ra.lift == rb.lift  # exact same BIGINT ratio both ways
        assert ra.support == cb / n
        assert ra.confidence >= ra.support - 1e-15


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    deltas=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)),  # (user, delta)
        min_size=1,
        max_size=60,
    )
)
def test_clamped_balance_random_deltas(spark, deltas):
    """The Skorokhod closed form must equal the literal recurrence
    b = max(0, b + d) on arbitrary signed streams, per user."""
    from sqlstreamstore_spark.analytics.events import clamped_balance

    ev = spark.createDataFrame(
        [
            (i, _day(i), u, "credit" if d >= 0 else "purchase", abs(d) / 100.0)
            for i, (u, d) in enumerate(deltas)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = clamped_balance(ev).collect()
    per_user = defaultdict(list)
    for i, (u, d) in enumerate(deltas):
        per_user[u].append((i, d))
    exp = {}
    for u, evs in per_user.items():
        b = 0
        for i, d in evs:  # event i maps to day i: already time-ordered
            b = max(0, b + d)
            exp[i] = b
    assert len(rows) == len(deltas)
    for r in rows:
        assert r.balance_cents == exp[r.event_id], (r.event_id, deltas)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),  # (price, size)
        min_size=1,
        max_size=30,
    )
)
def test_skyline_random_points(spark, pts):
    """Two-phase frontier == all-pairs dominance on arbitrary points,
    including duplicate coordinates."""
    from sqlstreamstore_spark.analytics.relational import part_skyline

    part = spark.createDataFrame(
        [(i, f"p{i}", float(p), s) for i, (p, s) in enumerate(pts)],
        "p_partkey long, p_name string, p_retailprice double, p_size int",
    )
    got = {r.p_partkey for r in part_skyline(part).collect()}
    exp = {
        i
        for i, (p, s) in enumerate(pts)
        if not any(
            q <= p and t >= s and (q < p or t > s) for (q, t) in pts
        )
    }
    assert got == exp, (pts, got, exp)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=12),
        min_size=1,
        max_size=20,
    )
)
def test_sentence_dedup_random_corpora(spark, texts):
    """Global chunk-dedup invariants on arbitrary corpora: every
    distinct chunk survives exactly once, first occurrence wins, and
    reconstruction preserves within-doc order."""
    from sqlstreamstore_spark.analytics.pipeline import sentence_dedup

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in sentence_dedup(docs, chunk_tokens=3).collect()}
    first = {}
    for did, toks in enumerate(texts):
        cs = [" ".join(toks[i : i + 3]) for i in range(0, len(toks), 3)]
        for pos, c in enumerate(cs):
            first.setdefault(c, (did, pos))
        kept = [
            c
            for pos, c in enumerate(cs)
            if first[c] == (did, pos)
        ]
        r = rows[did]
        assert r.n_chunks == len(cs)
        assert r.kept_text == " ".join(kept)
    assert sum(r.n_kept for r in rows.values()) == len(first)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    evs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100_000)),  # (user, seconds)
        min_size=1,
        max_size=40,
    )
)
def test_gap_sweep_random_streams(spark, evs):
    """Each sweep row equals an independent sessionization of the same
    random stream at that gap."""
    from sqlstreamstore_spark.analytics.events import session_gap_sweep

    base = dt.datetime(1995, 1, 1)
    ev = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=s), u, "e", 0.0)
            for i, (u, s) in enumerate(evs)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = {r.gap_s: r for r in session_gap_sweep(ev, (300, 1800)).collect()}
    for gap_s in (300, 1800):
        per_user = defaultdict(list)
        for i, (u, s) in enumerate(evs):
            per_user[u].append((s * 1_000_000, i))
        n_sessions = 0
        total_dur = 0
        for u, es in per_user.items():
            es.sort()
            start = prev = es[0][0]
            for us, _i in es[1:]:
                if us - prev > gap_s * 1_000_000:
                    n_sessions += 1
                    total_dur += prev - start
                    start = us
                prev = us
            n_sessions += 1
            total_dur += prev - start
        r = rows[gap_s]
        assert (r.n_sessions, r.total_duration_us) == (n_sessions, total_dur)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    evs=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50_000)),  # (user, seconds)
        min_size=1,
        max_size=40,
    )
)
def test_peak_concurrency_random_streams(spark, evs):
    """Sweep-line peak == brute-force max over interval-stabbing counts
    at every session boundary."""
    from sqlstreamstore_spark.analytics.events import peak_concurrency

    ev = spark.createDataFrame(
        [
            (i, dt.datetime(1995, 1, 1) + dt.timedelta(seconds=s), u, "e", 0.0)
            for i, (u, s) in enumerate(evs)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = peak_concurrency(ev, gap_seconds=600).collect()[0]
    per_user = defaultdict(list)
    for i, (u, s) in enumerate(evs):
        per_user[u].append(s * 1_000_000)
    sessions = []
    for u, ss in per_user.items():
        ss.sort()
        start = prev = ss[0]
        for us in ss[1:]:
            if us - prev > 600 * 1_000_000:
                sessions.append((start, prev))
                start = us
            prev = us
        sessions.append((start, prev))
    base_us = int(dt.datetime(1995, 1, 1, tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    peak = max(
        sum(1 for s2, e2 in sessions if s2 <= t <= e2) for t, _e in sessions
    )
    assert r.n_sessions == len(sessions)
    assert r.peak == peak, (evs, sessions)
    assert sum(1 for s2, e2 in sessions
               if s2 + base_us <= r.first_peak_us <= e2 + base_us) == peak


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    days=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)),  # (user, day)
        min_size=1,
        max_size=50,
    )
)
def test_dau_mau_random_streams(spark, days):
    from sqlstreamstore_spark.analytics.events import dau_mau_stickiness

    ev = spark.createDataFrame(
        [
            (i, _day(d), u, "e", 0.0)
            for i, (u, d) in enumerate(days)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = {r.day_no: r for r in dau_mau_stickiness(ev, window_days=7).collect()}
    pairs = {( _day(d).date().toordinal() - dt.date(1970, 1, 1).toordinal(), u)
             for u, d in days}
    obs_days = sorted({d for d, _u in pairs})
    assert set(rows) == set(obs_days)
    for d in obs_days:
        dau = len({u for dd, u in pairs if dd == d})
        mau = len({u for dd, u in pairs if d - 6 <= dd <= d})
        assert (rows[d].dau, rows[d].mau) == (dau, mau), (days, d)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.lists(st.integers(0, 30), min_size=2, max_size=15)
)
def test_theil_sen_random_series(spark, counts):
    """Fused medians == statistics.median on arbitrary short series
    (the day axis is dense by construction here)."""
    import statistics

    from sqlstreamstore_spark.analytics.events import theil_sen_trend

    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, _day(d), 0, "e", 0.0))
            eid += 1
    if not rows:
        return
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r = theil_sen_trend(ev).collect()[0]
    # the spine spans first..last day WITH events
    lo = min(d for d, c in enumerate(counts) if c)
    hi = max(d for d, c in enumerate(counts) if c)
    series = [(d, counts[d]) for d in range(lo, hi + 1)]
    if len(series) < 2:
        return
    slopes = [
        (cb - ca) / (db - da)
        for i, (da, ca) in enumerate(series)
        for db, cb in series[i + 1:]
    ]
    assert r.n_pairs == len(slopes)
    assert abs(r.slope_per_day - statistics.median(slopes)) < 1e-12, counts
