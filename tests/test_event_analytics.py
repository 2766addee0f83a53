"""Funnel and cohort-retention semantics on handcrafted rows (the gate
also hash-matches both against DuckDB at fixture scale)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sqlstreamstore_spark.analytics.events import cohort_retention, funnel_conversion


def T(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )


def test_funnel_ordering_matters(spark):
    rows = [
        # user 1: full ordered funnel
        (1, 1, "signup", T("2024-01-01"), 0.0),
        (2, 1, "click", T("2024-01-02"), 0.0),
        (3, 1, "purchase", T("2024-01-03"), 0.0),
        # user 2: clicked BEFORE signup → not a stage-2 conversion
        (4, 2, "click", T("2024-01-01"), 0.0),
        (5, 2, "signup", T("2024-01-02"), 0.0),
        (6, 2, "purchase", T("2024-01-03"), 0.0),
        # user 3: signup + click, purchase before click → stage 2 only
        (7, 3, "signup", T("2024-01-01"), 0.0),
        (8, 3, "purchase", T("2024-01-02"), 0.0),
        (9, 3, "click", T("2024-01-03"), 0.0),
        # user 4: never signed up
        (10, 4, "click", T("2024-01-01"), 0.0),
    ]
    r = funnel_conversion(_events(spark, rows)).collect()[0]
    assert (r.n_users, r.n_signup, r.n_signup_click, r.n_signup_click_purchase) == (4, 3, 2, 1)


def test_cohort_retention_weeks(spark):
    rows = [
        # user 1 first seen week of Jan 1 (Mon), active again 2 weeks later
        (1, 1, "view", T("2024-01-01"), 0.0),
        (2, 1, "view", T("2024-01-15"), 0.0),
        # user 2 same cohort, active only in week 0 (two events, one week)
        (3, 2, "view", T("2024-01-02"), 0.0),
        (4, 2, "view", T("2024-01-03"), 0.0),
        # user 3 next cohort
        (5, 3, "view", T("2024-01-08"), 0.0),
    ]
    got = {
        (r.cohort_week, r.weeks_since): r.n_active_users
        for r in cohort_retention(_events(spark, rows)).collect()
    }
    w0, w1 = T("2024-01-01"), T("2024-01-08")
    assert got == {(w0, 0): 2, (w0, 2): 1, (w1, 0): 1}


def test_incremental_rollup_merge_equals_recompute(spark):
    """The incremental-maintenance contract: any split of the log,
    rolled up separately and monoid-merged, equals the full recompute —
    including a three-way split merged in two different orders
    (associativity is what lets a pipeline fold in one batch at a
    time)."""
    from sqlstreamstore_spark.analytics.incremental import (
        daily_rollup,
        merge_rollups,
        present_rollup,
    )
    from sqlstreamstore_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    full = present_rollup(daily_rollup(ev)).collect()

    p1 = daily_rollup(ev.filter(F.col("event_id") % 3 == 0))
    p2 = daily_rollup(ev.filter(F.col("event_id") % 3 == 1))
    p3 = daily_rollup(ev.filter(F.col("event_id") % 3 == 2))

    left = present_rollup(merge_rollups(merge_rollups(p1, p2), p3)).collect()
    right = present_rollup(merge_rollups(p1, merge_rollups(p2, p3))).collect()
    assert [tuple(r) for r in left] == [tuple(r) for r in full]
    assert [tuple(r) for r in right] == [tuple(r) for r in full]


def test_incremental_rollup_empty_delta_is_identity(spark):
    """Merging an empty batch changes nothing (the identity element) —
    the no-new-data pipeline tick must be a no-op, not a corruption."""
    from sqlstreamstore_spark.analytics.incremental import (
        daily_rollup,
        merge_rollups,
        present_rollup,
    )
    from sqlstreamstore_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    state = daily_rollup(ev)
    empty = daily_rollup(ev.filter(F.lit(False)))
    merged = present_rollup(merge_rollups(state, empty)).collect()
    assert [tuple(r) for r in merged] == [tuple(r) for r in present_rollup(state).collect()]


def test_histogram_state_merge_and_quantile_bins(spark):
    """Mergeable-histogram contract: split-state merge equals the
    full-recompute state, and the located p-quantile bin is the true
    one on a hand-checkable distribution (100 values 0..99, bounds at
    9.5, 19.5, ... — p50 lands in bin 5, p90 in bin 9)."""
    from sqlstreamstore_spark.analytics.incremental import (
        histogram_quantile_bins,
        histogram_state,
        merge_histogram_states,
    )

    rows = [("g", float(v)) for v in range(100)]
    df = spark.createDataFrame(rows, "g string, x double")
    bounds = [9.5 + 10 * i for i in range(9)]

    full = histogram_state(df, ["g"], "x", bounds)
    a = histogram_state(df.filter("x < 37"), ["g"], "x", bounds)
    b = histogram_state(df.filter("x >= 37"), ["g"], "x", bounds)
    merged = merge_histogram_states(a, b)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))

    p50 = histogram_quantile_bins(merged, ["g"], 0.5).collect()[0]
    assert (p50.q_bin, p50.cum_below, p50.bin_n, p50.total) == (4, 40, 10, 100)
    p90 = histogram_quantile_bins(merged, ["g"], 0.9).collect()[0]
    assert (p90.q_bin, p90.cum_below, p90.bin_n, p90.total) == (8, 80, 10, 100)
    p100 = histogram_quantile_bins(merged, ["g"], 1.0).collect()[0]
    assert p100.q_bin == 9


def test_sliding_window_frame_semantics(spark):
    """RANGE frame: inclusive at both ends, peers at equal ts all in
    the frame, per-user isolation — checked on handcrafted rows."""
    from sqlstreamstore_spark.analytics.events import sliding_value_window

    rows = [
        # user 1: t0, t0+30min, t0+60min (inclusive edge), t0+61min
        (1, 1, "a", T("2024-01-01 00:00:00"), 1.0),
        (2, 1, "a", T("2024-01-01 00:30:00"), 2.0),
        (3, 1, "a", T("2024-01-01 01:00:00"), 4.0),
        (4, 1, "a", T("2024-01-01 01:01:00"), 8.0),
        # user 2: two events at the SAME timestamp (peers)
        (5, 2, "a", T("2024-01-01 00:00:00"), 16.0),
        (6, 2, "a", T("2024-01-01 00:00:00"), 32.0),
    ]
    out = {r.event_id: r for r in sliding_value_window(_events(spark, rows)).collect()}
    assert (out[1].n_window, out[1].sum_window) == (1, 1.0)
    assert (out[2].n_window, out[2].sum_window) == (2, 3.0)
    # t0 is exactly 60 min before event 3 — inclusive lower edge
    assert (out[3].n_window, out[3].sum_window) == (3, 7.0)
    # event 4: t0 drops out (61 min), rest stay
    assert (out[4].n_window, out[4].sum_window) == (3, 14.0)
    # equal-ts peers see each other in BOTH rows (RANGE, not ROWS)
    assert (out[5].n_window, out[5].sum_window) == (2, 48.0)
    assert (out[6].n_window, out[6].sum_window) == (2, 48.0)


def test_quality_gate_per_source_rank_semantics(spark):
    """The gate keeps exactly the docs at/above each source's rank-
    ceil(q*N) score — differentially checked against a pure-Python
    per-source recompute on the fixture."""
    import math

    from sqlstreamstore_spark.analytics.pipeline import quality_percentile_gate
    from sqlstreamstore_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kept = {r.doc_id for r in quality_percentile_gate(docs, q=0.5, accuracy=10**6).collect()}
    rows = docs.select("doc_id", "source", "text").collect()
    by_src = {}
    for r in rows:
        toks = r.text.split(" ")
        by_src.setdefault(r.source, []).append((r.doc_id, len(set(toks)) / len(toks)))
    expect = set()
    for src, pairs in by_src.items():
        scores = sorted(s for _, s in pairs)
        thr = scores[math.ceil(0.5 * len(scores)) - 1]
        expect |= {d for d, s in pairs if s >= thr}
    assert kept == expect


# ------------------------------------------------------------- EWMA


def _ev_df(spark, rows):
    """rows: (event_id, user_id, epoch_sec, value)."""
    data = [
        (e, u, dt.datetime.fromtimestamp(t, dt.timezone.utc).replace(tzinfo=None), v)
        for e, u, t, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, value double"
    )


def _ewma_py(xs, alpha=0.25):
    out, num, den = [], 0.0, 0.0
    for x in xs:
        num = num * (1 - alpha) + x
        den = den * (1 - alpha) + 1.0
        out.append(num / den)
    return out


def test_ewma_matches_closed_form_per_user(spark):
    from sqlstreamstore_spark.analytics.events import ewma_value

    rows = []
    seqs = {1: [10.0, 20.0, 0.0, 40.0, 5.0], 2: [100.0], 3: [1.0, 1.0, 1.0, 9.0]}
    eid = 0
    for u, xs in seqs.items():
        for i, x in enumerate(xs):
            rows.append((eid, u, 1_700_000_000 + i * 60, x))
            eid += 1
    got = {
        (r.user_id, r.event_id): r.ewma
        for r in ewma_value(_ev_df(spark, rows), alpha=0.25).collect()
    }
    eid = 0
    for u, xs in seqs.items():
        for i, want in enumerate(_ewma_py(xs)):
            assert abs(got[(u, eid)] - want) < 1e-9, (u, eid)
            eid += 1


def test_ewma_tie_break_and_null_discipline(spark):
    """Equal timestamps order by event_id; NULL ts/value rows drop."""
    from sqlstreamstore_spark.analytics.events import ewma_value

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, 1, t0, 10.0),
            (2, 1, t0, 30.0),     # same ts: must apply AFTER event 1
            (3, 1, None, 99.0),   # dropped: NULL ts
            (4, 1, t0, None),     # dropped: NULL value
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {r.event_id: r.ewma for r in ewma_value(df).collect()}
    assert set(got) == {1, 2}
    assert abs(got[1] - 10.0) < 1e-12
    assert abs(got[2] - _ewma_py([10.0, 30.0])[1]) < 1e-12


def test_ewma_plans_as_one_grouped_pandas_exchange(spark):
    from sqlstreamstore_spark.analytics.events import ewma_value

    rows = [(i, i % 3, 1_700_000_000 + i, float(i)) for i in range(30)]
    plan = (
        ewma_value(_ev_df(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") == 1  # one shuffle on user_id, nothing global


# ------------------------------------------ rolling distinct users


def test_rolling_distinct_matches_bruteforce(spark):
    from sqlstreamstore_spark.analytics.events import rolling_distinct_users

    # users revisiting across hours, gaps between active hours, and a
    # user appearing twice in one hour (must count once)
    raw = [
        (0, 100), (0, 100), (0, 101),       # hour 0
        (1, 100),                            # hour 1
        (5, 102), (5, 103),                  # gap, hour 5
        (30, 100),                           # outside 24h of hour 0..5
        (31, 104),
    ]
    base = 1_700_000_000 - (1_700_000_000 % 3600)
    rows = [
        (i, u, dt.datetime.fromtimestamp(base + h * 3600 + 7, dt.timezone.utc).replace(tzinfo=None), 1.0)
        for i, (h, u) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r.hour_epoch - base // 3600: r.n_users
        for r in rolling_distinct_users(df, window_hours=24).collect()
    }
    hours = sorted({h for h, _ in raw})
    want = {
        t: len({u for h, u in raw if t - 23 <= h <= t}) for t in hours
    }
    assert got == want


def test_rolling_hll_bounded_state_and_accuracy(spark):
    from sqlstreamstore_spark.analytics.events import (
        rolling_distinct_users,
        rolling_distinct_users_hll,
    )

    base = 1_704_067_200  # 2024-01-01 00:00 UTC, hour-aligned
    rows = []
    eid = 0
    for h in range(30):
        for u in range(200 + 37 * h):
            if (u + h) % 3 == 0:  # overlapping but shifting populations
                rows.append(
                    (eid, u, dt.datetime.fromtimestamp(base + h * 3600 + u % 3600, dt.timezone.utc).replace(tzinfo=None), 1.0)
                )
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    exact = {r.hour_epoch: r.n_users for r in rolling_distinct_users(df).collect()}
    est = {r.hour_epoch: r for r in rolling_distinct_users_hll(df).collect()}
    assert set(exact) == set(est)
    for h, n in exact.items():
        r = est[h]
        assert r.n_hit <= 256  # bounded state: a register file, not a user set
        # corrected estimate (linear counting below 2.5m): 3 sigma at
        # m=256 is ~19.5 %; generous 25 % envelope
        assert abs(r.hll_users - n) / n < 0.25, (h, n, r.hll_users)


# ----------------------------------------------------------- SCD-2


def test_scd2_versions_semantics(spark):
    from sqlstreamstore_spark.analytics.events import scd2_versions

    t0 = 1_700_000_000
    raw = [
        # user 1: A A B A  -> versions A, B, A (middle A duplicate collapses)
        (0, 1, t0 + 0, "A"),
        (1, 1, t0 + 10, "A"),
        (2, 1, t0 + 20, "B"),
        (3, 1, t0 + 30, "A"),
        # user 2: single value, never changes -> one open version
        (4, 2, t0 + 0, "X"),
        (5, 2, t0 + 50, "X"),
    ]
    df = spark.createDataFrame(
        [
            (e, u, dt.datetime.fromtimestamp(t, dt.timezone.utc).replace(tzinfo=None), ty)
            for e, u, t, ty in raw
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    rows = scd2_versions(df).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert [r.event_type for r in by_user[1]] == ["A", "B", "A"]
    assert [r.event_type for r in by_user[2]] == ["X"]
    for u, vs in by_user.items():
        # chain continuity: each version closes exactly when the next opens
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to_us == b.valid_from_us
        assert vs[-1].valid_to_us == -1  # exactly one open version
        assert all(v.valid_to_us != -1 for v in vs[:-1])


def test_scd2_point_in_time_reconstruction(spark):
    """Probing the dimension at any instant must return the value the
    raw log had then — the property SCD-2 exists for."""
    from sqlstreamstore_spark.analytics.events import scd2_versions

    t0 = 1_700_000_000
    raw = [(i, 7, t0 + i * 60, ["p", "q", "q", "r", "p"][i]) for i in range(5)]
    df = spark.createDataFrame(
        [
            (e, u, dt.datetime.fromtimestamp(t, dt.timezone.utc).replace(tzinfo=None), ty)
            for e, u, t, ty in raw
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    vs = scd2_versions(df).collect()
    for probe_s, want in [(t0, "p"), (t0 + 90, "q"), (t0 + 185, "r"), (t0 + 1000, "p")]:
        probe_us = probe_s * 1_000_000
        hits = [
            v.event_type
            for v in vs
            if v.valid_from_us <= probe_us
            and (v.valid_to_us == -1 or probe_us < v.valid_to_us)
        ]
        assert hits == [want], (probe_s, hits)


def test_scd2_single_exchange_plan(spark):
    from sqlstreamstore_spark.analytics.events import scd2_versions

    df = spark.createDataFrame(
        [(i, i % 3, dt.datetime(2024, 1, 1, 0, 0, i % 60), "t") for i in range(30)],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    plan = scd2_versions(df)._jdf.queryExecution().executedPlan().toString()
    # both windows and the change filter share one user_id partitioning
    # (the final orderBy adds its range exchange; no other shuffles)
    assert plan.count("hashpartitioning") <= 2


# ---------------------------------------------------- session table


def test_session_table_semantics(spark):
    from sqlstreamstore_spark.analytics.events import (
        session_table,
        sessions_per_user,
    )

    t0 = 1_700_000_000
    raw = [
        (0, 1, t0),           # session 1 start
        (1, 1, t0 + 1800),    # exactly the gap: SAME session (> rule)
        (2, 1, t0 + 1800 + 1801),  # 1801 s gap: new session
        (3, 2, t0),           # single-event session
    ]
    df = spark.createDataFrame(
        [
            (e, u, dt.datetime.fromtimestamp(t, dt.timezone.utc).replace(tzinfo=None), "x", 0.0)
            for e, u, t in raw
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    rows = session_table(df).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    s1 = by_user[1]
    assert [r.n_events for r in s1] == [2, 1]
    assert s1[0].duration_us == 1800 * 1_000_000
    assert s1[1].duration_us == 0
    assert by_user[2][0].n_events == 1 and by_user[2][0].duration_us == 0
    # session COUNT agrees with the count-only operator
    counts = {r.user_id: r.n_sessions for r in sessions_per_user(df).collect()}
    for u, vs in by_user.items():
        assert counts[u] == len(vs)


def test_vocab_growth_partitions_the_vocabulary(spark):
    from sqlstreamstore_spark.analytics.dedup import _shingles
    from sqlstreamstore_spark.analytics.text import vocab_growth

    from sqlstreamstore_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = vocab_growth(docs).collect()
    # cumulative is the running total and ends at the true distinct count
    run = 0
    for r in rows:
        run += r.n_new_tokens
        assert r.vocab_cum == run
    total = (
        docs.select(F.explode(_shingles(F.col("text"), 3)).alias("s"))
        .agg(F.count_distinct("s"))
        .collect()[0][0]
    )
    assert run == total
    assert len(rows) > 10  # a real curve, not a degenerate point


def test_funnel_windowed_attribution_edges(spark):
    """Conversions count only inside the attribution window, anchored
    on the PREVIOUS stage's first hit; boundary is inclusive."""
    from sqlstreamstore_spark.analytics.events import funnel_windowed

    day = 86_400
    t0 = 1_700_000_000
    raw = [
        # user 1: full funnel inside windows
        (1, "signup", t0), (1, "click", t0 + day), (1, "purchase", t0 + 2 * day),
        # user 2: click AFTER 7d of signup -> stage 2 fails
        (2, "signup", t0), (2, "click", t0 + 8 * day), (2, "purchase", t0 + 9 * day),
        # user 3: click at exactly +7d (inclusive), purchase at exactly
        # +7d of the click (inclusive) -> converts fully
        (3, "signup", t0), (3, "click", t0 + 7 * day), (3, "purchase", t0 + 14 * day),
        # user 4: purchase BEFORE the click -> stage 3 fails
        (4, "signup", t0), (4, "purchase", t0 + day), (4, "click", t0 + 2 * day),
        # user 5: no signup -> not in the funnel at all
        (5, "click", t0), (5, "purchase", t0 + day),
    ]
    df = spark.createDataFrame(
        [
            (i, u, ty, dt.datetime.fromtimestamp(t, dt.timezone.utc).replace(tzinfo=None), 0.0)
            for i, (u, ty, t) in enumerate(raw)
        ],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    r = funnel_windowed(df).collect()[0]
    assert (r.n_signup, r.n_click_w, r.n_purchase_w) == (4, 3, 2)


def test_funnel_windowed_single_shuffle_plan(spark):
    from sqlstreamstore_spark.analytics.events import funnel_windowed

    df = spark.createDataFrame(
        [(i, i % 5, "signup", dt.datetime(2024, 1, 1), 0.0) for i in range(20)],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    plan = funnel_windowed(df)._jdf.queryExecution().executedPlan().toString()
    # the three stage windows share one user_id hashpartitioning; the
    # final count-distinct agg adds its own exchanges
    assert plan.count("hashpartitioning(user_id") <= 1


def test_top_event_paths_counts_and_user_boundary(spark):
    from sqlstreamstore_spark.analytics.events import top_event_paths

    rows = [
        # user 1: a b c d  -> trigrams (a,b,c), (b,c,d)
        (0, 1, "a", T("2024-01-01T00:00:00"), 0.0),
        (1, 1, "b", T("2024-01-01T00:01:00"), 0.0),
        (2, 1, "c", T("2024-01-01T00:02:00"), 0.0),
        (3, 1, "d", T("2024-01-01T00:03:00"), 0.0),
        # user 2: a b c -> (a,b,c); trigram must NOT span users
        (4, 2, "a", T("2024-01-01T00:00:00"), 0.0),
        (5, 2, "b", T("2024-01-01T00:01:00"), 0.0),
        (6, 2, "c", T("2024-01-01T00:02:00"), 0.0),
        # user 3: only two events -> no trigram
        (7, 3, "x", T("2024-01-01T00:00:00"), 0.0),
        (8, 3, "y", T("2024-01-01T00:01:00"), 0.0),
    ]
    got = {
        (r.e1, r.e2, r.e3): r.n
        for r in top_event_paths(_events(spark, rows)).collect()
    }
    assert got == {("a", "b", "c"): 2, ("b", "c", "d"): 1}


def test_top_event_paths_tie_break_is_total_order(spark):
    from sqlstreamstore_spark.analytics.events import top_event_paths

    # two paths with equal counts: cut must pick lexicographically
    rows = []
    i = 0
    for u, seq in [(1, "abc"), (2, "abd")]:
        for j, t in enumerate(seq):
            rows.append((i, u, t, T("2024-01-01T00:00:00") + dt.timedelta(minutes=j), 0.0))
            i += 1
    out = top_event_paths(_events(spark, rows), k=1).collect()
    assert [(r.e1, r.e2, r.e3) for r in out] == [("a", "b", "c")]


def test_cusum_changepoint_planted_level_shift(spark):
    from sqlstreamstore_spark.analytics.events import cusum_changepoint

    # type "a": 5 days at 2/day then 5 days at 8/day. D=10, total=50,
    # dev_d = 10*c - 50: five days of -30 then five of +30 -> CUSUM
    # bottoms at -150 on day 5 (the last low day) and returns to 0.
    rows = []
    i = 0
    for d in range(10):
        c = 2 if d < 5 else 8
        for k in range(c):
            rows.append(
                (i, 1, "a", T("2024-03-01T00:00:00") + dt.timedelta(days=d, minutes=k), 0.0)
            )
            i += 1
    r = cusum_changepoint(_events(spark, rows)).collect()
    assert len(r) == 1
    assert r[0].change_day == T("2024-03-05T00:00:00")
    assert r[0].cusum == -150
    assert (r[0].n_days, r[0].total) == (10, 50)


def test_seasonal_profile_dow_mapping_and_shares(spark):
    from sqlstreamstore_spark.analytics.events import seasonal_profile

    # 2024-01-01 is a Monday -> dow 0; 2024-01-06 a Saturday -> dow 5
    rows = [
        (0, 1, "a", T("2024-01-01T09:00:00"), 0.0),
        (1, 1, "a", T("2024-01-01T09:30:00"), 0.0),
        (2, 1, "a", T("2024-01-06T23:00:00"), 0.0),
        (3, 1, "b", T("2024-01-03T12:00:00"), 0.0),
    ]
    out = seasonal_profile(_events(spark, rows)).collect()
    cells = {(r.event_type, r.dow, r.hod): r for r in out}
    assert set(cells) == {("a", 0, 9), ("a", 5, 23), ("b", 2, 12)}
    a_peak = cells[("a", 0, 9)]
    assert a_peak.n == 2 and a_peak.rank_in_type == 1
    assert abs(a_peak.share - 2 / 3) < 1e-15
    assert cells[("a", 5, 23)].rank_in_type == 2
    assert cells[("b", 2, 12)].share == 1.0
