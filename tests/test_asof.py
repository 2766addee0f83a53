"""As-of join semantics on handcrafted data: inclusive match, no-match
nulls, per-key isolation. (The gate also hash-matches the operator
against DuckDB's native ASOF JOIN on 10k rows.)"""

import datetime as dt

from sqlstreamstore_spark.analytics.asof import asof_join


def T(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "a", T("2024-01-05")),
            (2, "a", T("2024-01-10")),
            (3, "a", T("2024-01-01")),  # before any right row → null
            (4, "b", T("2024-01-05")),  # key with no right rows → null
        ],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", T("2024-01-03"), 30.0),
            ("a", T("2024-01-05"), 50.0),  # equal timestamp: inclusive
            ("a", T("2024-01-08"), 80.0),
        ],
        "k string, rt timestamp, v double",
    )
    out = {
        r["id"]: (r["__asof_time"], r["v"])
        for r in asof_join(left, right, "k", "k", "t", "rt", ["v"]).collect()
    }
    assert out[1] == (T("2024-01-05"), 50.0)  # <= is inclusive
    assert out[2] == (T("2024-01-08"), 80.0)  # latest at-or-before
    assert out[3] == (None, None)
    assert out[4] == (None, None)


def test_range_join_bucketed_containment(spark):
    from sqlstreamstore_spark.analytics.asof import range_join_bucketed

    left = spark.createDataFrame(
        [
            (1, "a", T("2024-01-01 00:30:00")),  # inside w1
            (2, "a", T("2024-01-01 02:30:00")),  # outside any window
            (3, "a", T("2024-01-01 01:00:00")),  # on w1's inclusive end
            (4, "b", T("2024-01-01 00:30:00")),  # right user, no window for b
        ],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [("w1", "a", T("2024-01-01 00:00:00"), T("2024-01-01 01:00:00"))],
        "w string, rk string, s timestamp, e timestamp",
    )
    got = sorted(
        r["id"]
        for r in range_join_bucketed(
            left, right, "k", "rk", "t", "s", "e", bucket="1 hour"
        ).collect()
    )
    assert got == [1, 3]


def _iv_df(spark, rows, prefix):
    """rows: (id, key, start_epoch, end_epoch) → interval frame with
    prefixed column names (the operator requires disjoint names)."""
    p = prefix
    data = [
        (i, k, dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None),
         dt.datetime.fromtimestamp(e, dt.timezone.utc).replace(tzinfo=None))
        for i, k, s, e in rows
    ]
    return spark.createDataFrame(
        data, f"{p}_id long, {p}_key long, {p}_s timestamp, {p}_e timestamp"
    )


def test_interval_overlap_matches_naive_join(spark):
    """Differential: bucketed overlap join == naive theta join on
    intervals engineered to hit every geometry — disjoint, touching at
    a single endpoint, nested containment, identical, zero-length,
    spanning many buckets, same geometry under a different key."""
    from sqlstreamstore_spark.analytics.asof import interval_overlap_join

    h = 3_600
    base = 1_700_000_000
    a_rows, b_rows = [], []
    i = 0
    for key in (1, 2):
        a_rows += [
            (i + 0, key, base, base + 2 * h),          # vanilla
            (i + 1, key, base + 10 * h, base + 10 * h),  # zero-length
            (i + 2, key, base + 20 * h, base + 40 * h),  # spans many cells
            (i + 3, key, base + 100 * h, base + 101 * h),  # isolated
        ]
        b_rows += [
            (i + 0, key, base + 2 * h, base + 3 * h),   # touches a0's end
            (i + 1, key, base + 1, base + 1 * h),       # inside a0
            (i + 2, key, base + 10 * h, base + 10 * h),  # equals a1 (point)
            (i + 3, key, base + 25 * h, base + 26 * h),  # inside a2
            (i + 4, key, base + 39 * h, base + 50 * h),  # overlaps a2's tail
            (i + 5, key, base + 200 * h, base + 201 * h),  # matches nothing
        ]
        i += 10
    a = _iv_df(spark, a_rows, "a")
    b = _iv_df(spark, b_rows, "b")
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "a_key", "b_key", "a_s", "a_e", "b_s", "b_e", bucket_secs=h
        ).collect()
    )
    want = sorted(
        (r.a_id, r.b_id)
        for r in a.join(
            b,
            (a.a_key == b.b_key) & (a.a_s <= b.b_e) & (b.b_s <= a.a_e),
        ).collect()
    )
    assert got == want
    assert len(got) == len(set(got))  # canonical-cell dedup: no dup pairs
    # sanity on the geometry: containment, touch, and point-overlap all hit
    assert (0, 0) in got and (0, 1) in got and (1, 2) in got and (2, 3) in got


def test_interval_overlap_respects_keys_and_plans_as_hash_join(spark):
    from sqlstreamstore_spark.analytics.asof import interval_overlap_join

    h = 3_600
    base = 1_700_000_000
    a = _iv_df(spark, [(0, 1, base, base + h)], "a")
    b = _iv_df(spark, [(0, 2, base, base + h)], "b")  # overlaps in time, wrong key
    out = interval_overlap_join(
        a, b, "a_key", "b_key", "a_s", "a_e", "b_s", "b_e", bucket_secs=h
    )
    assert out.count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
