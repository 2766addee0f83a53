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
