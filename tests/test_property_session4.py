"""Property-based differentials for the round-5 session-4 operators:
interval-overlap join, weighted median, EWMA and the portable HLL rho
must agree with independent pure-Python twins on arbitrary inputs
(examples batched per Spark job to keep the suite fast)."""

from __future__ import annotations

import datetime as dt
import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


def _ts(epoch):
    return dt.datetime.fromtimestamp(epoch, dt.timezone.utc).replace(tzinfo=None)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ivs=st.lists(
        st.tuples(
            st.integers(0, 3),          # key
            st.integers(0, 500_000),    # start offset (s)
            st.integers(0, 50_000),     # length (s)
        ),
        min_size=1,
        max_size=25,
    ),
    bucket=st.sampled_from([600, 3_600, 86_400]),
)
def test_interval_overlap_join_random_geometries(spark, ivs, bucket):
    """Bucketed overlap join == naive O(N²) predicate on random
    interval sets, at several grid widths, with no duplicate pairs."""
    from sqlstreamstore_spark.analytics.asof import interval_overlap_join

    base = 1_700_000_000
    rows = [
        (i, k, base + s, base + s + ln) for i, (k, s, ln) in enumerate(ivs)
    ]
    a = spark.createDataFrame(
        [(i, k, _ts(s), _ts(e)) for i, k, s, e in rows],
        "a_id long, a_key long, a_s timestamp, a_e timestamp",
    )
    b = spark.createDataFrame(
        [(i, k, _ts(s), _ts(e)) for i, k, s, e in rows],
        "b_id long, b_key long, b_s timestamp, b_e timestamp",
    )
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "a_key", "b_key", "a_s", "a_e", "b_s", "b_e", bucket_secs=bucket
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, ka, sa, ea in rows
        for j, kb, sb, eb in rows
        if ka == kb and sa <= eb and sb <= ea
    )
    assert got == want
    assert len(got) == len(set(got))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 2),            # group
            st.integers(0, 1_000),        # value
            st.integers(1, 40),           # weight (tokens)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_median_random(spark, data):
    from sqlstreamstore_spark.analytics.relational import weighted_median

    df = spark.createDataFrame(
        [(f"g{g}", v, " ".join(["w"] * w)) for g, v, w in data],
        "source string, n_chars long, text string",
    )
    got = {r.source: (r.total_w, r.wmedian) for r in weighted_median(df).collect()}
    by_g: dict[str, list] = {}
    for g, v, w in data:
        by_g.setdefault(f"g{g}", []).append((v, w))
    for g, pairs in by_g.items():
        pairs = sorted(pairs)
        total = sum(w for _, w in pairs)
        cum = 0
        for v, w in pairs:
            cum += w
            if 2 * cum >= total:
                assert got[g] == (total, v), g
                break


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seqs=st.lists(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=1,
            max_size=30,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_ewma_random_sequences(spark, seqs):
    from sqlstreamstore_spark.analytics.events import ewma_value

    rows, eid = [], 0
    for u, xs in enumerate(seqs):
        for i, x in enumerate(xs):
            rows.append((eid, u, _ts(1_700_000_000 + i * 60), float(x)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r.user_id, r.event_id): r.ewma for r in ewma_value(df, alpha=0.25).collect()
    }
    eid = 0
    for u, xs in enumerate(seqs):
        num = den = 0.0
        for x in xs:
            num = num * 0.75 + x
            den = den * 0.75 + 1.0
            want = num / den
            scale = max(1.0, abs(want))
            assert abs(got[(u, eid)] - want) / scale < 1e-9
            eid += 1


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(items=st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=200))
def test_hll_registers_match_python_on_arbitrary_strings(spark, items):
    from sqlstreamstore_spark.analytics.text import hll_registers

    df = spark.createDataFrame([(s,) for s in items], "s string")
    got = {(r.reg, r.rho) for r in hll_registers(df).collect()}
    regs: dict[int, int] = {}
    for s in items:
        h = hashlib.md5(s.encode()).hexdigest()
        reg = int(h[:2], 16)
        tail = int(h[2:14], 16)
        rho = 49 if tail == 0 else 49 - tail.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    assert got == set(regs.items())
