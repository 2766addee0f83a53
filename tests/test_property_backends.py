"""Property-based backend equivalence: ANY sequence of store operations
produces identical observable state on the InMemory and SQLite backends
(the executable-spec-vs-real-backend strategy the reference's acceptance
suite implements with hand-written cases, here driven by hypothesis).

Also: paged reads with arbitrary page sizes reconstruct the full log.
"""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sqlstreamstore_spark.exceptions import WrongExpectedVersionError
from sqlstreamstore_spark.schema import ExpectedVersion
from sqlstreamstore_spark.store import InMemoryStreamStore, NewStreamMessage
from sqlstreamstore_spark.store.sqlite_store import SqliteStreamStore

STREAMS = ["s1", "s2", "s3"]

# an op = (stream_idx, expected_version, [message ints])
ops_strategy = st.lists(
    st.tuples(
        st.integers(0, len(STREAMS) - 1),
        st.sampled_from(
            [ExpectedVersion.ANY, ExpectedVersion.NO_STREAM, 0, 1, 2]
        ),
        st.lists(st.integers(1, 60), min_size=1, max_size=4),
        st.booleans(),  # delete the stream instead of appending
    ),
    min_size=1,
    max_size=14,
)


def msgs(ns):
    return [NewStreamMessage(str(uuid.UUID(int=n)), f"t{n}", f'{{"n":{n}}}') for n in ns]


def observe(store):
    """Full observable state: global log + per-stream heads + listing."""
    page = store.read_all_forwards(0, 1000)
    log = [
        (m.position, m.stream_id, m.stream_version, m.message_id, m.type, m.json_data)
        for m in page.messages
    ]
    heads = {
        s: (
            store.read_stream_head_version(s),
            store.read_stream_head_position(s),
        )
        for s in STREAMS
    }
    listed, _ = store.list_streams()
    return log, heads, sorted(listed), store.read_head_position()


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ops=ops_strategy)
def test_memory_and_sqlite_agree(ops):
    mem, sql = InMemoryStreamStore(), SqliteStreamStore()
    for idx, ev, ns, do_delete in ops:
        sid = STREAMS[idx]
        if do_delete:
            r1 = r2 = None
            try:
                mem.delete_stream(sid)
            except WrongExpectedVersionError:
                r1 = "err"
            try:
                sql.delete_stream(sid)
            except WrongExpectedVersionError:
                r2 = "err"
            assert r1 == r2
            continue
        out1 = out2 = None
        try:
            a = mem.append_to_stream(sid, ev, msgs(ns))
            out1 = (a.current_version, a.current_position)
        except WrongExpectedVersionError:
            out1 = "err"
        except ValueError:
            out1 = "err-dup"
        try:
            a = sql.append_to_stream(sid, ev, msgs(ns))
            out2 = (a.current_version, a.current_position)
        except WrongExpectedVersionError:
            out2 = "err"
        except ValueError:
            out2 = "err-dup"
        assert out1 == out2, (sid, ev, ns)
    assert observe(mem) == observe(sql)


@settings(max_examples=25, deadline=None)
@given(
    n_msgs=st.integers(1, 40),
    page=st.integers(1, 17),
    backwards=st.booleans(),
)
def test_paged_reads_reconstruct_log(n_msgs, page, backwards):
    store = InMemoryStreamStore()
    store.append_to_stream("s", ExpectedVersion.ANY, msgs(range(1, n_msgs + 1)))
    got = []
    pos = 1_000_000 if backwards else 0
    read = store.read_all_backwards if backwards else store.read_all_forwards
    p = read(pos, page)
    while True:
        got.extend(m.position for m in p.messages)
        if p.is_end:
            break
        p = p.read_next()
    expect = list(range(n_msgs))
    assert got == (expect[::-1] if backwards else expect)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=st.lists(
    st.tuples(
        st.integers(0, 1),
        st.sampled_from([ExpectedVersion.ANY, ExpectedVersion.NO_STREAM, 0]),
        st.lists(st.integers(1, 30), min_size=1, max_size=3, unique=True),
        st.booleans(),
    ),
    min_size=1, max_size=6,
))
def test_spark_store_agrees_with_memory(spark, tmp_path_factory, ops):
    """The Parquet-backed store obeys the same decision table and
    produces the same observable state as the in-memory spec (few
    examples — each op is Spark work — the cheap backends get the
    deep fuzzing above)."""
    from sqlstreamstore_spark.store import SparkParquetStreamStore

    mem = InMemoryStreamStore()
    spk = SparkParquetStreamStore(
        spark, str(tmp_path_factory.mktemp("prop-store"))
    )
    for idx, ev, ns, do_delete in ops:
        sid = STREAMS[idx]
        if do_delete:
            r1 = r2 = None
            try:
                mem.delete_stream(sid)
            except WrongExpectedVersionError:
                r1 = "err"
            try:
                spk.delete_stream(sid)
            except WrongExpectedVersionError:
                r2 = "err"
            assert r1 == r2
            continue
        o1 = o2 = None
        try:
            a = mem.append_to_stream(sid, ev, msgs(ns))
            o1 = (a.current_version, a.current_position)
        except WrongExpectedVersionError:
            o1 = "err"
        try:
            a = spk.append_to_stream(sid, ev, msgs(ns))
            o2 = (a.current_version, a.current_position)
        except WrongExpectedVersionError:
            o2 = "err"
        assert o1 == o2, (sid, ev, ns)
    assert observe(mem) == observe(spk)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ops=ops_strategy)
def test_http_client_and_memory_agree(ops):
    """The HTTP tier under the same random-op-sequence property: a
    client driving the HAL server over one in-memory store must observe
    exactly what a second, directly-driven in-memory store observes."""
    from sqlstreamstore_spark.http import HttpClientStreamStore, StreamStoreHttpServer

    mem = InMemoryStreamStore()
    backend = InMemoryStreamStore()
    server = StreamStoreHttpServer(backend).start()
    try:
        http = HttpClientStreamStore(server.url)
        for idx, ev, ns, do_delete in ops:
            sid = STREAMS[idx]
            if do_delete:
                outs = []
                for s in (mem, http):
                    try:
                        s.delete_stream(sid)
                        outs.append(None)
                    except WrongExpectedVersionError:
                        outs.append("err")
                assert outs[0] == outs[1]
                continue
            outs = []
            for s in (mem, http):
                try:
                    a = s.append_to_stream(sid, ev, msgs(ns))
                    outs.append((a.current_version, a.current_position))
                except WrongExpectedVersionError:
                    outs.append("err")
                except ValueError:
                    outs.append("err-dup")
            assert outs[0] == outs[1], (sid, ev, ns)
        assert observe(mem) == observe(http)
    finally:
        server.stop()


# -- widened op mix: deletes, per-message deletes, retention metadata,
# and clock advancement (max-age expiry must agree across backends too)

_IDX = st.integers(0, len(STREAMS) - 1)
_full_op = st.one_of(
    st.tuples(
        st.just("append"), _IDX,
        st.sampled_from([ExpectedVersion.ANY, ExpectedVersion.NO_STREAM, 0, 1, 2]),
        st.lists(st.integers(1, 60), min_size=1, max_size=4),
    ),
    st.tuples(st.just("delete_stream"), _IDX, st.just(None), st.just(None)),
    st.tuples(st.just("delete_message"), _IDX, st.integers(1, 60), st.just(None)),
    st.tuples(
        st.just("set_meta"), _IDX,
        st.one_of(st.none(), st.integers(1, 4)),      # max_count
        st.one_of(st.none(), st.integers(20, 120)),   # max_age seconds
    ),
    st.tuples(st.just("tick"), st.integers(1, 90), st.just(None), st.just(None)),
)


class _Clock:
    def __init__(self):
        import datetime as dt

        self.now = dt.datetime(2024, 1, 1)

    def __call__(self):
        return self.now


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ops=st.lists(_full_op, min_size=1, max_size=14))
def test_memory_and_sqlite_agree_with_retention_and_deletes(ops):
    """The full op surface — appends, stream/message deletes, retention
    metadata, time passing — must leave both backends in identical
    observable state, including max-age expiry and max-count scavenge
    effects."""
    import datetime as dt

    clock = _Clock()
    mem = InMemoryStreamStore(get_utc_now=clock)
    sql = SqliteStreamStore(get_utc_now=clock)

    def run(store, op):
        kind = op[0]
        try:
            if kind == "append":
                _k, idx, ev, ns = op
                a = store.append_to_stream(STREAMS[idx], ev, msgs(ns))
                return (a.current_version, a.current_position)
            if kind == "delete_stream":
                store.delete_stream(STREAMS[op[1]])
                return "del"
            if kind == "delete_message":
                store.delete_message(STREAMS[op[1]], str(uuid.UUID(int=op[2])))
                return "delmsg"
            if kind == "set_meta":
                _k, idx, mc, ma = op
                r = store.set_stream_metadata(
                    STREAMS[idx], max_count=mc, max_age=ma
                )
                return ("meta", r.current_version)
        except WrongExpectedVersionError:
            return "err"
        except ValueError:
            return "err-dup"

    for op in ops:
        if op[0] == "tick":
            clock.now += dt.timedelta(seconds=op[1])
            continue
        assert run(mem, op) == run(sql, op), op
    assert observe(mem) == observe(sql)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=st.lists(
    st.tuples(
        st.integers(0, 1),
        st.sampled_from([ExpectedVersion.ANY, ExpectedVersion.NO_STREAM, 0]),
        st.lists(st.integers(1, 30), min_size=1, max_size=3, unique=True),
        st.sampled_from(["append", "delete", "meta"]),
    ),
    min_size=1, max_size=6,
))
def test_spark_store_reopen_cycle_agrees_with_memory(spark, tmp_path_factory, ops):
    """Delta-log durability property: after EVERY mutation the Parquet
    store is REOPENED from disk (a fresh handle resolving the patch
    chain) and must still match the in-memory spec — any state a commit
    fails to carry (the purge-piggyback class of bug) diverges here."""
    from sqlstreamstore_spark.store import SparkParquetStreamStore

    mem = InMemoryStreamStore()
    path = str(tmp_path_factory.mktemp("prop-reopen"))
    spk = SparkParquetStreamStore(spark, path)
    for idx, ev, ns, kind in ops:
        sid = STREAMS[idx]
        r1 = r2 = None
        if kind == "delete":
            try:
                mem.delete_stream(sid)
            except WrongExpectedVersionError:
                r1 = "err"
            try:
                spk.delete_stream(sid)
            except WrongExpectedVersionError:
                r2 = "err"
        elif kind == "meta":
            mem.set_stream_metadata(sid, max_count=2)
            spk.set_stream_metadata(sid, max_count=2)
        else:
            try:
                a = mem.append_to_stream(sid, ev, msgs(ns))
                r1 = (a.current_version, a.current_position)
            except WrongExpectedVersionError:
                r1 = "err"
            try:
                a = spk.append_to_stream(sid, ev, msgs(ns))
                r2 = (a.current_version, a.current_position)
            except WrongExpectedVersionError:
                r2 = "err"
        assert r1 == r2, (sid, ev, ns, kind)
        # the reopened handle must see exactly the same world
        spk = SparkParquetStreamStore(spark, path)
        assert observe(mem) == observe(spk), (sid, ev, ns, kind)
