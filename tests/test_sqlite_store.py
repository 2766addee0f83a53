"""SQLite-backend specifics: file persistence across reopen, and the
Spark analytics lift (log_df). The full acceptance matrix runs against
this backend via the parameterized fixtures in test_store_*."""

import uuid

from sqlstreamstore_spark.schema import ExpectedVersion
from sqlstreamstore_spark.store import NewStreamMessage
from sqlstreamstore_spark.store.sqlite_store import SqliteStreamStore


def msgs(*ns):
    return [NewStreamMessage(str(uuid.UUID(int=n)), f"t{n}", f'{{"n":{n}}}') for n in ns]


def test_sqlite_survives_reopen(tmp_path):
    path = str(tmp_path / "store.db")
    s1 = SqliteStreamStore(path)
    s1.append_to_stream("a", ExpectedVersion.NO_STREAM, msgs(1, 2))
    s1.append_to_stream("b", ExpectedVersion.NO_STREAM, msgs(3))
    del s1
    s2 = SqliteStreamStore(path)
    assert s2.read_head_position() == 2
    page = s2.read_stream_forwards("a", 0, 10)
    assert [m.stream_version for m in page.messages] == [0, 1]
    # idempotent re-append still recognized after reopen
    r = s2.append_to_stream("a", ExpectedVersion.NO_STREAM, msgs(1, 2))
    assert r.current_version == 1


def test_sqlite_log_df_matches_api(spark):
    s = SqliteStreamStore()
    s.append_to_stream("x", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    s.append_to_stream("y", ExpectedVersion.NO_STREAM, msgs(4))
    df = s.log_df(spark)
    rows = df.orderBy("position").collect()
    assert [r.position for r in rows] == [0, 1, 2, 3]
    assert rows[3].stream_id == "y" and rows[3].stream_version == 0


def test_sqlite_cross_thread_subscription():
    """The subscription reader/notifier threads must be able to read a
    store created on the main thread (serialized by the store lock)."""
    import threading

    from sqlstreamstore_spark.streaming import subscribe_to_all

    s = SqliteStreamStore()
    s.append_to_stream("a", ExpectedVersion.ANY, msgs(1, 2, 3))
    got, done = [], threading.Event()
    sub = subscribe_to_all(
        s,
        lambda m: (got.append(m.position), done.set() if len(got) >= 5 else None),
        page_size=100,
        poll_interval=0.02,
    )
    s.append_to_stream("b", ExpectedVersion.ANY, msgs(4, 5))
    assert done.wait(10)
    sub.dispose()
    assert [p for p in got] == [0, 1, 2, 3, 4]
