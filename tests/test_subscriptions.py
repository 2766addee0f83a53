"""Subscription semantics (AcceptanceTests.Subscriptions.cs shapes):
ordered delivery, catch-up then live, from-end, caught-up signaling,
drop reasons; plus the Structured Streaming source over the Parquet
store."""

import threading
import uuid

import pytest

from sqlstreamstore_spark.schema import ExpectedVersion
from sqlstreamstore_spark.store import InMemoryStreamStore, NewStreamMessage
from sqlstreamstore_spark.streaming import (
    SubscriptionDroppedReason,
    subscribe_to_all,
    subscribe_to_stream,
)


def msgs(*ns):
    return [NewStreamMessage(str(uuid.UUID(int=n)), f"t{n}", f'{{"n":{n}}}') for n in ns]


def collect_until(n, timeout=5.0):
    got, evt = [], threading.Event()

    def cb(m):
        got.append(m)
        if len(got) >= n:
            evt.set()

    return got, evt, cb


def test_subscribe_to_stream_catchup_then_live():
    store = InMemoryStreamStore()
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    got, evt, cb = collect_until(5)
    caught = []
    sub = subscribe_to_stream(store, "s", cb, has_caught_up=caught.append)
    try:
        assert evt.wait(1) is False and len(got) == 3
        store.append_to_stream("s", 2, msgs(4, 5))
        assert evt.wait(5)
        assert [m.stream_version for m in got] == [0, 1, 2, 3, 4]
        assert caught[0] is True
    finally:
        sub.dispose()
    assert sub.dropped_reason == SubscriptionDroppedReason.DISPOSED


def test_subscribe_to_stream_from_version():
    store = InMemoryStreamStore()
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3, 4))
    got, evt, cb = collect_until(2)
    sub = subscribe_to_stream(store, "s", cb, continue_after_version=1)
    try:
        assert evt.wait(5)
        assert [m.stream_version for m in got] == [2, 3]
    finally:
        sub.dispose()


def test_subscribe_to_all_from_end_only_new():
    store = InMemoryStreamStore()
    store.append_to_stream("a", ExpectedVersion.NO_STREAM, msgs(1, 2))
    got, evt, cb = collect_until(1)
    sub = subscribe_to_all(store, cb, from_end=True)
    try:
        store.append_to_stream("b", ExpectedVersion.NO_STREAM, msgs(3))
        assert evt.wait(5)
        assert [m.position for m in got] == [2]
    finally:
        sub.dispose()


def test_subscribe_to_all_global_order():
    store = InMemoryStreamStore()
    for i in range(10):
        store.append_to_stream(f"s{i % 3}", ExpectedVersion.ANY, msgs(i + 1))
    got, evt, cb = collect_until(10)
    sub = subscribe_to_all(store, cb, page_size=3)
    try:
        assert evt.wait(5)
        assert [m.position for m in got] == list(range(10))
    finally:
        sub.dispose()


def test_subscriber_error_drops_subscription():
    store = InMemoryStreamStore()
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1))
    dropped = []

    def bad(_m):
        raise RuntimeError("boom")

    sub = subscribe_to_stream(store, "s", bad, on_dropped=lambda r, e: dropped.append(r))
    assert sub.join(5)
    assert dropped == [SubscriptionDroppedReason.SUBSCRIBER_ERROR]
    sub.dispose()


def test_structured_streaming_source(spark, tmp_path):
    from sqlstreamstore_spark.store import SparkParquetStreamStore
    from sqlstreamstore_spark.streaming.source import subscribe_foreach_batch

    store = SparkParquetStreamStore(spark, str(tmp_path / "stream-store"))
    store.append_to_stream("s1", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    batches = []
    q = subscribe_foreach_batch(store, batches.append)
    try:
        q.processAllAvailable()
        store.append_to_stream("s1", 2, msgs(4, 5))
        q.processAllAvailable()
        delivered = [r["position"] for b in batches for r in b]
        assert delivered == [0, 1, 2, 3, 4]
    finally:
        q.stop()
