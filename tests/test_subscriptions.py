"""Subscription semantics (AcceptanceTests.Subscriptions.cs shapes):
ordered delivery, catch-up then live, from-end, caught-up signaling,
drop reasons; plus the Structured Streaming source over the Parquet
store."""

import threading
import time
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


def test_multiple_concurrent_subscriptions_each_get_all():
    """AcceptanceTests.Subscriptions.cs: N independent subscriptions each
    receive every message in order."""
    store = InMemoryStreamStore()
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    collected = [[] for _ in range(3)]
    evts = [threading.Event() for _ in range(3)]

    def mk(i):
        def cb(m):
            collected[i].append(m)
            if len(collected[i]) >= 5:
                evts[i].set()
        return cb

    subs = [subscribe_to_stream(store, "s", mk(i), poll_interval=0.02) for i in range(3)]
    store.append_to_stream("s", ExpectedVersion.ANY, msgs(4, 5))
    assert all(e.wait(5) for e in evts)
    for sub in subs:
        sub.dispose()
    for got in collected:
        assert [m.stream_version for m in got] == [0, 1, 2, 3, 4]


def test_caught_up_fell_behind_cycle():
    """hasCaughtUp edge-triggers: True on IsEnd, False when a burst
    outpaces the page size, True again after draining
    (StreamSubscription.cs:125-158)."""
    store = InMemoryStreamStore()
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1))
    signals = []
    got, evt, cb = collect_until(30)
    sub = subscribe_to_stream(
        store, "s", cb, has_caught_up=signals.append, page_size=5, poll_interval=0.02
    )
    deadline = time.time() + 5
    while not signals and time.time() < deadline:
        time.sleep(0.01)
    assert signals and signals[0] is True
    # burst of 29 > page_size forces a fell-behind (False) then True
    store.append_to_stream("s", ExpectedVersion.ANY, msgs(*range(2, 31)))
    assert evt.wait(5)
    deadline = time.time() + 5
    while signals[-1] is not True or len(signals) < 3:
        if time.time() > deadline:
            break
        time.sleep(0.01)
    sub.dispose()
    assert False in signals  # fell behind during the burst
    assert signals[-1] is True  # and caught back up
    # edge-triggered: no two consecutive equal signals
    assert all(a != b for a, b in zip(signals, signals[1:]))


def test_dispose_stops_delivery_and_reports_reason():
    store = InMemoryStreamStore()
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2))
    dropped = []
    got, evt, cb = collect_until(2)
    sub = subscribe_to_stream(
        store, "s", cb, on_dropped=lambda r, e: dropped.append((r, e)), poll_interval=0.02
    )
    assert evt.wait(5)
    sub.dispose()
    n_before = len(got)
    store.append_to_stream("s", ExpectedVersion.ANY, msgs(3, 4))
    time.sleep(0.2)
    assert len(got) == n_before  # nothing delivered after dispose
    assert sub.dropped_reason == SubscriptionDroppedReason.DISPOSED


def test_subscribe_to_all_continue_after_position():
    store = InMemoryStreamStore()
    store.append_to_stream("a", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    store.append_to_stream("b", ExpectedVersion.NO_STREAM, msgs(4, 5))
    got, evt, cb = collect_until(3)
    sub = subscribe_to_all(store, cb, continue_after_position=1, poll_interval=0.02)
    assert evt.wait(5)
    sub.dispose()
    assert [m.position for m in got] == [2, 3, 4]


def test_subscribe_to_all_on_spark_store(spark, tmp_path):
    """Catch-up + live subscription against the Parquet-backed store
    (paged reads are Spark jobs; on_appended wakes the notifier)."""
    from sqlstreamstore_spark.store import SparkParquetStreamStore

    store = SparkParquetStreamStore(spark, str(tmp_path / "sub-store"))
    store.append_to_stream("s", ExpectedVersion.ANY, msgs(1, 2, 3))
    got, evt, cb = collect_until(5, timeout=30)
    sub = subscribe_to_all(store, cb, page_size=100, poll_interval=0.1)
    store.append_to_stream("t", ExpectedVersion.ANY, msgs(4, 5))
    assert evt.wait(30)
    sub.dispose()
    assert [m.position for m in got] == [0, 1, 2, 3, 4]


def test_disposed_subscription_releases_push_hook():
    """ADVICE r1: dispose() must release the store's on_appended slot so
    later subscriptions still get push wakeups (poll_interval=5s here,
    so only a push delivers within the 3s window)."""
    store = InMemoryStreamStore()
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1))
    s1 = subscribe_to_stream(store, "s", lambda m: None, poll_interval=5)
    assert len(store.on_appended._callbacks) == 1
    s1.dispose()
    assert len(store.on_appended._callbacks) == 0

    got, done = [], threading.Event()

    def cb(m):
        got.append(m)
        if len(got) >= 2:
            done.set()

    s2 = subscribe_to_stream(store, "s", cb, poll_interval=5)
    store.append_to_stream("s", ExpectedVersion.ANY, msgs(2))
    assert done.wait(3), "second subscription did not get a push wakeup"
    s2.dispose()
    assert len(store.on_appended._callbacks) == 0


def test_two_live_subscriptions_both_get_push_wakeups():
    """With on_appended as a callback list, concurrent subscriptions all
    receive push notifications (previously only the first did)."""
    store = InMemoryStreamStore()
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1))
    got = [[], []]
    evts = [threading.Event(), threading.Event()]

    def mk(i):
        def cb(m):
            got[i].append(m)
            if len(got[i]) >= 2:
                evts[i].set()
        return cb

    subs = [subscribe_to_stream(store, "s", mk(i), poll_interval=5) for i in range(2)]
    assert len(store.on_appended._callbacks) == 2
    store.append_to_stream("s", ExpectedVersion.ANY, msgs(2))
    assert all(e.wait(3) for e in evts), "a subscription missed the push wakeup"
    for s in subs:
        s.dispose()


def test_subscribe_to_stream_before_messages_are_written():
    """Can_subscribe_to_a_stream_from_start_before_messages_are_written:
    subscribing to a not-yet-existing stream delivers messages appended
    afterwards."""
    store = InMemoryStreamStore()
    got, evt, cb = collect_until(3)
    sub = subscribe_to_stream(store, "later", cb, poll_interval=0.02)
    store.append_to_stream("later", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    assert evt.wait(5)
    sub.dispose()
    assert [m.stream_version for m in got] == [0, 1, 2]


def test_subscribe_to_all_from_end_on_empty_store():
    """Given_empty_streamstore_can_subscribe_to_all_stream_from_end
    (AllStreamSubscription.cs:176 empty-store edge): from-end on an
    empty store delivers only what arrives after subscribing."""
    store = InMemoryStreamStore()
    got, evt, cb = collect_until(2)
    sub = subscribe_to_all(store, cb, from_end=True, poll_interval=0.02)
    time.sleep(0.1)
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2))
    assert evt.wait(5)
    sub.dispose()
    assert [m.position for m in got] == [0, 1]


def test_dispose_subscription_multiple_times():
    """Can_dispose_stream_subscription_multiple_times: dispose is
    idempotent and the drop reason stays Disposed (fired once)."""
    store = InMemoryStreamStore()
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1))
    drops = []
    sub = subscribe_to_stream(
        store, "s", lambda m: None,
        on_dropped=lambda reason, exc: drops.append(reason), poll_interval=0.02,
    )
    time.sleep(0.2)
    sub.dispose()
    sub.dispose()
    sub.dispose()
    assert sub.dropped_reason == SubscriptionDroppedReason.DISPOSED
    assert drops.count(SubscriptionDroppedReason.DISPOSED) <= 1


def test_deleted_stream_tombstone_has_correct_position_via_subscription():
    """When_delete_then_deleted_message_should_have_correct_position:
    the $deleted tombstone appended by delete_stream is delivered at the
    next global position."""
    store = InMemoryStreamStore()
    store.append_to_stream("a", ExpectedVersion.NO_STREAM, msgs(1, 2))
    store.delete_stream("a")
    got, evt, cb = collect_until(1)
    sub = subscribe_to_all(store, cb, poll_interval=0.02)
    assert evt.wait(5)
    sub.dispose()
    # positions 0,1 are deleted with the stream; the tombstone holds the
    # next assigned position (2)
    assert got[0].stream_id == "$deleted"
    assert got[0].type == "$stream-deleted"
    assert got[0].position == 2


def test_caught_up_notifies_only_once_while_idle():
    """Subscriptions.cs When_caught_up_to_all_then_then_should_notify_
    only_twice: hasCaughtUp(True) is edge-triggered — a multi-page
    catch-up raises it once at the end, and idle polling afterwards must
    not re-raise it."""
    store = InMemoryStreamStore()
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(*range(1, 31)))
    got, evt, cb = collect_until(30)
    signals = []
    sub = subscribe_to_all(
        store, cb, has_caught_up=signals.append, page_size=10, poll_interval=0.02
    )
    try:
        assert evt.wait(5)
        time.sleep(0.3)  # many idle polls
        assert signals.count(True) == 1, signals
    finally:
        sub.dispose()


def test_has_caught_up_raised_on_empty_store():
    """Subscriptions.cs When_subscribe_to_{all,stream}_with_empty_store_
    should_raise_has_caught_up: an empty store still signals caught-up
    (there is nothing to catch up on)."""
    store = InMemoryStreamStore()
    sig_all, sig_stream = [], []
    evt_all, evt_stream = threading.Event(), threading.Event()
    sub1 = subscribe_to_all(
        store, lambda m: None,
        has_caught_up=lambda b: (sig_all.append(b), evt_all.set()),
        poll_interval=0.02,
    )
    sub2 = subscribe_to_stream(
        store, "nope", lambda m: None,
        has_caught_up=lambda b: (sig_stream.append(b), evt_stream.set()),
        poll_interval=0.02,
    )
    try:
        assert evt_all.wait(5) and evt_stream.wait(5)
        assert sig_all[0] is True and sig_stream[0] is True
    finally:
        sub1.dispose()
        sub2.dispose()


def test_subscribe_to_stream_from_end_only_new():
    """Subscriptions.cs Can_subscribe_to_a_stream_from_end: continue
    after the current end delivers only messages appended later."""
    store = InMemoryStreamStore()
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    got, evt, cb = collect_until(2)
    sub = subscribe_to_stream(store, "s", cb, from_end=True)
    try:
        time.sleep(0.1)
        assert got == []
        store.append_to_stream("s", 2, msgs(4, 5))
        assert evt.wait(5)
        assert [m.stream_version for m in got] == [3, 4]
    finally:
        sub.dispose()
