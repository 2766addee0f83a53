"""Catch-up subscriptions (SURVEY.md §2.1 #14-15, §2.4).

Semantics from the reference:
  - pull/push loop: read a page → deliver messages in order → on
    IsEnd-transition raise has_caught_up(True/False) edge-triggered
    (StreamSubscription.cs:108-247, AllStreamSubscription.cs:104-232);
  - when caught up and idle, wait on a notifier that polls the head
    position (PollingStreamStoreNotifier.cs:51-82, 1 s default);
  - continue_after_version/position=None ⇒ from start; "end" ⇒ resolve
    the current head first and deliver only later messages
    (AllStreamSubscription.cs:148-177);
  - drop exactly once with a reason: disposed / subscriber error /
    store error (SubscriptionDroppedReason.cs).

Delivery is at-least-once across restarts (caller re-subscribes with
the last seen version/position) and strictly ordered within a
subscription. For the Spark-native streaming path over the Parquet
store, see streaming/source.py (Structured Streaming file source)."""

from __future__ import annotations

import threading
from collections.abc import Callable

from sqlstreamstore_spark.store.base import StreamStore
from sqlstreamstore_spark.store.messages import StreamMessage


class SubscriptionDroppedReason:
    DISPOSED = "Disposed"
    SUBSCRIBER_ERROR = "SubscriberError"
    STREAM_STORE_ERROR = "StreamStoreError"


class PollingNotifier:
    """Signals when the store head advances (PollingStreamStoreNotifier
    .cs:51-82). Where the store exposes on_appended we subscribe to it
    directly (the in-memory reference does the same via its Subject);
    otherwise we poll every `interval` seconds."""

    def __init__(self, store: StreamStore, interval: float = 1.0):
        self._store = store
        self._interval = interval
        self._event = threading.Event()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        hook = getattr(store, "on_appended", None)
        if hook is not None and hasattr(hook, "add"):
            # every subscription registers its own callback (fan-out like
            # the reference's Subject<Unit>); released in dispose().
            hook.add(self._event.set)
            self._uses_hook = True
        else:
            self._uses_hook = False

    def start(self) -> None:
        if self._uses_hook:
            return
        self._thread = threading.Thread(target=self._poll_loop, daemon=True)
        self._thread.start()

    def _poll_loop(self) -> None:
        last = self._store.read_head_position()
        while not self._stop.wait(self._interval):
            head = self._store.read_head_position()
            if head > last:
                last = head
                self._event.set()

    def wait(self, timeout: float) -> bool:
        got = self._event.wait(timeout)
        self._event.clear()
        return got

    def dispose(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        if self._uses_hook:
            self._store.on_appended.remove(self._event.set)


class _Subscription:
    def __init__(self, notifier: PollingNotifier):
        self._notifier = notifier
        self._disposed = threading.Event()
        self._done = threading.Event()
        self._thread: threading.Thread | None = None
        self.last_delivered: int | None = None
        self.dropped_reason: str | None = None
        self.dropped_exception: Exception | None = None

    def _drop(self, reason: str, exc: Exception | None = None) -> None:
        if self.dropped_reason is None:
            self.dropped_reason = reason
            self.dropped_exception = exc
        self._done.set()

    def dispose(self) -> None:
        self._disposed.set()
        if self._thread:
            self._thread.join(timeout=5)
        self._notifier.dispose()
        self._drop(SubscriptionDroppedReason.DISPOSED)

    def join(self, timeout: float | None = None) -> bool:
        return self._done.wait(timeout)


def subscribe_to_stream(
    store: StreamStore,
    stream_id: str,
    on_message: Callable[[StreamMessage], None],
    continue_after_version: int | None = None,
    from_end: bool = False,
    has_caught_up: Callable[[bool], None] | None = None,
    on_dropped: Callable[[str, Exception | None], None] | None = None,
    page_size: int = 10,
    poll_interval: float = 0.05,
    max_idle_polls: int | None = None,
) -> _Subscription:
    """Catch-up subscription on one stream. page_size=10 matches
    StreamSubscription.cs:19."""
    notifier = PollingNotifier(store, poll_interval)
    sub = _Subscription(notifier)

    if from_end:
        continue_after_version = store.read_stream_head_version(stream_id)

    def run():
        next_version = 0 if continue_after_version is None else continue_after_version + 1
        caught_up_state: bool | None = None
        idle = 0
        nv = next_version
        try:
            while not sub._disposed.is_set():
                page = store.read_stream_forwards(stream_id, nv, page_size)
                messages = page.messages if page.status == "Success" else []
                for m in messages:
                    if sub._disposed.is_set():
                        return
                    try:
                        on_message(m)
                    except Exception as e:  # noqa: BLE001
                        sub._drop(SubscriptionDroppedReason.SUBSCRIBER_ERROR, e)
                        if on_dropped:
                            on_dropped(sub.dropped_reason, e)
                        return
                    sub.last_delivered = m.stream_version
                if messages:
                    nv = messages[-1].stream_version + 1
                elif page.status == "Success":
                    nv = max(nv, page.next_stream_version)
                if page.is_end or page.status != "Success":
                    if caught_up_state is not True and has_caught_up:
                        has_caught_up(True)
                    caught_up_state = True
                    if not messages:
                        idle += 1
                        if max_idle_polls is not None and idle >= max_idle_polls:
                            return
                        notifier.wait(poll_interval)
                    else:
                        idle = 0
                else:
                    if caught_up_state is not False and has_caught_up:
                        has_caught_up(False)
                    caught_up_state = False
                    idle = 0
        except Exception as e:  # noqa: BLE001
            sub._drop(SubscriptionDroppedReason.STREAM_STORE_ERROR, e)
            if on_dropped:
                on_dropped(sub.dropped_reason, e)
        finally:
            sub._done.set()

    notifier.start()
    sub._thread = threading.Thread(target=run, daemon=True)
    sub._thread.start()
    return sub


def subscribe_to_all(
    store: StreamStore,
    on_message: Callable[[StreamMessage], None],
    continue_after_position: int | None = None,
    from_end: bool = False,
    has_caught_up: Callable[[bool], None] | None = None,
    on_dropped: Callable[[str, Exception | None], None] | None = None,
    page_size: int = 10,
    poll_interval: float = 0.05,
    max_idle_polls: int | None = None,
) -> _Subscription:
    """Catch-up subscription on $all (AllStreamSubscription.cs:104-232)."""
    notifier = PollingNotifier(store, poll_interval)
    sub = _Subscription(notifier)

    if from_end:
        continue_after_position = store.read_head_position()

    def run():
        np = 0 if continue_after_position is None else continue_after_position + 1
        caught_up_state: bool | None = None
        idle = 0
        try:
            while not sub._disposed.is_set():
                page = store.read_all_forwards(np, page_size)
                for m in page.messages:
                    if sub._disposed.is_set():
                        return
                    try:
                        on_message(m)
                    except Exception as e:  # noqa: BLE001
                        sub._drop(SubscriptionDroppedReason.SUBSCRIBER_ERROR, e)
                        if on_dropped:
                            on_dropped(sub.dropped_reason, e)
                        return
                    sub.last_delivered = m.position
                np = page.next_position
                if page.is_end:
                    if caught_up_state is not True and has_caught_up:
                        has_caught_up(True)
                    caught_up_state = True
                    if not page.messages:
                        idle += 1
                        if max_idle_polls is not None and idle >= max_idle_polls:
                            return
                        notifier.wait(poll_interval)
                    else:
                        idle = 0
                else:
                    if caught_up_state is not False and has_caught_up:
                        has_caught_up(False)
                    caught_up_state = False
                    idle = 0
        except Exception as e:  # noqa: BLE001
            sub._drop(SubscriptionDroppedReason.STREAM_STORE_ERROR, e)
            if on_dropped:
                on_dropped(sub.dropped_reason, e)
        finally:
            sub._done.set()

    notifier.start()
    sub._thread = threading.Thread(target=run, daemon=True)
    sub._thread.start()
    return sub
