"""In-memory backend — the executable spec, mirroring the role of the
reference's InMemoryStreamStore (InMemory/InMemoryStreamStore.cs): fast,
deterministic, used to pin behavior in tests. All behavioral logic lives
in store/base.py; this backend is just ordered dicts/lists."""

from __future__ import annotations

import bisect
import datetime as _dt
from collections.abc import Callable

from sqlstreamstore_spark.store.base import StreamStore
from sqlstreamstore_spark.store.messages import NewStreamMessage, StreamMessage


class _Stream:
    __slots__ = ("messages", "by_id", "current_version", "current_position", "first_position")

    def __init__(self):
        self.messages: list[StreamMessage] = []
        self.by_id: dict[str, StreamMessage] = {}
        self.current_version = -1
        self.current_position = -1
        self.first_position: int | None = None


class InMemoryStreamStore(StreamStore):
    def __init__(
        self,
        get_utc_now: Callable[[], _dt.datetime] | None = None,
        track_deletions: bool = True,
    ):
        super().__init__(get_utc_now, track_deletions)
        self._streams: dict[str, _Stream] = {}
        self._all: list[StreamMessage] = []  # position-ordered
        self._head = -1

    # ---------------------------------------------------------------- backend

    def _head_position(self) -> int:
        return self._head

    def _stream_head(self, stream_id: str):
        s = self._streams.get(stream_id)
        return (s.current_version, s.current_position) if s else None

    def _stream_stored_ids(self, stream_id: str) -> list[str]:
        s = self._streams.get(stream_id)
        return [m.message_id for m in s.messages] if s else []

    def _read_stream_slice(self, stream_id, from_version, count, forwards):
        s = self._streams.get(stream_id)
        if not s:
            return []
        if forwards:
            rows = [m for m in s.messages if m.stream_version >= from_version]
            return rows[:count]
        rows = [m for m in reversed(s.messages) if m.stream_version <= from_version]
        return rows[:count]

    def _read_all_slice(self, from_position, count, forwards):
        keys = [m.position for m in self._all]
        if forwards:
            i = bisect.bisect_left(keys, from_position)
            return self._all[i : i + count]
        i = bisect.bisect_right(keys, from_position)
        return list(reversed(self._all[max(0, i - count) : i]))

    def _commit_messages(self, stream_id, base_version, base_position, messages, created_utc):
        s = self._streams.get(stream_id)
        if s is None:
            s = _Stream()
            self._streams[stream_id] = s
        version, position = base_version, base_position
        for nm in messages:
            version += 1
            position += 1
            m = StreamMessage(
                stream_id=stream_id, message_id=nm.message_id, stream_version=version,
                position=position, created_utc=created_utc, type=nm.type,
                json_metadata=nm.json_metadata, json_data=nm.json_data,
            )
            s.messages.append(m)
            s.by_id[nm.message_id] = m
            if s.first_position is None:
                s.first_position = position
            self._all.append(m)
            self._head = position
        s.current_version = version if messages else s.current_version
        s.current_position = position if messages else s.current_position
        if messages and self.on_appended:
            self.on_appended()
        return version, position

    def _delete_stream_rows(self, stream_id) -> bool:
        s = self._streams.pop(stream_id, None)
        if s is None:
            return False
        dead = {id(m) for m in s.messages}
        self._all = [m for m in self._all if id(m) not in dead]
        return len(dead) > 0

    def _delete_message_row(self, stream_id, message_id) -> bool:
        s = self._streams.get(stream_id)
        if not s or message_id not in s.by_id:
            return False
        m = s.by_id.pop(message_id)
        s.messages.remove(m)
        self._all.remove(m)
        return True

    def _list_stream_ids(self, pattern, kind, max_count, continuation):
        rows = []
        for sid, s in self._streams.items():
            if sid.startswith("$") or s.first_position is None:
                continue
            if pattern and kind == "startswith" and not sid.startswith(pattern):
                continue
            if pattern and kind == "endswith" and not sid.endswith(pattern):
                continue
            if s.first_position <= continuation:
                continue
            rows.append((sid, s.first_position))
        rows.sort(key=lambda r: r[1])
        return rows[:max_count]

    def _point_json_data(self, stream_id, message_id):
        s = self._streams.get(stream_id)
        if not s or message_id not in s.by_id:
            return None
        return s.by_id[message_id].json_data
