"""StreamStore base: the full public API of the reference
(IStreamStore.cs / IReadonlyStreamStore.cs) implemented once over a
small set of backend primitives.

Backends implement raw slice reads and the physical commit; everything
behavioral lives here: guards (StreamStoreBase.cs:44-67), the §2.3
append decision (append_logic.py), page-field arithmetic
(InMemoryStreamStore.cs:298-662), metadata via `$$` shadow streams
(InMemoryStreamStore.cs:189-248), delete orchestration + `$deleted`
tombstones (InMemoryStreamStore.cs:250-296, Streams/Deleted.cs),
max-count scavenge after append/set-metadata
(InMemoryStreamStore.cs:103-124) and max-age expiry filtering on reads
(ReadonlyStreamStoreBase.cs:377-462).

Where the reference's in-memory and SQL backends disagree (they are
mutually inconsistent in unpinned corners), we follow the SQL backends,
which filter by key instead of list index:
  - backwards reads with from beyond the head return the existing tail
    (Pg Read.sql) rather than the in-memory empty page;
  - reads address messages by stream_version/position, so mid-stream
    deletes don't shift later messages into earlier slots.
"""

from __future__ import annotations

import datetime as _dt
import json
import threading
import uuid
from collections.abc import Callable

from sqlstreamstore_spark.exceptions import InvalidStreamIdError, WrongExpectedVersionError
from sqlstreamstore_spark.functions.uuid5 import uuid5_py
from sqlstreamstore_spark.schema import (
    DELETED_STREAM_ID,
    MESSAGE_DELETED_TYPE,
    METADATA_TYPE,
    STREAM_DELETED_TYPE,
    ExpectedVersion,
    Position,
    StreamVersion,
    metadata_stream_id,
)
from sqlstreamstore_spark.store import append_logic
from sqlstreamstore_spark.store.messages import (
    AppendResult,
    NewStreamMessage,
    PageReadStatus,
    ReadAllPage,
    ReadDirection,
    ReadStreamPage,
    SetStreamMetadataResult,
    StreamMessage,
    StreamMetadataResult,
)

#: Namespace for deterministic metadata-message ids (the reference uses a
#: .NET-specific SHA-1 GUID scheme, MetadataMessageIdGenerator.cs:33-36;
#: we use RFC-4122 uuid5 over the same inputs — same idempotency
#: property, different byte recipe).
METADATA_ID_NAMESPACE = uuid.UUID("8d1e0b02-0d78-408e-8211-f899be6f8aa2")


def _utcnow() -> _dt.datetime:
    return _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)


def validate_stream_id(stream_id: str, allow_system: bool = False) -> None:
    """StreamId.cs:16-22 (+ $-guard StreamStoreBase.cs:50 for writes)."""
    if not isinstance(stream_id, str) or not stream_id or stream_id.strip() == "":
        raise InvalidStreamIdError(f"Invalid stream id: {stream_id!r}")
    if any(c.isspace() for c in stream_id):
        raise InvalidStreamIdError(f"Stream id must not contain whitespace: {stream_id!r}")
    if not allow_system and stream_id.startswith("$"):
        raise InvalidStreamIdError(f"Stream id must not start with '$': {stream_id!r}")


class AppendedCallbacks:
    """Multi-subscriber append hook: calling it fans out to every
    registered callback; add/remove are idempotent per callback."""

    def __init__(self) -> None:
        self._callbacks: list[Callable[[], None]] = []

    def add(self, cb: Callable[[], None]) -> None:
        if cb not in self._callbacks:
            self._callbacks.append(cb)

    def remove(self, cb: Callable[[], None]) -> None:
        if cb in self._callbacks:
            self._callbacks.remove(cb)

    def __call__(self) -> None:
        for cb in list(self._callbacks):
            cb()

    def __bool__(self) -> bool:
        return True  # safe to invoke unconditionally; empty call is a no-op


class StreamStore:
    """Abstract store. Subclasses implement the _backend primitives."""

    def __init__(
        self,
        get_utc_now: Callable[[], _dt.datetime] | None = None,
        track_deletions: bool = True,
    ):
        self.get_utc_now = get_utc_now or _utcnow
        # Tombstone appends to $deleted can be disabled, mirroring the
        # reference's DisableDeletionTracking
        # (PostgresStreamStoreSettings.cs:98, AcceptanceTests.DeletionTracking.cs).
        self.track_deletions = track_deletions
        # Metadata cache (the single-writer analog of the reference's
        # MetadataMaxAgeCache, Infrastructure/MetadataMaxAgeCache.cs:37-68
        # — we can invalidate exactly instead of expiring on a TTL).
        self._meta_cache: dict[str, StreamMetadataResult] = {}
        # Append notification hook — a callback LIST so every concurrent
        # subscription gets push wakeups (the reference's Subject<Unit>
        # fan-out, InMemoryStreamStore.cs:53-63), and a disposed
        # subscription releases only its own slot (ADVICE r1).
        self.on_appended = AppendedCallbacks()
        # Serialize all writers within the process (the reference's
        # in-memory store holds a lock for every mutation,
        # InMemoryStreamStore.cs; the threaded HTTP server makes
        # concurrent writers a reality for every backend). Re-entrant:
        # metadata/delete paths nest through _append_internal.
        self._write_lock = threading.RLock()

    # ---------------------------------------------------------------- backend
    # primitives each backend implements

    def _head_position(self) -> int:
        raise NotImplementedError

    def _stream_head(self, stream_id: str) -> tuple[int, int] | None:
        """(current_version, current_position) or None if absent."""
        raise NotImplementedError

    def _stream_stored_ids(self, stream_id: str) -> list[str]:
        """Message ids of a stream in stored (version) order."""
        raise NotImplementedError

    def _read_stream_slice(
        self, stream_id: str, from_version: int, count: int, forwards: bool
    ) -> list[StreamMessage]:
        raise NotImplementedError

    def _read_all_slice(
        self, from_position: int, count: int, forwards: bool
    ) -> list[StreamMessage]:
        raise NotImplementedError

    def _commit_messages(
        self,
        stream_id: str,
        base_version: int,
        base_position: int,
        messages: list[NewStreamMessage],
        created_utc: _dt.datetime,
    ) -> tuple[int, int]:
        """Physically append; versions base_version+1.. and positions
        base_position+1.. are assigned by the caller's serialized commit.
        Returns (new_version, new_position)."""
        raise NotImplementedError

    def _delete_stream_rows(self, stream_id: str) -> bool:
        raise NotImplementedError

    def _delete_message_row(self, stream_id: str, message_id: str) -> bool:
        raise NotImplementedError

    def _list_stream_ids(
        self, pattern: str | None, kind: str, max_count: int, continuation: int
    ) -> list[tuple[str, int]]:
        """[(stream_id, first_position)] ordered by first appearance."""
        raise NotImplementedError

    def _point_json_data(self, stream_id: str, message_id: str) -> str | None:
        """Lazy json_data fetch for prefetch_json_data=False."""
        raise NotImplementedError

    # ---------------------------------------------------------------- append

    def append_to_stream(
        self,
        stream_id: str,
        expected_version: int,
        messages: list[NewStreamMessage] | NewStreamMessage,
    ) -> AppendResult:
        validate_stream_id(stream_id)
        if isinstance(messages, NewStreamMessage):
            # single-message convenience overload
            # (StreamStoreExtensions.cs:185-196)
            messages = [messages]
        ids = [m.message_id for m in messages]
        if len(set(ids)) != len(ids):
            # Reference backends diverge here (InMemory stores both, SQL
            # backends' ON CONFLICT reconciliation throws); we pin the
            # strict behavior so every backend agrees.
            raise ValueError("duplicate message ids within one append batch")
        return self._append_internal(stream_id, expected_version, list(messages))

    def _append_internal(
        self, stream_id: str, expected_version: int, messages: list[NewStreamMessage]
    ) -> AppendResult:
        with self._write_lock:
            return self._append_internal_locked(stream_id, expected_version, messages)

    def _append_internal_locked(
        self, stream_id: str, expected_version: int, messages: list[NewStreamMessage]
    ) -> AppendResult:
        # empty batch + concrete expected version: no-op at head
        # (StreamStoreBase.cs:59-63 — note CurrentVersion echoes the
        # expectation, an acceptance-pinned quirk).
        if not messages and expected_version >= 0:
            return AppendResult(expected_version, self._head_position())

        head = self._stream_head(stream_id)
        stream_exists = head is not None
        stored_ids = self._stream_stored_ids(stream_id) if stream_exists else []
        decision = append_logic.decide_append(
            stream_id,
            expected_version,
            [m.message_id for m in messages],
            stored_ids,
            stream_exists,
            current_version=head[0] if stream_exists else -1,
        )
        if decision == append_logic.NOOP:
            return AppendResult(head[0], head[1])
        if not messages:
            # NO_STREAM/ANY with an empty batch creates an empty stream
            # (observable as Success/-1 on reads — InMemoryStreamStore
            # .cs:132-150 via AppendEvents over zero messages).
            if not stream_exists:
                self._commit_messages(stream_id, -1, self._head_position(), [],
                                      self.get_utc_now())
            return AppendResult(
                head[0] if stream_exists else -1,
                head[1] if stream_exists else -1,
            )

        base_version = head[0] if stream_exists else -1
        base_position = self._head_position()
        new_version, new_position = self._commit_messages(
            stream_id, base_version, base_position, messages, self.get_utc_now()
        )
        result = AppendResult(new_version, new_position)
        # post-append max-count scavenge (InMemoryStreamStore.cs:98-100)
        if not stream_id.startswith("$"):
            meta = self.get_stream_metadata(stream_id)
            self._check_stream_max_count(stream_id, meta.max_count)
        return result

    def _check_stream_max_count(self, stream_id: str, max_count: int | None) -> None:
        """Delete oldest messages beyond max_count
        (InMemoryStreamStore.cs:103-124)."""
        if max_count is None:
            return
        head = self._stream_head(stream_id)
        if head is None:
            return
        ids = self._stream_stored_ids(stream_id)  # version-ordered
        if len(ids) > max_count:
            # victims = the oldest overflow — the id list (already keyed
            # reads, no full-message fetch) is all the purge needs
            self._purge_victims(stream_id, list(ids[: len(ids) - max_count]))

    def _purge_victims(self, stream_id: str, message_ids: list[str]) -> None:
        """Delete the scavenge victims. Default: one delete per message
        (fine for in-memory/SQLite). Backends whose per-delete commit is
        expensive (a manifest fsync on the Parquet store) override this
        with a single batched commit."""
        for mid in message_ids:
            self.delete_message(stream_id, mid, _validate=False)

    # ---------------------------------------------------------------- reads

    def read_head_position(self) -> int:
        return self._head_position()

    def read_stream_head_position(self, stream_id: str) -> int:
        head = self._stream_head(stream_id)
        return head[1] if head else Position.NONE

    def read_stream_head_version(self, stream_id: str) -> int:
        head = self._stream_head(stream_id)
        return head[0] if head else StreamVersion.NONE

    def read_message_by_id(self, stream_id: str, message_id: str):
        """Point lookup of one message by its stream-scoped message id,
        or None. A miss answers from the stored-id index WITHOUT paging
        the stream (advisor r4: the HTTP tier's by-id GET previously
        scanned every page of a long stream on a 404); a hit starts
        paging at the id's ordinal — versions only grow (DeleteMessage
        keeps them), so stored ordinal i has stream_version >= i and
        the id is always at or after that page."""
        validate_stream_id(stream_id)
        ids = self._stream_stored_ids(stream_id)
        try:
            ordinal = ids.index(message_id)
        except ValueError:
            return None
        v = ordinal
        while True:
            page = self.read_stream_forwards(stream_id, v, 100,
                                             prefetch_json_data=True)
            if page.status != PageReadStatus.SUCCESS:
                return None
            for m in page.messages:
                if m.message_id == message_id:
                    return m
            if page.is_end:
                return None
            v = page.next_stream_version

    @staticmethod
    def _ensure_read_args(frm: int, max_count: int, allow_end: bool) -> None:
        """Argument guards matching the reference's Ensure checks
        (ReadonlyStreamStoreBase.cs:45-58): max_count >= 1; from >= 0,
        or the -1 end sentinel on backwards reads."""
        if max_count < 1:
            raise ValueError("max_count must be >= 1")
        if frm < (-1 if allow_end else 0):
            raise ValueError("from position/version out of range")

    def read_all_forwards(
        self, from_position_inclusive: int = 0, max_count: int = 100,
        prefetch_json_data: bool = True,
    ) -> ReadAllPage:
        self._ensure_read_args(from_position_inclusive, max_count, allow_end=False)
        head = self._head_position()
        if head < 0:
            return ReadAllPage(Position.START, Position.START, True,
                               ReadDirection.FORWARD, [], None)
        if from_position_inclusive > head:
            page = ReadAllPage(from_position_inclusive, from_position_inclusive, True,
                               ReadDirection.FORWARD, [], None)
            page.read_next = self._next_all(page, max_count, prefetch_json_data, True)
            return page
        rows = self._read_all_slice(from_position_inclusive, max_count + 1, True)
        rows = self._apply_prefetch(rows, prefetch_json_data)
        is_end = len(rows) <= max_count
        returned = rows if is_end else rows[:max_count]
        next_position = (
            (returned[-1].position + 1 if returned else from_position_inclusive)
            if is_end
            else rows[max_count].position
        )
        returned = self._filter_expired(returned)
        page = ReadAllPage(
            returned[0].position if returned else from_position_inclusive,
            next_position, is_end, ReadDirection.FORWARD, returned, None,
        )
        page.read_next = self._next_all(page, max_count, prefetch_json_data, True)
        return page

    def read_all_backwards(
        self, from_position_inclusive: int = Position.END, max_count: int = 100,
        prefetch_json_data: bool = True,
    ) -> ReadAllPage:
        self._ensure_read_args(from_position_inclusive, max_count, allow_end=True)
        head = self._head_position()
        if head < 0:
            return ReadAllPage(Position.START, Position.START, True,
                               ReadDirection.BACKWARD, [], None)
        frm = head if from_position_inclusive == Position.END else from_position_inclusive
        rows = self._read_all_slice(frm, max_count + 1, False)
        rows = self._apply_prefetch(rows, prefetch_json_data)
        is_end = len(rows) <= max_count
        returned = rows if is_end else rows[:max_count]
        next_position = 0 if is_end else rows[max_count].position
        returned = self._filter_expired(returned)
        page = ReadAllPage(
            returned[0].position if returned else frm,
            next_position, is_end, ReadDirection.BACKWARD, returned, None,
        )
        page.read_next = self._next_all(page, max_count, prefetch_json_data, False)
        return page

    def _next_all(self, page: ReadAllPage, max_count: int, prefetch: bool, forwards: bool):
        def read_next() -> ReadAllPage:
            if forwards:
                return self.read_all_forwards(page.next_position, max_count, prefetch)
            return self.read_all_backwards(page.next_position, max_count, prefetch)

        return read_next

    def read_stream_forwards(
        self, stream_id: str, from_version_inclusive: int = 0, max_count: int = 100,
        prefetch_json_data: bool = True,
    ) -> ReadStreamPage:
        self._ensure_read_args(from_version_inclusive, max_count, allow_end=False)
        head = self._stream_head(stream_id)
        if head is None:
            return ReadStreamPage(
                stream_id, PageReadStatus.STREAM_NOT_FOUND, from_version_inclusive,
                -1, -1, -1, ReadDirection.FORWARD, True, [], None,
            )
        last_version, last_position = head
        rows = self._read_stream_slice(stream_id, from_version_inclusive, max_count + 1, True)
        rows = self._apply_prefetch(rows, prefetch_json_data)
        is_end = len(rows) <= max_count
        returned = rows if is_end else rows[:max_count]
        if last_version == -1:
            next_version = 0
        elif not returned:
            next_version = last_version + 1
        else:
            next_version = returned[-1].stream_version + 1
        returned = self._filter_expired(returned, stream_id=stream_id)
        page = ReadStreamPage(
            stream_id, PageReadStatus.SUCCESS, from_version_inclusive,
            next_version, last_version, last_position,
            ReadDirection.FORWARD, is_end, returned, None,
        )
        page.read_next = self._next_stream(page, max_count, prefetch_json_data, True)
        return page

    def read_stream_backwards(
        self, stream_id: str, from_version_inclusive: int = StreamVersion.END,
        max_count: int = 100, prefetch_json_data: bool = True,
    ) -> ReadStreamPage:
        self._ensure_read_args(from_version_inclusive, max_count, allow_end=True)
        head = self._stream_head(stream_id)
        if head is None:
            return ReadStreamPage(
                stream_id, PageReadStatus.STREAM_NOT_FOUND, from_version_inclusive,
                -1, -1, -1, ReadDirection.BACKWARD, True, [], None,
            )
        last_version, last_position = head
        frm = last_version if from_version_inclusive == StreamVersion.END else from_version_inclusive
        rows = self._read_stream_slice(stream_id, frm, max_count + 1, False)
        rows = self._apply_prefetch(rows, prefetch_json_data)
        is_end = len(rows) <= max_count
        returned = rows if is_end else rows[:max_count]
        next_version = (
            returned[-1].stream_version - 1 if returned else StreamVersion.END
        ) if is_end else rows[max_count].stream_version
        is_end_page = next_version < 0 if is_end else False
        returned = self._filter_expired(returned, stream_id=stream_id)
        page = ReadStreamPage(
            stream_id, PageReadStatus.SUCCESS, from_version_inclusive,
            next_version, last_version, last_position,
            ReadDirection.BACKWARD, is_end_page if not is_end else True, returned, None,
        )
        page.read_next = self._next_stream(page, max_count, prefetch_json_data, False)
        return page

    def _next_stream(self, page: ReadStreamPage, max_count: int, prefetch: bool, forwards: bool):
        def read_next() -> ReadStreamPage:
            if forwards:
                return self.read_stream_forwards(page.stream_id, page.next_stream_version,
                                                 max_count, prefetch)
            return self.read_stream_backwards(page.stream_id, page.next_stream_version,
                                              max_count, prefetch)

        return read_next

    def _apply_prefetch(self, rows: list[StreamMessage], prefetch: bool) -> list[StreamMessage]:
        if prefetch:
            return rows
        out = []
        for m in rows:
            sid, mid = m.stream_id, m.message_id
            out.append(
                StreamMessage(
                    stream_id=sid, message_id=mid, stream_version=m.stream_version,
                    position=m.position, created_utc=m.created_utc, type=m.type,
                    json_metadata=m.json_metadata, json_data=None,
                    _get_json_data=lambda s=sid, i=mid: self._point_json_data(s, i),
                )
            )
        return out

    # ------------------------------------------------------------- retention

    def _filter_expired(
        self, messages: list[StreamMessage], stream_id: str | None = None
    ) -> list[StreamMessage]:
        """Max-age filter + synchronous purge
        (ReadonlyStreamStoreBase.cs:377-462). `$`-streams exempt."""
        if stream_id is not None and stream_id.startswith("$"):
            return messages
        now = self.get_utc_now()
        max_age_cache: dict[str, int | None] = {}
        valid: list[StreamMessage] = []
        purge: list[StreamMessage] = []
        for m in messages:
            if m.stream_id.startswith("$"):
                valid.append(m)
                continue
            if m.stream_id not in max_age_cache:
                max_age_cache[m.stream_id] = self.get_stream_metadata(m.stream_id).max_age
            max_age = max_age_cache[m.stream_id]
            if max_age is None or m.created_utc + _dt.timedelta(seconds=max_age) > now:
                valid.append(m)
            else:
                purge.append(m)
        for m in purge:
            self.delete_message(m.stream_id, m.message_id, _validate=False)
        return valid

    # ------------------------------------------------------------- metadata

    def get_stream_metadata(self, stream_id: str) -> StreamMetadataResult:
        if stream_id in self._meta_cache:
            return self._meta_cache[stream_id]
        meta_id = metadata_stream_id(stream_id)
        page = self.read_stream_backwards(meta_id, StreamVersion.END, 1)
        if page.status == PageReadStatus.STREAM_NOT_FOUND or not page.messages:
            result = StreamMetadataResult(stream_id, -1)
        else:
            payload = json.loads(page.messages[0].json_data)
            result = StreamMetadataResult(
                stream_id,
                page.last_stream_version,
                payload.get("MaxAge"),
                payload.get("MaxCount"),
                payload.get("MetaJson"),
            )
        self._meta_cache[stream_id] = result
        return result

    def set_stream_metadata(
        self,
        stream_id: str,
        expected_stream_metadata_version: int = ExpectedVersion.ANY,
        max_age: int | None = None,
        max_count: int | None = None,
        metadata_json: str | None = None,
    ) -> SetStreamMetadataResult:
        validate_stream_id(stream_id)
        meta_id = metadata_stream_id(stream_id)
        payload = json.dumps(
            {"StreamId": stream_id, "MaxAge": max_age, "MaxCount": max_count,
             "MetaJson": metadata_json},
            separators=(",", ":"),
        )
        message_id = str(
            uuid.uuid5(
                METADATA_ID_NAMESPACE,
                f"{meta_id}:{expected_stream_metadata_version}:{payload}",
            )
        )
        msg = NewStreamMessage(message_id, METADATA_TYPE, payload)
        with self._write_lock:
            result = self._append_internal(meta_id, expected_stream_metadata_version, [msg])
            self._meta_cache.pop(stream_id, None)
            self._check_stream_max_count(stream_id, max_count)
        return SetStreamMetadataResult(result.current_version)

    # --------------------------------------------------------------- deletes

    def delete_stream(
        self, stream_id: str, expected_version: int = ExpectedVersion.ANY
    ) -> None:
        validate_stream_id(stream_id)
        with self._write_lock:
            self._delete_stream_internal(stream_id, expected_version)
            self._delete_stream_internal(metadata_stream_id(stream_id), ExpectedVersion.ANY)
            self._meta_cache.pop(stream_id, None)

    def _delete_stream_internal(self, stream_id: str, expected_version: int) -> None:
        head = self._stream_head(stream_id)
        if head is None:
            # Deleting an absent stream throws only for a concrete (>= 0)
            # expected version (InMemoryStreamStore.cs:270-278; the
            # acceptance test named ..._then_should_not_throw actually
            # asserts WrongExpectedVersionException in its body,
            # AcceptanceTests.DeleteStream.cs:121-131).
            if expected_version >= 0:
                raise WrongExpectedVersionError(stream_id, expected_version)
            return
        if expected_version != ExpectedVersion.ANY and head[0] != expected_version:
            raise WrongExpectedVersionError(stream_id, expected_version)
        deleted = self._delete_stream_rows(stream_id)
        if deleted and self.track_deletions and not stream_id.startswith("$$"):
            # Deterministic tombstone id (reference uses a random GUID,
            # Deleted.cs:36 — determinism is strictly better for a
            # replayable distributed commit log; "v2" salt = delete
            # generation, so re-creating and re-deleting still appends).
            tombstone = NewStreamMessage(
                uuid5_py(f"$stream-deleted:{stream_id}:{self._head_position()}"),
                STREAM_DELETED_TYPE,
                json.dumps({"StreamId": stream_id}, separators=(",", ":")),
            )
            self._append_internal(DELETED_STREAM_ID, ExpectedVersion.ANY, [tombstone])

    def delete_message(self, stream_id: str, message_id: str, _validate: bool = True) -> None:
        if _validate:
            validate_stream_id(stream_id, allow_system=True)
        with self._write_lock:
            self._delete_message_locked(stream_id, message_id)

    def _delete_message_locked(self, stream_id: str, message_id: str) -> None:
        deleted = self._delete_message_row(stream_id, message_id)
        if deleted and self.track_deletions:
            tombstone = NewStreamMessage(
                uuid5_py(f"$message-deleted:{stream_id}:{message_id}"),
                MESSAGE_DELETED_TYPE,
                json.dumps({"StreamId": stream_id, "MessageId": message_id},
                           separators=(",", ":")),
            )
            self._append_internal(DELETED_STREAM_ID, ExpectedVersion.ANY, [tombstone])

    # ----------------------------------------------------------------- list

    def list_streams(
        self, pattern: str | None = None, kind: str = "any",
        max_count: int = 100, continuation: int = -1,
    ) -> tuple[list[str], int]:
        """Returns (stream_ids, continuation_token)."""
        rows = self._list_stream_ids(pattern, kind, max_count, continuation)
        token = rows[-1][1] if rows else continuation
        return [sid for sid, _ in rows], token
