"""Metadata, retention, deletes, list-streams — modeled on
AcceptanceTests.StreamMetadata.cs / StreamLimits.cs / DeleteStream.cs /
DeleteEvent.cs / ListStreams.cs."""

import datetime as dt
import uuid

import pytest

from sqlstreamstore_spark.exceptions import WrongExpectedVersionError
from sqlstreamstore_spark.schema import DELETED_STREAM_ID, ExpectedVersion
from sqlstreamstore_spark.store import InMemoryStreamStore, NewStreamMessage
from sqlstreamstore_spark.store.sqlite_store import SqliteStreamStore


def msgs(*ns):
    return [NewStreamMessage(str(uuid.UUID(int=n)), f"t{n}", f'{{"n":{n}}}') for n in ns]


class Clock:
    def __init__(self):
        self.now = dt.datetime(2024, 1, 1)

    def __call__(self):
        return self.now


@pytest.fixture
def clock():
    return Clock()


@pytest.fixture(params=["memory", "sqlite"])
def store(request, clock):
    if request.param == "memory":
        return InMemoryStreamStore(get_utc_now=clock)
    return SqliteStreamStore(get_utc_now=clock)


def test_metadata_roundtrip(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1))
    store.set_stream_metadata("s", ExpectedVersion.NO_STREAM, max_age=10,
                              max_count=5, metadata_json='{"k":1}')
    meta = store.get_stream_metadata("s")
    assert (meta.max_age, meta.max_count, meta.metadata_json) == (10, 5, '{"k":1}')
    assert meta.metadata_stream_version == 0


def test_metadata_for_unknown_stream(store):
    meta = store.get_stream_metadata("nope")
    assert meta.metadata_stream_version == -1
    assert meta.max_age is None


def test_set_metadata_idempotent(store):
    store.set_stream_metadata("s", ExpectedVersion.NO_STREAM, max_count=3)
    # identical args → same deterministic message id → idempotent no-op
    store.set_stream_metadata("s", ExpectedVersion.NO_STREAM, max_count=3)
    assert store.get_stream_metadata("s").metadata_stream_version == 0


def test_metadata_before_stream_exists(store):
    store.set_stream_metadata("s", ExpectedVersion.NO_STREAM, max_count=2)
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    page = store.read_stream_forwards("s", 0, 10)
    assert [m.stream_version for m in page.messages] == [1, 2]


def test_max_count_scavenges_oldest(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3, 4))
    store.set_stream_metadata("s", ExpectedVersion.NO_STREAM, max_count=2)
    page = store.read_stream_forwards("s", 0, 10)
    assert [m.stream_version for m in page.messages] == [2, 3]
    # appends keep scavenging; versions continue, never renumber
    store.append_to_stream("s", 3, msgs(5))
    page = store.read_stream_forwards("s", 0, 10)
    assert [m.stream_version for m in page.messages] == [3, 4]


def test_max_age_filters_expired(store, clock):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2))
    store.set_stream_metadata("s", ExpectedVersion.NO_STREAM, max_age=60)
    clock.now += dt.timedelta(seconds=30)
    store.append_to_stream("s", 1, msgs(3))
    clock.now += dt.timedelta(seconds=45)  # first two now 75s old, third 45s
    page = store.read_stream_forwards("s", 0, 10)
    assert [m.stream_version for m in page.messages] == [2]
    all_page = store.read_all_forwards(0, 100)
    assert [m.stream_version for m in all_page.messages if m.stream_id == "s"] == [2]


def test_delete_stream_and_tombstone(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    store.delete_stream("s", 2)
    assert store.read_stream_forwards("s", 0, 10).status == "StreamNotFound"
    page = store.read_stream_backwards(DELETED_STREAM_ID, -1, 1)
    assert page.messages[0].type == "$stream-deleted"
    assert '"StreamId":"s"' in page.messages[0].json_data


def test_delete_stream_wrong_version_throws(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2))
    with pytest.raises(WrongExpectedVersionError):
        store.delete_stream("s", 7)


def test_delete_missing_stream(store):
    """DeleteStream.cs:111-131 — deleting an absent stream is a no-op with
    ANY but throws WrongExpectedVersion for a concrete expected version
    (the test body at :129 asserts the exception despite the test name;
    InMemoryStreamStore.cs:270-278 throws for expectedVersion >= 0)."""
    store.delete_stream("nope")  # no raise
    with pytest.raises(WrongExpectedVersionError):
        store.delete_stream("nope", 0)


def test_delete_message_keeps_versions(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    mid = str(uuid.UUID(int=2))
    store.delete_message("s", mid)
    page = store.read_stream_forwards("s", 0, 10)
    assert [m.stream_version for m in page.messages] == [0, 2]
    # append continues from the old head (DeleteEvent.cs:64)
    r = store.append_to_stream("s", 2, msgs(4))
    assert r.current_version == 3
    tomb = store.read_stream_backwards(DELETED_STREAM_ID, -1, 10)
    assert any(m.type == "$message-deleted" for m in tomb.messages)


def test_delete_stream_removes_metadata_stream(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1))
    store.set_stream_metadata("s", max_count=5)
    store.delete_stream("s")
    assert store.get_stream_metadata("s").metadata_stream_version == -1


def test_list_streams_patterns_and_pagination(store):
    for i, sid in enumerate(["app-1", "app-2", "web-1", "web-2", "app-3"]):
        store.append_to_stream(sid, ExpectedVersion.NO_STREAM, msgs(i + 1))
    ids, _ = store.list_streams()
    assert ids == ["app-1", "app-2", "web-1", "web-2", "app-3"]  # creation order
    ids, _ = store.list_streams("app-", "startswith")
    assert ids == ["app-1", "app-2", "app-3"]
    ids, _ = store.list_streams("1", "endswith")
    assert ids == ["app-1", "web-1"]
    page1, token = store.list_streams(max_count=2)
    page2, _ = store.list_streams(max_count=2, continuation=token)
    assert page1 == ["app-1", "app-2"] and page2 == ["web-1", "web-2"]
    # deleted + system streams excluded
    store.delete_stream("app-2")
    store.set_stream_metadata("app-1", max_count=5)
    ids, _ = store.list_streams()
    assert "app-2" not in ids and all(not s.startswith("$") for s in ids)


def test_head_ops(store):
    assert store.read_head_position() == -1
    store.append_to_stream("a", ExpectedVersion.NO_STREAM, msgs(1, 2))
    store.append_to_stream("b", ExpectedVersion.NO_STREAM, msgs(3))
    assert store.read_head_position() == 2
    assert store.read_stream_head_position("a") == 1
    assert store.read_stream_head_version("a") == 1
    assert store.read_stream_head_position("zz") == -1
    assert store.read_stream_head_version("zz") == -1


def test_deletion_tracking_disabled():
    """DisableDeletionTracking parity (AcceptanceTests.DeletionTracking.cs:12-36):
    no tombstones reach $deleted when tracking is off."""
    import uuid

    from sqlstreamstore_spark.schema import ExpectedVersion
    from sqlstreamstore_spark.store import InMemoryStreamStore, NewStreamMessage

    store = InMemoryStreamStore(track_deletions=False)
    msgs = [NewStreamMessage(str(uuid.UUID(int=n)), "t", '{"n":1}') for n in (1, 2)]
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs)
    store.delete_message("s", msgs[0].message_id)
    store.delete_stream("s")
    page = store.read_stream_forwards("$deleted", 0, 10)
    assert page.status == "STREAM_NOT_FOUND" or not page.messages


def test_list_streams_excludes_deleted(store):
    """ListStreams.cs:108-119: deleted streams don't appear (and no
    null/empty entries are returned)."""
    store.append_to_stream("stream-1", ExpectedVersion.ANY, msgs(1))
    store.append_to_stream("stream-2", ExpectedVersion.ANY, msgs(2))
    store.delete_stream("stream-1")
    ids, _ = store.list_streams()
    assert "stream-1" not in ids
    assert all(ids)  # no None/empty entries
    assert "stream-2" in ids


def test_head_ops_on_created_empty_stream(store):
    """ReadHeadCheckpoint.cs: a CREATED-but-empty stream (NoStream + [])
    still reports -1 for both heads, and the global head stays -1."""
    store.append_to_stream("empty", ExpectedVersion.NO_STREAM, [])
    assert store.read_head_position() == -1
    assert store.read_stream_head_position("empty") == -1
    assert store.read_stream_head_version("empty") == -1


def test_can_set_metadata_on_deleted_stream(store):
    """StreamMetadata.cs Can_set_deleted_stream_metadata: setting
    metadata after deletion works (a fresh $$ stream) and reads back."""
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1))
    store.delete_stream("s")
    store.set_stream_metadata("s", max_count=7)
    meta = store.get_stream_metadata("s")
    assert meta.max_count == 7
    assert meta.metadata_stream_version == 0
