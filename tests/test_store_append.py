"""Append concurrency/idempotency matrix (SURVEY.md §2.3) — ports the
decision-table cases from AcceptanceTests.AppendStream.cs against the
in-memory spec store."""

import uuid

import pytest

from sqlstreamstore_spark.exceptions import InvalidStreamIdError, WrongExpectedVersionError
from sqlstreamstore_spark.schema import ExpectedVersion
from sqlstreamstore_spark.store import InMemoryStreamStore, NewStreamMessage
from sqlstreamstore_spark.store.sqlite_store import SqliteStreamStore


def msgs(*ns):
    return [
        NewStreamMessage(str(uuid.UUID(int=n)), f"type-{n}", f'{{"n":{n}}}') for n in ns
    ]


@pytest.fixture(params=["memory", "sqlite"])
def store(request):
    return InMemoryStreamStore() if request.param == "memory" else SqliteStreamStore()


def test_append_no_stream_creates(store):
    r = store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    assert r.current_version == 2
    assert r.current_position == 2


def test_append_no_stream_idempotent_full_repeat(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    r = store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    assert r.current_version == 2
    assert store.read_head_position() == 2


def test_append_no_stream_idempotent_prefix(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    r = store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2))
    assert r.current_version == 2


def test_append_no_stream_longer_throws(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2))
    with pytest.raises(WrongExpectedVersionError):
        store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))


def test_append_no_stream_mismatch_throws(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    with pytest.raises(WrongExpectedVersionError):
        store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(2, 1))


def test_append_any_appends_and_noops(store):
    store.append_to_stream("s", ExpectedVersion.ANY, msgs(1, 2))
    r = store.append_to_stream("s", ExpectedVersion.ANY, msgs(3, 4))
    assert r.current_version == 3
    # full repeat anywhere in the stream → no-op
    r = store.append_to_stream("s", ExpectedVersion.ANY, msgs(2, 3))
    assert r.current_version == 3
    assert store.read_head_position() == 3


def test_append_any_partial_overlap_throws(store):
    store.append_to_stream("s", ExpectedVersion.ANY, msgs(1, 2, 3))
    with pytest.raises(WrongExpectedVersionError):
        store.append_to_stream("s", ExpectedVersion.ANY, msgs(3, 4))  # 3 stored, 4 not
    with pytest.raises(WrongExpectedVersionError):
        store.append_to_stream("s", ExpectedVersion.ANY, msgs(2, 4))  # run mismatch


def test_append_exact_version(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    r = store.append_to_stream("s", 2, msgs(4))
    assert r.current_version == 3


def test_append_exact_version_ahead_throws(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1))
    with pytest.raises(WrongExpectedVersionError):
        store.append_to_stream("s", 5, msgs(2))


def test_append_exact_version_on_missing_stream_throws(store):
    with pytest.raises(WrongExpectedVersionError):
        store.append_to_stream("nope", 0, msgs(1))


def test_append_exact_version_behind_idempotent(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    # expected 0 with the messages already at versions 1..2 → no-op
    r = store.append_to_stream("s", 0, msgs(2, 3))
    assert r.current_version == 2
    assert store.read_head_position() == 2


def test_append_exact_version_behind_mismatch_throws(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    with pytest.raises(WrongExpectedVersionError):
        store.append_to_stream("s", 0, msgs(2, 4))
    with pytest.raises(WrongExpectedVersionError):
        store.append_to_stream("s", 1, msgs(3, 4))  # runs past stored end


def test_append_duplicate_id_at_head_throws(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2))
    with pytest.raises(WrongExpectedVersionError):
        store.append_to_stream("s", 1, msgs(1))


def test_append_empty_with_expected_version_noops(store):
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2))
    r = store.append_to_stream("s", 1, [])
    assert r.current_version == 1
    assert r.current_position == store.read_head_position()


def test_append_empty_no_stream_creates_empty_stream(store):
    r = store.append_to_stream("s", ExpectedVersion.NO_STREAM, [])
    assert r.current_version == -1
    page = store.read_stream_forwards("s", 0, 10)
    assert page.status == "Success"
    assert page.last_stream_version == -1
    assert page.next_stream_version == 0
    assert page.messages == []


def test_append_rejects_system_streams(store):
    with pytest.raises(InvalidStreamIdError):
        store.append_to_stream("$deleted", ExpectedVersion.ANY, msgs(1))


def test_append_rejects_whitespace_ids(store):
    for bad in ["", "  ", "a b", "a\tb", None]:
        with pytest.raises(InvalidStreamIdError):
            store.append_to_stream(bad, ExpectedVersion.ANY, msgs(1))


def test_positions_are_dense_across_streams(store):
    store.append_to_stream("a", ExpectedVersion.NO_STREAM, msgs(1, 2))
    store.append_to_stream("b", ExpectedVersion.NO_STREAM, msgs(3))
    store.append_to_stream("a", 1, msgs(4))
    page = store.read_all_forwards(0, 10)
    assert [m.position for m in page.messages] == [0, 1, 2, 3]
    assert [m.stream_version for m in page.messages] == [0, 1, 0, 2]


def test_interleaved_concurrency_conflict(store):
    # two writers both read head=0 and try to append at expected 0
    store.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1))
    store.append_to_stream("s", 0, msgs(2))
    with pytest.raises(WrongExpectedVersionError):
        store.append_to_stream("s", 0, msgs(3))


def test_append_any_out_of_order_repeat_throws(store):
    """AppendStream.cs:432-442: replaying previously-committed messages
    in a different order under Any is a mismatch, not idempotent."""
    store.append_to_stream("s", ExpectedVersion.ANY, msgs(1, 2, 3))
    with pytest.raises(WrongExpectedVersionError):
        store.append_to_stream("s", ExpectedVersion.ANY, msgs(2, 1))


def test_append_any_full_suffix_repeat_is_idempotent(store):
    """AppendStream.cs ...Any_and_all_messages_committed...: replaying a
    committed suffix (found mid-stream) no-ops and reports the head."""
    store.append_to_stream("s", ExpectedVersion.ANY, msgs(1, 2, 3, 4))
    r = store.append_to_stream("s", ExpectedVersion.ANY, msgs(3, 4))
    assert (r.current_version, r.current_position) == (3, 3)
    page = store.read_stream_forwards("s", 0, 10)
    assert [m.stream_version for m in page.messages] == [0, 1, 2, 3]


def test_append_to_many_streams_returns_expected_position(store):
    """AppendStream.cs When_append_to_many_streams_returns_expected_
    position: positions are global across streams and results report
    them."""
    r1 = store.append_to_stream("a", ExpectedVersion.NO_STREAM, msgs(1, 2))
    r2 = store.append_to_stream("b", ExpectedVersion.NO_STREAM, msgs(3))
    r3 = store.append_to_stream("a", 1, msgs(4))
    assert (r1.current_position, r2.current_position, r3.current_position) == (1, 2, 3)
    assert store.read_stream_head_position("a") == 3
    assert store.read_stream_head_position("b") == 2


def test_append_url_encodable_ids_across_expected_versions(store):
    """AppendStream.cs URL-encodable theories: ids with /, #, %, ?
    (whitespace stays forbidden, StreamId.cs:16-22) work for every
    expectedVersion sentinel."""
    for i, ev in enumerate(
        [ExpectedVersion.NO_STREAM, ExpectedVersion.ANY, ExpectedVersion.NO_STREAM]
    ):
        sid = f"stream/#%{i}?"
        r = store.append_to_stream(sid, ev, msgs(10 + i))
        assert r.current_version == 0
        page = store.read_stream_forwards(sid, 0, 10)
        assert page.status == "Success" and len(page.messages) == 1
