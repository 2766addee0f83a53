"""Reference acceptance-test corners called out by the r1 verdict,
named per the originating case and run against all three backends:

  - When_read_without_prefetch_and_stream_is_deleted_then_GetJsonData_
    should_return_null (AcceptanceTests.ReadAll.cs:88)
  - Can_set_and_get_stream_metadata_for_non_existent_stream +
    append-after (AcceptanceTests.StreamMetadata.cs:29-60)
  - When_read_stream_forwards/backwards_with_url_encodable_stream
    (AcceptanceTests.ReadStream.cs:351-373)
"""

import uuid

import pytest

from sqlstreamstore_spark.schema import ExpectedVersion, StreamVersion
from sqlstreamstore_spark.store import (
    InMemoryStreamStore,
    NewStreamMessage,
    SparkParquetStreamStore,
)
from sqlstreamstore_spark.store.sqlite_store import SqliteStreamStore


def msgs(*ns):
    return [NewStreamMessage(str(uuid.UUID(int=n)), f"t{n}", f'{{"n":{n}}}') for n in ns]


@pytest.fixture(params=["memory", "parquet", "sqlite"])
def store(request, spark, tmp_path):
    if request.param == "memory":
        return InMemoryStreamStore()
    if request.param == "parquet":
        return SparkParquetStreamStore(spark, str(tmp_path / "store"))
    return SqliteStreamStore(str(tmp_path / "store.db"))


def test_read_without_prefetch_after_stream_delete_returns_null_json(store):
    """AcceptanceTests.ReadAll.cs:88 — a page read with
    prefetch_json_data=False holds lazy json handles; deleting the
    stream before resolving them makes get_json_data() return None."""
    store.append_to_stream("stream-1", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    page = store.read_all_forwards(0, 4, prefetch_json_data=False)
    assert all(m.json_data is None for m in page.messages if m.stream_id == "stream-1")
    store.delete_stream("stream-1")
    for m in page.messages:
        if m.stream_id == "stream-1":
            assert m.get_json_data() is None


@pytest.mark.parametrize(
    "expected", [ExpectedVersion.NO_STREAM, ExpectedVersion.ANY]
)
def test_set_and_get_stream_metadata_for_non_existent_stream(store, expected):
    """AcceptanceTests.StreamMetadata.cs:29 — metadata can be set before
    the stream exists, for both NoStream and Any."""
    store.set_stream_metadata(
        "stream-1", expected, max_age=2, max_count=3, metadata_json='{"k":"v"}'
    )
    meta = store.get_stream_metadata("stream-1")
    assert meta.stream_id == "stream-1"
    assert meta.max_age == 2
    assert meta.max_count == 3
    assert meta.metadata_stream_version == 0
    assert meta.metadata_json == '{"k":"v"}'


def test_set_stream_metadata_then_append_with_nostream(store):
    """AcceptanceTests.StreamMetadata.cs:52 — setting metadata first
    must not make a later NoStream append fail (the `$$` shadow stream
    is not the stream itself)."""
    store.set_stream_metadata("stream-1", ExpectedVersion.ANY, max_age=20, max_count=10)
    r = store.append_to_stream("stream-1", ExpectedVersion.NO_STREAM, msgs(1))
    assert r.current_version == 0


@pytest.mark.parametrize("stream_id", ["stream/1", "stream%1"])
def test_read_stream_with_url_encodable_stream_id(store, stream_id):
    """AcceptanceTests.ReadStream.cs:351-373 — ids containing '/' and
    '%' round-trip through append and both read directions."""
    store.append_to_stream(stream_id, ExpectedVersion.NO_STREAM, msgs(1))
    fwd = store.read_stream_forwards(stream_id, StreamVersion.START, 1)
    assert fwd.messages[0].stream_id == stream_id
    bwd = store.read_stream_backwards(stream_id, StreamVersion.END, 1)
    assert bwd.messages[0].stream_id == stream_id


def test_append_single_message_convenience_overload(store):
    """StreamStoreExtensions.cs:185-196 — a bare NewStreamMessage (not a
    list) appends as a one-element batch."""
    r = store.append_to_stream(
        "s", ExpectedVersion.NO_STREAM, NewStreamMessage(str(uuid.UUID(int=1)), "t", "{}")
    )
    assert r.current_version == 0
    assert store.read_stream_forwards("s", 0, 10).messages[0].stream_version == 0


def test_can_create_empty_stream_and_append_to_it(store):
    """AcceptanceTests.AppendStream.cs:295-313 — appending an empty
    batch with NoStream CREATES the stream (reads return Success with
    zero messages, head -1), and a later EmptyStream-sentinel append
    succeeds."""
    r = store.append_to_stream("stream-1", ExpectedVersion.NO_STREAM, [])
    assert (r.current_version, r.current_position) == (-1, -1)
    page = store.read_stream_forwards("stream-1", 0, 2)
    assert page.status == "Success" and page.messages == []
    assert store.read_stream_head_version("stream-1") == -1
    r2 = store.append_to_stream(
        "stream-1", ExpectedVersion.EMPTY_STREAM,
        msgs(1, 2, 3),
    )
    assert r2.current_version == 2


def test_unicode_and_large_payload_roundtrip(store):
    """Unicode types/payloads/metadata and ~100 KB bodies round-trip on
    every backend, including the lazy prefetch=false fetch."""
    payload = '{"text": "héllo 😀 \\" quotes ' + "x" * 100_000 + '"}'
    meta = '{"m": "wörld"}'
    store.append_to_stream(
        "u", ExpectedVersion.NO_STREAM,
        [NewStreamMessage(str(uuid.UUID(int=1)), "tÿpe", payload, meta)],
    )
    m = store.read_stream_forwards("u", 0, 10).messages[0]
    assert m.json_data == payload and m.json_metadata == meta and m.type == "tÿpe"
    lazy = store.read_stream_forwards("u", 0, 10, prefetch_json_data=False).messages[0]
    assert lazy.json_data is None and lazy.get_json_data() == payload
