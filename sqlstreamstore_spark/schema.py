"""Canonical schema + sentinel constants.

Mirrors the reference's data model (SURVEY.md §1):
  - message struct: /root/reference/src/SqlStreamStore/Streams/StreamMessage.cs:10-19
  - SQL table:      /root/reference/src/SqlStreamStore.Postgres/PgSqlScripts/Tables.sql:33-47
  - sentinels:      Streams/ExpectedVersion.cs:12-23, Position.cs:16-21,
                    StreamVersion.cs:16-21
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Canonical columnar schema of the global message log ("$all").
#: One row per message; `position` is the dense 0-based global order,
#: `stream_version` the dense 0-based order within `stream_id`.
MESSAGES_SCHEMA = T.StructType(
    [
        T.StructField("position", T.LongType(), nullable=False),
        T.StructField("stream_id", T.StringType(), nullable=False),
        T.StructField("stream_version", T.IntegerType(), nullable=False),
        T.StructField("message_id", T.StringType(), nullable=False),
        T.StructField("created_utc", T.TimestampType(), nullable=False),
        T.StructField("type", T.StringType(), nullable=False),
        T.StructField("json_data", T.StringType(), nullable=False),
        T.StructField("json_metadata", T.StringType(), nullable=True),
    ]
)

#: Column order used everywhere (stable for oracle comparison).
MESSAGE_COLUMNS = [f.name for f in MESSAGES_SCHEMA.fields]


def arrow_messages_schema():
    """The same schema as a pyarrow schema (naive-UTC timestamps).
    Pinned wherever we scan commit files directly with pyarrow: the
    store's own files carry naive timestamps while Spark-written
    compacted files carry tz-aware ones — a mixed scan must cast to one
    canonical form."""
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("position", pa.int64()),
            pa.field("stream_id", pa.string()),
            pa.field("stream_version", pa.int32()),
            pa.field("message_id", pa.string()),
            pa.field("created_utc", pa.timestamp("us")),
            pa.field("type", pa.string()),
            pa.field("json_data", pa.string()),
            pa.field("json_metadata", pa.string()),
        ]
    )


class ExpectedVersion:
    """Optimistic-concurrency sentinels (ExpectedVersion.cs:12-23)."""

    EMPTY_STREAM = -1
    ANY = -2
    NO_STREAM = -3


class Position:
    """Global-position sentinels (Position.cs:16-21)."""

    START = 0
    END = -1  # read-backwards "from end"
    NONE = -1  # head of an empty store


class StreamVersion:
    """Per-stream version sentinels (StreamVersion.cs:16-21)."""

    START = 0
    END = -1  # read-backwards "from end"
    NONE = -1  # head of an absent stream


#: Reserved-id conventions (Streams/Deleted.cs:14-24, InMemoryStreamStore.cs:198).
SYSTEM_PREFIX = "$"
METADATA_PREFIX = "$$"
DELETED_STREAM_ID = "$deleted"
STREAM_DELETED_TYPE = "$stream-deleted"
MESSAGE_DELETED_TYPE = "$message-deleted"
METADATA_TYPE = "$stream-metadata"


def metadata_stream_id(stream_id: str) -> str:
    """`$$<streamId>` shadow stream (Postgres/StreamIdInfo.cs:16)."""
    return METADATA_PREFIX + stream_id
