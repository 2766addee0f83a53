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
from sqlstreamstore_spark.store.memory import InMemoryStreamStore
from sqlstreamstore_spark.store.spark_store import SparkParquetStreamStore

__all__ = [
    "AppendResult",
    "NewStreamMessage",
    "PageReadStatus",
    "ReadAllPage",
    "ReadDirection",
    "ReadStreamPage",
    "SetStreamMetadataResult",
    "StreamMessage",
    "StreamMetadataResult",
    "InMemoryStreamStore",
    "SparkParquetStreamStore",
]
