"""sqlstreamstore_spark — a PySpark-native stream-store + analytics engine.

A brand-new engine with the query and data-processing capabilities of
SQLStreamStore/SQLStreamStore (the .NET reference at /root/reference/),
re-expressed Spark-first: the append-only globally-ordered message log is
a columnar DataFrame; every read operation is a declarative DataFrame
expression optimized by Catalyst; subscriptions are incremental reads
(polling / Structured Streaming); the write path is a serialized
single-writer commit protocol implemented in Python around Spark writes.

Layout:
    schema.py       canonical message schema + sentinel constants
    session.py      SparkSession builder tuned for the engine
    exceptions.py   WrongExpectedVersionException et al.
    functions/      JVM-side column functions (UUIDv5, JSON helpers)
    operators/      read-side relational operators (paged reads, heads,
                    list-streams, retention, global position assignment)
    store/          the stream-store API: in-memory spec + Parquet store
    streaming/      catch-up subscriptions (polling + Structured Streaming)
    analytics/      TPC-H-style queries and LLM-pipeline operators
                    (dedup, similarity search, text analysis)
"""

from sqlstreamstore_spark.schema import (
    MESSAGES_SCHEMA,
    ExpectedVersion,
    Position,
    StreamVersion,
)
from sqlstreamstore_spark.exceptions import (
    InvalidStreamIdError,
    WrongExpectedVersionError,
)

__all__ = [
    "MESSAGES_SCHEMA",
    "ExpectedVersion",
    "Position",
    "StreamVersion",
    "InvalidStreamIdError",
    "WrongExpectedVersionError",
]

__version__ = "0.1.0"
