"""Derive the canonical `events_log` message log from the raw `events`
table (FIXTURES.md §A.2) — the engine's canonical messages schema
(SURVEY.md §1.2, mirroring PgSqlScripts/Tables.sql:33-47 and
Streams/StreamMessage.cs:10-19).

Derivation (deterministic):
    position        dense 0-based rank by (ts, event_id)      [global]
    stream_id       'user-' || user_id
    stream_version  0-based rank of (ts, event_id) per stream [partitioned]
    message_id      UUIDv5(DNS namespace, str(event_id))      [JVM-side]
    created_utc     ts
    type            event_type
    json_data       props
    json_metadata   ''

Scale notes: `stream_version` is a partitioned window (distributed);
`position` uses the two-phase dense global index (operators/positions.py)
so nothing funnels through one partition. All expressions are built-in
(sha1/conv/concat) — the whole view stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sqlstreamstore_spark.functions.uuid5 import uuid5_col
from sqlstreamstore_spark.operators.positions import with_dense_global_index
from sqlstreamstore_spark.schema import MESSAGE_COLUMNS


def events_to_log(events: DataFrame, position_strategy: str = "auto") -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) → events_log."""
    w_stream = Window.partitionBy("user_id").orderBy("ts", "event_id")
    df = with_dense_global_index(
        events, ["ts", "event_id"], index_col="position", strategy=position_strategy
    )
    return df.select(
        F.col("position"),
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("stream_id"),
        (F.row_number().over(w_stream) - F.lit(1)).cast("int").alias("stream_version"),
        uuid5_col(F.col("event_id").cast("string")).alias("message_id"),
        F.col("ts").alias("created_utc"),
        F.col("event_type").alias("type"),
        F.col("props").alias("json_data"),
        F.lit("").alias("json_metadata"),
    ).select(*MESSAGE_COLUMNS)


#: DuckDB CTE computing the same view (minus message_id — the DuckDB build
#: has no sha1(), so UUIDv5 cannot be expressed there; message_id parity is
#: instead pinned by tests/test_uuid5.py against Python's uuid.uuid5).
EVENTS_LOG_ORACLE_CTE = """
WITH events_log AS (
  SELECT
    row_number() OVER (ORDER BY ts, event_id) - 1       AS position,
    'user-' || CAST(user_id AS VARCHAR)                 AS stream_id,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER)
                                                        AS stream_version,
    ts                                                  AS created_utc,
    event_type                                          AS type,
    props                                               AS json_data,
    ''                                                  AS json_metadata
  FROM events
)
"""

#: Columns both engines can compute bit-identically (see note above).
ORACLE_COLUMNS = [
    "position",
    "stream_id",
    "stream_version",
    "created_utc",
    "type",
    "json_data",
    "json_metadata",
]
