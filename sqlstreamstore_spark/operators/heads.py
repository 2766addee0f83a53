"""Head-position/version operators (SURVEY.md §2.1 #10-12).

Reference: ReadHeadPosition.sql:5, ReadStreamHeadPosition.sql:7,
ReadStreamHeadVersion.sql:7; −1-when-empty convention from
Position.cs/StreamVersion.cs. Each is a single partial-aggregated
`max()` — map-side combine then a 1-row reduce; on Parquet the scan
reads only the one needed column (column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def head_position_df(log: DataFrame) -> DataFrame:
    """Oracle: SELECT coalesce(max(position), -1) AS head_position FROM events_log"""
    return log.agg(
        F.coalesce(F.max("position"), F.lit(-1).cast("long")).alias("head_position")
    )


def stream_head_position_df(log: DataFrame, stream_id: str) -> DataFrame:
    """Oracle: SELECT coalesce(max(position), -1) AS head_position
    FROM events_log WHERE stream_id = '{s}'"""
    return log.filter(F.col("stream_id") == F.lit(stream_id)).agg(
        F.coalesce(F.max("position"), F.lit(-1).cast("long")).alias("head_position")
    )


def stream_head_version_df(log: DataFrame, stream_id: str) -> DataFrame:
    """Oracle: SELECT coalesce(max(stream_version), -1) AS head_version
    FROM events_log WHERE stream_id = '{s}'"""
    return log.filter(F.col("stream_id") == F.lit(stream_id)).agg(
        F.coalesce(F.max("stream_version"), F.lit(-1).cast("int")).alias("head_version")
    )
