"""Event-log analytics: sessionization and time-bucketed aggregates.

Sessionization is the classic lag-gap-cumsum pattern (distributed: both
windows partition by user, nothing global). In streaming, the same
semantics come from ``session_window`` (streaming/ layer)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessions_per_user(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Count sessions per user: a session break is a gap > gap_seconds
    between consecutive events of one user.

    Oracle: see registry.py — identical lag/sum window SQL in DuckDB.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    return (
        events.withColumn(
            "is_new_session",
            F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0)),
        )
        .groupBy("user_id")
        .agg(
            F.sum("is_new_session").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


def events_per_type_day(events: DataFrame) -> DataFrame:
    """Daily counts + value sums per event type (value summed exactly as
    DECIMAL then cast back — see tpch.py exactness strategy)."""
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )
