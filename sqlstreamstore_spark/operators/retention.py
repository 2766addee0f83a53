"""Retention operators: max-age expiry filter and max-count scavenge
(SURVEY.md §2.2).

Reference: expiry filter ReadonlyStreamStoreBase.cs:377-462 (drop rows
older than the stream's max_age seconds, `$`-streams exempt); scavenge
PgSqlScripts/Scavenge.sql:20-29 (delete oldest beyond max_count,
newest-by-version kept).

Spark-first shapes:
  - expiry: broadcast-join the (tiny) stream_meta table, one codegen'd
    filter — no per-row metadata lookups like the reference's cache.
  - scavenge victims: per-stream max(stream_version) via a partial agg
    + broadcast back, NOT a row_number window — same result, but the agg
    combines map-side while a window would shuffle every row of a 100 TB
    log. (For the general top-N-per-group case we keep the window form
    in store/maintenance; for victim *selection* the agg is cheaper.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlstreamstore_spark.schema import SYSTEM_PREFIX


def expiry_filter_df(
    log: DataFrame,
    stream_meta: DataFrame,
    now_utc,
) -> DataFrame:
    """Drop messages whose stream has max_age and created_utc + max_age <= now.

    stream_meta: DataFrame[stream_id: string, max_age: int?, max_count: int?]
    — bounded by the number of streams with metadata; broadcast it.

    Oracle (per stream s with fixed max_age):
      SELECT * FROM events_log WHERE stream_id='{s}'
        AND created_utc + INTERVAL ({max_age}) SECOND > TIMESTAMP '{now}'
      ORDER BY stream_version
    """
    meta = F.broadcast(stream_meta.select("stream_id", "max_age"))
    joined = log.join(meta, "stream_id", "left")
    # Pure 64-bit micros arithmetic: identical semantics to
    # `created_utc + INTERVAL max_age SECOND > now` (both engines compute
    # timestamps at micros precision, and the addition is exact), but it
    # codegens to two long ops instead of interval machinery.
    expires_us = F.unix_micros(F.col("created_utc")) + F.col("max_age").cast("long") * F.lit(1_000_000)
    keep = (
        F.col("max_age").isNull()
        | F.col("stream_id").startswith(SYSTEM_PREFIX)
        | (expires_us > F.unix_micros(F.lit(now_utc).cast("timestamp")))
    )
    return joined.filter(keep).drop("max_age")


def scavenge_victims_df(
    log: DataFrame, stream_id: str, max_count: int, key_col: str = "message_id"
) -> DataFrame:
    """Messages to purge so the stream keeps its newest `max_count`
    messages by stream_version (Scavenge.sql:20-29).

    Oracle: SELECT {key} FROM events_log WHERE stream_id='{s}'
            AND stream_version <= (SELECT max(stream_version) - {mc}
                                   FROM events_log WHERE stream_id='{s}')
            ORDER BY stream_version
    """
    s = log.filter(F.col("stream_id") == F.lit(stream_id))
    cutoff = s.agg((F.max("stream_version") - F.lit(int(max_count))).alias("__cutoff"))
    return (
        s.join(F.broadcast(cutoff))
        .filter(F.col("stream_version") <= F.col("__cutoff"))
        .orderBy("stream_version")
        .select(key_col)
    )
