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


def stream_meta_df(log: DataFrame) -> DataFrame:
    """Derive the per-stream retention table from the `$$` metadata
    shadow streams: latest metadata message per stream wins
    (InMemoryStreamStore.cs:200-208). Pure DataFrame — one window over
    the (tiny) metadata-stream subset; broadcast the result."""
    from pyspark.sql import Window

    meta_msgs = log.filter(F.col("stream_id").startswith("$$"))
    w = Window.partitionBy("stream_id").orderBy(F.col("stream_version").desc())
    latest = (
        meta_msgs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.expr("substring(stream_id, 3)").alias("stream_id"),
            F.get_json_object("json_data", "$.MaxAge").cast("int").alias("max_age"),
            F.get_json_object("json_data", "$.MaxCount").cast("int").alias("max_count"),
        )
    )
    return latest


def scavenge_all_victims_df(log: DataFrame, stream_meta: DataFrame) -> DataFrame:
    """ALL (stream_id, message_id) pairs beyond their stream's max_count
    — the whole-store batch form of the reference's per-append async
    scavenge (Scavenge.sql:20-29 looped per stream): one window pass
    over streams that HAVE max_count, rank desc by version, victims are
    rank > max_count. Scale: the semi-join against the bounded metadata
    table prunes the scan to governed streams before the shuffle."""
    from pyspark.sql import Window

    governed = F.broadcast(
        stream_meta.filter(F.col("max_count").isNotNull()).select("stream_id", "max_count")
    )
    w = Window.partitionBy("stream_id").orderBy(F.col("stream_version").desc())
    return (
        log.join(governed, "stream_id")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") > F.col("max_count"))
        .select("stream_id", "message_id", "stream_version")
    )


def expire_all_victims_df(log: DataFrame, stream_meta: DataFrame, now_utc) -> DataFrame:
    """ALL expired (stream_id, message_id) pairs by max_age — the batch
    twin of the read-path expiry filter (same predicate, inverted)."""
    governed = F.broadcast(
        stream_meta.filter(F.col("max_age").isNotNull()).select("stream_id", "max_age")
    )
    now_us = F.lit(int(now_utc.timestamp() * 1_000_000))
    created_us = F.unix_micros(F.col("created_utc"))
    return (
        log.filter(~F.col("stream_id").startswith("$"))
        .join(governed, "stream_id")
        .filter(created_us + F.col("max_age").cast("long") * F.lit(1_000_000) <= now_us)
        .select("stream_id", "message_id", "stream_version")
    )
