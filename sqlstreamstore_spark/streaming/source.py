"""Structured Streaming over the Parquet store — the Spark-native
subscription path (SURVEY.md §3.3 "Spark equivalent").

The store's commit protocol appends one Parquet file per commit into
``data/``; Spark's file streaming source natively discovers new files,
so the store directory IS a streaming source — no custom Source
implementation needed:

    micro-batch trigger  ≙ the reference's polling notifier
    start-offset         ≙ continue_after_position (filter on position)
    foreachBatch         ≙ the push loop, exactly-once per epoch

Caveats (documented semantics, matching the reference's at-least-once
model): the file source sees appended files only — logical deletions
(manifest deletion sets) are not retro-pushed, identical to how the
reference's subscriptions never retract delivered messages."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlstreamstore_spark.schema import MESSAGES_SCHEMA
from sqlstreamstore_spark.store.spark_store import SparkParquetStreamStore


def stream_source(
    store: SparkParquetStreamStore,
    continue_after_position: int | None = None,
    stream_id: str | None = None,
) -> DataFrame:
    """The store as an unbounded streaming DataFrame (position order is
    NOT guaranteed across partitions within a micro-batch — sort in
    foreachBatch if per-batch order matters, as subscribe_foreach_batch
    does)."""
    df = (
        store.spark.readStream.schema(MESSAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1000)
        # bulk_append writes commits into data/bulk-*/ subdirectories;
        # without recursive lookup the file source silently skips them
        # (ADVICE r1: silent message loss on a documented path).
        .option("recursiveFileLookup", "true")
        .parquet(store._data_dir)
    )
    if continue_after_position is not None:
        df = df.filter(F.col("position") > continue_after_position)
    if stream_id is not None:
        df = df.filter(F.col("stream_id") == stream_id)
    return df


def subscribe_foreach_batch(
    store: SparkParquetStreamStore,
    on_batch: Callable[[list], None],
    continue_after_position: int | None = None,
    stream_id: str | None = None,
    query_name: str = "sqlstreamstore_subscription",
):
    """Micro-batch subscription: each epoch's messages are delivered to
    ``on_batch`` as position-ordered rows (the foreachBatch sink is the
    reference's push loop; epoch ids give exactly-once batch semantics)."""
    src = stream_source(store, continue_after_position, stream_id)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.orderBy("position").collect()
        if rows:
            on_batch(rows)

    return (
        src.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .option("checkpointLocation", f"{store.path}/checkpoints/{query_name}")
        .start()
    )


def windowed_event_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Event-time windowed aggregation with late-data watermarking — the
    streaming analytics the reference lacks entirely (SURVEY.md §2.4:
    'Watermark analog: none'). Works on a streaming or batch events
    DataFrame."""
    return (
        events.withWatermark("created_utc", watermark)
        .groupBy(F.window("created_utc", window), F.col("type"))
        .agg(F.count("*").alias("n"))
    )
