"""Streaming ingestion INTO the store — the write-side twin of
streaming/source.py. The reference has no streaming writer (its writer
is the application calling AppendToStream in a loop); Spark-first, the
natural shape is a foreachBatch sink where every micro-batch lands as
ONE bulk commit:

    readStream(...)  →  transform to message columns  →  store_sink()

Per-epoch exactly-once: Structured Streaming may re-run an epoch after
a failure, and bulk_append has no per-message idempotency (by
contract). The sink therefore records the last committed epoch per
query name in the store manifest and skips replays — the same
checkpoint-plus-transactional-sink pattern every exactly-once Spark
sink uses, with the store's own manifest as the transaction log.

Scale: message bytes never touch the driver (bulk_append writes the
batch through Spark executors); the driver handles only per-stream head
aggregates and the manifest swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sqlstreamstore_spark.store.spark_store import SparkParquetStreamStore


def store_sink(
    store: SparkParquetStreamStore,
    messages_stream: DataFrame,
    order_col: str,
    query_name: str = "sqlstreamstore_sink",
    trigger: dict | None = None,
):
    """Start a streaming query that appends every micro-batch to the
    store in one bulk commit. ``messages_stream`` must carry the message
    columns (stream_id, message_id, type, json_data, json_metadata,
    created_utc) plus ``order_col`` for intra-stream ordering.

    Returns the StreamingQuery. Epoch replays are skipped via the
    manifest's sink_epochs record (exactly-once per epoch).
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        committed = store._manifest.setdefault("sink_epochs", {})
        if committed.get(query_name, -1) >= epoch_id:
            return  # epoch replay after restart — already committed
        if batch_df.isEmpty():
            return
        # Stamp the epoch BEFORE the commit: bulk_append's manifest swap
        # then persists data + epoch marker atomically. If the commit
        # fails before the swap, its parquet output is an unreferenced
        # orphan (readers are manifest-scoped) and the marker rolls
        # back, so the replayed epoch re-runs cleanly — no path
        # double-appends.
        prev = committed.get(query_name, -1)
        committed[query_name] = epoch_id
        try:
            store.bulk_append(batch_df, order_col=order_col, allow_existing=True)
        except BaseException:
            committed[query_name] = prev
            raise

    return (
        messages_stream.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .option("checkpointLocation", f"{store.path}/checkpoints/{query_name}")
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
