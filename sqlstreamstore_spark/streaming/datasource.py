"""Custom Structured Streaming source for the Parquet store via the
Python DataSource API (Spark 4) — SURVEY.md §3.3's "Spark equivalent",
phase 2: a real Source whose offset IS the store's head position.

    latestOffset()  = manifest head_position   (the reference's
                      PollingStreamStoreNotifier reads the same head,
                      PollingStreamStoreNotifier.cs:51-82)
    partitions(a,b) = position ranges (a,b] split into chunks — each
                      micro-batch scans in PARALLEL across executors
    read(part)      = pyarrow scan of the immutable commit files with
                      the position-range filter pushed down

Semantics match the reference's subscriptions: appended messages only
(commit files are immutable; logical deletes are not retro-pushed),
at-least-once across restarts via checkpointed offsets, per-batch
position order restorable with an orderBy in foreachBatch.

Registration:  spark.dataSource.register(StreamStoreDataSource)
Usage:         spark.readStream.format("sqlstreamstore")
                    .option("path", store.path).load()
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from sqlstreamstore_spark.schema import MESSAGES_SCHEMA

#: Rows per read partition — bounds per-task memory at any scale.
DEFAULT_ROWS_PER_PARTITION = 50_000


class _RangePartition(InputPartition):
    def __init__(self, files: list[str], lo: int, hi: int):
        self.files = files  # absolute paths of manifest-owned commit files
        self.lo = lo  # exclusive
        self.hi = hi  # inclusive


class StreamStoreStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("option 'path' (store directory) is required")
        self._start = int(options.get("startposition", -1))
        self._rows_per_part = int(
            options.get("rowsperpartition", DEFAULT_ROWS_PER_PARTITION)
        )

    # ------------------------------------------------------------- offsets

    def _manifest(self) -> dict:
        # delta-log aware: manifest.json alone is a snapshot CACHE —
        # patch commits live in manifest.history until the next
        # snapshot, so resolve through the store's shared reader
        from sqlstreamstore_spark.store.spark_store import (
            resolve_manifest_state,
        )

        if not os.path.isdir(self._path):
            return {"head_position": -1, "files": []}
        state, _snap = resolve_manifest_state(self._path)
        return state

    def _head(self) -> int:
        return self._manifest().get("head_position", -1)

    def initialOffset(self) -> dict:
        return {"position": self._start}

    def latestOffset(self) -> dict:
        return {"position": self._head()}

    def partitions(self, start: dict, end: dict):
        # Snapshot the manifest's OWNED file list on the driver and ship
        # it with each partition: scanning data/ raw would serve phantom
        # rows from files the manifest doesn't own (a failed bulk_append
        # job's leftovers) and double-read during compact()'s swap window
        # (ADVICE r1). Commit files are immutable, so a snapshot taken
        # here stays valid for the whole micro-batch.
        m = self._manifest()
        data_dir = os.path.join(self._path, "data")
        files = [os.path.join(data_dir, fn) for fn in m.get("files", [])]
        lo, hi = start["position"], end["position"]
        if hi <= lo:
            return [_RangePartition(files, lo, lo)]
        parts = []
        a = lo
        while a < hi:
            b = min(a + self._rows_per_part, hi)
            parts.append(_RangePartition(files, a, b))
            a = b
        return parts

    # --------------------------------------------------------------- read

    def read(self, partition: _RangePartition):
        # Executor-side: scan the immutable commit files with the range
        # predicate pushed into the parquet reader (row-group pruning —
        # files are position-ordered by construction).
        yield from _read_range(partition.files, partition.lo, partition.hi)

    def commit(self, end: dict) -> None:
        pass  # offsets are checkpointed by the engine; nothing to ack


def _read_range(files: list[str], lo: int, hi: int):
    """Executor-side range scan shared by the batch and stream readers,
    restricted to the manifest-owned files captured on the driver.

    r12 (guide §4): yields PyArrow RecordBatches directly — the Spark 4
    Python DataSource Arrow path — instead of `to_pylist()` + one Python
    tuple per row; a 100k-message catch-up drain ships as a handful of
    Arrow buffers rather than 100k boxed tuples. Values are unchanged:
    the store's naive-us timestamps ARE the UTC instants (the row path
    relied on the same session-UTC interpretation), so attaching the
    UTC zone relabels the int64 payloads without touching them."""
    if hi <= lo or not files:
        return
    import pyarrow as pa
    import pyarrow.dataset as ds

    from sqlstreamstore_spark.schema import arrow_messages_schema

    naive = arrow_messages_schema()
    dataset = ds.dataset(files, format="parquet", schema=naive)
    flt = (ds.field("position") > lo) & (ds.field("position") <= hi)
    aware = pa.schema(
        [
            f if f.name != "created_utc"
            else pa.field("created_utc", pa.timestamp("us", tz="UTC"))
            for f in naive
        ]
    )
    yield from dataset.to_table(filter=flt).cast(aware).to_batches()


class StreamStoreBatchReader(DataSourceReader):
    """Batch twin: spark.read.format("sqlstreamstore") scans the whole
    log (positions 0..head) with the same bounded range partitions."""

    def __init__(self, options):
        self._stream = StreamStoreStreamReader(options)

    def partitions(self):
        return self._stream.partitions(
            {"position": -1}, {"position": self._stream._head()}
        )

    def read(self, partition: _RangePartition):
        yield from _read_range(partition.files, partition.lo, partition.hi)


class StreamStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sqlstreamstore"

    def schema(self):
        return MESSAGES_SCHEMA

    def reader(self, schema):
        return StreamStoreBatchReader(self.options)

    def streamReader(self, schema):
        return StreamStoreStreamReader(self.options)
