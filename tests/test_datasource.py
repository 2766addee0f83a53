"""Custom Python DataSource streaming reader over the Parquet store:
catch-up delivery, offset checkpointing across restarts, start-position
option."""

import uuid

import pytest
from pyspark.sql import functions as F

from sqlstreamstore_spark.schema import ExpectedVersion
from sqlstreamstore_spark.store import NewStreamMessage, SparkParquetStreamStore
from sqlstreamstore_spark.streaming.datasource import StreamStoreDataSource


def msgs(lo, n):
    return [NewStreamMessage(str(uuid.UUID(int=lo + i)), "t", '{"x":1}') for i in range(n)]


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(StreamStoreDataSource)
    return spark


def _drain(spark, path, name, checkpoint):
    got = []

    def sink(df, epoch_id):
        got.extend(df.orderBy("position").collect())

    q = (
        spark.readStream.format("sqlstreamstore")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(sink)
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(got, key=lambda r: r.position)


def test_datasource_catchup_and_resume(registered, tmp_path):
    spark = registered
    store = SparkParquetStreamStore(spark, str(tmp_path / "store"))
    store.append_to_stream("a", ExpectedVersion.ANY, msgs(1, 30))
    store.append_to_stream("b", ExpectedVersion.ANY, msgs(100, 20))

    ckpt = str(tmp_path / "ckpt")
    rows = _drain(spark, store.path, "ds1", ckpt)
    assert [r.position for r in rows] == list(range(50))
    assert rows[30].stream_id == "b" and rows[30].stream_version == 0

    # restart from the checkpoint: only NEW messages arrive
    store.append_to_stream("a", ExpectedVersion.ANY, msgs(1000, 5))
    rows2 = _drain(spark, store.path, "ds2", ckpt)
    assert [r.position for r in rows2] == list(range(50, 55))


def test_datasource_start_position(registered, tmp_path):
    spark = registered
    store = SparkParquetStreamStore(spark, str(tmp_path / "store2"))
    store.append_to_stream("s", ExpectedVersion.ANY, msgs(1, 10))
    q = (
        spark.readStream.format("sqlstreamstore")
        .option("path", store.path)
        .option("startposition", "4")
        .load()
        .writeStream.format("memory")
        .queryName("ds3")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ds3 ORDER BY position").collect()
    assert [r.position for r in rows] == [5, 6, 7, 8, 9]


def test_datasource_batch_read(registered, tmp_path):
    spark = registered
    store = SparkParquetStreamStore(spark, str(tmp_path / "store3"))
    store.append_to_stream("x", ExpectedVersion.ANY, msgs(1, 25))
    store.append_to_stream("y", ExpectedVersion.ANY, msgs(200, 10))
    df = spark.read.format("sqlstreamstore").option("path", store.path).load()
    rows = df.orderBy("position").collect()
    assert [r.position for r in rows] == list(range(35))
    assert df.filter(F.col("stream_id") == "y").count() == 10


def test_datasource_resume_survives_compaction(registered, tmp_path):
    """Offsets are positions, not file names — a checkpointed reader must
    resume correctly even after compact() rewrites the data files."""
    spark = registered
    store = SparkParquetStreamStore(spark, str(tmp_path / "store4"))
    store.append_to_stream("a", ExpectedVersion.ANY, msgs(1, 20))
    ckpt = str(tmp_path / "ckpt4")
    rows = _drain(spark, store.path, "dc1", ckpt)
    assert [r.position for r in rows] == list(range(20))

    store.compact(target_files=2)
    store.append_to_stream("a", ExpectedVersion.ANY, msgs(500, 5))
    rows2 = _drain(spark, store.path, "dc2", ckpt)
    assert [r.position for r in rows2] == list(range(20, 25))


def test_datasource_ignores_files_manifest_does_not_own(registered, tmp_path):
    """ADVICE r1: a failed bulk_append leaves partial parquet under
    data/; reads must be scoped to the manifest's file list, never a
    raw directory glob — orphans are invisible."""
    import os
    import shutil

    spark = registered
    store = SparkParquetStreamStore(spark, str(tmp_path / "store5"))
    store.append_to_stream("a", ExpectedVersion.ANY, msgs(1, 5))
    # simulate a failed bulk job: copy a commit file into an orphan dir
    # the manifest never references (phantom positions 0..4 duplicated)
    orphan = os.path.join(store._data_dir, "bulk-99999999")
    os.makedirs(orphan)
    src = next(f for f in os.listdir(store._data_dir) if f.endswith(".parquet"))
    shutil.copy(os.path.join(store._data_dir, src), os.path.join(orphan, "part-0.parquet"))

    df = spark.read.format("sqlstreamstore").option("path", store.path).load()
    assert df.count() == 5  # no phantom rows
    rows = _drain(spark, store.path, "dc5", str(tmp_path / "ckpt5"))
    assert [r.position for r in rows] == list(range(5))
    # compact() sweeps the orphan
    store.compact(target_files=1)
    assert not os.path.isdir(orphan)


def test_file_stream_source_sees_bulk_appended_messages(registered, tmp_path):
    """ADVICE r1: bulk_append writes into data/bulk-*/; the file
    streaming source must discover those files (recursiveFileLookup) or
    it silently loses messages."""
    import datetime as dt

    from sqlstreamstore_spark.streaming.source import subscribe_foreach_batch

    spark = registered
    store = SparkParquetStreamStore(spark, str(tmp_path / "store6"))
    store.append_to_stream("seed", ExpectedVersion.ANY, msgs(1, 3))
    bulk = spark.createDataFrame(
        [
            (f"bulk-{i % 2}", str(uuid.UUID(int=1000 + i)), "t", '{"x":1}', "", dt.datetime(2024, 1, 1), i)
            for i in range(10)
        ],
        "stream_id string, message_id string, type string, json_data string, "
        "json_metadata string, created_utc timestamp, seq long",
    )
    store.bulk_append(bulk, order_col="seq")
    got = []
    q = subscribe_foreach_batch(store, got.extend, query_name=f"bulk_disc_{uuid.uuid4().hex[:6]}")
    import time

    deadline = time.time() + 60
    while time.time() < deadline and len(got) < 13:
        time.sleep(0.5)
    q.stop()
    assert sorted(r.position for r in got) == list(range(13))
