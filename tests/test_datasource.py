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
