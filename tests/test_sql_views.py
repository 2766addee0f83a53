"""SQL surface (sqlstreamstore_spark/sql.py): the store and the fixture
tables are reachable from plain spark.sql."""

from __future__ import annotations

import uuid

import pytest

from sqlstreamstore_spark.sql import register_store_views, register_tables
from sqlstreamstore_spark.store.messages import NewStreamMessage
from sqlstreamstore_spark.store.spark_store import SparkParquetStreamStore


@pytest.fixture()
def store(spark, tmp_path):
    s = SparkParquetStreamStore(spark, str(tmp_path / "store"))
    for sid in ("order-1", "order-2"):
        s.append_to_stream(sid, -2, [
            NewStreamMessage(
                str(uuid.uuid5(uuid.NAMESPACE_DNS, f"{sid}-m{i}")),
                "evt", '{"n": %d}' % i)
            for i in range(3)
        ])
    return s


def test_store_views_sql_roundtrip(spark, store):
    views = register_store_views(spark, store)
    assert set(views) == {"sss_messages", "sss_streams", "sss_heads"}
    n = spark.sql("SELECT count(*) AS n FROM sss_messages").collect()[0].n
    assert n == 6
    rows = {
        r.stream_id: (r.head_version, r.message_count)
        for r in spark.sql(
            "SELECT * FROM sss_streams ORDER BY stream_id"
        ).collect()
    }
    assert rows == {"order-1": (2, 3), "order-2": (2, 3)}
    head = spark.sql("SELECT head_position FROM sss_heads").collect()[0].head_position
    assert head == store.read_head_position()
    # join the log against itself via SQL only
    joined = spark.sql("""
        SELECT m.stream_id, count(*) AS n
        FROM sss_messages m JOIN sss_streams s USING (stream_id)
        WHERE s.head_version >= 2 GROUP BY m.stream_id ORDER BY m.stream_id
    """).collect()
    assert [(r.stream_id, r.n) for r in joined] == [("order-1", 3), ("order-2", 3)]


def test_fixture_tables_run_oracle_sql_verbatim(spark):
    """register_tables makes the DuckDB-oracle SQL strings runnable on
    Spark itself for the ANSI subset — spot-check one TPC-H oracle."""
    import __spark_entry__ as entry

    register_tables(spark, "/root/testdata/sf0.001")
    sql = entry.oracle_sql()["tpch_q6"]
    got = spark.sql(sql).collect()
    assert len(got) == 1 and got[0][0] is not None
