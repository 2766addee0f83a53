"""End-to-end demo: the stream store, subscriptions, streaming source,
and the analytics surface in one run.

    python examples/demo.py [store_dir]

Walks through: append with optimistic concurrency → paged reads →
metadata/retention → catch-up subscription → the store as a Spark
streaming source → relational + pipeline analytics over the driver
fixtures (if /root/testdata exists).
"""

from __future__ import annotations

import sys
import tempfile
import threading
import uuid

sys.path.insert(0, ".")

from sqlstreamstore_spark.schema import ExpectedVersion
from sqlstreamstore_spark.session import get_spark
from sqlstreamstore_spark.store import NewStreamMessage, SparkParquetStreamStore
from sqlstreamstore_spark.streaming import StreamStoreDataSource, subscribe_to_all


def msg(n: int, t: str = "demo") -> NewStreamMessage:
    return NewStreamMessage(str(uuid.UUID(int=n)), t, f'{{"n":{n}}}')


def main() -> int:
    spark = get_spark(app_name="demo")
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="sss-demo-")
    store = SparkParquetStreamStore(spark, root)
    print(f"store at {root}")

    # 1. appends: optimistic concurrency + idempotency
    r = store.append_to_stream("account-1", ExpectedVersion.NO_STREAM, [msg(1), msg(2)])
    print(f"appended → version={r.current_version} position={r.current_position}")
    r = store.append_to_stream("account-1", ExpectedVersion.NO_STREAM, [msg(1), msg(2)])
    print(f"idempotent re-append → still version={r.current_version}")
    store.append_to_stream("account-2", ExpectedVersion.ANY, [msg(10 + i) for i in range(5)])

    # 2. paged reads
    page = store.read_all_forwards(0, 3)
    print(f"read_all page: {[m.position for m in page.messages]}, is_end={page.is_end}")
    page2 = page.read_next()
    print(f"  next page:   {[m.position for m in page2.messages]}")

    # 3. metadata + retention
    store.set_stream_metadata("account-2", ExpectedVersion.NO_STREAM, max_count=3)
    kept = store.read_stream_forwards("account-2", 0, 100).messages
    print(f"after max_count=3 scavenge: versions {[m.stream_version for m in kept]}")

    # 4. catch-up subscription
    got, done = [], threading.Event()
    sub = subscribe_to_all(
        store,
        lambda m: (got.append(m.position), done.set() if len(got) >= 7 else None),
        page_size=100,
        poll_interval=0.05,
    )
    store.append_to_stream("account-1", ExpectedVersion.ANY, [msg(99)])
    done.wait(10)
    sub.dispose()
    print(f"subscription delivered positions {got}")

    # 5. the store as a Structured Streaming source
    spark.dataSource.register(StreamStoreDataSource)
    batch = spark.read.format("sqlstreamstore").option("path", store.path).load()
    print(f"batch read via data source: {batch.count()} live messages")
    batch.groupBy("stream_id").count().show()

    # 6. the HTTP/HAL tier: same API over the wire
    from sqlstreamstore_spark.http import HttpClientStreamStore, StreamStoreHttpServer

    server = StreamStoreHttpServer(store).start()
    try:
        client = HttpClientStreamStore(server.url)
        head = client.read_head_position()
        page = client.read_all_forwards(0, 3)
        print(f"HTTP client: head={head}, first page positions "
              f"{[m.position for m in page.messages]}")
    finally:
        server.stop()

    # 7. streaming ingestion INTO the store (one bulk commit per epoch)
    import datetime as dt

    from sqlstreamstore_spark.streaming import store_sink

    incoming = tempfile.mkdtemp(prefix="sss-incoming-")
    spark.createDataFrame(
        [("feed-1", str(uuid.UUID(int=5000 + i)), "tick", '{"i":%d}' % i, "",
          dt.datetime(2024, 1, 1), i) for i in range(20)],
        "stream_id string, message_id string, type string, json_data string, "
        "json_metadata string, created_utc timestamp, seq long",
    ).write.parquet(incoming, mode="overwrite")
    q = store_sink(
        store,
        spark.readStream.schema(
            "stream_id string, message_id string, type string, json_data string, "
            "json_metadata string, created_utc timestamp, seq long"
        ).parquet(incoming),
        order_col="seq",
        query_name="demo_sink",
    )
    q.awaitTermination(60)
    print(f"streaming sink ingested feed-1 → head={store.read_head_position()}, "
          f"feed-1 head version={store.read_stream_head_version('feed-1')}")

    # 8. time travel + CDC: snapshot a commit, interleave deletes and a
    # scavenge, then read the exact delta a consumer gained since —
    # tombstones included (deletes-in-CDC is the case that bites real
    # consumers)
    v_before = store.manifest_version
    store.append_to_stream("feed-1", ExpectedVersion.ANY, [msg(7001)])
    store.delete_message("feed-1", str(uuid.UUID(int=5003)))
    store.set_stream_metadata("feed-1", max_count=10)  # scavenges oldest
    v_after = store.manifest_version
    delta = store.changes_between(v_before, v_after)
    print("CDC delta since the snapshot (tombstones ride along):")
    delta.select("position", "stream_id", "stream_version", "type") \
        .orderBy("position").show(8, truncate=False)
    print(f"as_of({v_before}) still reads the pre-delete view: "
          f"head={store.as_of(v_before).read_head_position()}")

    # 9. analytics over the driver fixtures (optional)
    import os

    sf = "/root/testdata/sf0.001"
    if os.path.isdir(sf):
        from sqlstreamstore_spark.analytics import tpch
        from sqlstreamstore_spark.sources.tables import load_table

        q3 = tpch.q3_shipping_priority(
            load_table(spark, sf, "customer"),
            load_table(spark, sf, "orders"),
            load_table(spark, sf, "lineitem"),
        )
        print("TPC-H Q3 shape over fixtures:")
        q3.show(5)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
