"""Event-time streaming operators (streaming/windowed.py): watermarked
tumbling windows, session windows, and applyInPandasWithState running
totals — each driven end-to-end with a file-stream source + AvailableNow
trigger + memory sink, and (where a batch twin exists) checked against
the equivalent batch aggregation on the same rows."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from sqlstreamstore_spark.streaming import windowed


@pytest.fixture(scope="module")
def events_dir(spark):
    """A small deterministic events table written as parquet (the
    streaming file source replays it as one batch under AvailableNow)."""
    df = (
        spark.range(200)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).alias("user_id"),
            F.element_at(
                F.array(F.lit("click"), F.lit("login"), F.lit("purchase")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("id") * 97)).alias("ts"),
            (F.col("id") % 10).cast("double").alias("value"),
        )
    )
    d = tempfile.mkdtemp(prefix="ssswin_")
    df.coalesce(2).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_available_now(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name != "totals" else "update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _read_stream(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    return spark.readStream.schema(batch.schema).parquet(events_dir)


def test_windowed_counts_match_batch(spark, events_dir):
    name = f"wc_{uuid.uuid4().hex[:8]}"
    stream = windowed.windowed_counts(_read_stream(spark, events_dir), "1 hour")
    q = (
        stream.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; re-run in complete
    # mode is overkill — instead compare against batch twin restricted to
    # the windows that were emitted.
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert got, "no windows closed"
    batch = spark.read.parquet(events_dir)
    expect_df = (
        batch.groupBy(
            F.window("ts", "1 hour").alias("win"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("ws"), "event_type", "n", "sum_value")
    )
    expect = {(r.ws, r.event_type): (r.n, r.sum_value) for r in expect_df.collect()}
    for k, v in got.items():
        assert expect[k] == v


def test_session_windows_run(spark, events_dir):
    name = f"sw_{uuid.uuid4().hex[:8]}"
    stream = windowed.session_windows(_read_stream(spark, events_dir), gap="5 minutes")
    q = (
        stream.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # 1 event / 97s per global clock, per-user cadence 7*97=679s > 5 min
    # gap → every event is its own session; all but the tail close.
    assert rows
    assert all(r.n_events == 1 for r in rows)


def test_stateful_running_totals(spark, events_dir):
    name = f"totals_{uuid.uuid4().hex[:8]}"
    stream = windowed.stateful_running_totals(_read_stream(spark, events_dir))
    q = (
        stream.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # one emission per user per micro-batch; last emission per user is
    # the final running total — compare with the batch aggregate.
    batch = spark.read.parquet(events_dir)
    expect = {
        r.user_id: (r.n, r.total)
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    got_rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert got_rows
    # AvailableNow may run 1+ micro-batches; keep the max (monotone counts)
    got: dict = {}
    for r in got_rows:
        if r.user_id not in got or r.n_events > got[r.user_id][0]:
            got[r.user_id] = (r.n_events, r.total_value)
    assert set(got) == set(expect)
    for u in expect:
        assert got[u][0] == expect[u][0]
        assert abs(got[u][1] - expect[u][1]) < 1e-9


def test_stream_stream_interval_join(spark, events_dir):
    stream = _read_stream(spark, events_dir)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    out = windowed.interval_join_clicks_to_purchases(clicks, purchases, within="30 minutes")
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # batch twin over the same rows
    batch = spark.read.parquet(events_dir)
    c = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("ci"), F.col("ts").alias("ct"))
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pi"), F.col("ts").alias("pt"))
    expect = {
        (r.pi, r.ci)
        for r in c.join(
            p,
            F.expr("cu = pu AND ct <= pt AND ct >= pt - INTERVAL 30 MINUTES"),
        ).collect()
    }
    assert got  # the fixture cadence guarantees matches
    assert got == expect


def test_dedup_within_watermark(spark, events_dir):
    stream = _read_stream(spark, events_dir)
    # duplicate every event by unioning the stream with itself
    doubled = stream.union(_read_stream(spark, events_dir))
    name = f"ddw_{uuid.uuid4().hex[:8]}"
    q = (
        windowed.dedup_within_watermark(doubled)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT event_id FROM {name}").collect()
    ids = [r.event_id for r in rows]
    assert len(ids) == 200 and len(set(ids)) == 200


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data semantics across restarts: run 1 processes the on-time
    row then a watermark-advancing row (watermark 09:50 persisted to the
    checkpoint); run 2 receives a row for the long-past 00:00 window —
    it is dropped by the watermark and the window closes with only the
    on-time row. (Within a single run, eviction lags the watermark by a
    batch, so the drop is only guaranteed for post-eviction arrivals —
    hence the two-run shape.)"""
    import os

    d = str(tmp_path / "late-events")
    os.makedirs(d)
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, user_id long, event_type string, ts timestamp, value double"

    def write(name, rows, mtime):
        p = os.path.join(d, name)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(p + ".tmp")
        part = [f for f in os.listdir(p + ".tmp") if f.endswith(".parquet")][0]
        os.rename(os.path.join(p + ".tmp", part), p)
        os.utime(p, (mtime, mtime))

    emitted = []

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        agg = windowed.windowed_counts(stream, "1 hour", watermark_delay="10 minutes")
        q = (
            agg.writeStream.foreachBatch(
                lambda df, eid: emitted.extend(tuple(r) for r in df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write("b1.parquet", [(1, 1, "click", dt.datetime(2024, 1, 1, 0, 30), 1.0)], 1_000)
    write("b2.parquet", [(2, 1, "click", dt.datetime(2024, 1, 1, 10, 0), 1.0)], 2_000)
    run()  # watermark 09:50 now persisted in the checkpoint

    write("b3.parquet", [(3, 1, "click", dt.datetime(2024, 1, 1, 0, 45), 9.0)], 3_000)
    run()  # late row: behind the restored watermark -> dropped

    w0 = dt.datetime(2024, 1, 1, 0, 0)
    closed = {r[0]: (r[3], r[4]) for r in emitted}
    assert closed[w0] == (1, 1.0)  # late row (would be 2, 10.0) dropped


def test_stateful_stream_heads_transform_with_state(spark):
    """transformWithStateInPandas head tracking: stream a log-shaped
    parquet dir, final emitted head per stream equals the batch
    max(version)/max(position)/count — the `streams` view twin.
    Requires RocksDB state store + protobuf in the Python workers;
    skips where the environment lacks them (this sandbox has no
    protobuf — the operator is still exercised for plan construction)."""
    import shutil
    import tempfile

    pytest.importorskip("google.protobuf", reason="transformWithState worker needs protobuf")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    log = (
        spark.range(120)
        .select(
            F.concat(F.lit("s-"), (F.col("id") % 5).cast("string")).alias("stream_id"),
            (F.col("id") / 5).cast("long").alias("stream_version"),
            F.col("id").alias("position"),
        )
    )
    d = tempfile.mkdtemp(prefix="sssheads_")
    try:
        log.coalesce(2).write.mode("overwrite").parquet(d)
        stream = windowed.stateful_stream_heads(
            spark.readStream.schema(
                "stream_id string, stream_version long, position long"
            ).parquet(d)
        )
        name = f"heads_{uuid.uuid4().hex[:8]}"
        q = (
            stream.writeStream.format("memory").queryName(name)
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        batch = {
            r.stream_id: (r.v, r.p, r.n)
            for r in spark.read.parquet(d)
            .groupBy("stream_id")
            .agg(F.max("stream_version").alias("v"), F.max("position").alias("p"),
                 F.count("*").alias("n"))
            .collect()
        }
        got: dict = {}
        for r in spark.sql(f"SELECT * FROM {name}").collect():
            # keep the latest emission per stream (monotone message_count)
            if r.stream_id not in got or r.message_count > got[r.stream_id][2]:
                got[r.stream_id] = (r.head_version, r.head_position, r.message_count)
        assert got == batch
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stateful_stream_heads_plan_constructs(spark):
    """Even without the runtime deps, the transformWithState plan must
    analyze: correct output schema and a streaming logical plan node."""
    import tempfile

    d = tempfile.mkdtemp(prefix="sssheadsplan_")
    sdf = (
        spark.readStream.schema("stream_id string, stream_version long, position long")
        .parquet(d)
    )
    out = windowed.stateful_stream_heads(sdf)
    assert [f.name for f in out.schema.fields] == [
        "stream_id", "head_version", "head_position", "message_count"]
    assert out.isStreaming
