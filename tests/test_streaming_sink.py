"""Streaming ingestion into the store (streaming/sink.py): micro-batches
land as single bulk commits, versions continue across existing streams,
and replayed epochs are skipped via the manifest's sink_epochs marker."""

import datetime as dt
import uuid

from pyspark.sql import functions as F

from sqlstreamstore_spark.schema import ExpectedVersion
from sqlstreamstore_spark.store import NewStreamMessage, SparkParquetStreamStore
from sqlstreamstore_spark.streaming.sink import store_sink


def _messages_df(spark, lo, n, streams=2):
    rows = [
        (f"s-{i % streams}", str(uuid.UUID(int=lo + i)), "t", '{"x":1}', "",
         dt.datetime(2024, 1, 1), lo + i)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "stream_id string, message_id string, type string, json_data string, "
        "json_metadata string, created_utc timestamp, seq long",
    )


def test_bulk_append_allow_existing_continues_versions(spark, tmp_path):
    store = SparkParquetStreamStore(spark, str(tmp_path / "store"))
    store.append_to_stream(
        "s-0", ExpectedVersion.NO_STREAM,
        [NewStreamMessage(str(uuid.UUID(int=999)), "t", "{}")],
    )
    n, head = store.bulk_append(_messages_df(spark, 0, 6), "seq", allow_existing=True)
    assert (n, head) == (6, 6)
    p0 = store.read_stream_forwards("s-0", 0, 10)
    # pre-existing message is version 0; bulk rows continue 1..3
    assert [m.stream_version for m in p0.messages] == [0, 1, 2, 3]
    p1 = store.read_stream_forwards("s-1", 0, 10)
    assert [m.stream_version for m in p1.messages] == [0, 1, 2]
    # global order follows (stream_id, seq): all positions dense
    all_pos = [m.position for m in store.read_all_forwards(0, 100).messages]
    assert all_pos == list(range(7))
    # idempotency window reloads correctly after the bulk commit
    r = store.append_to_stream(
        "s-0", 3, [NewStreamMessage(str(uuid.UUID(int=5000)), "t", "{}")]
    )
    assert r.current_version == 4


def test_store_sink_end_to_end(spark, tmp_path):
    src_dir = str(tmp_path / "incoming")
    store = SparkParquetStreamStore(spark, str(tmp_path / "store2"))
    _messages_df(spark, 0, 10).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(
            "stream_id string, message_id string, type string, json_data string, "
            "json_metadata string, created_utc timestamp, seq long"
        ).parquet(src_dir)
    )
    q = store_sink(store, stream, order_col="seq", query_name="sink_e2e")
    q.awaitTermination(120)
    assert store.read_head_position() == 9
    p = store.read_stream_forwards("s-0", 0, 100)
    assert [m.stream_version for m in p.messages] == [0, 1, 2, 3, 4]
    # a second availableNow run over the same checkpoint sees no new files
    q2 = store_sink(store, stream, order_col="seq", query_name="sink_e2e")
    q2.awaitTermination(120)
    assert store.read_head_position() == 9


def test_store_sink_skips_replayed_epoch(spark, tmp_path):
    """Crash-replay guard: an epoch id at-or-below the manifest marker
    must not re-append its batch."""
    src_dir = str(tmp_path / "incoming3")
    store = SparkParquetStreamStore(spark, str(tmp_path / "store3"))
    _messages_df(spark, 0, 4).write.parquet(src_dir)
    # pretend epoch 0 already committed (as after a crash between the
    # checkpoint write and the restart)
    store._manifest.setdefault("sink_epochs", {})["sink_replay"] = 0
    store._save_manifest()
    stream = (
        spark.readStream.schema(
            "stream_id string, message_id string, type string, json_data string, "
            "json_metadata string, created_utc timestamp, seq long"
        ).parquet(src_dir)
    )
    q = store_sink(store, stream, order_col="seq", query_name="sink_replay")
    q.awaitTermination(120)
    assert store.read_head_position() == -1  # epoch 0 was skipped


def test_bulk_append_into_deleted_then_recreated_stream(spark, tmp_path):
    """Deletion cutoffs + bulk re-creation interplay: bulk rows into a
    previously deleted stream id land above the cutoff with versions
    from 0 — fully visible (the r1 advisor's delete-shadowing class)."""
    store = SparkParquetStreamStore(spark, str(tmp_path / "store4"))
    store.append_to_stream(
        "a", ExpectedVersion.NO_STREAM,
        [NewStreamMessage(str(uuid.UUID(int=1)), "t", "{}"),
         NewStreamMessage(str(uuid.UUID(int=2)), "t", "{}")],
    )
    store.delete_stream("a")
    n, head = store.bulk_append(_messages_df(spark, 100, 3, streams=1).withColumn(
        "stream_id", F.lit("a")), "seq", allow_existing=True)
    assert (n, head) == (3, 5)  # tombstone took position 2
    p = store.read_stream_forwards("a", 0, 10)
    assert [m.stream_version for m in p.messages] == [0, 1, 2]
    assert [m.position for m in p.messages] == [3, 4, 5]


def _dup_messages_df(spark, lo, n, dup_every=3):
    """Messages where every dup_every-th row repeats the content of the
    row before it (distinct message ids, duplicate json_data)."""
    rows = []
    for i in range(n):
        content = i - 1 if (i % dup_every == 0 and i > 0) else i
        rows.append(
            (f"s-{i % 2}", str(uuid.UUID(int=lo + i)), "t",
             f'{{"x":{content}}}', "", dt.datetime(2024, 1, 1), lo + i)
        )
    return spark.createDataFrame(
        rows,
        "stream_id string, message_id string, type string, json_data string, "
        "json_metadata string, created_utc timestamp, seq long",
    )


def test_deduped_sink_drops_cross_epoch_duplicates(spark, tmp_path):
    """Online ingest dedup: in-batch duplicates collapse to the first
    occurrence, and a second epoch re-sending old content appends
    nothing new."""
    from sqlstreamstore_spark.streaming.sink import deduped_store_sink

    src_dir = str(tmp_path / "incoming-dedup")
    store = SparkParquetStreamStore(spark, str(tmp_path / "store-dedup"))
    batch1 = _dup_messages_df(spark, 0, 9)  # contents 0..8 with 3,6 dup'd
    batch1.write.parquet(src_dir)
    schema = ("stream_id string, message_id string, type string, json_data string, "
              "json_metadata string, created_utc timestamp, seq long")
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = deduped_store_sink(store, stream, order_col="seq", query_name="dsink")
    q.awaitTermination(120)
    distinct_contents = {r for (r,) in batch1.select("json_data").distinct().collect()}
    all1 = store.read_all_forwards(0, 1000).messages
    assert len(all1) == len(distinct_contents)  # dups dropped, first kept
    assert {m.get_json_data() for m in all1} == distinct_contents

    # epoch 2: half old content, half new — only the new rows land
    batch2 = _dup_messages_df(spark, 100, 4)  # contents 0..3 -> 0,1,2 old... 
    batch2.write.mode("append").parquet(src_dir)
    q2 = deduped_store_sink(
        store, spark.readStream.schema(schema).parquet(src_dir),
        order_col="seq", query_name="dsink",
    )
    q2.awaitTermination(120)
    all2 = store.read_all_forwards(0, 1000).messages
    new_contents = {r for (r,) in batch2.select("json_data").distinct().collect()}
    expected = distinct_contents | new_contents
    assert len(all2) == len(expected)


def test_rebuild_dedup_index_recovers_membership(spark, tmp_path):
    """After deleting the index (simulated crash), rebuild_dedup_index
    re-derives it from the log and dedup keeps working."""
    import shutil

    from sqlstreamstore_spark.streaming.sink import (
        deduped_store_sink,
        rebuild_dedup_index,
    )

    src_dir = str(tmp_path / "incoming-rb")
    store = SparkParquetStreamStore(spark, str(tmp_path / "store-rb"))
    _dup_messages_df(spark, 0, 6).write.parquet(src_dir)
    schema = ("stream_id string, message_id string, type string, json_data string, "
              "json_metadata string, created_utc timestamp, seq long")
    q = deduped_store_sink(
        store, spark.readStream.schema(schema).parquet(src_dir),
        order_col="seq", query_name="rb",
    )
    q.awaitTermination(120)
    head = store.read_head_position()
    shutil.rmtree(str(tmp_path / "store-rb" / "_dedup_index" / "rb"))
    n = rebuild_dedup_index(store, query_name="rb")
    assert n == head + 1  # one digest per surviving message
    # resend the same content: nothing appends
    _dup_messages_df(spark, 200, 6).write.mode("append").parquet(src_dir)
    q2 = deduped_store_sink(
        store, spark.readStream.schema(schema).parquet(src_dir),
        order_col="seq", query_name="rb",
    )
    q2.awaitTermination(120)
    assert store.read_head_position() == head


def test_rollup_sink_incremental_state_matches_recompute(spark, tmp_path):
    """The materialized-view loop: two availableNow passes over a file
    source (second sees only the new files via the checkpoint) leave
    the persisted rollup state equal to a full recompute over ALL
    events; replaying a committed epoch is a no-op (the merge is not
    idempotent — the pointer guard is what makes it exactly-once)."""
    import datetime as dt

    from sqlstreamstore_spark.analytics.incremental import daily_rollup, present_rollup
    from sqlstreamstore_spark.streaming.sink import read_rollup_state, rollup_sink

    src = tmp_path / "events_src"
    state = str(tmp_path / "rollup_state")
    schema = "event_id long, ts timestamp, event_type string, props string"

    def mk(rows):
        return spark.createDataFrame(
            [(i, dt.datetime(2024, 1, 1 + (i % 3)), t, f'{{"k":{k}}}')
             for i, t, k in rows], schema)

    batch1 = [(i, "click" if i % 2 == 0 else "view", i * 3) for i in range(40)]
    batch2 = [(100 + i, "click" if i % 3 == 0 else "buy", i * 7) for i in range(25)]

    mk(batch1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = rollup_sink(stream, state, query_name="t1")
    q.awaitTermination(120)

    epoch1, st1 = read_rollup_state(spark, state)
    full1 = present_rollup(daily_rollup(mk(batch1))).collect()
    assert [tuple(r) for r in present_rollup(st1).collect()] == [tuple(r) for r in full1]

    # second ingest: only the new files process; state merges forward
    mk(batch2).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = rollup_sink(stream, state, query_name="t1")
    q.awaitTermination(120)

    epoch2, st2 = read_rollup_state(spark, state)
    assert epoch2 > epoch1
    full = present_rollup(daily_rollup(mk(batch1 + batch2))).collect()
    assert [tuple(r) for r in present_rollup(st2).collect()] == [tuple(r) for r in full]

    # replay guard: re-running an availableNow pass with no new data
    # must not double-merge
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = rollup_sink(stream, state, query_name="t1")
    q.awaitTermination(120)
    _, st3 = read_rollup_state(spark, state)
    assert [tuple(r) for r in present_rollup(st3).collect()] == [tuple(r) for r in full]


def test_hll_sink_bounded_state_matches_batch_sketch(spark, tmp_path):
    """Two availableNow passes leave the persisted register state equal
    to the batch-recomputed sketch over ALL events (max-merge ==
    recompute), with bounded rows; the committed estimate matches the
    batch estimate exactly."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sqlstreamstore_spark.analytics.text import hll_estimate, hll_registers
    from sqlstreamstore_spark.streaming.sink import (
        hll_sink,
        read_hll_daily_estimates,
        read_rollup_state,
    )

    src = tmp_path / "ev_src"
    state = str(tmp_path / "hll_state")
    schema = "event_id long, ts timestamp, user_id long"

    def mk(rows):
        return spark.createDataFrame(
            [(i, dt.datetime(2024, 1, 1 + d), u) for i, d, u in rows], schema
        )

    batch1 = [(i, i % 2, i % 500) for i in range(800)]
    batch2 = [(1000 + i, i % 2, 300 + i % 700) for i in range(900)]

    mk(batch1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    hll_sink(stream, state, query_name="h1").awaitTermination(120)

    mk(batch2).write.mode("append").parquet(str(src))
    stream2 = spark.readStream.schema(schema).parquet(str(src))
    hll_sink(stream2, state, query_name="h1").awaitTermination(120)

    epoch, regs = read_rollup_state(spark, state)
    assert regs is not None
    # bounded state: <= 256 registers per day
    per_day = {r.day: r.n for r in regs.groupBy("day").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 256 for n in per_day.values())

    # max-merge across epochs == batch recompute over everything
    all_rows = mk(batch1 + batch2)
    want = hll_registers(
        all_rows.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("user_id").cast("string").alias("u"),
        ),
        col="u",
        group_cols=("day",),
    )
    assert sorted(map(tuple, regs.collect())) == sorted(map(tuple, want.collect()))

    _, est = read_hll_daily_estimates(spark, state)
    got = {r.day: r.hll_corrected for r in est.collect()}
    want_est = {
        r.day: r.hll_corrected
        for r in hll_estimate(want, group_cols=("day",)).collect()
    }
    assert got == want_est
    # and the estimates are sane vs the exact distincts
    exact = {
        r.day: r.n
        for r in all_rows.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for d, n in exact.items():
        assert abs(got[d] - n) / n < 0.25


def test_fuzzy_dedup_ingest_sink_end_to_end(spark, tmp_path):
    """Round-9 continuous-crawl shape: micro-batches probe the
    maintained LSH index — exact dups drop at the digest stage, corpus
    near-dups drop at the fuzzy probe, novel docs land AND extend the
    index so the next batch checks against them; replays append
    nothing."""
    from sqlstreamstore_spark.streaming.sink import fuzzy_dedup_ingest_sink

    src = str(tmp_path / "crawl")
    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "mh-index")
    schema = "doc_id long, text string"

    def text(i, extra=""):
        return " ".join(f"t{i}a{j}" for j in range(20)) + extra

    b1 = spark.createDataFrame(
        [(i, text(i)) for i in (1, 2, 3, 4)], schema
    )
    b1.write.parquet(src)
    q = fuzzy_dedup_ingest_sink(
        spark.readStream.schema(schema).parquet(src), corpus, idx,
        threshold=0.5, query_name="fsink",
    )
    q.awaitTermination(120)
    got1 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got1 == {1, 2, 3, 4}

    # batch 2: 11 = exact dup of 1 (digest stage), 12 = near-dup of 2
    # (fuzzy probe), 13/14 = novel (new-new pairs are out of scope by
    # the incremental contract — both land)
    b2 = spark.createDataFrame(
        [(11, text(1)), (12, text(2, " extra")),
         (13, text(13)), (14, text(14))], schema
    )
    b2.write.mode("append").parquet(src)
    q2 = fuzzy_dedup_ingest_sink(
        spark.readStream.schema(schema).parquet(src), corpus, idx,
        threshold=0.5, query_name="fsink",
    )
    q2.awaitTermination(120)
    got2 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got2 == {1, 2, 3, 4, 13, 14}

    # the index extended itself: only survivors' band rows exist
    idx_docs = {
        r.doc_id for r in spark.read.parquet(idx).select("doc_id").distinct().collect()
    }
    assert idx_docs == got2

    # batch 3 = batch 2 re-delivered under a FRESH checkpoint (crash
    # replay): the digest stage makes it a no-op for 13/14, the probe
    # (self-pair-guarded) for 12
    b2.write.mode("append").parquet(src)
    q3 = fuzzy_dedup_ingest_sink(
        spark.readStream.schema(schema).parquet(src), corpus, idx,
        threshold=0.5, query_name="fsink-replay",
        checkpoint_dir=str(tmp_path / "ckpt-replay"),
    )
    q3.awaitTermination(120)
    got3 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got3 == got2
