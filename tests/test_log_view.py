"""events_log derivation invariants (FIXTURES.md §A.2) — the constraints
the reference enforces via PK/unique indexes (Tables.sql:42-46)."""

import uuid

from pyspark.sql import functions as F

from sqlstreamstore_spark.functions.uuid5 import NAMESPACE_DNS
from sqlstreamstore_spark.operators.log_view import events_to_log
from sqlstreamstore_spark.operators.positions import with_dense_global_index
from sqlstreamstore_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_position_dense_and_unique(events_log):
    n = events_log.count()
    assert events_log.select("position").distinct().count() == n
    agg = events_log.agg(F.min("position"), F.max("position")).collect()[0]
    assert (agg[0], agg[1]) == (0, n - 1)


def test_stream_version_dense_per_stream(events_log):
    bad = (
        events_log.groupBy("stream_id")
        .agg(F.min("stream_version").alias("lo"), F.max("stream_version").alias("hi"), F.count("*").alias("n"))
        .filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
        .count()
    )
    assert bad == 0
    dup = events_log.groupBy("stream_id", "stream_version").count().filter("count > 1").count()
    assert dup == 0


def test_message_id_is_uuid5_of_event_id(spark, events_log):
    events = load_table(spark, SF_DIR, "events")
    sample = events.orderBy("event_id").limit(20).collect()
    by_pos = {r["created_utc"]: r["message_id"] for r in events_log.collect()}
    for ev in sample:
        expected = str(uuid.uuid5(NAMESPACE_DNS, str(ev["event_id"])))
        assert by_pos[ev["ts"]] == expected or expected in by_pos.values()


def test_global_index_strategies_agree(spark):
    events = load_table(spark, SF_DIR, "events")
    a = with_dense_global_index(events, ["ts", "event_id"], strategy="offsets")
    b = with_dense_global_index(events, ["ts", "event_id"], strategy="window")
    am = {r["event_id"]: r["position"] for r in a.collect()}
    bm = {r["event_id"]: r["position"] for r in b.collect()}
    assert am == bm


def test_with_global_last_carry_matches_single_partition_reference(spark):
    """The two-phase last-carry equals the naive single-partition window
    on a randomized mixed stream of boundary/query rows — including
    partitions that contain no boundary at all (prefix fill path)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sqlstreamstore_spark.operators.positions import with_global_last_carry

    rng = random.Random(7)
    rows = []
    for i in range(500):
        axis = rng.randrange(10_000)
        is_b = rng.random() < 0.05  # sparse boundaries => empty partitions
        rows.append((i, axis, float(axis) if is_b else None))
    df = spark.createDataFrame(rows, "rid long, axis long, bval double")

    got = {
        r.rid: r.carried
        for r in with_global_last_carry(
            df, [(F.col("axis"), True), (F.col("rid"), True)], "bval"
        ).collect()
    }
    w = (
        Window.orderBy("axis", "rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = {
        r.rid: r.c
        for r in df.withColumn(
            "c", F.last("bval", ignorenulls=True).over(w)
        ).collect()
    }
    assert got == ref

    # descending walk (the NEXT-boundary form)
    got_d = {
        r.rid: r.carried
        for r in with_global_last_carry(
            df, [(F.col("axis"), False), (F.col("rid"), False)], "bval"
        ).collect()
    }
    wd = (
        Window.orderBy(F.col("axis").desc(), F.col("rid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref_d = {
        r.rid: r.c
        for r in df.withColumn(
            "c", F.last("bval", ignorenulls=True).over(wd)
        ).collect()
    }
    assert got_d == ref_d


def test_with_global_cummax_matches_single_partition_reference(spark):
    """Two-phase global cummax (inclusive and exclusive) vs the
    single-partition window truth, on data deliberately spread across
    many range partitions with duplicates and nulls in the value."""
    from pyspark.sql import Window

    from sqlstreamstore_spark.operators.positions import with_global_cummax

    rows = [(i, ((i * 37) % 97) if i % 11 else None) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    for exclusive in (False, True):
        got = {
            r.k: r.m
            for r in with_global_cummax(
                df, [F.col("k")], "v", "m", exclusive=exclusive, num_partitions=16
            ).collect()
        }
        hi = -1 if exclusive else Window.currentRow
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, hi)
        exp = {
            r.k: r.m
            for r in df.withColumn("m", F.max("v").over(w)).collect()
        }
        assert got == exp, exclusive


def test_with_global_rank_and_cumsum_matches_two_primitives(spark):
    """The fused pass must equal the separate dense-index + cumsum
    primitives on data spanning many range partitions, nulls included
    in the value column."""
    from sqlstreamstore_spark.operators.positions import (
        with_dense_global_index,
        with_global_cumsum,
        with_global_rank_and_cumsum,
    )

    rows = [(i, ((i * 13) % 7) if i % 9 else None) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, v long")
    fused = {
        r.k: (r.ix, r.c)
        for r in with_global_rank_and_cumsum(
            df, [F.col("k")], "v", "ix", "c", num_partitions=16
        ).collect()
    }
    a = with_dense_global_index(df, [F.col("k")], "ix", num_partitions=16)
    b = with_global_cumsum(a, [F.col("k")], "v", "c", num_partitions=16)
    exp = {r.k: (r.ix, r.c) for r in b.collect()}
    assert fused == exp
