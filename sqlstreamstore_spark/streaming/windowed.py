"""Event-time streaming operators: watermarked windowed aggregation,
session windows, and custom stateful processing.

The reference has no event-time layer (SURVEY.md §2.4: "Watermark
analog: none — no event-time processing"); these operators are the
Spark-native extension a large-scale pipeline needs on top of the same
log: late data is bounded by a watermark instead of the reference's
3-second gap-stabilization delay (`ReadonlyStreamStoreBase.cs:18`).

Each builder takes an unbounded DataFrame (from `stream_source`, a file
stream, or `rate` source) and declares the aggregation; state cleanup is
watermark-driven, so state size is bounded by (watermark horizon ×
arrival rate), not total history — the property that matters at 100 TB.

All are plain declarative plans: Catalyst compiles them to incremental
`StateStore` aggregations with partial (map-side) combine per
micro-batch; the shuffle key is the grouping key, identical to the
batch twin in analytics/events.py.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding) event-time counts + value sums per
    event_type. Late rows beyond `watermark_delay` are dropped and the
    corresponding window state is evicted."""
    w = F.window(F.col("ts"), window_duration, slide_duration or window_duration)
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(w.alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Native session windows per user: a session closes after `gap` of
    event-time silence. The built-in `session_window` merges overlapping
    per-key windows inside the state store — the streaming twin of
    analytics/events.sessions_per_user's lag-gap-cumsum."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window(F.col("ts"), gap).alias("win"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def interval_join_clicks_to_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same
    user's clicks in the preceding `within` interval. Both sides are
    watermarked and the join condition carries the time bound, so state
    for rows older than (watermark − interval) is evicted — without the
    bound the join state would grow forever.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark_delay)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark_delay)
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND click_ts <= purchase_ts "
            f"AND click_ts >= purchase_ts - INTERVAL {within}"
        ),
    ).select("p_user", "purchase_id", "purchase_ts", "click_id", "click_ts")


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark keeps state
    only for the watermark horizon (bounded), vs plain dropDuplicates
    whose state grows with total distinct keys forever — the difference
    between a pipeline that runs for years and one that OOMs."""
    return events.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


#: Output schema of `stateful_running_totals`.
RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)


def stateful_running_totals(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value sum, emitted once per micro-batch per
    active key. The canonical template for operators `session_window`
    can't express (per-key custom state machines).

    State is (n, total) per user — O(distinct keys), partitioned by the
    grouping key across executors; an optional processing-time timeout
    evicts idle keys.
    """

    def update(
        key: tuple, pdfs: Iterator, state: GroupState
    ) -> Iterator:
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


STREAM_HEADS_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("head_version", T.LongType(), False),
        T.StructField("head_position", T.LongType(), False),
        T.StructField("message_count", T.LongType(), False),
    ]
)


def stateful_stream_heads(log: DataFrame) -> DataFrame:
    """Live per-stream head tracking via ``transformWithStateInPandas``
    (the Spark 4.x arbitrary-state API — typed ValueState instead of
    applyInPandasWithState's row-tuple blob): the streaming twin of the
    ``streams`` materialized aggregate (analytics/events.py,
    reference `src/SqlStreamStore.MsSql/ScriptsV3/Tables.sql` streams
    table). Each micro-batch updates (head_version, head_position,
    message_count) per stream and emits the new head — exactly what a
    subscription dashboard or a caught-up detector polls.

    State is one 3-long struct per stream — O(distinct streams),
    hash-partitioned by stream_id across executors; at 100 TB the state
    store scales horizontally and per-key updates stay local.

    Runtime requirements (honest env note): transformWithState needs
    the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) and the ``protobuf`` package
    in the Python workers. This sandbox lacks protobuf, so the
    end-to-end test auto-skips there; ``stateful_running_totals`` above
    is the applyInPandasWithState twin that runs everywhere."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class HeadsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._head = handle.getValueState(
                "head", "head_version long, head_position long, message_count long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            ver, pos, n = (
                self._head.get() if self._head.exists() else (-1, -1, 0)
            )
            for pdf in rows:
                ver = max(ver, int(pdf["stream_version"].max()))
                pos = max(pos, int(pdf["position"].max()))
                n += len(pdf)
            self._head.update((ver, pos, n))
            yield pd.DataFrame(
                {
                    "stream_id": [key[0]],
                    "head_version": [ver],
                    "head_position": [pos],
                    "message_count": [n],
                }
            )

        def close(self) -> None:
            pass

    return (
        log.select("stream_id", "stream_version", "position")
        .groupBy("stream_id")
        .transformWithStateInPandas(
            statefulProcessor=HeadsProcessor(),
            outputStructType=STREAM_HEADS_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )
