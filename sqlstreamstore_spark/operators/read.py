"""Paged-read operators over the message log — the core query surface
(SURVEY.md §2.1 #1-4).

Reference behavior: ReadonlyStreamStoreBase.cs:45-165, PgSqlScripts/
ReadAll.sql:21-44, Read.sql:29-48. Each is a pure DataFrame expression:
filter + orderBy + limit. Catalyst pushes the position/version bounds
into the Parquet scan (min/max row-group pruning) and fuses LIMIT with
the sort into TakeOrderedAndProject — the same effect as the reference's
indexed top-k scans, with no code of ours in the hot path.

These return DataFrames; page-object assembly (IsEnd / NextPosition
arithmetic) lives in store/base.py where maxCount+1 probing happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drain_all_forwards(log: DataFrame, page_size: int = 1000):
    """Iterate the entire log in position order, yielding lists of Rows
    of ``page_size`` — the scale path for a full drain (ReadAllForwards
    loop analog). ONE Spark job: range-repartition + in-partition sort,
    then partitions stream to the driver via toLocalIterator in order —
    no per-page job overhead, no single-partition global sort.
    """
    n = max(1, log.sparkSession.sparkContext.defaultParallelism)
    it = (
        log.repartitionByRange(n, "position")
        .sortWithinPartitions("position")
        .toLocalIterator(prefetchPartitions=True)
    )
    buf = []
    for row in it:
        buf.append(row)
        if len(buf) == page_size:
            yield buf
            buf = []
    if buf:
        yield buf


def drain_all_forwards_arrow(log: DataFrame, page_size: int = 1000):
    """Arrow fast path for a bounded full-log export: ONE range-sort job,
    one Arrow IPC transfer (no per-Row deserialization — ~10× the row
    iterator's throughput), then zero-copy page slices. Driver memory
    bounds the result, so this is for bounded drains (an export, a
    backfill into another system); use `drain_all_forwards` when the log
    exceeds driver memory — it streams partition-by-partition.
    """
    n = max(1, log.sparkSession.sparkContext.defaultParallelism)
    tbl = (
        log.repartitionByRange(n, "position")
        .sortWithinPartitions("position")
        .toArrow()
    )
    for start in range(0, tbl.num_rows, page_size):
        yield tbl.slice(start, page_size)


class ArrowPageCache:
    """Serve keyset ``ReadAllForwards`` pages from a driver-side Arrow
    snapshot of the sorted log window — zero Spark jobs per page.

    Rationale: the reference's SQL backends answer a 1000-row page from
    the RDBMS buffer pool in ~1 ms; a distributed query per page costs a
    full job round-trip (~50-100 ms on local[32], regardless of data
    size — it's scheduling+planning floor, not scan). A feed server at
    100 TB does what any hot-path cache does: keep the served window
    (the hot tail, bounded by ``window_rows``) as one Arrow table on the
    serving node, refreshed per commit batch, and fall back to the
    distributed scan for cold ranges. One job builds the window
    (range-sorted Arrow transfer); every page after that is a
    binary-search + zero-copy slice.

    Page contents are identical to ``read_all_forwards_df`` over the
    same log (pinned by tests/test_read_operators.py).
    """

    def __init__(self, log: DataFrame, window_rows: int | None = None):
        self._log = log
        self._window_rows = window_rows
        self.refresh()

    def refresh(self) -> None:
        """Rebuild the cached window from the current log — a feed
        server calls this per commit batch (cheap: one range-sorted
        Arrow transfer of the window)."""
        import numpy as np

        log = self._log
        n = max(1, log.sparkSession.sparkContext.defaultParallelism)
        sorted_log = log.repartitionByRange(n, "position").sortWithinPartitions(
            "position"
        )
        tbl = sorted_log.toArrow()  # partition order == position order
        if self._window_rows is not None and tbl.num_rows > self._window_rows:
            tbl = tbl.slice(tbl.num_rows - self._window_rows)
        self._tbl = tbl
        # dense or not, positions are sorted: a numpy view gives O(log n)
        # lower-bound lookup per page
        self._pos = np.asarray(tbl.column("position"))
        self.window_start = int(self._pos[0]) if tbl.num_rows else 0

    def read_all_forwards(self, from_position: int, max_count: int):
        """One page as a zero-copy Arrow slice. Cold ranges (below the
        cached window) fall back to the distributed scan."""
        import numpy as np

        if self._tbl.num_rows and from_position < self.window_start:
            return (
                read_all_forwards_df(self._log, from_position, max_count)
                .toArrow()
            )
        lo = int(np.searchsorted(self._pos, from_position, side="left"))
        return self._tbl.slice(lo, max_count)


def read_all_forwards_df(log: DataFrame, from_position: int, max_count: int) -> DataFrame:
    """Global scan from position, ascending (ReadAll.sql:21-44).

    Oracle: SELECT * FROM events_log WHERE position >= {p}
            ORDER BY position LIMIT {n}
    """
    return (
        log.filter(F.col("position") >= F.lit(int(from_position)))
        .orderBy("position")
        .limit(int(max_count))
    )


def read_all_backwards_df(log: DataFrame, from_position: int, max_count: int) -> DataFrame:
    """Global scan from position, descending (ReadAll.sql:36-41).

    Oracle: SELECT * FROM events_log WHERE position <= {p}
            ORDER BY position DESC LIMIT {n}
    """
    return (
        log.filter(F.col("position") <= F.lit(int(from_position)))
        .orderBy(F.col("position").desc())
        .limit(int(max_count))
    )


def read_stream_forwards_df(
    log: DataFrame, stream_id: str, from_version: int, max_count: int
) -> DataFrame:
    """Per-stream scan from version, ascending (Read.sql:29-48).

    Oracle: SELECT * FROM events_log WHERE stream_id = '{s}'
            AND stream_version >= {v} ORDER BY stream_version LIMIT {n}
    """
    return (
        log.filter(
            (F.col("stream_id") == F.lit(stream_id))
            & (F.col("stream_version") >= F.lit(int(from_version)))
        )
        .orderBy("stream_version")
        .limit(int(max_count))
    )


def read_stream_backwards_df(
    log: DataFrame, stream_id: str, from_version: int, max_count: int
) -> DataFrame:
    """Per-stream scan from version, descending
    (InMemoryStreamStore.cs:577-662).

    Oracle: SELECT * FROM events_log WHERE stream_id = '{s}'
            AND stream_version <= {v} ORDER BY stream_version DESC LIMIT {n}
    """
    return (
        log.filter(
            (F.col("stream_id") == F.lit(stream_id))
            & (F.col("stream_version") <= F.lit(int(from_version)))
        )
        .orderBy(F.col("stream_version").desc())
        .limit(int(max_count))
    )
