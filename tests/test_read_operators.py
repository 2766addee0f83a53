"""Read-side operators vs the DuckDB oracle (SURVEY.md §2.1 #1-4, 10-13).

The oracle CTE derives events_log in DuckDB (minus message_id — no sha1
there; covered by test_uuid5.py + test_log_view.py invariants instead).
"""

from pyspark.sql import functions as F

from sqlstreamstore_spark.operators.heads import (
    head_position_df,
    stream_head_position_df,
    stream_head_version_df,
)
from sqlstreamstore_spark.operators.list_streams import list_streams_df
from sqlstreamstore_spark.operators.log_view import EVENTS_LOG_ORACLE_CTE, ORACLE_COLUMNS
from sqlstreamstore_spark.operators.read import (
    read_all_backwards_df,
    read_all_forwards_df,
    read_stream_backwards_df,
    read_stream_forwards_df,
)
from tests.conftest import assert_same_rows

COLS = ", ".join(ORACLE_COLUMNS)


def proj(df):
    return df.select(*ORACLE_COLUMNS)


def test_read_all_forwards(events_log, duck):
    assert_same_rows(
        proj(read_all_forwards_df(events_log, 100, 50)),
        duck,
        EVENTS_LOG_ORACLE_CTE
        + f"SELECT {COLS} FROM events_log WHERE position >= 100 ORDER BY position LIMIT 50",
    )


def test_read_all_forwards_from_zero_is_everything_in_order(events_log, duck):
    assert_same_rows(
        proj(read_all_forwards_df(events_log, 0, 10_000)),
        duck,
        EVENTS_LOG_ORACLE_CTE + f"SELECT {COLS} FROM events_log ORDER BY position",
    )


def test_read_all_backwards(events_log, duck):
    assert_same_rows(
        proj(read_all_backwards_df(events_log, 500, 50)),
        duck,
        EVENTS_LOG_ORACLE_CTE
        + f"SELECT {COLS} FROM events_log WHERE position <= 500 ORDER BY position DESC LIMIT 50",
    )


def test_read_stream_forwards(events_log, duck):
    assert_same_rows(
        proj(read_stream_forwards_df(events_log, "user-13", 2, 10)),
        duck,
        EVENTS_LOG_ORACLE_CTE
        + f"SELECT {COLS} FROM events_log WHERE stream_id='user-13' "
        "AND stream_version >= 2 ORDER BY stream_version LIMIT 10",
    )


def test_read_stream_backwards(events_log, duck):
    assert_same_rows(
        proj(read_stream_backwards_df(events_log, "user-13", 20, 10)),
        duck,
        EVENTS_LOG_ORACLE_CTE
        + f"SELECT {COLS} FROM events_log WHERE stream_id='user-13' "
        "AND stream_version <= 20 ORDER BY stream_version DESC LIMIT 10",
    )


def test_read_missing_stream_is_empty(events_log):
    assert read_stream_forwards_df(events_log, "no-such-stream", 0, 10).count() == 0


def test_heads(events_log, duck):
    assert_same_rows(
        head_position_df(events_log),
        duck,
        EVENTS_LOG_ORACLE_CTE
        + "SELECT coalesce(max(position), -1) AS head_position FROM events_log",
    )
    assert_same_rows(
        stream_head_position_df(events_log, "user-13"),
        duck,
        EVENTS_LOG_ORACLE_CTE
        + "SELECT coalesce(max(position), -1) AS head_position FROM events_log "
        "WHERE stream_id='user-13'",
    )
    assert_same_rows(
        stream_head_version_df(events_log, "user-13"),
        duck,
        EVENTS_LOG_ORACLE_CTE
        + "SELECT coalesce(max(stream_version), -1) AS head_version FROM events_log "
        "WHERE stream_id='user-13'",
    )


def test_head_of_missing_stream_is_minus_one(events_log):
    assert stream_head_position_df(events_log, "nope").collect()[0][0] == -1
    assert stream_head_version_df(events_log, "nope").collect()[0][0] == -1


def test_list_streams_prefix(events_log, duck):
    assert_same_rows(
        list_streams_df(events_log, "user-1", "startswith", 20),
        duck,
        EVENTS_LOG_ORACLE_CTE
        + "SELECT stream_id, min(position) AS first_pos FROM events_log "
        "WHERE stream_id LIKE 'user-1%' AND stream_id NOT LIKE '$%' "
        "GROUP BY stream_id ORDER BY first_pos LIMIT 20",
    )


def test_list_streams_endswith(events_log):
    rows = list_streams_df(events_log, "3", "endswith", 100).collect()
    assert all(r["stream_id"].endswith("3") for r in rows)
    assert rows == sorted(rows, key=lambda r: r["first_pos"])


def test_list_streams_continuation(events_log):
    page1 = list_streams_df(events_log, None, "any", 5).collect()
    token = page1[-1]["first_pos"]
    page2 = list_streams_df(events_log, None, "any", 5, continuation_position=token).collect()
    ids1 = {r["stream_id"] for r in page1}
    assert all(r["stream_id"] not in ids1 for r in page2)
    assert all(r["first_pos"] > token for r in page2)


def test_drain_all_forwards_row_pages(events_log):
    from sqlstreamstore_spark.operators.read import drain_all_forwards

    total, last = 0, -1
    for page in drain_all_forwards(events_log, 700):
        assert page[0]["position"] > last
        positions = [r["position"] for r in page]
        assert positions == sorted(positions)
        last = positions[-1]
        total += len(page)
    assert total == events_log.count()
    assert last == total - 1  # dense 0-based positions


def test_drain_all_forwards_arrow_matches_rows(events_log):
    from sqlstreamstore_spark.operators.read import drain_all_forwards_arrow

    total, last = 0, -1
    for batch in drain_all_forwards_arrow(events_log, 700):
        pos = batch.column("position").to_pylist()
        assert pos == sorted(pos) and pos[0] > last
        last = pos[-1]
        total += batch.num_rows
    assert total == events_log.count()
    assert last == total - 1


def test_arrow_page_cache_pages_match_distributed_reads(events_log):
    """ArrowPageCache (the feed server's hot-window page cache) must
    return byte-identical pages to the distributed read_all_forwards_df
    over the same log — including a misaligned start, the final short
    page, and past-end reads. With a bounded window, reads below the
    window fall back to the distributed scan and still match."""
    from sqlstreamstore_spark.operators.read import ArrowPageCache, read_all_forwards_df

    def norm(rows):
        # Arrow surfaces timestamps tz-aware (UTC); Row.asDict naive —
        # same instant, normalize for compare
        return [
            {
                k: (v.replace(tzinfo=None) if hasattr(v, "tzinfo") else v)
                for k, v in r.items()
            }
            for r in rows
        ]

    cache = ArrowPageCache(events_log)
    for pos, n in [(0, 1000), (137, 50), (990, 1000), (10**9, 10)]:
        got = norm(cache.read_all_forwards(pos, n).to_pylist())
        want = norm(
            r.asDict() for r in read_all_forwards_df(events_log, pos, n).collect()
        )
        assert got == want, (pos, n)
    # bounded window: cold range falls back to the cluster, hot is cached
    total = events_log.count()
    small = ArrowPageCache(events_log, window_rows=100)
    assert small.window_start > 0
    cold = norm(small.read_all_forwards(5, 20).to_pylist())
    want = norm(r.asDict() for r in read_all_forwards_df(events_log, 5, 20).collect())
    assert cold == want
    hot_from = small.window_start + 3
    hot = norm(small.read_all_forwards(hot_from, 40).to_pylist())
    want = norm(
        r.asDict() for r in read_all_forwards_df(events_log, hot_from, 40).collect()
    )
    assert hot == want
    assert total > 100
