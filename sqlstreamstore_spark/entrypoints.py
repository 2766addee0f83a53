"""Registry of (spark query, DuckDB oracle SQL) pairs for the driver's
correctness gate (`__spark_entry__.py`).

Every entry corresponds to an operator in SURVEY.md §2 (or an analytics
operator from the M8 milestone). Column names are aliased identically on
both sides — the driver sorts columns by name and value-hashes.

The events_log view is memoized (and cached in Spark) per sf_dir so the
driver's per-query calls don't re-derive positions each time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlstreamstore_spark.operators.heads import (
    head_position_df,
    stream_head_position_df,
    stream_head_version_df,
)
from sqlstreamstore_spark.operators.list_streams import list_streams_df
from sqlstreamstore_spark.operators.log_view import (
    EVENTS_LOG_ORACLE_CTE,
    ORACLE_COLUMNS,
    events_to_log,
)
from sqlstreamstore_spark.operators.read import (
    read_all_backwards_df,
    read_all_forwards_df,
    read_stream_backwards_df,
    read_stream_forwards_df,
)
from sqlstreamstore_spark.operators.retention import (
    expiry_filter_df,
    scavenge_victims_df,
)
from sqlstreamstore_spark.sources.tables import load_table

_LOG_CACHE: dict[tuple[int, str], DataFrame] = {}

#: Fixed parameters for the declared queries (valid at every sf: user ids
#: start at 0; positions 0..N-1 with N >= 1000).
P_ALL_FROM = 100
P_ALL_BACK = 500
N_PAGE = 50
STREAM = "user-13"
STREAM_B = "user-7"
STREAM_FROM_V = 2
STREAM_BACK_V = 20
N_STREAM = 10
LIST_PREFIX = "user-1"
N_LIST = 20
SCAVENGE_MAX_COUNT = 5
EXPIRE_MAX_AGE_S = 864_000  # 10 days
EXPIRE_NOW = "2024-01-20 00:00:00"  # mid-range of the 30-day event window

_COLS = ", ".join(ORACLE_COLUMNS)


def get_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark), sf_dir)
    if key not in _LOG_CACHE:
        log = events_to_log(load_table(spark, sf_dir, "events")).cache()
        _LOG_CACHE[key] = log
    return _LOG_CACHE[key]


def _proj(df: DataFrame) -> DataFrame:
    # message_id excluded from oracle-compared projections: the DuckDB
    # build has no sha1() → UUIDv5 is not expressible there (pinned by
    # tests/test_uuid5.py instead).
    return df.select(*ORACLE_COLUMNS)


def flagship_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReadAllForwards — the reference's core read operation."""
    return _proj(read_all_forwards_df(get_log(spark, sf_dir), P_ALL_FROM, N_PAGE))


# ---------------------------------------------------------------- registry

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]


def _stream_store_queries() -> dict[str, QuerySpec]:
    C = EVENTS_LOG_ORACLE_CTE
    return {
        "read_all_forwards": (
            lambda spark, sf: _proj(read_all_forwards_df(get_log(spark, sf), P_ALL_FROM, N_PAGE)),
            C
            + f"SELECT {_COLS} FROM events_log WHERE position >= {P_ALL_FROM} "
            f"ORDER BY position LIMIT {N_PAGE}",
        ),
        "read_all_backwards": (
            lambda spark, sf: _proj(read_all_backwards_df(get_log(spark, sf), P_ALL_BACK, N_PAGE)),
            C
            + f"SELECT {_COLS} FROM events_log WHERE position <= {P_ALL_BACK} "
            f"ORDER BY position DESC LIMIT {N_PAGE}",
        ),
        "read_stream_forwards": (
            lambda spark, sf: _proj(
                read_stream_forwards_df(get_log(spark, sf), STREAM, STREAM_FROM_V, N_STREAM)
            ),
            C
            + f"SELECT {_COLS} FROM events_log WHERE stream_id = '{STREAM}' "
            f"AND stream_version >= {STREAM_FROM_V} ORDER BY stream_version LIMIT {N_STREAM}",
        ),
        "read_stream_backwards": (
            lambda spark, sf: _proj(
                read_stream_backwards_df(get_log(spark, sf), STREAM, STREAM_BACK_V, N_STREAM)
            ),
            C
            + f"SELECT {_COLS} FROM events_log WHERE stream_id = '{STREAM}' "
            f"AND stream_version <= {STREAM_BACK_V} ORDER BY stream_version DESC LIMIT {N_STREAM}",
        ),
        "read_head_position": (
            lambda spark, sf: head_position_df(get_log(spark, sf)),
            C + "SELECT coalesce(max(position), -1) AS head_position FROM events_log",
        ),
        "read_stream_head_position": (
            lambda spark, sf: stream_head_position_df(get_log(spark, sf), STREAM),
            C
            + f"SELECT coalesce(max(position), -1) AS head_position FROM events_log "
            f"WHERE stream_id = '{STREAM}'",
        ),
        "read_stream_head_version": (
            lambda spark, sf: stream_head_version_df(get_log(spark, sf), STREAM),
            C
            + f"SELECT coalesce(max(stream_version), -1) AS head_version FROM events_log "
            f"WHERE stream_id = '{STREAM}'",
        ),
        "list_streams": (
            lambda spark, sf: list_streams_df(get_log(spark, sf), LIST_PREFIX, "startswith", N_LIST),
            C
            + f"SELECT stream_id, min(position) AS first_pos FROM events_log "
            f"WHERE stream_id LIKE '{LIST_PREFIX}%' AND stream_id NOT LIKE '$%' "
            f"GROUP BY stream_id ORDER BY first_pos LIMIT {N_LIST}",
        ),
        "scavenge_victims": (
            lambda spark, sf: scavenge_victims_df(
                get_log(spark, sf), STREAM, SCAVENGE_MAX_COUNT, key_col="stream_version"
            ),
            C
            + f"SELECT stream_version FROM events_log WHERE stream_id = '{STREAM}' "
            f"AND stream_version <= (SELECT max(stream_version) - {SCAVENGE_MAX_COUNT} "
            f"FROM events_log WHERE stream_id = '{STREAM}') ORDER BY stream_version",
        ),
        "streams_view": (
            lambda spark, sf: _streams_view_query(spark, sf),
            C
            + "SELECT stream_id, CAST(max(stream_version) AS INTEGER) AS head_version, "
            "max(position) AS head_position, min(position) AS first_position, "
            "count(*) AS message_count "
            "FROM events_log GROUP BY stream_id ORDER BY first_position",
        ),
        "expiry_filter": (
            lambda spark, sf: _expiry_query(spark, sf),
            C
            + f"SELECT {_COLS} FROM events_log WHERE stream_id = '{STREAM}' "
            f"AND created_utc + INTERVAL ({EXPIRE_MAX_AGE_S}) SECOND > TIMESTAMP '{EXPIRE_NOW}' "
            f"ORDER BY stream_version",
        ),
        # Round-trip THROUGH the actual Parquet store: bulk-ingest the
        # canonical log into a fresh store and hash-match the store's own
        # read surface (log_df) against SQL. Positions are re-assigned by
        # the ingest order key (stream_id, original position) — the
        # oracle re-ranks the same way, so this verifies the store's
        # commit protocol + manifest read path end to end, not just the
        # log derivation.
        "scavenge_all_victims": (
            _scavenge_all_query,
            C
            + f"""SELECT stream_id, stream_version FROM (
  SELECT stream_id, stream_version,
         row_number() OVER (PARTITION BY stream_id ORDER BY stream_version DESC) AS rk
  FROM events_log
  WHERE stream_id IN ('{STREAM}', '{STREAM_B}')) t
WHERE rk > {SCAVENGE_MAX_COUNT}
ORDER BY stream_id, stream_version""",
        ),
        # Time travel through the actual store: two bulk commits, then
        # read commit 1 via as_of() and the commit-1→2 delta via
        # changes_between(). The oracle replays the same two-phase
        # ingest arithmetic (positions continue from the first commit's
        # row count, versions from each stream's first-commit count).
        "store_time_travel": (
            _time_travel_query,
            C
            + f""", first AS (SELECT * FROM events_log WHERE position < {TT_SPLIT}),
second AS (SELECT * FROM events_log WHERE position >= {TT_SPLIT}),
ing1 AS (
  SELECT row_number() OVER (ORDER BY stream_id, position) - 1 AS position,
         stream_id,
         CAST(row_number() OVER (PARTITION BY stream_id ORDER BY position) - 1 AS INTEGER)
           AS stream_version,
         type, json_data
  FROM first),
cnt1 AS (SELECT stream_id, count(*) AS c FROM first GROUP BY stream_id),
ing2 AS (
  SELECT {TT_SPLIT} + row_number() OVER (ORDER BY s.stream_id, s.position) - 1 AS position,
         s.stream_id,
         CAST(coalesce(c.c, 0)
              + row_number() OVER (PARTITION BY s.stream_id ORDER BY s.position) - 1 AS INTEGER)
           AS stream_version,
         s.type, s.json_data
  FROM second s LEFT JOIN cnt1 c ON s.stream_id = c.stream_id)
SELECT * FROM (
  SELECT 'snapshot' AS phase, position, stream_id, stream_version, type, json_data
  FROM ing1 ORDER BY position LIMIT 100)
UNION ALL
SELECT * FROM (
  SELECT 'delta' AS phase, position, stream_id, stream_version, type, json_data
  FROM ing2 ORDER BY position LIMIT 100)
ORDER BY phase, position""",
        ),
        "store_bulk_roundtrip": (
            _store_roundtrip_query,
            C
            + """, ingested AS (
  SELECT row_number() OVER (ORDER BY stream_id, position) - 1 AS position,
         stream_id,
         CAST(row_number() OVER (PARTITION BY stream_id ORDER BY position) - 1 AS INTEGER)
           AS stream_version,
         created_utc, type, json_data
  FROM events_log
)
SELECT position, stream_id, stream_version, created_utc, type, json_data
FROM ingested ORDER BY position LIMIT 200""",
        ),
    }


def _scavenge_all_query(spark: SparkSession, sf: str) -> DataFrame:
    """Whole-store batch scavenge shape (operators/retention.py
    scavenge_all_victims_df) with a literal two-stream meta table."""
    from sqlstreamstore_spark.operators.retention import scavenge_all_victims_df

    meta = spark.createDataFrame(
        [(STREAM, SCAVENGE_MAX_COUNT), (STREAM_B, SCAVENGE_MAX_COUNT)],
        "stream_id string, max_count int",
    )
    return (
        scavenge_all_victims_df(get_log(spark, sf), meta)
        .select("stream_id", "stream_version")
        .orderBy("stream_id", "stream_version")
    )


def _store_roundtrip_query(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from sqlstreamstore_spark.store.spark_store import SparkParquetStreamStore

    log = get_log(spark, sf)
    path = tempfile.mkdtemp(prefix="gate-store-roundtrip-")
    store = SparkParquetStreamStore(spark, path)
    bulk_src = log.select(
        "stream_id", "message_id", "type", "json_data", "json_metadata",
        "created_utc", F.col("position").alias("seq"),
    )
    store.bulk_append(bulk_src, order_col="seq")
    return (
        store.log_df()
        .select("position", "stream_id", "stream_version", "created_utc", "type", "json_data")
        .orderBy("position")
        .limit(200)
    )


TT_SPLIT = 150


def _time_travel_query(spark: SparkSession, sf: str) -> DataFrame:
    """as_of()/changes_between() through the real Parquet store: commit
    the canonical log in two bulk commits, then read commit 1's
    snapshot and the 1→2 delta (entrypoints oracle replays the same
    two-phase position/version arithmetic in SQL)."""
    import tempfile

    from sqlstreamstore_spark.store.spark_store import SparkParquetStreamStore

    log = get_log(spark, sf)
    path = tempfile.mkdtemp(prefix="gate-store-timetravel-")
    store = SparkParquetStreamStore(spark, path)
    src = log.select(
        "stream_id", "message_id", "type", "json_data", "json_metadata",
        "created_utc", F.col("position").alias("seq"),
    )
    store.bulk_append(src.filter(F.col("seq") < TT_SPLIT), order_col="seq")
    v1 = store.manifest_version
    store.bulk_append(
        src.filter(F.col("seq") >= TT_SPLIT), order_col="seq", allow_existing=True
    )
    v2 = store.manifest_version

    def phase(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("phase"), "position", "stream_id",
            "stream_version", "type", "json_data",
        )

    snap = phase(store.as_of(v1).log_df().orderBy("position").limit(100), "snapshot")
    delta = phase(
        store.changes_between(v1, v2).orderBy("position").limit(100), "delta"
    )
    return snap.unionAll(delta).orderBy("phase", "position")


def _streams_view_query(spark: SparkSession, sf: str) -> DataFrame:
    from sqlstreamstore_spark.analytics.events import streams_view

    return streams_view(get_log(spark, sf))


def _expiry_query(spark: SparkSession, sf: str) -> DataFrame:
    from datetime import datetime

    log = get_log(spark, sf).filter(F.col("stream_id") == STREAM)
    meta = spark.createDataFrame(
        [(STREAM, EXPIRE_MAX_AGE_S, None)],
        "stream_id string, max_age int, max_count int",
    )
    now = datetime.fromisoformat(EXPIRE_NOW)
    return _proj(expiry_filter_df(log, meta, now).orderBy("stream_version"))


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (fn, _sql) in _all_specs().items():
        out[name] = fn
    return out


def build_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, (_fn, sql) in _all_specs().items():
        if sql is not None:
            out[name] = sql
    return out


# The driver evaluates queries in dict order and caps CORRECTNESS at ~50
# rows per round. Round-4 rotation (VERDICT r3 "Next round" #1/#2): the
# two r3 reds — both canonicalizer-representation bugs, now fixed
# (rollcall's array column dropped from the gate projection;
# json_payload_stats oracle CAST ... AS BIGINT) — go first so the fixes
# get driver proof; then ALL 33 session-3/4 queries that have never had
# a driver row (COVERAGE.md provenance list), then dedup_simhash (oracled
# in r2 but only ever driver-run rows-only in r1), then the four
# regression canaries. 40 slots used; the remainder of the ~50 cap is
# available to round-4 additions (appended below as they land).
_GATE_PRIORITY: tuple[str, ...] = (
    # -- r3 reds, fixed this round --
    "collect_list_rollcall", "json_payload_stats",
    # -- never driver-checked (sessions 3/4; sim-verified + pytest-pinned) --
    "dedup_jaccard_prefix", "dq_duplicate_keys", "dq_profile_orders",
    "dq_referential_orphans", "events_cumulative_reach", "events_daily_anomaly",
    "events_gap_fill", "events_transitions", "fuzzy_name_matches",
    "graph_bfs_distances", "graph_pagerank", "graph_triangles",
    "multimodal_audio_features", "multimodal_extract_frames",
    "multimodal_image_ahash", "multimodal_image_near_dup",
    "multimodal_video_near_dup", "sampling_fixed_size", "sampling_pps_systematic",
    "sim_embedding_lsh_recall", "stats_higher_moments", "stats_kmv_by_source",
    "stats_kmv_distinct", "stats_window_ranks", "store_time_travel",
    "text_bpe_stats", "text_compression_signals", "text_hashed_features",
    "text_heavy_hitters", "text_ngram_novelty", "tpch_bucketed_join_revenue",
    "tpch_q11_important_stock", "tpch_q20_dominant_supp",
    # -- oracled in r2 but never driver-checked with its oracle --
    "dedup_simhash",
    # -- round-4 additions (never checked by construction) --
    "stats_ntile_deciles_approx", "multimodal_mp4_metadata",
    "layout_zorder_values", "incremental_rollup_merge",
    "drift_ks_exact", "drift_chi2_types", "drift_ks_binned",
    "incremental_histogram_p90",
    # re-check: its default bits are now AUTO-derived (bits=None ⇒
    # log2(N/32) from a count) — same bits=4 at the fixture's N=500, so
    # the oracle hash is unchanged, but the code path is new
    "sim_cosine_near_dup_lsh",
    # -- §2-core + regression canaries, inside the cap every round --
    "read_all_forwards", "store_bulk_roundtrip",
    "events_funnel", "dedup_minhash_lsh",
)


def _all_specs() -> dict[str, QuerySpec]:
    specs = dict(_stream_store_queries())
    try:
        from sqlstreamstore_spark.analytics.registry import analytics_queries

        specs.update(analytics_queries())
    except ImportError:
        pass
    rank = {n: i for i, n in enumerate(_GATE_PRIORITY)}
    # after the priority block: oracled queries before rows-only ones, so
    # a cap never spends slots on weaker checks while oracled ones wait
    return dict(
        sorted(
            specs.items(),
            key=lambda kv: (rank.get(kv[0], len(rank)), kv[1][1] is None),
        )
    )
