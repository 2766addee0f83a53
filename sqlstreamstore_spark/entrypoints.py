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
    # applicationId, not id(spark): CPython reuses ids after GC, which
    # could hand back a cached DataFrame bound to a dead session
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _LOG_CACHE:
        log = events_to_log(load_table(spark, sf_dir, "events")).cache()
        _LOG_CACHE[key] = log
    return _LOG_CACHE[key]


def _gate_tmpdir(prefix: str) -> str:
    """mkdtemp registered for rmtree at interpreter exit — gate-store
    scratch dirs must not accumulate across driver runs."""
    import atexit
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    if not _CDC_TMPDIRS:
        atexit.register(_cdc_cleanup)
    _CDC_TMPDIRS.append(path)
    return path


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
        # CDC over an append/delete-stream/delete-message/scavenge/append
        # interleaving (r4 verdict #5): the commit-range delta a consumer
        # at v_final gained since v1 must show appended-then-scavenged
        # rows ABSENT, deleted streams absent, and every tombstone
        # present — replayed in SQL including the store's position/
        # version assignment arithmetic. Deletion-tracking reference
        # analog: src/SqlStreamStore/Streams/Deleted.cs:14-24.
        "store_cdc_multi": (_cdc_multi_query, _CDC_MULTI_SQL),
        # CDC-driven incremental view maintenance: the per-stream view
        # maintained from the delta alone (inserts add, stream-delete
        # tombstones drop, message-delete tombstones decrement, delta-
        # internal ordering by position) hash-matches the oracle's
        # independent RECOMPUTE at v2 — maintained == recomputed,
        # cross-engine, through deletes and scavenges.
        "store_cdc_rollup": (_cdc_rollup_query, _CDC_ROLLUP_SQL),
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
    from sqlstreamstore_spark.store.spark_store import SparkParquetStreamStore

    log = get_log(spark, sf)
    path = _gate_tmpdir("gate-store-roundtrip-")
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
    from sqlstreamstore_spark.store.spark_store import SparkParquetStreamStore

    log = get_log(spark, sf)
    path = _gate_tmpdir("gate-store-timetravel-")
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


# --- store_cdc_multi constants: streams are re-keyed cdc-0..cdc-7 from
# the log's position (density is then sf-independent: every gate sf has
# positions 0..649), so the scenario and its SQL replay share literals.
CDC_K = 8
CDC_S1, CDC_S2, CDC_END = 300, 600, 650
CDC_DS = "cdc-5"   # delete_stream target
CDC_DM = "cdc-1"   # delete_message target (its first batch-2 message)
CDC_SC = "cdc-2"   # scavenge target (max_count below)
CDC_MAXC = 20      # keep newest 20 -> victims reach into batch 2


_CDC_STORE_CACHE: dict[tuple[str, str], tuple] = {}
_CDC_TMPDIRS: list[str] = []


def _cdc_cleanup() -> None:
    import shutil

    for p in _CDC_TMPDIRS:
        shutil.rmtree(p, ignore_errors=True)


def _cdc_store(spark: SparkSession, sf: str):
    """(store, v1, v2) for the canonical CDC interleaving — memoized
    per (session, sf) so the two CDC gate rows (`store_cdc_multi`,
    `store_cdc_rollup`) share one build instead of paying the five
    commits twice. Keyed on applicationId (stable per session), not
    id(spark) — CPython can reuse an id after an old session is
    collected, which would serve a store bound to a dead JVM. Temp
    store dirs are rmtree'd at interpreter exit."""
    key = (spark.sparkContext.applicationId, sf)
    if key in _CDC_STORE_CACHE:
        return _CDC_STORE_CACHE[key]
    from sqlstreamstore_spark.store.spark_store import SparkParquetStreamStore

    log = get_log(spark, sf)
    path = _gate_tmpdir("gate-store-cdc-")
    store = SparkParquetStreamStore(spark, path)
    src = log.filter(F.col("position") < CDC_END).select(
        F.concat(F.lit("cdc-"), (F.col("position") % CDC_K).cast("string"))
        .alias("stream_id"),
        "message_id", "type", "json_data", "json_metadata", "created_utc",
        F.col("position").alias("seq"),
    )
    store.bulk_append(src.filter(F.col("seq") < CDC_S1), order_col="seq")
    v1 = store.manifest_version
    store.bulk_append(
        src.filter((F.col("seq") >= CDC_S1) & (F.col("seq") < CDC_S2)),
        order_col="seq", allow_existing=True,
    )
    store.delete_stream(CDC_DS)
    n1_dm = src.filter(
        (F.col("stream_id") == CDC_DM) & (F.col("seq") < CDC_S1)
    ).count()
    dm_msg = store.read_stream_forwards(CDC_DM, n1_dm, 1).messages[0]
    store.delete_message(CDC_DM, dm_msg.message_id)
    store.set_stream_metadata(CDC_SC, max_count=CDC_MAXC)
    store.bulk_append(
        src.filter(F.col("seq") >= CDC_S2), order_col="seq", allow_existing=True
    )
    v2 = store.manifest_version
    _CDC_STORE_CACHE[key] = (store, v1, v2)
    return store, v1, v2


def _cdc_multi_query(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-commit CDC through the real Parquet store: two bulk
    commits, then DeleteStream + DeleteMessage + a metadata-triggered
    scavenge, then a third bulk commit; return changes_between(v1,
    v_final). Deletes-in-CDC is the case most likely to bite a real
    consumer: scavenged/deleted rows must be ABSENT from the delta while
    their tombstones (and the metadata message) are PRESENT, at the
    store's exact position/version assignments."""
    store, v1, v2 = _cdc_store(spark, sf)

    payload = F.when(
        F.col("type").startswith("$"),
        F.get_json_object("json_data", "$.StreamId"),
    ).otherwise(F.col("json_data"))
    return (
        store.changes_between(v1, v2)
        .select(
            "position", "stream_id", "stream_version", "type",
            payload.alias("payload"),
        )
        .orderBy("position")
    )


def _cdc_multi_oracle() -> str:
    """SQL replay of the whole interleaving: the bulk position/version
    arithmetic (the store_time_travel pattern), the scavenge victim
    rule (keep newest CDC_MAXC by version), literal tombstone/metadata
    rows at their deterministic positions, and the final commit's
    version continuation (deleted stream restarts at 0; delete_message
    keeps versions)."""
    return (
        EVENTS_LOG_ORACLE_CTE
        + f""", src AS (
  SELECT 'cdc-' || CAST(position % {CDC_K} AS VARCHAR) AS stream_id,
         type, json_data, position AS seq
  FROM events_log WHERE position < {CDC_END}),
b2 AS (SELECT * FROM src WHERE seq >= {CDC_S1} AND seq < {CDC_S2}),
b3 AS (SELECT * FROM src WHERE seq >= {CDC_S2}),
cnt1 AS (SELECT stream_id, count(*) AS c FROM src
         WHERE seq < {CDC_S1} GROUP BY stream_id),
cnt2 AS (SELECT stream_id, count(*) AS c FROM src
         WHERE seq < {CDC_S2} GROUP BY stream_id),
ing2 AS (
  SELECT {CDC_S1} + row_number() OVER (ORDER BY s.stream_id, s.seq) - 1 AS position,
         s.stream_id,
         CAST(coalesce(c.c, 0)
              + row_number() OVER (PARTITION BY s.stream_id ORDER BY s.seq) - 1
           AS INTEGER) AS stream_version,
         row_number() OVER (PARTITION BY s.stream_id ORDER BY s.seq) AS rn_in_stream,
         s.type, s.json_data
  FROM b2 s LEFT JOIN cnt1 c ON s.stream_id = c.stream_id),
sc_all AS (
  SELECT row_number() OVER (ORDER BY seq) - 1 AS v, count(*) OVER () AS n
  FROM src WHERE stream_id = '{CDC_SC}' AND seq < {CDC_S2}),
victims AS (SELECT v FROM sc_all WHERE v < n - {CDC_MAXC}),
nv AS (SELECT count(*) AS n FROM victims),
surv2 AS (
  SELECT position, stream_id, stream_version, type, json_data AS payload
  FROM ing2
  WHERE stream_id <> '{CDC_DS}'
    AND NOT (stream_id = '{CDC_DM}' AND rn_in_stream = 1)
    AND NOT (stream_id = '{CDC_SC}'
             AND stream_version IN (SELECT v FROM victims))),
tombs AS (
  SELECT CAST({CDC_S2} AS BIGINT) AS position, '$deleted' AS stream_id,
         CAST(0 AS INTEGER) AS stream_version,
         '$stream-deleted' AS type, '{CDC_DS}' AS payload
  UNION ALL
  SELECT {CDC_S2} + 1, '$deleted', CAST(1 AS INTEGER),
         '$message-deleted', '{CDC_DM}'
  UNION ALL
  SELECT {CDC_S2} + 2, '$${CDC_SC}', CAST(0 AS INTEGER),
         '$stream-metadata', '{CDC_SC}'
  UNION ALL
  SELECT {CDC_S2} + 2 + row_number() OVER (ORDER BY v),
         '$deleted',
         CAST(1 + row_number() OVER (ORDER BY v) AS INTEGER),
         '$message-deleted', '{CDC_SC}'
  FROM victims),
ing3 AS (
  SELECT (SELECT {CDC_S2} + 2 + n FROM nv)
           + row_number() OVER (ORDER BY s.stream_id, s.seq) AS position,
         s.stream_id,
         CAST(CASE WHEN s.stream_id = '{CDC_DS}' THEN 0
                   ELSE coalesce(c.c, 0) END
              + row_number() OVER (PARTITION BY s.stream_id ORDER BY s.seq) - 1
           AS INTEGER) AS stream_version,
         s.type, s.json_data AS payload
  FROM b3 s LEFT JOIN cnt2 c ON s.stream_id = c.stream_id)
SELECT CAST(position AS BIGINT) AS position, stream_id, stream_version,
       type, payload
FROM (SELECT * FROM surv2 UNION ALL SELECT * FROM tombs
      UNION ALL SELECT * FROM ing3)
ORDER BY position
"""
    )


_CDC_MULTI_SQL = _cdc_multi_oracle()


def _cdc_rollup_query(spark: SparkSession, sf: str) -> DataFrame:
    """CDC-driven incremental view maintenance (the Materialize shape):
    take the per-stream message-count view at v1, apply ONLY the
    changes_between(v1, v2) delta — inserts add, $stream-deleted drops
    the stream's row (re-appends after the tombstone re-add), and
    $message-deleted tombstones decrement — and return the maintained
    view. The oracle independently RECOMPUTES the view at v2 from the
    log replay, so the gate hash-match IS the maintained == recomputed
    proof, across engines, through deletes and scavenges.

    The delete rule is the subtle part: changes_between serves the
    TO-version's view, so a message both created and deleted inside
    the delta never appears in it at all — a tombstone must therefore
    decrement ONLY if its MessageId exists in the consumer's held v1
    snapshot (semi-join against the prior state), else it double-
    counts. Within-delta ordering is honored by position: only
    inserts/decrements AFTER a stream's last $stream-deleted tombstone
    count (the delete-then-reappend case). Scale shape: the view and
    every delta aggregate are keyed by stream_id; the delta never
    rescans history — exactly the never-recompute contract of
    analytics/incremental.py, driven by the store's own CDC feed.
    """
    store, v1, v2 = _cdc_store(spark, sf)
    # barriers (r12 optimization): the v1 snapshot is referenced by the
    # prior census AND the tombstone semi-join, and the CDC delta by
    # three branch projections (inserts / stream-tombstones /
    # message-tombstones) — each reference re-ran the manifest-segment
    # union scan (measured plan before: 48 scans / 60 exchanges).
    # Both frames are bounded by the CDC fixture's window.
    prior_msgs = (
        store.as_of(v1).log_df()
        .filter(~F.col("stream_id").startswith("$"))
        .select("stream_id", "message_id")
        .localCheckpoint(eager=False)
    )
    prior = prior_msgs.groupBy("stream_id").agg(F.count("*").alias("prior_n"))
    delta = store.changes_between(v1, v2).localCheckpoint(eager=False)
    sid = F.get_json_object("json_data", "$.StreamId")
    mid = F.get_json_object("json_data", "$.MessageId")
    ins = delta.filter(~F.col("stream_id").startswith("$")).select(
        "stream_id", "position"
    )
    sdel = delta.filter(F.col("type") == "$stream-deleted").select(
        sid.alias("stream_id"), "position"
    )
    mdel = delta.filter(F.col("type") == "$message-deleted").select(
        sid.alias("stream_id"), mid.alias("message_id"), "position"
    )
    last_del = sdel.groupBy("stream_id").agg(F.max("position").alias("dpos"))

    def after_del(df: DataFrame, name: str) -> DataFrame:
        return (
            df.join(last_del, "stream_id", "left")
            .filter(F.col("dpos").isNull() | (F.col("position") > F.col("dpos")))
            .groupBy("stream_id")
            .agg(F.count("*").alias(name))
        )

    ins_n = after_del(ins, "ins_n")
    mdel_n = after_del(
        mdel.join(prior_msgs, ["stream_id", "message_id"], "semi"), "mdel_n"
    )
    keys = (
        prior.select("stream_id")
        .union(ins.select("stream_id"))
        .union(mdel.select("stream_id"))
        .distinct()
    )
    n = (
        F.when(F.col("dpos").isNotNull(), F.lit(0)).otherwise(
            F.coalesce(F.col("prior_n"), F.lit(0))
        )
        + F.coalesce(F.col("ins_n"), F.lit(0))
        - F.coalesce(F.col("mdel_n"), F.lit(0))
    )
    return (
        keys.join(prior, "stream_id", "left")
        .join(last_del, "stream_id", "left")
        .join(ins_n, "stream_id", "left")
        .join(mdel_n, "stream_id", "left")
        .select("stream_id", n.cast("bigint").alias("n_messages"))
        .filter(F.col("n_messages") > 0)
        .orderBy("stream_id")
    )


def _cdc_rollup_oracle() -> str:
    """Independent recompute of the per-stream view at v2 from the log
    replay: batch-1+2 rows minus the deleted stream, the deleted
    message (the target stream's first batch-2 row) and the scavenge
    victims (keep newest CDC_MAXC by version), plus all of batch 3."""
    return (
        EVENTS_LOG_ORACLE_CTE
        + f""", src AS (
  SELECT 'cdc-' || CAST(position % {CDC_K} AS VARCHAR) AS stream_id,
         position AS seq
  FROM events_log WHERE position < {CDC_END}),
cnt1 AS (SELECT stream_id, count(*) AS c FROM src
         WHERE seq < {CDC_S1} GROUP BY stream_id),
all12 AS (
  SELECT stream_id,
         row_number() OVER (PARTITION BY stream_id ORDER BY seq) - 1 AS v
  FROM src WHERE seq < {CDC_S2}),
scn AS (SELECT count(*) AS n FROM src
        WHERE stream_id = '{CDC_SC}' AND seq < {CDC_S2}),
final12 AS (
  SELECT a.stream_id FROM all12 a LEFT JOIN cnt1 c ON a.stream_id = c.stream_id
  WHERE a.stream_id <> '{CDC_DS}'
    AND NOT (a.stream_id = '{CDC_DM}' AND a.v = coalesce(c.c, 0))
    AND NOT (a.stream_id = '{CDC_SC}'
             AND a.v < (SELECT n - {CDC_MAXC} FROM scn))),
allrows AS (SELECT stream_id FROM final12
            UNION ALL
            SELECT stream_id FROM src WHERE seq >= {CDC_S2})
SELECT stream_id, CAST(count(*) AS BIGINT) AS n_messages
FROM allrows GROUP BY stream_id ORDER BY stream_id
"""
    )


_CDC_ROLLUP_SQL = _cdc_rollup_oracle()


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
# rows per round. Round-6 rotation (VERDICT r5 "Next round" #1):
# STALEST-FIRST — each round front-loads the queries whose latest driver
# row is OLDEST, after the four regression canaries that stay inside the
# cap window every round. Shared code changes every round — the stalest
# green row is the one most likely to be silently stale.
#
# Round-7 refinement (VERDICT r6 #1: "don't displace the rotation with
# new queries"): never-checked queries no longer jump the queue as
# round-0. They sort at the MEDIAN existing vintage — behind the stale
# backlog being drained, ahead of the freshest half, so brand-new rows
# neither starve nor displace the scarce resource (fresh evidence on
# old rows). The only exceptions are _GATE_PINNED_NEW: the specific new
# rows the current round's verdict explicitly demands driver evidence
# for; they ride right after the canaries.
#
# Round-8 refinement (ADVICE r7 #1): a pin EXPIRES the moment the query
# gains a driver row — a name counts as pinned only while it is absent
# from gate_last_checked(), so satisfied pins stop displacing the stale
# backlog in later rounds automatically.
#
# Round-12 window (VERDICT r11 #1): pin the 20 stale/unevidenced gates
# — the 6 r11 additions with no driver row at all, the 5 flipped-oracle
# gates whose LATEST driver rows are stale `no_oracle` entries from
# r9/r10 (the r11 golden/inequality oracles have never been
# driver-confirmed), and the 9 remaining r5-vintage rows (those sort
# first under stalest-first anyway, no pin needed). 2 canaries + 6 new
# pins + 5 refresh pins + 9 r5 + 28 oldest r6 = exactly 50. Canaries
# stay at the r11 pair — restoring the 4-tuple would displace two r6
# drains; restore once the r6 backlog (46 rows) is gone (~r13).
_GATE_CANARIES: tuple[str, ...] = (
    "read_all_forwards", "dedup_minhash_lsh",
    # r14+: restore "events_funnel", "store_bulk_roundtrip" here (the
    # r6 backlog still held 18 rows at r13 start — restore once it and
    # the r7 tail drain; the r13 plan's "~r13" estimate assumed a
    # 46-row r6 drain in r12 that only landed 28).
)

_GATE_PINNED_NEW: tuple[str, ...] = (
    # r13 (per the r12 plan): the TWELVE r12 additions with no driver
    # row yet — deliberately not pinned in r12 so they wouldn't
    # displace that round's 20-gate stale/flip drain; judge-sim ALL OK
    # at both SFs in r12 and again at r13 start. Pins self-expire once
    # the rows land. (The r11 pin list landed its rows in r12 and has
    # expired out.)
    "dedup_digest_prefix_probe",
    "text_kneser_ney_bigram",
    "sim_knn_descent_step",
    "eval_krippendorff_alpha",
    "graph_label_propagation",
    "sim_cosine_topk_matryoshka",
    "graph_k_core",
    "sim_mmr_rerank",
    "pipeline_decontaminate_semantic",
    "eval_retrieval_metrics",
    "graph_k_truss",
    "sampling_kcenter_coreset",
)

# Refresh pins: gates that HAVE driver rows, but whose oracle semantics
# changed after that row landed (r11 flipped these from rows-only to
# golden/inequality oracles — the latest official record still reads
# `no_oracle`). A refresh pin is live while the gate's newest driver
# row is OLDER than the named round; it expires automatically the
# round a fresh row lands.
_GATE_PINNED_REFRESH: dict[str, int] = {
    # oracle flipped in r11 → needs a row from r12 or later
    "sim_cosine_topk_ivf": 12,
    "sim_cosine_topk_pq": 12,
    "stats_approx_sketches": 12,
    "text_bpe_stats": 12,
    "text_compression_signals": 12,
}


def gate_last_checked() -> dict[str, int]:
    """query name -> latest round with a driver CORRECTNESS row, parsed
    from the repo-root CORRECTNESS_r{N}.json files the driver commits.
    Queries with no row yet (new this round) are absent (treated as 0)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(f) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name in data:
            last[name] = max(last.get(name, 0), rnd)
    return last


def _all_specs() -> dict[str, QuerySpec]:
    specs = dict(_stream_store_queries())
    try:
        from sqlstreamstore_spark.analytics.registry import analytics_queries

        specs.update(analytics_queries())
    except ImportError:
        pass
    canary_rank = {n: i for i, n in enumerate(_GATE_CANARIES)}
    last = gate_last_checked()
    # ADVICE r7 #1: a pin is live only while the query has no driver row
    # yet; once checked it rejoins the normal stalest-first rotation.
    # r12: refresh pins stay live until a row lands at/after the named
    # round (oracle-semantics changes invalidate the old evidence).
    pinned = {n for n in _GATE_PINNED_NEW if n not in last}
    pinned |= {
        n for n, rnd in _GATE_PINNED_REFRESH.items() if last.get(n, 0) < rnd
    }
    # never-checked rows sort at the median existing vintage (minus a
    # half so they precede that round's own rows): mid-queue, not front
    rounds = sorted(last.values())
    new_vintage = (rounds[len(rounds) // 2] - 0.5) if rounds else 0.0
    # canaries first (always in the cap), pinned-new next, then
    # ascending last-checked round; ties break oracled-before-rows-only,
    # then by name so the order is total and reproducible
    return dict(
        sorted(
            specs.items(),
            key=lambda kv: (
                canary_rank.get(kv[0], len(canary_rank)),
                0 if kv[0] in pinned else 1,
                last.get(kv[0], new_vintage),
                kv[1][1] is None,
                kv[0],
            ),
        )
    )
