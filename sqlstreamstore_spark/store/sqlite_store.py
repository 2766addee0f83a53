"""SQLite backend — the RDBMS twin, mirroring the role of the
reference's SQL backends (src/SqlStreamStore.Sqlite/, and structurally
PgSqlScripts/Tables.sql:4-47): two tables, `streams` (denormalized head
per stream) and `messages` (PK position; UNIQUE (stream_id, version) and
(stream_id, message_id)), with every backend primitive a parameterized
SQL statement. All behavioral logic — the §2.3 append matrix, retention,
tombstones, paging arithmetic — lives in store/base.py and is therefore
byte-identical across InMemory / Parquet / SQLite, the same
one-contract-many-backends shape the reference's acceptance suite pins.

The analytics path: `log_df()` lifts the table into a Spark DataFrame
(driver-side read — SQLite is an embedded file DB; on a real cluster
this backend is the system-of-record for modest logs, or the metadata
tier next to the Parquet store for big ones; a server RDBMS would use
spark.read.jdbc with position-range partitioning instead)."""

from __future__ import annotations

import datetime as _dt
import sqlite3
import threading
from collections.abc import Callable

from sqlstreamstore_spark.store.base import StreamStore
from sqlstreamstore_spark.store.messages import NewStreamMessage, StreamMessage

_SCHEMA = """
CREATE TABLE IF NOT EXISTS store_meta (
    k TEXT PRIMARY KEY,
    v INTEGER NOT NULL
);
INSERT OR IGNORE INTO store_meta VALUES ('head_position', -1);
CREATE TABLE IF NOT EXISTS streams (
    stream_id      TEXT PRIMARY KEY,
    version        INTEGER NOT NULL,
    position       INTEGER NOT NULL,
    first_position INTEGER
);
CREATE TABLE IF NOT EXISTS messages (
    position       INTEGER PRIMARY KEY,
    stream_id      TEXT NOT NULL,
    stream_version INTEGER NOT NULL,
    message_id     TEXT NOT NULL,
    created_utc    TEXT NOT NULL,
    type           TEXT NOT NULL,
    json_data      TEXT NOT NULL,
    json_metadata  TEXT,
    UNIQUE (stream_id, stream_version),
    UNIQUE (stream_id, message_id)
);
"""

_COLS = "position, stream_id, stream_version, message_id, created_utc, type, json_data, json_metadata"


def _row_to_msg(r) -> StreamMessage:
    return StreamMessage(
        position=r[0], stream_id=r[1], stream_version=r[2], message_id=r[3],
        created_utc=_dt.datetime.fromisoformat(r[4]), type=r[5],
        json_data=r[6], json_metadata=r[7],
    )


class SqliteStreamStore(StreamStore):
    def __init__(
        self,
        path: str = ":memory:",
        get_utc_now: Callable[[], _dt.datetime] | None = None,
        track_deletions: bool = True,
    ):
        super().__init__(get_utc_now, track_deletions)
        # Cross-thread access (subscription reader/notifier threads):
        # sqlite allows it with check_same_thread=False as long as calls
        # are serialized — the lock below guards every statement (the
        # single-writer commit protocol already serializes writes).
        self._db = sqlite3.connect(path, check_same_thread=False)
        self._lock = threading.RLock()
        self._db.executescript(_SCHEMA)
        self._db.commit()

    # ---------------------------------------------------------------- backend

    def _head_position(self) -> int:
        # A persisted monotone counter, NOT max(position): like the
        # reference's DB sequence (Tables.sql:29-31), positions are never
        # reused after deletes.
        with self._lock:
            r = self._db.execute(
                "SELECT v FROM store_meta WHERE k = 'head_position'"
            ).fetchone()
        return r[0]

    def _stream_head(self, stream_id: str):
        with self._lock:
            r = self._db.execute(
                "SELECT version, position FROM streams WHERE stream_id = ?", (stream_id,)
            ).fetchone()
        return (r[0], r[1]) if r else None

    def _stream_stored_ids(self, stream_id: str) -> list[str]:
        with self._lock:
            rows = self._db.execute(
                "SELECT message_id FROM messages WHERE stream_id = ? ORDER BY stream_version",
                (stream_id,),
            ).fetchall()
        return [r[0] for r in rows]

    def _read_stream_slice(self, stream_id, from_version, count, forwards):
        op, order = (">=", "ASC") if forwards else ("<=", "DESC")
        with self._lock:
            rows = self._db.execute(
                f"SELECT {_COLS} FROM messages WHERE stream_id = ? AND stream_version {op} ? "
                f"ORDER BY stream_version {order} LIMIT ?",
                (stream_id, from_version, count),
            ).fetchall()
        return [_row_to_msg(r) for r in rows]

    def _read_all_slice(self, from_position, count, forwards):
        op, order = (">=", "ASC") if forwards else ("<=", "DESC")
        with self._lock:
            rows = self._db.execute(
                f"SELECT {_COLS} FROM messages WHERE position {op} ? "
                f"ORDER BY position {order} LIMIT ?",
                (from_position, count),
            ).fetchall()
        return [_row_to_msg(r) for r in rows]

    def _commit_messages(self, stream_id, base_version, base_position, messages, created_utc):
        version, position = base_version, base_position
        with self._lock:
            return self._commit_locked(
                stream_id, base_version, base_position, messages, created_utc
            )

    def _commit_locked(self, stream_id, base_version, base_position, messages, created_utc):
        version, position = base_version, base_position
        cur = self._db.cursor()
        for nm in messages:
            version += 1
            position += 1
            cur.execute(
                "INSERT INTO messages VALUES (?,?,?,?,?,?,?,?)",
                (position, stream_id, version, nm.message_id,
                 created_utc.isoformat(), nm.type, nm.json_data, nm.json_metadata),
            )
        if messages:
            cur.execute(
                "UPDATE store_meta SET v = ? WHERE k = 'head_position' AND v < ?",
                (position, position),
            )
        first = base_position + 1 if messages else None
        cur.execute(
            "INSERT INTO streams (stream_id, version, position, first_position) "
            "VALUES (?,?,?,?) ON CONFLICT(stream_id) DO UPDATE SET "
            "version = excluded.version, position = excluded.position, "
            "first_position = coalesce(streams.first_position, excluded.first_position)",
            (stream_id, version, position, first),
        )
        self._db.commit()
        if messages and self.on_appended:
            self.on_appended()
        return version, position

    def _delete_stream_rows(self, stream_id) -> bool:
      with self._lock:
        cur = self._db.cursor()
        n = cur.execute(
            "SELECT count(*) FROM messages WHERE stream_id = ?", (stream_id,)
        ).fetchone()[0]
        existed = cur.execute(
            "SELECT 1 FROM streams WHERE stream_id = ?", (stream_id,)
        ).fetchone() is not None
        if not existed:
            return False
        cur.execute("DELETE FROM messages WHERE stream_id = ?", (stream_id,))
        cur.execute("DELETE FROM streams WHERE stream_id = ?", (stream_id,))
        self._db.commit()
        return n > 0

    def _delete_message_row(self, stream_id, message_id) -> bool:
        with self._lock:
            cur = self._db.cursor()
            cur.execute(
                "DELETE FROM messages WHERE stream_id = ? AND message_id = ?",
                (stream_id, message_id),
            )
            self._db.commit()
            return cur.rowcount > 0

    def _list_stream_ids(self, pattern, kind, max_count, continuation):
        sql = (
            "SELECT stream_id, first_position FROM streams "
            "WHERE first_position IS NOT NULL AND first_position > ? "
            "AND stream_id NOT LIKE '$%' "
        )
        args: list = [continuation]
        if pattern and kind == "startswith":
            sql += "AND stream_id LIKE ? ESCAPE '\\' "
            args.append(_like_escape(pattern) + "%")
        elif pattern and kind == "endswith":
            sql += "AND stream_id LIKE ? ESCAPE '\\' "
            args.append("%" + _like_escape(pattern))
        sql += "ORDER BY first_position LIMIT ?"
        args.append(max_count)
        with self._lock:
            return [(r[0], r[1]) for r in self._db.execute(sql, args).fetchall()]

    def _point_json_data(self, stream_id, message_id):
        with self._lock:
            r = self._db.execute(
                "SELECT json_data FROM messages WHERE stream_id = ? AND message_id = ?",
                (stream_id, message_id),
            ).fetchone()
        return r[0] if r else None

    # ------------------------------------------------------------- analytics

    def log_df(self, spark):
        """The live log as a Spark DataFrame (embedded DB ⇒ driver-side
        read; see module docstring for the server-RDBMS variant)."""
        from sqlstreamstore_spark.schema import MESSAGES_SCHEMA

        with self._lock:
            rows = self._db.execute(
                f"SELECT {_COLS} FROM messages ORDER BY position"
            ).fetchall()
        data = [
            (r[0], r[1], r[2], r[3], _dt.datetime.fromisoformat(r[4]), r[5], r[6], r[7])
            for r in rows
        ]
        return spark.createDataFrame(data, MESSAGES_SCHEMA)


def _like_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
