"""SparkParquetStreamStore — the engine's durable store: an append-only
Parquet log + a tiny JSON manifest, committed by a serialized
single-writer protocol (SURVEY.md §3.2's Spark design).

Architecture (vs the reference's RDBMS backends):
  - WRITE path: driver-side commit protocol. The append decision (§2.3)
    runs in Python; the batch is written as one Parquet file (pyarrow —
    a driver-local columnar write, no Spark job for a handful of rows);
    the manifest (head position, per-stream heads, file list, deletion
    sets) is swapped atomically via write-temp + rename. Dense positions
    are assigned here, so the reference's gap detection/3s-stabilization
    (ReadonlyStreamStoreBase.cs:65-89) is unnecessary by construction.
  - READ path: a Spark DataFrame over the manifest's file list with
    deletion filters — every paged read is the declarative expression
    from operators/read.py; Catalyst pushes position/version bounds into
    the Parquet scan (row-group min/max pruning works because files are
    position-ordered by construction).
  - DELETES are O(1) logical (deletion sets in the manifest, anti-joined
    on read) — the Delta-style deletion-vector approach; `compact()`
    rewrites files to apply them physically and to merge small commit
    files (maintenance, like the reference's async scavenge queue).

Scale notes: the manifest holds per-stream heads — O(#streams), the
same cardinality the reference keeps in its `streams` table
(Tables.sql:4-15). The id-window cache used by idempotency checks loads
one stream's ids on demand (the analog of the reference's indexed
(stream, message_id) lookups, Tables.sql:45)."""

from __future__ import annotations

import datetime as _dt
import json
import os
import uuid as _uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlstreamstore_spark.schema import MESSAGES_SCHEMA
from sqlstreamstore_spark.store.base import StreamStore
from sqlstreamstore_spark.store.messages import NewStreamMessage, StreamMessage


def _migrate_manifest(m: dict) -> dict:
    if isinstance(m.get("deleted_streams"), list):
        # migrate pre-cutoff manifests (deleted ids only): treat
        # everything up to the head at load time as deleted.
        m["deleted_streams"] = {
            sid: m["head_position"] for sid in m["deleted_streams"]
        }
    return m


def _empty_manifest_state() -> dict:
    return {
        "version": 0,
        "head_position": -1,
        "streams": {},
        "files": [],
        # stream_id -> max position covered by the delete; rows of the
        # stream at positions <= cutoff are dead, later appends (a
        # re-created stream) stay visible — reference semantics
        # (InMemoryStreamStore.cs delete + re-append round-trips).
        "deleted_streams": {},
        "deleted_messages": {},
    }


def _read_sidecar(version_path: str) -> tuple[int, int] | None:
    """(current_version, latest_snapshot_version); legacy single-number
    sidecars mean snapshot == current. None when absent/corrupt."""
    try:
        with open(version_path) as f:
            parts = f.read().split()
        if len(parts) == 1:
            return int(parts[0]), int(parts[0])
        return int(parts[0]), int(parts[1])
    except (OSError, ValueError):
        return None


def _apply_manifest_patch(state: dict, p: dict) -> None:
    state["version"] = p["version"]
    if "head_position" in p:
        state["head_position"] = p["head_position"]
    state["streams"].update(p.get("streams", {}))
    for sid in p.get("streams_del", []):
        state["streams"].pop(sid, None)
    state["files"].extend(p.get("files_add", []))
    if p.get("deleted_streams") is not None:
        state["deleted_streams"] = p["deleted_streams"]
    if p.get("deleted_messages") is not None:
        state["deleted_messages"] = p["deleted_messages"]


def _replay_manifest(history_dir: str, base: dict, to_version: int) -> dict:
    """Apply history entries base.version+1 .. to_version. A .snap.json
    or legacy-full {v}.json along the way resets the state wholesale
    (both are complete manifests)."""
    state = base
    for v in range(base["version"] + 1, to_version + 1):
        snap = os.path.join(history_dir, f"{v}.snap.json")
        if os.path.exists(snap):
            with open(snap) as f:
                state = _migrate_manifest(json.load(f))
            continue
        with open(os.path.join(history_dir, f"{v}.json")) as f:
            entry = json.load(f)
        if entry.get("patch"):
            _apply_manifest_patch(state, entry)
        else:  # pre-delta-log archive: a full manifest copy
            state = _migrate_manifest(entry)
    return state


def resolve_manifest_state(path: str) -> tuple[dict, int]:
    """Current (state, latest_snapshot_version) for a store directory —
    the delta-log resolution shared by store handles and out-of-process
    readers (the custom streaming DataSource)."""
    manifest_path = os.path.join(path, "manifest.json")
    history_dir = os.path.join(path, "manifest.history")
    side = _read_sidecar(os.path.join(path, "manifest.version"))
    if side is None:
        # legacy / fresh store: manifest.json (if any) IS the state
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                m = _migrate_manifest(json.load(f))
            return m, m["version"]
        return _empty_manifest_state(), 0
    current, snap_v = side
    base = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            base = _migrate_manifest(json.load(f))
        if base["version"] > current:
            # pre-delta-log crash window: the OLD commit point was the
            # manifest rename (sidecar written after), so a manifest
            # ahead of the sidecar is the committed state
            return base, base["version"]
    if (base is None or base["version"] < snap_v) and snap_v > 0:
        with open(os.path.join(history_dir, f"{snap_v}.snap.json")) as f:
            base = _migrate_manifest(json.load(f))
    if base is None:
        base = _empty_manifest_state()
    if base["version"] >= current:
        return base, snap_v
    return _replay_manifest(history_dir, base, current), snap_v


class SparkParquetStreamStore(StreamStore):
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        get_utc_now: Callable[[], _dt.datetime] | None = None,
        track_deletions: bool = True,
        as_of_version: int | None = None,
    ):
        super().__init__(get_utc_now, track_deletions)
        self.spark = spark
        self.path = path
        self._data_dir = os.path.join(path, "data")
        self._manifest_path = os.path.join(path, "manifest.json")
        self._lock_path = os.path.join(path, ".manifest.lock")
        self._version_path = os.path.join(path, "manifest.version")
        self._history_dir = os.path.join(path, "manifest.history")
        os.makedirs(self._data_dir, exist_ok=True)
        self._read_only = as_of_version is not None
        # set by mutators that touch non-stream manifest state (deletion
        # sets, file replacements) without saving in the same call: the
        # NEXT commit must be a full snapshot, never a patch, or the
        # piggybacked state would be lost on replay
        self._manifest_dirty = False
        self._manifest = self._load_manifest()
        if as_of_version is not None and self._manifest["version"] != as_of_version:
            self._manifest = self._load_archived_manifest(as_of_version)
        self._ids_cache: dict[str, list[str]] = {}
        self._log_cache: DataFrame | None = None
        self._log_cache_version = -1

    # ---------------------------------------------------------- time travel

    def as_of(self, version: int) -> "SparkParquetStreamStore":
        """Read-only snapshot of the store at manifest ``version`` —
        Delta-style time travel over the commit log. Every commit
        archives its manifest into ``manifest.history/``, and data files
        are immutable until ``compact()``, so the full read API
        (paged reads, heads, metadata, list_streams, ``log_df``) works
        against any archived version: audit "what did consumers see at
        commit V", reproduce a downstream job, or diff two commits.
        Write operations on a snapshot raise.

        Caveat (same contract as Delta VACUUM): ``compact()`` rewrites
        the live log and deletes superseded data files — snapshots older
        than the last compaction may reference removed files and fail at
        scan time. Archive retention is the operator's policy decision.
        """
        return SparkParquetStreamStore(
            self.spark, self.path, get_utc_now=self.get_utc_now,
            track_deletions=self.track_deletions, as_of_version=version,
        )

    @property
    def manifest_version(self) -> int:
        """The commit version this handle reads (monotonic per commit)."""
        return self._manifest["version"]

    def changes_between(self, from_version: int, to_version: int) -> DataFrame:
        """CDC over commits: the messages a reader at ``to_version``
        gained since ``from_version`` — the ``to`` snapshot's log
        restricted to positions above the ``from`` head. Deletions that
        happened before ``to`` are applied (they're part of ``to``'s
        view); ones after are not. Feed it to incremental consumers
        that process commit ranges instead of polling pages."""
        head_from = (
            -1 if from_version == 0
            else self._manifest_at(from_version)["head_position"]
        )
        return self.as_of(to_version).log_df().filter(
            F.col("position") > head_from
        )

    def _manifest_at(self, version: int) -> dict:
        if version == self._manifest["version"]:
            return self._manifest
        return self._load_archived_manifest(version)

    def _load_archived_manifest(self, version: int) -> dict:
        """State at an arbitrary historical version: walk down to the
        nearest full snapshot (a .snap.json, or a pre-delta-log full
        archive, or the empty store at 0), then replay patches up."""
        base = None
        v = version
        while v > 0:
            snap = os.path.join(self._history_dir, f"{v}.snap.json")
            if os.path.exists(snap):
                with open(snap) as f:
                    base = _migrate_manifest(json.load(f))
                break
            pth = os.path.join(self._history_dir, f"{v}.json")
            if os.path.exists(pth):
                with open(pth) as f:
                    entry = json.load(f)
                if not entry.get("patch"):
                    base = _migrate_manifest(entry)
                    break
                v -= 1
                continue
            raise ValueError(
                f"no archived manifest for version {version} "
                f"(missing history entry for commit {v}: store predates "
                "time travel, or archives were pruned)"
            )
        if base is None:
            base = _empty_manifest_state()
        try:
            return _replay_manifest(self._history_dir, base, version)
        except OSError as e:
            raise ValueError(
                f"no archived manifest for version {version} ({e})"
            ) from None

    def refresh(self) -> None:
        """Re-sync this handle with the on-disk manifest — the retry
        recipe after ``ConcurrentWriteError`` in a multi-writer
        deployment: catch, ``refresh()``, re-issue the append (the §2.3
        idempotency check makes a replayed batch safe). Discards all
        in-memory state from a failed attempt; the attempt's orphan data
        files are invisible to manifest-scoped readers and reclaimed by
        ``compact()``."""
        if self._read_only:
            return  # snapshots stay frozen at their version
        with self._write_lock:
            self._manifest = self._load_manifest()
            self._manifest_dirty = False  # unsaved mutations discarded
            self._ids_cache.clear()
            self._meta_cache.clear()
            self._log_cache = None
            self._log_cache_version = -1

    # -------------------------------------------------------------- manifest

    #: Full snapshot every N commits on the patch (append) path; every
    #: non-append commit (delete/scavenge/compact/...) is a snapshot.
    SNAPSHOT_EVERY = 64

    def _load_manifest(self) -> dict:
        state, snap_v = resolve_manifest_state(self.path)
        self._snapshot_version = snap_v
        return state

    def _save_manifest(self, patch: dict | None = None) -> None:
        """Delta-log commit with single-writer enforcement: an exclusive
        flock around a version CAS (the on-disk version must equal the
        version this handle loaded/last wrote; the loser raises
        ConcurrentWriteError instead of clobbering the winner).

        Commit cost is O(change), not O(#streams): the append hot paths
        pass a ``patch`` (touched stream heads + files added + new head
        position) written as ``manifest.history/{V}.json``; every
        non-append commit — and every SNAPSHOT_EVERY-th commit — writes
        a full ``{V}.snap.json`` snapshot instead. Open replays the
        patches above the latest snapshot (the reference's SQL backends
        update one `streams` row per append for the same O(change)
        reason, AppendToStream.sql:160-163). ``manifest.json`` remains a
        snapshot CACHE refreshed after snapshot commits; the COMMIT
        POINT is the atomic sidecar rename (``V S`` = current version +
        latest snapshot version), so a crash at any earlier step leaves
        only an orphan history file that the version's eventual winner
        overwrites. The per-version history doubles as the time-travel
        archive (as_of replays to any version)."""
        import fcntl

        from sqlstreamstore_spark.exceptions import ConcurrentWriteError

        if self._read_only:
            raise ValueError(
                "as_of() snapshot handles are read-only; open the store "
                "without as_of_version to write"
            )
        expected = self._manifest["version"]
        with open(self._lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                side = _read_sidecar(self._version_path)
                if side is not None:
                    found = side[0]
                    if found != expected and os.path.exists(self._manifest_path):
                        # legacy crash window: the OLD commit point was
                        # the manifest.json rename with the sidecar
                        # written after, so a manifest AHEAD of the
                        # sidecar is the committed state (the same rule
                        # resolve_manifest_state applies on open) —
                        # without this re-confirmation such a store
                        # would raise ConcurrentWriteError forever
                        with open(self._manifest_path) as f:
                            mv = json.load(f).get("version", 0)
                        if mv > found:
                            found = mv
                elif os.path.exists(self._manifest_path):
                    # pre-sidecar store: manifest.json IS the state
                    with open(self._manifest_path) as f:
                        found = json.load(f).get("version", 0)
                else:
                    found = 0
                if found != expected:
                    raise ConcurrentWriteError(self.path, expected, found)
                new_version = expected + 1
                self._manifest["version"] = new_version
                os.makedirs(self._history_dir, exist_ok=True)
                snapshot_due = (
                    patch is None
                    or self._manifest_dirty
                    or new_version % self.SNAPSHOT_EVERY == 0
                )
                if snapshot_due:
                    snap = os.path.join(
                        self._history_dir, f"{new_version}.snap.json"
                    )
                    tmp = snap + f".tmp.{_uuid.uuid4().hex}"
                    with open(tmp, "w") as f:
                        json.dump(self._manifest, f, separators=(",", ":"))
                    os.replace(tmp, snap)
                    self._snapshot_version = new_version
                else:
                    entry = dict(patch)
                    entry["version"] = new_version
                    entry["patch"] = True
                    pth = os.path.join(self._history_dir, f"{new_version}.json")
                    tmp = pth + f".tmp.{_uuid.uuid4().hex}"
                    with open(tmp, "w") as f:
                        json.dump(entry, f, separators=(",", ":"))
                    os.replace(tmp, pth)
                    # a crashed snapshot writer may have orphaned a
                    # {V}.snap.json for THIS version; replay prefers
                    # .snap.json, so it would shadow this committed
                    # patch with uncommitted state — remove it before
                    # the commit point (removing an uncommitted orphan
                    # is always safe)
                    stale_snap = os.path.join(
                        self._history_dir, f"{new_version}.snap.json"
                    )
                    if os.path.exists(stale_snap):
                        os.remove(stale_snap)
                # COMMIT POINT
                tmpv = self._version_path + f".tmp.{_uuid.uuid4().hex}"
                with open(tmpv, "w") as f:
                    f.write(f"{new_version} {self._snapshot_version}")
                os.replace(tmpv, self._version_path)
                if snapshot_due:
                    # refresh the snapshot cache (post-commit best-effort:
                    # open() falls back to the .snap.json file)
                    tmp = self._manifest_path + f".tmp.{_uuid.uuid4().hex}"
                    with open(tmp, "w") as f:
                        json.dump(self._manifest, f, separators=(",", ":"))
                    os.replace(tmp, self._manifest_path)
                self._manifest_dirty = False
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)

    # ------------------------------------------------------------------- log

    def log_df(self) -> DataFrame:
        """The live message log as a DataFrame (deletion filters applied).
        This is the store's analytics surface — feed it to any operator."""
        if self._log_cache is not None and self._log_cache_version == self._manifest["version"]:
            return self._log_cache
        m = self._manifest
        # Capture the version BEFORE building: a concurrent append (e.g.
        # the commit thread racing a subscription's read thread) would
        # otherwise bump the manifest mid-build and we'd tag a stale
        # DataFrame with the new version — permanently hiding the new
        # rows from every later read.
        version_at_build = m["version"]
        if not m["files"]:
            df = self.spark.createDataFrame([], MESSAGES_SCHEMA)
        else:
            paths = [os.path.join(self._data_dir, fn) for fn in m["files"]]
            df = self.spark.read.schema(MESSAGES_SCHEMA).parquet(*paths)
            if m["deleted_streams"]:
                dead_streams = self.spark.createDataFrame(
                    list(m["deleted_streams"].items()),
                    "stream_id string, __cutoff long",
                )
                # broadcast hash anti-join on stream_id with the position
                # bound as the extra condition — rows of a re-created
                # stream (position > cutoff) survive.
                df = df.join(
                    F.broadcast(dead_streams),
                    on=[
                        df["stream_id"] == dead_streams["stream_id"],
                        df["position"] <= dead_streams["__cutoff"],
                    ],
                    how="left_anti",
                )
            pairs = [
                (sid, mid)
                for sid, mids in m["deleted_messages"].items()
                for mid in mids
            ]
            if pairs:
                dead = self.spark.createDataFrame(pairs, "stream_id string, message_id string")
                df = df.join(F.broadcast(dead), ["stream_id", "message_id"], "left_anti")
        self._log_cache = df
        self._log_cache_version = version_at_build
        return df

    # -------------------------------------------------------------- backend

    def _head_position(self) -> int:
        return self._manifest["head_position"]

    def _stream_head(self, stream_id: str):
        s = self._manifest["streams"].get(stream_id)
        return (s["version"], s["position"]) if s else None

    def _stream_point_scan(self, flt, columns: list[str]):
        """Driver-local pyarrow scan of the manifest-owned commit files
        with deletion filters applied — the store's analog of the
        reference's indexed point lookups (Tables.sql:42-46). Point
        lookups (idempotency ids, lazy json fetch) are tiny keyed reads;
        launching a Spark job for each would pay ~100 ms of scheduling
        per append. Analytics stays on log_df()."""
        import pyarrow.dataset as ds

        from sqlstreamstore_spark.schema import arrow_messages_schema

        m = self._manifest
        if not m["files"]:
            import pyarrow as pa

            return pa.table(
                {c: [] for c in columns},
                schema=pa.schema([arrow_messages_schema().field(c) for c in columns]),
            )
        files = [os.path.join(self._data_dir, fn) for fn in m["files"]]
        dataset = ds.dataset(files, format="parquet", schema=arrow_messages_schema())
        return dataset.to_table(filter=flt, columns=columns)

    def _stream_stored_ids(self, stream_id: str) -> list[str]:
        if stream_id not in self._ids_cache:
            import pyarrow.dataset as ds

            m = self._manifest
            flt = ds.field("stream_id") == stream_id
            cutoff = m["deleted_streams"].get(stream_id)
            if cutoff is not None:
                flt = flt & (ds.field("position") > cutoff)
            tbl = self._stream_point_scan(flt, ["stream_version", "message_id"])
            dead = set(m["deleted_messages"].get(stream_id, []))
            pairs = sorted(
                (v, mid)
                for v, mid in zip(
                    tbl.column("stream_version").to_pylist(),
                    tbl.column("message_id").to_pylist(),
                )
                if mid not in dead
            )
            self._ids_cache[stream_id] = [mid for _v, mid in pairs]
        return self._ids_cache[stream_id]

    def _rows_to_messages(self, rows) -> list[StreamMessage]:
        return [
            StreamMessage(
                stream_id=r["stream_id"], message_id=r["message_id"],
                stream_version=r["stream_version"], position=r["position"],
                created_utc=r["created_utc"], type=r["type"],
                json_metadata=r["json_metadata"], json_data=r["json_data"],
            )
            for r in rows
        ]

    def _read_stream_slice(self, stream_id, from_version, count, forwards):
        # Always the keyed pyarrow point scan — never a Spark job. An
        # API page is maxCount-bounded; a distributed query for it pays
        # the ~50-100 ms job floor regardless of scan size, while the
        # keyed scan is ~ms (and the only option on spark=None ingest
        # handles). log_df() remains the analytics surface.
        return self._read_stream_slice_arrow(stream_id, from_version, count, forwards)

    def _read_stream_slice_arrow(self, stream_id, from_version, count, forwards):
        import pyarrow.dataset as ds

        m = self._manifest
        flt = ds.field("stream_id") == stream_id
        if forwards:
            flt = flt & (ds.field("stream_version") >= from_version)
        else:
            flt = flt & (ds.field("stream_version") <= from_version)
        cutoff = m["deleted_streams"].get(stream_id)
        if cutoff is not None:
            flt = flt & (ds.field("position") > cutoff)
        tbl = self._stream_point_scan(
            flt,
            ["position", "stream_id", "stream_version", "message_id",
             "created_utc", "type", "json_data", "json_metadata"],
        )
        dead = set(m["deleted_messages"].get(stream_id, []))
        rows = [r for r in tbl.to_pylist() if r["message_id"] not in dead]
        rows.sort(key=lambda r: r["stream_version"], reverse=not forwards)
        return self._rows_to_messages(rows[:count])

    def _read_all_slice(self, from_position, count, forwards):
        # Footer-range-pruned pyarrow scan (see _read_all_slice_arrow) —
        # same rationale as _read_stream_slice: a maxCount-bounded page
        # should never cost a cluster job.
        return self._read_all_slice_arrow(from_position, count, forwards)

    def _file_position_ranges(self) -> list[tuple[str, int, int]]:
        """(file, min_position, max_position) from parquet footers —
        the store's substitute for the reference's PK(position) B-tree
        on the JVM-free path. Cached per manifest version; a footer read
        is a few KB per file."""
        import pyarrow.parquet as pq

        if getattr(self, "_franges_version", None) == self._manifest["version"]:
            return self._franges
        out: list[tuple[str, int, int]] = []
        for fn in self._manifest["files"]:
            path = os.path.join(self._data_dir, fn)
            md = pq.read_metadata(path)
            idx = md.schema.names.index("position")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((fn, min(mins), max(maxs)))
        self._franges = out
        self._franges_version = self._manifest["version"]
        return out

    def _read_all_slice_arrow(self, from_position, count, forwards):
        """maxCount-bounded global page without a JVM: prune files by
        their footer position ranges, read candidates in range order,
        stop as soon as no unread file can still contribute to the
        first `count` surviving rows. Handles overlapping ranges (the
        by_stream compaction layout) via the kth-position bound."""
        import pyarrow.dataset as ds

        m = self._manifest
        flt = (
            (ds.field("position") >= from_position)
            if forwards
            else (ds.field("position") <= from_position)
        )
        cands = [
            (fn, mn, mx)
            for fn, mn, mx in self._file_position_ranges()
            if (mx >= from_position if forwards else mn <= from_position)
        ]
        cands.sort(key=(lambda t: t[1]) if forwards else (lambda t: -t[2]))
        dead_streams = m["deleted_streams"]
        dead_msgs = m["deleted_messages"]
        cols = ["position", "stream_id", "stream_version", "message_id",
                "created_utc", "type", "json_data", "json_metadata"]
        rows: list[dict] = []
        for i, (fn, mn, mx) in enumerate(cands):
            dataset = ds.dataset(
                [os.path.join(self._data_dir, fn)], format="parquet"
            )
            for r in dataset.to_table(filter=flt, columns=cols).to_pylist():
                cut = dead_streams.get(r["stream_id"])
                if cut is not None and r["position"] <= cut:
                    continue
                if r["message_id"] in dead_msgs.get(r["stream_id"], []):
                    continue
                rows.append(r)
            if len(rows) >= count and i + 1 < len(cands):
                rows.sort(key=lambda r: r["position"], reverse=not forwards)
                kth = rows[count - 1]["position"]
                nxt = cands[i + 1]
                # no later file can beat the current kth row
                if (nxt[1] > kth) if forwards else (nxt[2] < kth):
                    break
        rows.sort(key=lambda r: r["position"], reverse=not forwards)
        return self._rows_to_messages(rows[:count])

    def _assert_writable(self) -> None:
        if self._read_only:
            raise ValueError(
                "as_of() snapshot handles are read-only; open the store "
                "without as_of_version to write"
            )

    def _commit_messages(self, stream_id, base_version, base_position, messages, created_utc):
        self._assert_writable()
        import pyarrow as pa
        import pyarrow.parquet as pq

        version, position = base_version, base_position
        if messages:
            rows = []
            for nm in messages:
                version += 1
                position += 1
                rows.append(
                    {
                        "position": position,
                        "stream_id": stream_id,
                        "stream_version": version,
                        "message_id": nm.message_id,
                        "created_utc": created_utc,
                        "type": nm.type,
                        "json_data": nm.json_data,
                        "json_metadata": nm.json_metadata,
                    }
                )
            table = pa.Table.from_pylist(
                rows,
                schema=pa.schema(
                    [
                        pa.field("position", pa.int64(), False),
                        pa.field("stream_id", pa.string(), False),
                        pa.field("stream_version", pa.int32(), False),
                        pa.field("message_id", pa.string(), False),
                        pa.field("created_utc", pa.timestamp("us"), False),
                        pa.field("type", pa.string(), False),
                        pa.field("json_data", pa.string(), False),
                        pa.field("json_metadata", pa.string(), True),
                    ]
                ),
            )
            # Unique suffix: the data write happens BEFORE the flock+CAS
            # manifest swap, so a stale handle racing a committed writer
            # would otherwise clobber the winner's file (both compute the
            # same version+position from the same loaded manifest) — the
            # CAS would reject the loser's manifest but the winner's
            # bytes would already be gone. The loser's uniquely-named
            # orphan is invisible to manifest-scoped readers and swept by
            # compact().
            fname = (
                f"batch-{self._manifest['version'] + 1:08d}-{position:012d}"
                f"-{_uuid.uuid4().hex[:8]}.parquet"
            )
            pq.write_table(table, os.path.join(self._data_dir, fname))
            self._manifest["files"].append(fname)
            self._manifest["head_position"] = position

        s = self._manifest["streams"].setdefault(
            stream_id,
            {"version": -1, "position": -1, "first_position": None, "count": 0},
        )
        if messages:
            s["version"] = version
            s["position"] = position
            if s["first_position"] is None:
                s["first_position"] = base_position + 1
            s["count"] += len(messages)
            if stream_id in self._ids_cache:
                self._ids_cache[stream_id].extend(nm.message_id for nm in messages)
        # O(change) delta-log commit: only this stream's head, the one
        # new file, and the global head travel to disk
        commit_patch: dict = {"streams": {stream_id: dict(s)}}
        if messages:
            commit_patch["head_position"] = position
            commit_patch["files_add"] = [fname]
        self._save_manifest(patch=commit_patch)
        if messages and self.on_appended:
            self.on_appended()
        return version, position

    def _delete_stream_rows(self, stream_id) -> bool:
        self._assert_writable()
        s = self._manifest["streams"].pop(stream_id, None)
        self._ids_cache.pop(stream_id, None)
        if s is None:
            return False
        had_rows = s["count"] > 0
        if s.get("position") is not None:
            # cutoff = the stream's own head position: every stored row of
            # the stream is <= it, and any future append lands above the
            # global head, so a re-created stream is fully visible.
            # Recorded even when count == 0: the rows may all be logically
            # deleted via per-message filters, which the pop below drops —
            # without the cutoff they would physically reappear.
            self._manifest["deleted_streams"][stream_id] = s["position"]
        self._manifest["deleted_messages"].pop(stream_id, None)
        self._save_manifest()
        return had_rows

    def _purge_victims(self, stream_id, message_ids) -> None:
        """Batched max-count purge: every victim lands in ONE manifest
        commit plus (with deletion tracking) one batched tombstone
        append — the base class default costs a manifest fsync + a
        $deleted commit PER victim, which made a 100-message append to a
        max_count=10 stream ~200 fsyncs (bench append_maxcount row:
        57.7 s for 2,000 messages before this override)."""
        if not message_ids:
            return
        with self._write_lock:
            ids = self._stream_stored_ids(stream_id)
            present = set(ids)
            doomed = [m for m in message_ids if m in present]
            if not doomed:
                return
            dm = self._manifest["deleted_messages"].setdefault(stream_id, [])
            self._manifest_dirty = True  # the carrying commit must snapshot
            for mid in doomed:
                ids.remove(mid)
                dm.append(mid)
            s = self._manifest["streams"].get(stream_id)
            if s:
                s["count"] = max(0, s["count"] - len(doomed))
            if self.track_deletions:
                import json as _json

                from sqlstreamstore_spark.functions.uuid5 import uuid5_py
                from sqlstreamstore_spark.schema import (
                    DELETED_STREAM_ID,
                    ExpectedVersion,
                    MESSAGE_DELETED_TYPE,
                )

                tombstones = [
                    NewStreamMessage(
                        uuid5_py(f"$message-deleted:{stream_id}:{mid}"),
                        MESSAGE_DELETED_TYPE,
                        _json.dumps(
                            {"StreamId": stream_id, "MessageId": mid},
                            separators=(",", ":"),
                        ),
                    )
                    for mid in doomed
                ]
                # the tombstone commit also persists the deletion sets
                self._append_internal(DELETED_STREAM_ID, ExpectedVersion.ANY, tombstones)
            else:
                self._save_manifest()

    def _delete_message_row(self, stream_id, message_id) -> bool:
        self._assert_writable()
        ids = self._stream_stored_ids(stream_id)
        if message_id not in ids:
            return False
        ids.remove(message_id)
        self._manifest["deleted_messages"].setdefault(stream_id, []).append(message_id)
        s = self._manifest["streams"].get(stream_id)
        if s:
            s["count"] = max(0, s["count"] - 1)
        self._save_manifest()
        return True

    def _list_stream_ids(self, pattern, kind, max_count, continuation):
        rows = []
        for sid, s in self._manifest["streams"].items():
            if sid.startswith("$") or s["first_position"] is None:
                continue
            if pattern and kind == "startswith" and not sid.startswith(pattern):
                continue
            if pattern and kind == "endswith" and not sid.endswith(pattern):
                continue
            if s["first_position"] <= continuation:
                continue
            rows.append((sid, s["first_position"]))
        rows.sort(key=lambda r: r[1])
        return rows[:max_count]

    def _point_json_data(self, stream_id, message_id):
        import pyarrow.dataset as ds

        m = self._manifest
        if message_id in m["deleted_messages"].get(stream_id, []):
            return None
        flt = (ds.field("stream_id") == stream_id) & (ds.field("message_id") == message_id)
        cutoff = m["deleted_streams"].get(stream_id)
        if cutoff is not None:
            flt = flt & (ds.field("position") > cutoff)
        tbl = self._stream_point_scan(flt, ["json_data"])
        return tbl.column("json_data")[0].as_py() if tbl.num_rows else None

    # ------------------------------------------------------------ bulk load

    def bulk_append(
        self, new_messages, order_col: str, allow_existing: bool = False
    ) -> tuple[int, int]:
        """Scale ingestion path: append a whole DataFrame of messages in
        ONE commit, entirely through Spark — message bytes never touch
        the driver (only per-stream head aggregates do, O(#streams)).

        new_messages columns: stream_id, message_id, type, json_data,
        json_metadata, created_utc(timestamp), plus `order_col` defining
        intra-stream order. By default target streams must be NEW (the
        per-message §2.3 idempotency matrix is the transactional API's
        job; bulk load is for migration/backfill — mirrored by the
        reference's absence of any bulk path, its LoadTests just loop
        appends). ``allow_existing=True`` continues versions from each
        stream's current head via a broadcast of the affected heads —
        the streaming-ingestion contract (streaming/sink.py), which
        does NOT run idempotency checks (ANY-with-fresh-ids semantics).

        Positions are assigned head+1.. by (stream_id, order_col) using
        the two-phase dense index (no single-partition funnel); stream
        versions by a per-stream window. Returns (n_rows, new_head).
        """
        self._assert_writable()
        # same serialized-writer guarantee as the transactional API —
        # the streaming sink invokes this from the micro-batch thread
        # while the owning application may append on its own thread.
        with self._write_lock:
            return self._bulk_append_locked(new_messages, order_col, allow_existing)

    def _bulk_append_locked(
        self, new_messages, order_col: str, allow_existing: bool
    ) -> tuple[int, int]:
        from sqlstreamstore_spark.operators.positions import dense_global_index_pinned

        df = new_messages
        base = self._manifest["head_position"]
        # r13 (VERDICT r12 #4 — fold the per-commit jobs): the dense
        # index's partition-counts job now returns per-(pid, stream)
        # counts instead of a distinct-stream set. stream_id is the
        # FIRST order column, so each stream's rows occupy a contiguous
        # __idx block whose first index and length are derivable
        # driver-side from those counts alone — which kills BOTH
        # follow-up jobs the commit used to pay: the per-stream
        # min(__idx) aggregate inside the write job (replaced by one
        # broadcast of the driver-computed plan) and the whole
        # heads READ-BACK job after the write (heads are pure
        # arithmetic over (first_idx, count, base)). Per-commit jobs:
        # 3 → 2; the remaining two are the layout job and the write.
        indexed, pinned, pid_stream_counts = dense_global_index_pinned(
            df, ["stream_id", order_col], index_col="__idx",
            group_counts="stream_id",
        )
        # (pid, stream, count) rows arrive in GLOBAL index order —
        # running total = each stream's first global index
        stream_first: dict = {}
        stream_count: dict = {}
        acc = 0
        for _pid, sid, cnt in pid_stream_counts:
            if sid not in stream_first:
                stream_first[sid] = acc
            stream_count[sid] = stream_count.get(sid, 0) + int(cnt)
            acc += int(cnt)
        existing = sorted(
            s for s in stream_count if s in self._manifest["streams"]
        )
        if existing and not allow_existing:
            if pinned is not None:
                pinned.unpersist()
            raise ValueError(f"bulk_append targets existing streams: {existing[:5]}")
        base_versions = {
            sid: self._manifest["streams"][sid]["version"] for sid in existing
        }
        # Stream versions WITHOUT a per-stream window OR a per-stream
        # aggregate: version = __idx − first_idx + base, with first_idx
        # from the driver-side plan (contiguous-block arithmetic above).
        # The old Window.partitionBy(stream_id) funneled a HOT stream's
        # entire batch through one task (the exact skew a single-feed
        # 100 TB backfill hits); the plan broadcast is O(#streams) —
        # the same bound the manifest already holds driver-side.
        plan = self.spark.createDataFrame(
            [
                (sid, stream_first[sid], base_versions.get(sid))
                for sid in stream_count
            ],
            "stream_id string, __first_idx long, __base_version int",
        )
        positioned = indexed.join(F.broadcast(plan), "stream_id").select(
            (F.col("__idx") + F.lit(base + 1)).alias("position"),
            "stream_id",
            (
                F.col("__idx") - F.col("__first_idx")
                + F.coalesce(F.col("__base_version") + F.lit(1), F.lit(0))
            ).cast("int").alias("stream_version"),
            "message_id",
            F.col("created_utc").cast("timestamp").alias("created_utc"),
            "type",
            "json_data",
            "json_metadata",
        )
        # Unique suffix, not the manifest version: a failed attempt (crash
        # between the parquet write and _save_manifest, heads collect
        # failure, ConcurrentWriteError) must leave an orphan that never
        # collides with the retry — the streaming sink replays epochs on
        # exactly this path. Orphans are unreferenced by the manifest and
        # reclaimed by compact().
        sub = os.path.join(
            self._data_dir,
            f"bulk-{self._manifest['version'] + 1:08d}-{_uuid.uuid4().hex[:8]}",
        )
        try:
            positioned.write.parquet(sub)
        finally:
            # release the dense-index pin once the write has consumed it —
            # repeated bulk ingestions must not accumulate cached
            # partitions for the session lifetime (ADVICE r1).
            if pinned is not None:
                pinned.unpersist()
        files = [
            os.path.join(os.path.basename(sub), fn)
            for fn in sorted(os.listdir(sub))
            if fn.endswith(".parquet")
        ]
        # r13: heads are ARITHMETIC over the already-collected per-stream
        # (first_idx, count) plan — position block [first+base+1,
        # first+count+base], version block ends at count−1+base_version+1
        # — so the read-back job over the just-written parquet is gone.
        n_rows = 0
        new_head = base
        for sid, c in stream_count.items():
            fi = stream_first[sid]
            bv = base_versions.get(sid)
            v = (bv + 1 if bv is not None else 0) + c - 1
            p_min = fi + base + 1
            p_max = fi + c + base
            old = self._manifest["streams"].get(sid)
            self._manifest["streams"][sid] = {
                "version": int(v),
                "position": int(p_max),
                "first_position": old["first_position"] if old else int(p_min),
                "count": (old["count"] if old else 0) + int(c),
            }
            self._ids_cache.pop(sid, None)
            n_rows += int(c)
            new_head = max(new_head, int(p_max))
        self._manifest["files"].extend(files)
        self._manifest["head_position"] = new_head
        self._save_manifest(patch={
            "streams": {
                sid: dict(self._manifest["streams"][sid])
                for sid in stream_count
            },
            "files_add": files,
            "head_position": new_head,
        })
        if self.on_appended:
            self.on_appended()
        return n_rows, new_head

    # ---------------------------------------------------------- maintenance

    def scavenge(self, now: _dt.datetime | None = None) -> dict:
        """Whole-store retention pass: every stream's max-count overflow
        plus every max-age-expired message, found in one distributed
        window/join pass each and recorded as logical deletes in a
        single manifest commit — the batch form of the reference's
        per-append async scavenge queue (Infrastructure/TaskQueue.cs,
        Scavenge.sql), which loops per stream. Run compact() afterwards
        to reclaim the bytes physically.

        Returns {"max_count_victims": n, "expired_victims": n}. The
        victim list reaches the driver (it feeds the manifest's deletion
        sets, the same O(deletes) the reference writes per scavenge);
        for a severely-neglected 100 TB store run compact() directly —
        it applies the same predicates without materializing victims.
        """
        self._assert_writable()
        from sqlstreamstore_spark.operators.retention import (
            expire_all_victims_df,
            scavenge_all_victims_df,
            stream_meta_df,
        )

        with self._write_lock:
            log = self.log_df()
            meta = stream_meta_df(log)
            count_victims = scavenge_all_victims_df(log, meta).collect()
            expire_victims = expire_all_victims_df(
                log, meta, now or self.get_utc_now()
            ).collect()
            seen: set[tuple[str, str]] = set()
            n_count, n_age = 0, 0
            for rows, is_count in ((count_victims, True), (expire_victims, False)):
                for r in rows:
                    key = (r.stream_id, r.message_id)
                    if key in seen:
                        continue
                    seen.add(key)
                    self._manifest["deleted_messages"].setdefault(
                        r.stream_id, []
                    ).append(r.message_id)
                    s = self._manifest["streams"].get(r.stream_id)
                    if s:
                        s["count"] = max(0, s["count"] - 1)
                    self._ids_cache.pop(r.stream_id, None)
                    if is_count:
                        n_count += 1
                    else:
                        n_age += 1
            if seen:
                # the deletion sets just mutated: whichever commit runs
                # next (the tombstone append, or the save below) must be
                # a full snapshot so the sets are durable with it — the
                # same crash semantics as the pre-delta-log full dumps
                self._manifest_dirty = True
                if self.track_deletions:
                    # One batched $deleted append for the whole pass —
                    # same audit trail as the per-append purge path
                    # (reference DeleteEventInternal appends a
                    # $message-deleted tombstone per victim), without
                    # N single-message commits.
                    import json as _json

                    from sqlstreamstore_spark.functions.uuid5 import uuid5_py
                    from sqlstreamstore_spark.schema import (
                        DELETED_STREAM_ID,
                        ExpectedVersion,
                        MESSAGE_DELETED_TYPE,
                    )

                    tombstones = [
                        NewStreamMessage(
                            uuid5_py(f"$message-deleted:{sid}:{mid}"),
                            MESSAGE_DELETED_TYPE,
                            _json.dumps(
                                {"StreamId": sid, "MessageId": mid},
                                separators=(",", ":"),
                            ),
                        )
                        for sid, mid in sorted(seen)
                    ]
                    self._append_internal(
                        DELETED_STREAM_ID, ExpectedVersion.ANY, tombstones
                    )
                self._save_manifest()
            return {"max_count_victims": n_count, "expired_victims": n_age}

    def compact(self, target_files: int | None = None, layout: str = "by_position") -> None:
        """Apply deletion sets physically and merge small commit files:
        rewrite the live log into ~target_files Parquet files, then swap
        the manifest. The analog of the reference's async purge/scavenge
        queue (Infrastructure/TaskQueue.cs) as an explicit maintenance
        operation.

        layout picks which access path gets row-group pruning (the
        columnar substitute for the reference's two covering indexes,
        Tables.sql:42-46 — SURVEY.md §4 "dual-sorted copies"):
          - "by_position": range-partition + sort on position → global
            scans (ReadAll, subscriptions) prune to the position range;
          - "by_stream": range-partition on (stream_id, stream_version)
            → per-stream reads touch only that stream's files/row-groups.
        """
        self._assert_writable()
        if layout not in ("by_position", "by_stream"):
            raise ValueError(f"unknown layout {layout!r}")
        sort_cols = (
            ["position"] if layout == "by_position" else ["stream_id", "stream_version"]
        )
        live = self.log_df()
        tmp_dir = os.path.join(self.path, f"compact-{_uuid.uuid4().hex}")
        n = target_files or max(1, self.spark.sparkContext.defaultParallelism)
        live.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols).write.parquet(
            tmp_dir
        )
        new_files = []
        for i, fn in enumerate(sorted(os.listdir(tmp_dir))):
            if not fn.endswith(".parquet"):
                continue
            new_name = f"compacted-{self._manifest['version']:08d}-{i:05d}.parquet"
            os.replace(os.path.join(tmp_dir, fn), os.path.join(self._data_dir, new_name))
            new_files.append(new_name)
        old_files = list(self._manifest["files"])
        self._manifest["files"] = new_files
        self._manifest["deleted_streams"] = {}
        self._manifest["deleted_messages"] = {}
        self._save_manifest()
        for fn in old_files:
            try:
                os.remove(os.path.join(self._data_dir, fn))
            except OSError:
                pass
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        # Sweep orphans the manifest never owned (e.g. a failed
        # bulk_append job's partial output): readers are manifest-scoped
        # so orphans are invisible, but they waste space until compacted.
        owned = {os.path.normpath(f) for f in new_files}
        for entry in os.listdir(self._data_dir):
            p = os.path.join(self._data_dir, entry)
            if os.path.isdir(p):
                if not any(o.startswith(entry + os.sep) for o in owned):
                    shutil.rmtree(p, ignore_errors=True)
            elif entry.endswith(".parquet") and entry not in owned:
                try:
                    os.remove(p)
                except OSError:
                    pass
