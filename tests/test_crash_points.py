"""Randomized crash-point property for the delta-log commit protocol
(VERDICT r5 #6): the r3/r4 crash-window bugs were found by hand-authored
scenarios; this sweeps them. A random op sequence runs on a store, the
directory is cloned, and the next op runs on the clone with a simulated
kill (exception injection) at a random filesystem mutation inside
commit/purge/snapshot. Reopening the killed clone must land EXACTLY on
a commit boundary — the state before the op, after it, or after one of
its intermediate commits (delete/scavenge-flavored ops commit a
tombstone append and a manifest snapshot separately; each boundary is a
legal crash-recovery point, mirroring the reference's per-statement SQL
transactions) — and the reopened store must remain writable.

No-Spark (pyarrow) mode: same manifest/commit code path, no JVM, so
hypothesis can drive hundreds of kills. Crash points are armed on
os.replace/os.remove — the only mutations of committed state
(everything else writes uniquely-named tmp/orphan files by design;
spark_store.py:293 _save_manifest docstring)."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sqlstreamstore_spark.schema import ExpectedVersion
from sqlstreamstore_spark.store import NewStreamMessage, SparkParquetStreamStore

CLOCK = lambda: dt.datetime(2024, 1, 1)  # noqa: E731
STREAMS = ["s0", "s1", "s2"]


class SimulatedCrash(BaseException):
    """BaseException so no except-Exception handler in the store can
    swallow the kill — the point is an abrupt death mid-commit."""


class _Killer:
    """Counts committed-state mutations (os.replace / os.remove) and
    raises SimulatedCrash when the fuse reaches zero."""

    def __init__(self):
        self.fuse = None
        self._replace, self._remove = os.replace, os.remove

    def arm(self, fuse: int) -> None:
        self.fuse = fuse
        os.replace = self._wrap(self._replace)
        os.remove = self._wrap(self._remove)

    def disarm(self) -> None:
        os.replace, os.remove = self._replace, self._remove
        self.fuse = None

    def _wrap(self, fn):
        def inner(*a, **k):
            if self.fuse is not None:
                self.fuse -= 1
                if self.fuse < 0:
                    raise SimulatedCrash(a)
            return fn(*a, **k)

        return inner


def _open(path: str) -> SparkParquetStreamStore:
    s = SparkParquetStreamStore(None, path, get_utc_now=CLOCK)
    s.SNAPSHOT_EVERY = 3  # cross the full-snapshot path every 3rd commit
    return s


def _msg(n: int) -> NewStreamMessage:
    return NewStreamMessage(str(uuid.UUID(int=n)), f"t{n % 7}", f'{{"n":{n}}}')


def dump_state(path: str) -> dict:
    """Reopen from disk (exercises sidecar/snapshot/patch replay) and
    dump every observable: heads, per-stream pages, deletion sets."""
    s = _open(path)
    out = {
        "version": s.manifest_version,
        "head": s.read_head_position(),
        "streams": {},
        "deleted_messages": {
            k: sorted(v)
            for k, v in s._manifest.get("deleted_messages", {}).items()
        },
        "deleted_streams": dict(s._manifest.get("deleted_streams", {})),
    }
    for sid in sorted(s._manifest["streams"]):
        page = s.read_stream_forwards(sid, 0, 100_000)
        out["streams"][sid] = [
            (m.stream_version, m.position, m.type, m.json_data)
            for m in page.messages
        ]
    return out


def apply_op(store: SparkParquetStreamStore, op: tuple, seq: int) -> None:
    kind = op[0]
    if kind == "append":
        store.append_to_stream(
            STREAMS[op[1]], ExpectedVersion.ANY, [_msg(seq * 10 + i) for i in range(op[2])]
        )
    elif kind == "set_meta":
        store.set_stream_metadata(STREAMS[op[1]], max_count=2)
    elif kind == "delete_stream":
        store.delete_stream(STREAMS[op[1]])
    elif kind == "delete_message":
        sid = STREAMS[op[1]]
        meta = store._manifest["streams"].get(sid)
        if meta and meta["count"] > 0:
            first = store.read_stream_forwards(sid, 0, 1).messages
            if first:
                store.delete_message(sid, first[0].message_id)
    else:  # pragma: no cover
        raise AssertionError(kind)


_OPS = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 2), st.integers(1, 3)),
    st.tuples(st.just("set_meta"), st.integers(0, 2)),
    st.tuples(st.just("delete_stream"), st.integers(0, 2)),
    st.tuples(st.just("delete_message"), st.integers(0, 2)),
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    prefix=st.lists(_OPS, min_size=1, max_size=6),
    victim=_OPS,
    fuse=st.integers(0, 9),
)
def test_random_kill_lands_on_commit_boundary(tmp_path, prefix, victim, fuse):
    import tempfile

    base = tempfile.mkdtemp(prefix="crashprop-", dir=str(tmp_path))
    live = os.path.join(base, "live")
    clone = os.path.join(base, "clone")
    store = _open(live)
    for i, op in enumerate(prefix):
        apply_op(store, op, i)

    # clone the directory AT a commit boundary, then record every
    # commit-boundary state the victim op moves the live store through
    shutil.copytree(live, clone)
    boundaries = [dump_state(live)]
    orig_save = SparkParquetStreamStore._save_manifest

    def recording_save(self, patch=None):
        orig_save(self, patch=patch)
        boundaries.append(dump_state(live))

    SparkParquetStreamStore._save_manifest = recording_save
    try:
        apply_op(store, victim, 100)
    finally:
        SparkParquetStreamStore._save_manifest = orig_save
    post = dump_state(live)
    assert boundaries[-1] == post

    # replay the victim op on the clone, killed at a random fs mutation
    killer = _Killer()
    cstore = _open(clone)
    crashed = False
    killer.arm(fuse)
    try:
        apply_op(cstore, victim, 100)
    except SimulatedCrash:
        crashed = True
    finally:
        killer.disarm()

    got = dump_state(clone)
    if crashed:
        assert got in boundaries, (victim, fuse, got, boundaries)
    else:
        assert got == post, (victim, fuse)

    # whatever boundary it recovered into, the store must stay writable
    s2 = _open(clone)
    s2.append_to_stream("epilogue", ExpectedVersion.ANY, [_msg(999_999)])
    final = dump_state(clone)
    assert final["streams"]["epilogue"] == [
        (0, final["head"], f"t{999_999 % 7}", '{"n":999999}')
    ]
