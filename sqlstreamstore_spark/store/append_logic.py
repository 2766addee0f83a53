"""The append concurrency/idempotency decision table (SURVEY.md §2.3) —
the behavioral core of the engine.

Semantics re-expressed from the reference spec (IStreamStore.cs:16-33)
and its cleanest implementation (InMemory/InMemoryStream.cs:39-162;
SQL twin PgSqlScripts/AppendToStream.sql:25-151):

  expectedVersion = NO_STREAM (-3):
      stream absent → append.
      stream exists → incoming ids must be an exact PREFIX of stored ids
      (same order, len(incoming) <= len(stored)) → idempotent no-op;
      anything else → WrongExpectedVersion.
  expectedVersion = ANY (-2):
      if the FIRST incoming id exists at stored index i, the whole batch
      must equal the stored run ids[i : i+len] (and fit) → no-op;
      mismatch/overrun → WrongExpectedVersion. If the first id is unseen
      → append (later duplicate ids are permitted by the reference —
      only the first is probed).
  expectedVersion = n >= 0:
      n > current → WrongExpectedVersion.
      n == current → any incoming id already present anywhere in the
      stream → WrongExpectedVersion, else append.
      n < current → idempotency window: incoming ids must equal stored
      ids at offsets n+1 .. n+len (by stored order) → no-op; overrun or
      mismatch → WrongExpectedVersion.
  EMPTY_STREAM (-1) behaves as n == -1: only valid when current == -1
      (delete-guard semantics live in delete_stream, not here).

The decision is pure: it sees the stream's stored message ids (ordered)
and returns "append" or "noop", or raises. Stores supply the id list —
in-memory directly; the Spark store via a pruned single-stream scan
(the analog of the reference SQL backends' indexed id lookups).
"""

from __future__ import annotations

from sqlstreamstore_spark.exceptions import WrongExpectedVersionError
from sqlstreamstore_spark.schema import ExpectedVersion

APPEND = "append"
NOOP = "noop"


def decide_append(
    stream_id: str,
    expected_version: int,
    new_ids: list[str],
    stored_ids: list[str],
    stream_exists: bool,
    current_version: int | None = None,
) -> str:
    """Return APPEND or NOOP, or raise WrongExpectedVersionError.

    current_version matters when it diverges from len(stored_ids)-1
    (message deletes do NOT renumber or rewind the head —
    AcceptanceTests.DeleteEvent.cs:64).
    """
    if current_version is None:
        current_version = len(stored_ids) - 1
    if expected_version == ExpectedVersion.ANY:
        return _decide_any(stream_id, new_ids, stored_ids)
    if expected_version == ExpectedVersion.NO_STREAM:
        return _decide_no_stream(stream_id, new_ids, stored_ids, stream_exists)
    return _decide_exact(
        stream_id, expected_version, new_ids, stored_ids, stream_exists, current_version
    )


def _wrong(stream_id: str, expected_version: int) -> WrongExpectedVersionError:
    return WrongExpectedVersionError(stream_id, expected_version)


def _decide_any(stream_id: str, new_ids: list[str], stored_ids: list[str]) -> str:
    if new_ids:
        try:
            i = stored_ids.index(new_ids[0])
        except ValueError:
            # First id unseen. The reference's backends diverge when a
            # LATER id is already stored (InMemoryStream.cs appends a
            # duplicate; the SQL backends' ON CONFLICT reconciliation
            # throws, AppendToStream.sql:100-151). We pin the SQL
            # behavior — duplicates never silently enter a stream.
            stored = set(stored_ids)
            if any(mid in stored for mid in new_ids[1:]):
                raise _wrong(stream_id, ExpectedVersion.ANY)
            return APPEND
        if i + len(new_ids) > len(stored_ids):
            raise _wrong(stream_id, ExpectedVersion.ANY)
        for n in range(1, len(new_ids)):
            if new_ids[n] != stored_ids[i + n]:
                raise _wrong(stream_id, ExpectedVersion.ANY)
        return NOOP
    return APPEND


def _decide_no_stream(
    stream_id: str, new_ids: list[str], stored_ids: list[str], stream_exists: bool
) -> str:
    if stream_exists and stored_ids:
        if len(new_ids) > len(stored_ids):
            raise _wrong(stream_id, ExpectedVersion.NO_STREAM)
        for i, mid in enumerate(new_ids):
            if stored_ids[i] != mid:
                raise _wrong(stream_id, ExpectedVersion.NO_STREAM)
        return NOOP
    return APPEND


def _decide_exact(
    stream_id: str,
    expected_version: int,
    new_ids: list[str],
    stored_ids: list[str],
    stream_exists: bool,
    current: int,
) -> str:
    if not stream_exists:
        raise _wrong(stream_id, expected_version)
    if expected_version > current:
        raise _wrong(stream_id, expected_version)
    if current >= 0 and expected_version < current:
        for i, mid in enumerate(new_ids):
            index = expected_version + i + 1
            if index >= len(stored_ids) or stored_ids[index] != mid:
                raise _wrong(stream_id, expected_version)
        return NOOP
    # expected_version == current
    stored = set(stored_ids)
    if any(mid in stored for mid in new_ids):
        raise _wrong(stream_id, expected_version)
    return APPEND
