"""Engine exceptions, mirroring the reference's exception surface."""

from __future__ import annotations


class SqlStreamStoreSparkError(Exception):
    """Base class for engine errors."""


class InvalidStreamIdError(SqlStreamStoreSparkError, ValueError):
    """Raised for null/whitespace ids or ids containing whitespace
    (Streams/StreamId.cs:16-22), and for `$`-prefixed ids passed to
    write operations (Infrastructure/StreamStoreBase.cs:50)."""


class ConcurrentWriteError(SqlStreamStoreSparkError):
    """Another process committed to this store since we last loaded its
    manifest. The Parquet store is single-writer by design (dense
    positions are assigned driver-side — SURVEY.md §3.2); this error
    replaces the reference's multi-writer gap machinery
    (ReadonlyStreamStoreBase.cs:65-89, LoadTests/TestGaps.cs:15-100)
    with an explicit conflict instead of a silent manifest clobber."""

    def __init__(self, path: str, expected_version: int, found_version: int):
        self.path = path
        self.expected_version = expected_version
        self.found_version = found_version
        super().__init__(
            f"Concurrent writer detected on {path}: manifest version on disk is "
            f"{found_version}, this handle expected {expected_version}. Re-open "
            f"the store to pick up the other writer's commits."
        )


class WrongExpectedVersionError(SqlStreamStoreSparkError):
    """Optimistic-concurrency failure
    (Streams/WrongExpectedVersionException.cs; decision matrix in
    IStreamStore.cs:16-33 / SURVEY.md §2.3)."""

    def __init__(self, stream_id: str, expected_version: int, message: str | None = None):
        self.stream_id = stream_id
        self.expected_version = expected_version
        super().__init__(
            message
            or f"Append failed due to WrongExpectedVersion. Stream: {stream_id}, "
            f"Expected version: {expected_version}"
        )
