"""Engine exceptions, mirroring the reference's exception surface."""

from __future__ import annotations


class SqlStreamStoreSparkError(Exception):
    """Base class for engine errors."""


class InvalidStreamIdError(SqlStreamStoreSparkError, ValueError):
    """Raised for null/whitespace ids or ids containing whitespace
    (Streams/StreamId.cs:16-22), and for `$`-prefixed ids passed to
    write operations (Infrastructure/StreamStoreBase.cs:50)."""


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
