"""HTTP client presenting the same StreamStore API as the local
backends — the port of the reference's HttpClientSqlStreamStore
(src/SqlStreamStore.Http/; acceptance-tested in
tests/SqlStreamStore.Http.Tests/HttpClientStreamStoreAcceptanceTests.cs
against a HAL server over the in-memory store, which is exactly how
tests/test_http_store.py drives this client).

stdlib urllib only. All append/idempotency/retention logic runs
server-side; this class is a faithful protocol shim: pages come back as
the same dataclasses, ``read_next`` walks the keyset continuations, and
``prefetch_json_data=False`` messages lazily re-fetch their body via
the point-read route (null once deleted — StreamMessage.cs:59-72).
"""

from __future__ import annotations

import datetime as _dt
import json
import urllib.error
import urllib.request
from urllib.parse import quote

from sqlstreamstore_spark.exceptions import (
    InvalidStreamIdError,
    WrongExpectedVersionError,
)
from sqlstreamstore_spark.http.server import (
    EXPECTED_VERSION_HEADER,
    HEAD_POSITION_HEADER,
    _canonical_query,
)
from sqlstreamstore_spark.store.messages import (
    AppendResult,
    NewStreamMessage,
    ReadAllPage,
    ReadStreamPage,
    SetStreamMetadataResult,
    StreamMessage,
    StreamMetadataResult,
)


class HttpClientStreamStore:
    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        # path -> (etag, status, headers, body): conditional-GET cache.
        # Feed polling (catch-up subscriptions) re-reads the same head
        # page until it changes; with If-None-Match the server answers
        # 304 with no body — what makes HAL feeds cheap to poll
        # (reference ConditionalRequestTests.cs). Cached CONSERVATIVELY:
        # only responses whose ETag fully determines content — empty
        # feed pages (the steady-state head poll; nothing in them can
        # expire) and stream metadata (version bumps on every change).
        # Pages WITH messages are never reused: max-age expiry can
        # change their content without moving the version/position the
        # ETag is derived from. Bounded LRU-ish.
        self._etag_cache: dict[str, tuple[str, int, dict, object]] = {}
        self._etag_cache_max = 64

    # ------------------------------------------------------------ transport

    def _request(self, method: str, path: str, body=None, headers=None,
                 _redirects: int = 0):
        data = None if body is None else json.dumps(body).encode()
        headers = {"Content-Type": "application/json", **(headers or {})}
        cached = self._etag_cache.get(path) if method == "GET" else None
        if cached is not None:
            headers["If-None-Match"] = cached[0]
        req = urllib.request.Request(
            self.base_url + path, data=data, method=method, headers=headers,
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                raw = resp.read()
                out = resp.status, dict(resp.headers), json.loads(raw) if raw else None
                self._maybe_cache(method, path, *out)
                return out
        except urllib.error.HTTPError as e:
            if e.code == 304 and cached is not None:
                e.read()
                return cached[1], cached[2], cached[3]
            if e.code == 308 and method == "GET" and _redirects < 5:
                # canonical-URL redirect (PermanentRedirectResponse.cs).
                # Python 3.11+ urllib follows 308 natively, so this
                # branch only runs on older runtimes; depth-capped like
                # urllib's own redirect handler.
                e.read()
                loc = e.headers.get("Location", "")
                if loc and loc != path:
                    return self._request(method, loc, body, headers,
                                         _redirects + 1)
            raw = e.read()
            payload = json.loads(raw) if raw else {}
            if e.code == 409:
                raise WrongExpectedVersionError(
                    payload.get("streamId", ""), payload.get("expectedVersion", -2),
                    payload.get("message"),
                ) from None
            if e.code == 400:
                err = payload.get("error", "")
                msg = payload.get("message", "")
                if err == "InvalidStreamIdError":
                    raise InvalidStreamIdError(msg) from None
                raise ValueError(msg) from None
            if e.code == 404:
                return 404, dict(e.headers), payload
            raise

    def _maybe_cache(self, method: str, path: str, status: int, hdrs: dict, body) -> None:
        if method != "GET" or status != 200:
            return
        etag = hdrs.get("ETag")
        if etag is None:
            return
        if isinstance(body, dict) and "metadataStreamVersion" not in body:
            embedded = (body.get("_embedded") or {}).get("streamStore:message")
            if embedded != []:
                return  # content-bearing page: expiry could change it
        if len(self._etag_cache) >= self._etag_cache_max:
            self._etag_cache.pop(next(iter(self._etag_cache)))
        self._etag_cache[path] = (etag, status, hdrs, body)

    @staticmethod
    def _sid(stream_id: str) -> str:
        return quote(stream_id, safe="")

    def _message(self, d: dict) -> StreamMessage:
        stream_id, message_id = d["streamId"], d["messageId"]

        def lazy() -> str | None:
            _code, _h, body = self._request(
                "GET",
                f"/streams/{self._sid(stream_id)}/messages/{message_id}/data",
            )
            return (body or {}).get("jsonData")

        return StreamMessage(
            stream_id=stream_id,
            message_id=message_id,
            stream_version=d["streamVersion"],
            position=d["position"],
            created_utc=_dt.datetime.fromisoformat(d["createdUtc"]),
            type=d["type"],
            json_metadata=d["jsonMetadata"],
            json_data=d["jsonData"],
            _get_json_data=lazy if d["jsonData"] is None else None,
        )

    # ----------------------------------------------------------------- reads

    def read_head_position(self) -> int:
        req = urllib.request.Request(self.base_url + "/stream", method="HEAD")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return int(resp.headers[HEAD_POSITION_HEADER])

    def read_stream_head_position(self, stream_id: str) -> int:
        page = self.read_stream_backwards(stream_id, -1, 1)
        return page.last_stream_position

    def read_stream_head_version(self, stream_id: str) -> int:
        page = self.read_stream_backwards(stream_id, -1, 1)
        return page.last_stream_version

    @staticmethod
    def _feed_query(forwards: bool, pos: int, max_count: int, prefetch: bool) -> str:
        """The canonical query serialization — the SERVER's own
        serializer, imported, so client and server cannot drift (a
        mismatch would silently add a 308 round trip to every read)."""
        return _canonical_query(forwards, pos, max_count, prefetch)

    def _read_all(self, forwards: bool, position: int, max_count: int, prefetch: bool) -> ReadAllPage:
        _code, _h, b = self._request(
            "GET",
            f"/stream?{self._feed_query(forwards, position, max_count, prefetch)}",
        )
        page = ReadAllPage(
            from_position=b["fromPosition"],
            next_position=b["nextPosition"],
            is_end=b["isEnd"],
            direction=b["direction"],
            messages=[self._message(m) for m in b["_embedded"]["streamStore:message"]],
        )
        page.read_next = lambda: self._read_all(forwards, page.next_position, max_count, prefetch)
        return page

    def read_all_forwards(
        self, from_position_inclusive: int = 0, max_count: int = 100,
        prefetch_json_data: bool = True,
    ) -> ReadAllPage:
        return self._read_all(True, from_position_inclusive, max_count, prefetch_json_data)

    def read_all_backwards(
        self, from_position_inclusive: int = -1, max_count: int = 100,
        prefetch_json_data: bool = True,
    ) -> ReadAllPage:
        return self._read_all(False, from_position_inclusive, max_count, prefetch_json_data)

    def _read_stream(
        self, stream_id: str, forwards: bool, version: int, max_count: int, prefetch: bool
    ) -> ReadStreamPage:
        _code, _h, b = self._request(
            "GET",
            f"/streams/{self._sid(stream_id)}"
            f"?{self._feed_query(forwards, version, max_count, prefetch)}",
        )
        page = ReadStreamPage(
            stream_id=b["streamId"],
            status=b["status"],
            from_stream_version=b["fromStreamVersion"],
            next_stream_version=b["nextStreamVersion"],
            last_stream_version=b["lastStreamVersion"],
            last_stream_position=b["lastStreamPosition"],
            direction=b["direction"],
            is_end=b["isEnd"],
            messages=[self._message(m) for m in b["_embedded"]["streamStore:message"]],
        )
        page.read_next = lambda: self._read_stream(
            stream_id, forwards, page.next_stream_version, max_count, prefetch
        )
        return page

    def read_stream_forwards(
        self, stream_id: str, from_version_inclusive: int = 0, max_count: int = 100,
        prefetch_json_data: bool = True,
    ) -> ReadStreamPage:
        return self._read_stream(
            stream_id, True, from_version_inclusive, max_count, prefetch_json_data
        )

    def read_stream_backwards(
        self, stream_id: str, from_version_inclusive: int = -1, max_count: int = 100,
        prefetch_json_data: bool = True,
    ) -> ReadStreamPage:
        return self._read_stream(
            stream_id, False, from_version_inclusive, max_count, prefetch_json_data
        )

    def list_streams(
        self, pattern: str | None = None, kind: str = "any",
        max_count: int = 100, continuation: int = -1,
    ) -> tuple[list[str], int]:
        t = {"startswith": "s", "endswith": "e"}.get(kind, "")
        q = f"/streams?t={t}&m={max_count}&c={continuation}"
        if pattern:
            q += f"&p={quote(pattern, safe='')}"
        _code, _h, b = self._request("GET", q)
        return b["streamIds"], b["continuationToken"]

    # ---------------------------------------------------------------- writes

    def append_to_stream(
        self,
        stream_id: str,
        expected_version: int,
        messages: list[NewStreamMessage] | NewStreamMessage,
    ) -> AppendResult:
        if isinstance(messages, NewStreamMessage):
            messages = [messages]
        body = [
            {
                "messageId": m.message_id,
                "type": m.type,
                "jsonData": m.json_data,
                "jsonMetadata": m.json_metadata,
            }
            for m in messages
        ]
        _code, _h, b = self._request(
            "POST", f"/streams/{self._sid(stream_id)}", body,
            {EXPECTED_VERSION_HEADER: str(expected_version)},
        )
        return AppendResult(b["currentVersion"], b["currentPosition"])

    def delete_stream(self, stream_id: str, expected_version: int = -2) -> None:
        self._request(
            "DELETE", f"/streams/{self._sid(stream_id)}", None,
            {EXPECTED_VERSION_HEADER: str(expected_version)},
        )

    def read_message_by_id(self, stream_id: str, message_id: str):
        """Point lookup of one message by id via the single-message
        resource (server answers misses from the stored-id index
        without paging). Returns None on 404."""
        code, _h, body = self._request(
            "GET", f"/streams/{self._sid(stream_id)}/{message_id}"
        )
        if code != 200:
            return None
        return self._message(body)

    def delete_message(self, stream_id: str, message_id: str) -> None:
        self._request(
            "DELETE", f"/streams/{self._sid(stream_id)}/messages/{message_id}"
        )

    # -------------------------------------------------------------- metadata

    def get_stream_metadata(self, stream_id: str) -> StreamMetadataResult:
        _code, _h, b = self._request("GET", f"/streams/{self._sid(stream_id)}/metadata")
        return StreamMetadataResult(
            stream_id=b["streamId"],
            metadata_stream_version=b["metadataStreamVersion"],
            max_age=b["maxAge"],
            max_count=b["maxCount"],
            metadata_json=b["metadataJson"],
        )

    def set_stream_metadata(
        self,
        stream_id: str,
        expected_stream_metadata_version: int = -2,
        max_age: int | None = None,
        max_count: int | None = None,
        metadata_json: str | None = None,
    ) -> SetStreamMetadataResult:
        _code, _h, b = self._request(
            "POST", f"/streams/{self._sid(stream_id)}/metadata",
            {
                "expectedStreamMetadataVersion": expected_stream_metadata_version,
                "maxAge": max_age,
                "maxCount": max_count,
                "metadataJson": metadata_json,
            },
        )
        return SetStreamMetadataResult(b["currentVersion"])
