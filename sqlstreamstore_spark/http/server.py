"""HTTP/HAL server exposing any StreamStore backend over HTTP — the
engine's port of the reference's HAL hypermedia server
(src/SqlStreamStore.HAL/; path/relation constants
src/SqlStreamStore.Http.Common/Constants.cs:44-80). stdlib-only
(http.server), threaded, JSON bodies with HAL ``_links``/``_embedded``
envelopes on the read feeds.

Routes and query grammar mirror Constants.Paths +
Http.Common/LinkFormatter.cs exactly (``stream`` is the $all feed,
``streams/{id}`` a single stream; read params ``d`` direction,
``p`` position/version, ``m`` max count, ``e=1`` embed/prefetch;
list params ``p`` pattern, ``t`` s|e pattern type, ``m``, ``c``
continuation):

  GET    /                                   index (HAL links)
  GET    /stream?d=f|b&p=&m=[&e=1]           ReadAll page
  GET    /stream/{position}                  single $all message by exact
                                             position (404 when absent)
  HEAD   /stream                             head position header
  GET    /streams/{id}?d=f|b&p=&m=[&e=1]     ReadStream page
  POST   /streams/{id}      body=[messages]  AppendToStream
                            header SSS-ExpectedVersion
  DELETE /streams/{id}                       DeleteStream
                            header SSS-ExpectedVersion
  GET    /streams/{id}/{version}             single message by stream
                                             version (-1 -> 307 redirect
                                             to the head version; hits
                                             carry the version ETag +
                                             one-year Cache-Control)
  DELETE /streams/{id}/{version}             delete that version's message
  GET    /streams/{id}/messages/{mid}/data   lazy json_data point read
  DELETE /streams/{id}/messages/{mid}        DeleteMessage
  GET    /streams/{id}/metadata              GetStreamMetadata
  POST   /streams/{id}/metadata              SetStreamMetadata
  GET    /streams?p=&t=&m=&c=                ListStreams
  GET    /docs/{rel}                         write-relation docs — markdown,
                                             or the rel's draft-07 JSON
                                             schema under Accept:
                                             application/schema+json

HEAD mirrors every GET route's headers with no body; wrong verbs get
405 with the route's own Allow set; a non-matching Accept header gets
406 (HAL routes speak application/hal+json, docs negotiate
text/markdown | application/schema+json); feed pages carry the
reference's first/last/previous/next navigation links.

Canonical URLs (AllStream/ReadAllStreamOperation.cs:47-59,
AllStreamResource.cs:29-31, CanonicalUrlTests.cs): a feed GET whose
query string is not the canonical serialization ``d=&p=&m=[&e=1]`` —
wrong parameter order, defaulted/omitted values, unknown params —
receives ``308 Permanent Redirect`` to the canonical form, so every
page has exactly one cacheable URL. Parameter defaulting follows the
reference bit-for-bit: d other than f/F ⇒ backwards (absent too),
bad/absent p ⇒ start (forwards) / end (backwards), p < −1 clamps to
−1, bad/absent/non-positive m ⇒ 20, prefetch only when e=1.

Error contract: 400 invalid ids/args, 404 unknown route, 409
WrongExpectedVersion (body carries streamId/expectedVersion so the
client can re-raise faithfully) — the same status mapping the
reference's HAL middleware uses.

Conditional requests (reference: SqlStreamStore.HAL/ETag.cs,
PageExtensions.cs, HttpContextExtensions.cs:23-56, CacheControl.cs):
feed pages that include the head (IsEnd, or backwards-from-end) carry
``ETag: "<position|version>"`` plus ``Cache-Control: max-age=0,
no-cache, must-revalidate``; interior (immutable) all-feed pages carry
``Cache-Control: max-age=31536000``; stream metadata carries an ETag
from its metadata stream version. A request whose ``If-None-Match``
equals the response's ETag short-circuits to ``304 Not Modified`` with
headers only — what makes polling a HAL feed cheap.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from sqlstreamstore_spark.exceptions import (
    InvalidStreamIdError,
    WrongExpectedVersionError,
)
from sqlstreamstore_spark.store.base import StreamStore
from sqlstreamstore_spark.store.messages import NewStreamMessage

HAL_CONTENT_TYPE = "application/hal+json"
EXPECTED_VERSION_HEADER = "SSS-ExpectedVersion"
HEAD_POSITION_HEADER = "SSS-HeadPosition"

# CacheControl.cs:12-17
CACHE_CONTROL_NO_CACHE = "max-age=0, no-cache, must-revalidate"
CACHE_CONTROL_ONE_YEAR = "max-age=31536000"


def _etag(value: int) -> str:
    """ETags are the position/version in double quotes (ETag.cs:11-12)."""
    return f'"{value}"'


def _read_params(q: dict) -> tuple[bool, int, int, bool]:
    """Reference feed-param semantics (ReadAllStreamOperation.cs:19-45 /
    ReadStreamOperation.cs): returns (forwards, pos, max_count,
    prefetch)."""
    forwards = q.get("d") in ("f", "F")
    try:
        pos = int(q["p"])
        if pos < -1:
            pos = -1
    except (KeyError, ValueError):
        pos = 0 if forwards else -1
    try:
        m = int(q["m"])
        if m <= 0:
            m = 20
    except (KeyError, ValueError):
        m = 20
    return forwards, pos, m, q.get("e") == "1"


def _canonical_query(forwards: bool, pos: int, m: int, prefetch: bool) -> str:
    """LinkFormatter.GetStreamQueryString: d, p, m in that order; e=1
    appended only when prefetching."""
    base = f"d={'f' if forwards else 'b'}&p={pos}&m={m}"
    return base + ("&e=1" if prefetch else "")


class _BadRequest(Exception):
    """Raised only by request-parsing code — maps to HTTP 400."""


# /docs/{rel} markdown (reference: HAL Docs middleware + the rel set
# asserted by DocumentationTests.cs). Our own text, describing THIS
# server's wire contract.
DOCS: dict[str, str] = {
    "append": (
        "# append\n\n"
        "`POST /streams/{streamId}` with a JSON array of messages\n"
        "(`messageId`, `type`, `jsonData`, optional `jsonMetadata`) and\n"
        "an optional `SSS-ExpectedVersion` header (`-1` empty, `-2` any,\n"
        "`-3` no stream, `n>=0` exact head). Returns `currentVersion` /\n"
        "`currentPosition`; `409` with the stream id and expected\n"
        "version on an optimistic-concurrency conflict. Repeating a\n"
        "previously appended id sequence is an idempotent no-op.\n"
    ),
    "delete-stream": (
        "# delete-stream\n\n"
        "`DELETE /streams/{streamId}` with an optional\n"
        "`SSS-ExpectedVersion` header. Removes the stream and its `$$`\n"
        "metadata stream, appends a `$stream-deleted` tombstone to\n"
        "`$deleted` (unless deletion tracking is disabled), and returns\n"
        "`204`. A concrete expected version that does not match the\n"
        "head — including deleting an absent stream — yields `409`.\n"
    ),
    "delete-message": (
        "# delete-message\n\n"
        "`DELETE /streams/{streamId}/messages/{messageId}` removes one\n"
        "message and appends a `$message-deleted` tombstone to\n"
        "`$deleted`. Remaining stream versions are NOT renumbered; a\n"
        "later append continues from the old head. Returns `204`.\n"
    ),
    "metadata": (
        "# metadata\n\n"
        "`GET /streams/{streamId}/metadata` returns `maxAge` (seconds),\n"
        "`maxCount`, `metadataJson`, and `metadataStreamVersion` (also\n"
        "the response ETag). `POST` the same fields with\n"
        "`expectedStreamMetadataVersion` to update; setting metadata is\n"
        "idempotent per (stream, version, body) via deterministic\n"
        "message ids. Retention applies lazily on read and via\n"
        "scavenge on write.\n"
    ),
    "find": (
        "# find\n\n"
        "`GET /streams/{streamId}` reads a stream's feed page. Query:\n"
        "`d` (f|b), `p` (version), `m` (page size), `e=1` (prefetch\n"
        "json_data inline).\n"
    ),
    "feed-browser": (
        "# feed-browser\n\n"
        "`GET /streams?p=&t=&m=&c=` lists stream ids: `p` pattern, `t`\n"
        "pattern type (`s` startsWith, `e` endsWith, absent = any), `m`\n"
        "max results, `c` continuation token from the previous page.\n"
    ),
}

# JSON hyper-schemas for the write/browse relations (reference:
# SqlStreamStore.HAL/SchemaSet.cs:1-40 serves embedded
# `Schema.{rel}.schema.json` resources under Accept:
# application/schema+json, markdown otherwise
# [s_mediaTypeToExtension]; tests/SqlStreamStore.HAL.Tests/
# AllJsonSchemasTests.cs pins draft-07 + BOM-free). These describe
# THIS server's wire contract — draft-07, additionalProperties:false,
# the same six rels the reference embeds.
SCHEMA_MEDIA_TYPE = "application/schema+json"

_UUID_PATTERN = (
    "^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-"
    "[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}$"
)

SCHEMAS: dict[str, dict] = {
    "append": {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "Append to Stream",
        "type": "array",
        "items": {
            "type": "object",
            "required": ["messageId", "type", "jsonData"],
            "properties": {
                "messageId": {"type": "string", "pattern": _UUID_PATTERN},
                "type": {"type": "string"},
                "jsonData": {"type": "string"},
                "jsonMetadata": {"type": "string"},
            },
            "additionalProperties": False,
        },
    },
    "delete-stream": {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "Delete Stream",
        "type": "object",
        "additionalProperties": False,
    },
    "delete-message": {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "Delete Stream Message",
        "type": "object",
        "additionalProperties": False,
    },
    "metadata": {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "Set Stream Metadata",
        "type": "object",
        "properties": {
            "maxAge": {"type": "integer", "minimum": 1},
            "maxCount": {"type": "integer", "minimum": 1},
            "metadataJson": {"type": "string"},
            "expectedStreamMetadataVersion": {"type": "integer", "minimum": -2},
        },
        "additionalProperties": False,
    },
    "find": {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "Find a Stream",
        "type": "object",
        "required": ["streamId"],
        "properties": {
            "streamId": {"type": "string", "description": "The stream's id."},
        },
        "additionalProperties": False,
    },
    "feed-browser": {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "Browse Streams",
        "type": "object",
        "properties": {
            "p": {"type": "string", "description": "The pattern to search for."},
            "t": {
                "type": "string",
                "enum": ["s", "e"],
                "description": "Pattern type: s (startsWith) or e (endsWith).",
            },
            "m": {"type": "integer", "minimum": 1, "maximum": 100},
            "c": {"type": "string", "description": "Continuation token."},
        },
        "additionalProperties": False,
    },
}


def _msg_json(m) -> dict:
    return {
        "messageId": m.message_id,
        "streamId": m.stream_id,
        "streamVersion": m.stream_version,
        "position": m.position,
        "createdUtc": m.created_utc.isoformat(),
        "type": m.type,
        "jsonData": m.json_data,
        "jsonMetadata": m.json_metadata,
    }


class StreamStoreHttpServer:
    """Serve ``store`` over HTTP on a background thread. Port 0 picks an
    ephemeral port; read it back from ``server.url`` after ``start()``."""

    def __init__(self, store: StreamStore, host: str = "127.0.0.1", port: int = 0):
        self.store = store
        handler = _make_handler(store)
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "StreamStoreHttpServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


def _make_handler(store: StreamStore):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        # ------------------------------------------------------- plumbing

        def log_message(self, fmt, *args):  # quiet test output
            pass

        def _send(self, code: int, body: dict | list | None = None, headers: dict | None = None):
            payload = b"" if body is None else json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", HAL_CONTENT_TYPE)
            self.send_header("Content-Length", str(len(payload)))
            # CORS on every response (AllowedMethodsMiddleware.cs:37:
            # the reference appends Allow-Origin * so browser HAL
            # clients can consume the feeds)
            self.send_header("Access-Control-Allow-Origin", "*")
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            # HEAD = the GET response's headers (incl. Content-Length of
            # the entity it would carry) with no body — every GET route
            # gets HEAD for free, as in the reference's resource set
            # (ClientErrorTests.cs s_ResourceConfigurations)
            if payload and self.command != "HEAD":
                self.wfile.write(payload)

        def _send_cached(self, code: int, body, headers: dict | None):
            """Send, honoring ``If-None-Match`` when the response carries
            an ETag (HttpContextExtensions.cs:27-56): on match, a 304
            with the cacheable headers and no body."""
            etag = (headers or {}).get("ETag")
            inm = self.headers.get("If-None-Match")
            if etag is not None and inm is not None and etag in (
                c.strip() for c in inm.split(",")
            ):
                self._send(304, None, headers)
                return
            self._send(code, body, headers)

        def _parse(self, fn):
            """Run a request-parsing thunk; failures there are the
            client's fault (malformed body/params) — anything that
            escapes a handler *outside* _parse is a server fault and
            falls through _guard to 500."""
            try:
                return fn()
            except (ValueError, KeyError, TypeError, AttributeError) as e:
                raise _BadRequest(f"{type(e).__name__}: {e}") from e

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                return json.loads(self.rfile.read(n)) if n else None
            except (ValueError, TypeError) as e:
                raise _BadRequest(f"invalid JSON body: {e}") from e

        def _expected_version(self, default: int) -> int:
            raw = self.headers.get(EXPECTED_VERSION_HEADER)
            if raw is None:
                return default
            return self._parse(lambda: int(raw))

        def _route(self):
            u = urlparse(self.path)
            parts = [unquote(p) for p in u.path.split("/") if p != ""]
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            return parts, q

        def _acceptable(self, *types: str) -> bool:
            """AcceptMiddleware.cs parity: the request's Accept values
            (params stripped) must include */* or one of the route's
            media types; an absent header accepts anything."""
            raw = self.headers.get("Accept")
            if raw is None:
                return True
            vals = {v.split(";")[0].strip() for v in raw.split(",")}
            return bool(vals & ({"*/*"} | set(types)))

        def _not_acceptable(self, *types: str) -> None:
            self._send(406, {
                "type": "Not Acceptable",
                "title": "Not Acceptable",
                "detail": "The target resource only understands "
                          + ", ".join(types) + ".",
            })

        def _guard(self, fn):
            try:
                fn()
            except WrongExpectedVersionError as e:
                self._send(409, {
                    "error": "WrongExpectedVersion",
                    "streamId": e.stream_id,
                    "expectedVersion": e.expected_version,
                    "message": str(e),
                })
            except _BadRequest as e:
                # malformed body/params (missing keys, wrong shapes) are
                # client errors — never drop the connection
                self._send(400, {"error": "BadRequest", "message": str(e)})
            except (InvalidStreamIdError, ValueError) as e:
                # store-level argument validation (bad stream id, bad
                # bounds) — still the client's fault
                self._send(400, {"error": type(e).__name__, "message": str(e)})
            except Exception as e:  # noqa: BLE001 — last-resort 500 with a body
                # KeyError/TypeError/AttributeError out of the store
                # layer are genuine server bugs, not client errors
                self._send(500, {"error": type(e).__name__, "message": str(e)})

        # --------------------------------------------------------- routes

        def _allowed_for(self, parts) -> tuple[str, ...] | None:
            """Per-route method sets (ClientErrorTests.cs
            s_ResourceConfigurations); None = unknown route (404)."""
            def _is_int(x: str) -> bool:
                return x.lstrip("-").isdigit()

            def _is_guid(x: str) -> bool:
                import uuid as _u

                try:
                    _u.UUID(x)
                    return True
                except ValueError:
                    return False

            if parts == [] or parts == ["stream"] or parts == ["streams"]:
                return ("GET", "HEAD")
            if len(parts) == 2 and parts[0] == "stream" and _is_int(parts[1]):
                # single all-stream message by position
                # (AllStreamMessageMiddleware; OptionsTests "/stream/123")
                return ("GET", "HEAD")
            if len(parts) == 2 and parts[0] == "docs":
                return ("GET", "HEAD")
            if parts[0] == "streams":
                if len(parts) == 2:
                    return ("GET", "HEAD", "POST", "DELETE")
                if len(parts) == 3 and parts[2] == "metadata":
                    return ("GET", "HEAD", "POST")
                if len(parts) == 3 and _is_int(parts[2]):
                    # single message by stream version
                    # (StreamMessageByVersionMiddleware: GET + DELETE)
                    return ("GET", "HEAD", "DELETE")
                if len(parts) == 3 and _is_guid(parts[2]):
                    # single message by MESSAGE ID — the reference's
                    # canonical delete-message path
                    # (StreamMessageByMessageIdMiddleware; OptionsTests
                    # "/streams/a-stream/{guid}" → GET/HEAD/DELETE)
                    return ("GET", "HEAD", "DELETE")
                if len(parts) >= 4 and parts[2] == "messages":
                    return ("GET", "HEAD", "DELETE")
            return None

        def _method_ok(self, method: str) -> bool:
            parts, _q = self._route()
            allowed = self._allowed_for(parts)
            if allowed is None:
                self._send(404)
                return False
            if method not in allowed:
                # 405 + the route's own Allow set (stdlib default would
                # be 501; the reference appends OPTIONS everywhere)
                self._send(405, {"error": "MethodNotAllowed"},
                           {"Allow": ", ".join(allowed + ("OPTIONS",))})
                return False
            return True

        def do_GET(self):
            if self._method_ok("GET"):
                self._guard(self._get)

        def do_HEAD(self):
            parts, _q = self._route()
            if parts == ["stream"] and not urlparse(self.path).query:
                # bare HEAD /stream: the cheap head-position probe the
                # client's read_head_position uses (no page read)
                head = store.read_head_position()
                self._send(200, None, {HEAD_POSITION_HEADER: str(head)})
                return
            if self._method_ok("HEAD"):
                self._guard(self._get)

        def do_PUT(self):
            self._method_ok("PUT")

        def do_PATCH(self):
            self._method_ok("PATCH")

        def do_OPTIONS(self):
            # CORS preflight (AllowedMethodsMiddleware.cs Options +
            # OptionsTests.cs): the ROUTE's method set, not a global one
            parts, _q = self._route()
            allowed = self._allowed_for(parts)
            methods = (allowed + ("OPTIONS",)) if allowed else (
                "GET", "HEAD", "OPTIONS", "POST", "DELETE")
            self.send_response(204)
            self.send_header("Access-Control-Allow-Methods", ", ".join(methods))
            self.send_header("Access-Control-Allow-Headers",
                             "Content-Type, X-Requested-With, Authorization, "
                             + EXPECTED_VERSION_HEADER + ", If-None-Match")
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_POST(self):
            if self._method_ok("POST"):
                self._guard(self._post)

        def do_DELETE(self):
            if self._method_ok("DELETE"):
                self._guard(self._delete)

        def _get(self):
            parts, q = self._route()
            is_docs = len(parts) == 2 and parts[0] == "docs"
            if is_docs:
                # the docs resource negotiates two representations
                # (SchemaSet.cs s_mediaTypeToExtension: schema+json →
                # .json, markdown/any → .md)
                if not self._acceptable("text/markdown", SCHEMA_MEDIA_TYPE):
                    self._not_acceptable("text/markdown", SCHEMA_MEDIA_TYPE)
                    return
            elif not self._acceptable(HAL_CONTENT_TYPE):
                self._not_acceptable(HAL_CONTENT_TYPE)
                return
            if parts == []:
                self._send(200, {
                    "_links": {
                        "self": {"href": "/"},
                        "streamStore:feed": {"href": "/stream"},
                        "streamStore:find": {"href": "/streams/{streamId}", "templated": True},
                        "streamStore:feed-browser": {"href": "/streams"},
                        "streamStore:docs": {"href": "/docs/{rel}", "templated": True},
                    }
                })
            elif len(parts) == 2 and parts[0] == "docs":
                # schema+json explicitly requested wins; markdown (or
                # wildcard/absent Accept) gets the markdown — mirroring
                # the reference's quality-ordered mediaType→extension map
                raw = self.headers.get("Accept") or ""
                vals = {v.split(";")[0].strip() for v in raw.split(",") if v.strip()}
                if SCHEMA_MEDIA_TYPE in vals:
                    schema = SCHEMAS.get(parts[1])
                    if schema is None:
                        self._send(404)
                        return
                    payload = json.dumps(schema, indent=2).encode()
                    ctype = SCHEMA_MEDIA_TYPE + "; charset=utf-8"
                else:
                    doc = DOCS.get(parts[1])
                    if doc is None:
                        self._send(404)
                        return
                    payload = doc.encode()
                    ctype = "text/markdown; charset=utf-8"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload)))
                self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                if self.command != "HEAD":
                    self.wfile.write(payload)
            elif parts == ["stream"]:
                self._read_all(q)
            elif len(parts) == 2 and parts[0] == "stream":
                # single all-stream message by EXACT position
                # (ReadAllStreamMessageOperation.cs: ReadAllForwards(pos,
                # 1, prefetch) filtered to Position == pos; absent -> 404)
                pos = self._parse(lambda: int(parts[1]))
                page = store.read_all_forwards(pos, 1, prefetch_json_data=True)
                hit = [m for m in page.messages if m.position == pos]
                if not hit:
                    self._send(404, {"_links": {"self": {"href": self.path}}})
                else:
                    self._send(200, _msg_json(hit[0]))
            elif parts == ["streams"]:
                # LinkFormatter.ListStreams: p=pattern, t=s|e, m, c
                ids, token = store.list_streams(
                    pattern=q.get("p") or None,
                    kind={"s": "startswith", "e": "endswith"}.get(
                        q.get("t", ""), "any"
                    ),
                    max_count=self._parse(lambda: int(q.get("m", 100))),
                    continuation=self._parse(lambda: int(q.get("c", -1))),
                )
                self._send(200, {"streamIds": ids, "continuationToken": token,
                                 "_links": {"self": {"href": self.path}}})
            elif len(parts) == 2 and parts[0] == "streams":
                self._read_stream(parts[1], q)
            elif len(parts) == 3 and parts[0] == "streams" and parts[2] == "metadata":
                m = store.get_stream_metadata(parts[1])
                # StreamMetadataResource.cs:54 — ETag from the metadata
                # stream's version.
                self._send_cached(200, {
                    "streamId": m.stream_id,
                    "metadataStreamVersion": m.metadata_stream_version,
                    "maxAge": m.max_age,
                    "maxCount": m.max_count,
                    "metadataJson": m.metadata_json,
                }, {"ETag": _etag(m.metadata_stream_version)})
            elif (len(parts) == 3 and parts[0] == "streams"
                  and parts[2] != "metadata" and not parts[2].lstrip("-").isdigit()):
                # single message by MESSAGE ID (guid segment): store
                # point lookup — a miss is answered from the stored-id
                # index without paging the stream (advisor r4)
                mid = parts[2]
                found = store.read_message_by_id(parts[1], mid)
                if found is None:
                    self._send(404, {"streamId": parts[1], "messageId": mid})
                else:
                    self._send_cached(200, _msg_json(found), {
                        "ETag": _etag(found.stream_version),
                        "Cache-Control": CACHE_CONTROL_ONE_YEAR,
                    })
            elif len(parts) == 3 and parts[0] == "streams" and parts[2] != "metadata":
                # single message by stream version
                # (StreamMessageResource.cs Get: version -1 resolves to a
                # 307 redirect at the head version; hits carry the
                # version ETag + one-year Cache-Control — messages are
                # immutable; misses 404 WITH a {streamId, streamVersion}
                # body)
                version = self._parse(lambda: int(parts[2]))
                if version == -1:
                    head = store.read_stream_head_version(parts[1])
                    if head < 0:
                        self._send(404, {"streamId": parts[1], "streamVersion": -1})
                    else:
                        self._send(307, None, {
                            "Location": f"/streams/{parts[1]}/{head}"})
                    return
                page = store.read_stream_forwards(parts[1], version, 1, prefetch_json_data=True)
                hit = [m for m in page.messages if m.stream_version == version]
                if page.status == "StreamNotFound" or not hit:
                    self._send(404, {"streamId": parts[1], "streamVersion": version})
                else:
                    self._send_cached(200, _msg_json(hit[0]), {
                        "ETag": _etag(version),
                        "Cache-Control": CACHE_CONTROL_ONE_YEAR,
                    })
            elif (len(parts) == 5 and parts[0] == "streams" and parts[2] == "messages"
                  and parts[4] == "data"):
                data = store._point_json_data(parts[1], parts[3])
                self._send(200, {"jsonData": data})
            else:
                self._send(404)

        def _nav_links(
            self, prefix: str, m: int, prefetch: bool,
            keys: list[int], is_end: bool, metadata: bool = False,
        ) -> dict:
            """HAL feed navigation (AllStreamLinkExtensions.cs /
            StreamsLinkExtensions.cs): first/last always; previous/next
            by the page's min/max key, guarded exactly as the reference
            guards them (present only on non-end pages that aren't the
            first/last themselves)."""
            e = "&e=1" if prefetch else ""
            first = f"{prefix}?d=f&p=0&m={m}{e}"
            last = f"{prefix}?d=b&p=-1&m={m}{e}"
            links: dict = {"first": {"href": first}}
            if self.path != first and not is_end and keys:
                links["previous"] = {
                    "href": f"{prefix}?d=b&p={min(keys) - 1}&m={m}{e}"
                }
            links["self"] = {"href": self.path}
            links["streamStore:feed"] = {"href": self.path}
            if self.path != last and not is_end and keys:
                links["next"] = {
                    "href": f"{prefix}?d=f&p={max(keys) + 1}&m={m}{e}"
                }
            links["last"] = {"href": last}
            if metadata:
                links["streamStore:metadata"] = {"href": f"{prefix}/metadata"}
            return links

        def _canonical_redirect(self, q, path_prefix: str) -> tuple | None:
            """308 to the canonical URL when the raw query string is not
            the canonical serialization (AllStreamResource.cs:29-31);
            returns the parsed params when already canonical."""
            forwards, pos, m, prefetch = _read_params(q)
            canon = _canonical_query(forwards, pos, m, prefetch)
            if urlparse(self.path).query != canon:
                self._send(308, None, {"Location": f"{path_prefix}?{canon}"})
                return None
            return forwards, pos, m, prefetch

        def _read_all(self, q):
            params = self._canonical_redirect(q, "/stream")
            if params is None:
                return
            forwards, pos, m, prefetch = params
            page = (
                store.read_all_forwards(pos, m, prefetch)
                if forwards
                else store.read_all_backwards(pos, m, prefetch)
            )
            # PageExtensions.cs TryGetETag(ReadAllPage): pages touching
            # the head get a position ETag + no-cache; interior pages are
            # immutable and cacheable for a year.
            msgs = page.messages
            tag: int | None = None
            if not forwards and pos == -1:
                tag = msgs[0].position if msgs else -1
            elif page.is_end:
                tag = (msgs[-1].position if forwards else msgs[0].position) if msgs else -1
            headers = (
                {"ETag": _etag(tag), "Cache-Control": CACHE_CONTROL_NO_CACHE}
                if tag is not None
                else {"Cache-Control": CACHE_CONTROL_ONE_YEAR}
            )
            if not forwards and pos == -1:
                # AllStreamResource.cs:76-83: from-end reads expose the
                # head position as a header so pollers can track the log
                # head without parsing the body
                headers[HEAD_POSITION_HEADER] = str(
                    msgs[0].position if msgs else -1
                )
            self._send_cached(200, {
                "fromPosition": page.from_position,
                "nextPosition": page.next_position,
                "isEnd": page.is_end,
                "direction": page.direction,
                "_embedded": {"streamStore:message": [_msg_json(x) for x in page.messages]},
                "_links": self._nav_links(
                    "/stream", m, prefetch,
                    [x.position for x in msgs], page.is_end,
                ),
            }, headers)

        def _read_stream(self, stream_id, q):
            params = self._canonical_redirect(
                q, urlparse(self.path).path
            )
            if params is None:
                return
            forwards, pos, m, prefetch = params
            page = (
                store.read_stream_forwards(stream_id, pos, m, prefetch)
                if forwards
                else store.read_stream_backwards(stream_id, pos, m, prefetch)
            )
            code = 404 if page.status == "StreamNotFound" else 200
            # PageExtensions.cs TryGetETag(ReadStreamPage): head pages
            # (IsEnd or backwards-from-end) are tagged with the stream's
            # last version.
            headers = (
                {"ETag": _etag(page.last_stream_version)}
                if page.is_end or (not forwards and pos == -1)
                else None
            )
            self._send_cached(code, {
                "streamId": page.stream_id,
                "status": page.status,
                "fromStreamVersion": page.from_stream_version,
                "nextStreamVersion": page.next_stream_version,
                "lastStreamVersion": page.last_stream_version,
                "lastStreamPosition": page.last_stream_position,
                "direction": page.direction,
                "isEnd": page.is_end,
                "_embedded": {"streamStore:message": [_msg_json(x) for x in page.messages]},
                "_links": self._nav_links(
                    urlparse(self.path).path, m, prefetch,
                    [x.stream_version for x in page.messages], page.is_end,
                    metadata=True,
                ),
            }, headers)

        def _post(self):
            parts, _q = self._route()
            if not self._acceptable(HAL_CONTENT_TYPE):
                self._not_acceptable(HAL_CONTENT_TYPE)
                return
            if len(parts) == 2 and parts[0] == "streams":
                body = self._body() or []
                messages = self._parse(lambda: [
                    NewStreamMessage(
                        b["messageId"], b["type"], b["jsonData"],
                        b.get("jsonMetadata") or "",
                    )
                    for b in body
                ])
                r = store.append_to_stream(parts[1], self._expected_version(-2), messages)
                self._send(200, {
                    "currentVersion": r.current_version,
                    "currentPosition": r.current_position,
                })
            elif len(parts) == 3 and parts[0] == "streams" and parts[2] == "metadata":
                b = self._body() or {}
                kwargs = self._parse(lambda: {
                    "expected_stream_metadata_version":
                        b.get("expectedStreamMetadataVersion", -2),
                    "max_age": b.get("maxAge"),
                    "max_count": b.get("maxCount"),
                    "metadata_json": b.get("metadataJson"),
                })
                r = store.set_stream_metadata(parts[1], **kwargs)
                self._send(200, {"currentVersion": r.current_version})
            else:
                self._send(404)

        def _delete(self):
            parts, _q = self._route()
            if len(parts) == 2 and parts[0] == "streams":
                store.delete_stream(parts[1], self._expected_version(-2))
                self._send(204)
            elif len(parts) == 4 and parts[0] == "streams" and parts[2] == "messages":
                store.delete_message(parts[1], parts[3])
                self._send(204)
            elif (len(parts) == 3 and parts[0] == "streams"
                  and not parts[2].lstrip("-").isdigit()):
                # delete by MESSAGE ID on the reference's canonical path
                store.delete_message(parts[1], parts[2])
                self._send(204)
            elif len(parts) == 3 and parts[0] == "streams":
                # delete by stream VERSION: resolve to the message id,
                # then the ordinary delete; absent message is a no-op 204
                # (DeleteStreamMessageByVersionOperation.cs)
                version = self._parse(lambda: int(parts[2]))
                page = store.read_stream_forwards(parts[1], version, 1)
                hit = [m for m in page.messages if m.stream_version == version]
                if hit:
                    store.delete_message(parts[1], hit[0].message_id)
                self._send(204)
            else:
                self._send(404)

    return Handler
