"""HTTP layer: the HAL server over the in-memory backend driven through
HttpClientStreamStore — the same differential technique as the
reference's HttpClientStreamStoreAcceptanceTests.cs (HTTP client vs a
HAL server backed by InMemoryStreamStore), condensed: every observable
from the HTTP client must equal the same call made directly."""

import datetime as dt
import uuid

import pytest

from sqlstreamstore_spark.exceptions import WrongExpectedVersionError
from sqlstreamstore_spark.http import HttpClientStreamStore, StreamStoreHttpServer
from sqlstreamstore_spark.schema import ExpectedVersion
from sqlstreamstore_spark.store import InMemoryStreamStore, NewStreamMessage


def msgs(*ns):
    return [NewStreamMessage(str(uuid.UUID(int=n)), f"t{n}", f'{{"n":{n}}}') for n in ns]


class Clock:
    def __init__(self):
        self.now = dt.datetime(2024, 1, 1)

    def __call__(self):
        return self.now


@pytest.fixture
def duo():
    clock = Clock()
    backend = InMemoryStreamStore(get_utc_now=clock)
    server = StreamStoreHttpServer(backend).start()
    try:
        yield backend, HttpClientStreamStore(server.url), clock
    finally:
        server.stop()


def page_obs(p):
    if hasattr(p, "next_position"):
        return (p.from_position, p.next_position, p.is_end,
                [(m.position, m.stream_id, m.stream_version, m.message_id,
                  m.type, m.json_data, m.created_utc) for m in p.messages])
    return (p.status, p.from_stream_version, p.next_stream_version,
            p.last_stream_version, p.last_stream_position, p.is_end,
            [(m.position, m.stream_version, m.message_id, m.json_data)
             for m in p.messages])


def test_http_client_full_scenario_parity(duo):
    backend, client, clock = duo
    # writes go through HTTP; observables compared client vs backend
    client.append_to_stream("orders-1", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    client.append_to_stream("orders-2", ExpectedVersion.NO_STREAM, msgs(4, 5))
    client.append_to_stream("orders-1", 2, msgs(6))
    r = client.append_to_stream("orders-1", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    assert r.current_version == 3  # idempotent repeat
    with pytest.raises(WrongExpectedVersionError):
        client.append_to_stream("orders-1", 0, msgs(9))
    client.set_stream_metadata("orders-2", ExpectedVersion.NO_STREAM, max_count=1)
    client.delete_message("orders-1", str(uuid.UUID(int=2)))

    for fn in [
        lambda s: s.read_head_position(),
        lambda s: s.read_stream_head_version("orders-1"),
        lambda s: s.read_stream_head_position("orders-1"),
        lambda s: page_obs(s.read_all_forwards(0, 100)),
        lambda s: page_obs(s.read_all_backwards(-1, 3)),
        lambda s: page_obs(s.read_stream_forwards("orders-1", 0, 2)),
        lambda s: page_obs(s.read_stream_backwards("orders-1", -1, 2)),
        lambda s: page_obs(s.read_stream_forwards("missing", 0, 10)),
        lambda s: s.list_streams()[0],
        lambda s: (lambda m: (m.max_age, m.max_count, m.metadata_stream_version))(
            s.get_stream_metadata("orders-2")),
    ]:
        assert fn(client) == fn(backend)


def test_http_read_next_walks_keyset_pages(duo):
    _backend, client, _clock = duo
    client.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(*range(1, 26)))
    page = client.read_all_forwards(0, 10)
    seen = [m.position for m in page.messages]
    while not page.is_end:
        page = page.read_next()
        seen.extend(m.position for m in page.messages)
    assert seen == list(range(25))
    spage = client.read_stream_forwards("s", 0, 10)
    versions = [m.stream_version for m in spage.messages]
    while not spage.is_end:
        spage = spage.read_next()
        versions.extend(m.stream_version for m in spage.messages)
    assert versions == list(range(25))


def test_http_prefetch_false_lazy_data_and_deleted_null(duo):
    """ReadAll.cs:88 over the wire: prefetch=false pages carry no body;
    get_json_data() lazily fetches, and returns None after deletion."""
    _backend, client, _clock = duo
    client.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2))
    page = client.read_all_forwards(0, 10, prefetch_json_data=False)
    assert all(m.json_data is None for m in page.messages)
    assert page.messages[0].get_json_data() == '{"n":1}'
    client.delete_stream("s")
    assert page.messages[0].get_json_data() is None


def test_http_delete_stream_expected_version_and_tombstones(duo):
    backend, client, _clock = duo
    client.append_to_stream("a", ExpectedVersion.NO_STREAM, msgs(1, 2))
    with pytest.raises(WrongExpectedVersionError):
        client.delete_stream("a", expected_version=0)
    client.delete_stream("a", expected_version=1)
    assert client.read_stream_forwards("a", 0, 10).status == "StreamNotFound"
    tomb = client.read_stream_forwards("$deleted", 0, 10)
    assert [m.type for m in tomb.messages] == ["$stream-deleted"]
    assert page_obs(tomb) == page_obs(backend.read_stream_forwards("$deleted", 0, 10))


def test_http_url_encodable_stream_ids(duo):
    _backend, client, _clock = duo
    for sid in ("stream/1", "stream%1"):
        client.append_to_stream(sid, ExpectedVersion.NO_STREAM, msgs(1))
        assert client.read_stream_forwards(sid, 0, 1).messages[0].stream_id == sid
        assert client.read_stream_backwards(sid, -1, 1).messages[0].stream_id == sid


def test_http_list_streams_patterns(duo):
    _backend, client, _clock = duo
    for sid in ("app-1", "app-2", "web-1"):
        client.append_to_stream(sid, ExpectedVersion.NO_STREAM, msgs(1))
    ids, _tok = client.list_streams(pattern="app-", kind="startswith")
    assert ids == ["app-1", "app-2"]
    ids, _tok = client.list_streams(pattern="-1", kind="endswith")
    assert ids == ["app-1", "web-1"]


def test_http_max_age_expiry_over_the_wire(duo):
    """StreamLimits.cs max-age over HTTP: expired messages filtered by
    the server's injected clock."""
    _backend, client, clock = duo
    client.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2))
    client.set_stream_metadata("s", max_age=60)
    assert len(client.read_stream_forwards("s", 0, 10).messages) == 2
    clock.now += dt.timedelta(seconds=120)
    assert len(client.read_stream_forwards("s", 0, 10).messages) == 0


def test_http_client_supports_catchup_subscriptions(duo):
    """The reference's HTTP client supports poll-driven subscriptions;
    ours reuses the generic catch-up loop over the HTTP page reads."""
    import threading

    from sqlstreamstore_spark.streaming import subscribe_to_all

    _backend, client, _clock = duo
    client.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
    got, done = [], threading.Event()

    def cb(m):
        got.append(m)
        if len(got) >= 5:
            done.set()

    sub = subscribe_to_all(client, cb, poll_interval=0.05)
    client.append_to_stream("s", ExpectedVersion.ANY, msgs(4, 5))
    assert done.wait(10), f"only {len(got)} delivered"
    sub.dispose()
    assert [m.position for m in got] == [0, 1, 2, 3, 4]


def test_http_concurrent_appends_are_serialized(duo):
    """The threaded HTTP server makes concurrent writers real: parallel
    appends from many client threads must all commit with dense global
    positions and per-stream dense versions (the base-store write lock —
    the reference's in-memory store locks every mutation)."""
    import threading

    _backend, client, _clock = duo
    errors = []

    def writer(t):
        try:
            for b in range(5):
                client.append_to_stream(
                    f"w-{t}", ExpectedVersion.ANY, msgs(*(t * 1000 + b * 10 + i for i in range(3)))
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    page = client.read_all_forwards(0, 1000)
    positions = [m.position for m in page.messages]
    assert positions == list(range(60))  # 4 writers x 5 batches x 3 msgs, dense
    for t in range(4):
        sp = client.read_stream_forwards(f"w-{t}", 0, 100)
        assert [m.stream_version for m in sp.messages] == list(range(15))


def test_http_malformed_requests_get_4xx_not_dropped_connections(duo):
    """Malformed bodies/params are client errors: the server must answer
    400/404 with a JSON body, never crash the handler thread (a KeyError
    used to drop the connection mid-request)."""
    import json
    import urllib.error
    import urllib.request

    _backend, client, _clock = duo

    def req(method, path, data=None, headers=None):
        r = urllib.request.Request(
            client.base_url + path, data=data, method=method,
            headers={"Content-Type": "application/json", **(headers or {})},
        )
        try:
            with urllib.request.urlopen(r, timeout=10) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            e.read()
            return e.code

    assert req("POST", "/streams/s", b"{not json") == 400
    assert req("POST", "/streams/s", json.dumps([{"x": 1}]).encode()) == 400
    assert req("POST", "/streams/s", b"[]", {"SSS-ExpectedVersion": "abc"}) == 400
    assert req("GET", "/nope/deep/path") == 404
    # feed params never 400: the reference defaults anything unparsable
    # (ReadAllStreamOperation.cs int.TryParse fallbacks) and 308s the
    # request onto the canonical URL (urllib follows the redirect)
    assert req("GET", "/stream?position=xx") == 200
    assert req("POST", "/streams/s/metadata", b'"just a string"') == 400
    # the server is still alive and serving after all of that
    client.append_to_stream("alive", ExpectedVersion.NO_STREAM, msgs(1))
    assert client.read_stream_head_version("alive") == 0


def test_http_over_parquet_store_full_stack(spark, tmp_path):
    """Three tiers together: HttpClientStreamStore → HAL server →
    SparkParquetStreamStore. Appends over the wire commit to parquet,
    pages read back, and a catch-up subscription drains via HTTP."""
    import threading

    from sqlstreamstore_spark.store import SparkParquetStreamStore
    from sqlstreamstore_spark.streaming import subscribe_to_all

    backend = SparkParquetStreamStore(spark, str(tmp_path / "pstore"))
    server = StreamStoreHttpServer(backend).start()
    try:
        client = HttpClientStreamStore(server.url)
        client.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3))
        assert client.read_head_position() == 2
        page = client.read_all_forwards(0, 10)
        assert [m.position for m in page.messages] == [0, 1, 2]

        got, done = [], threading.Event()

        def cb(m):
            got.append(m)
            if len(got) >= 5:
                done.set()

        sub = subscribe_to_all(client, cb, poll_interval=0.1)
        client.append_to_stream("s", 2, msgs(4, 5))
        assert done.wait(30), f"only {len(got)} delivered"
        sub.dispose()
        assert [m.position for m in got] == [0, 1, 2, 3, 4]
        # the parquet files on disk hold exactly what went over the wire
        reopened = SparkParquetStreamStore(spark, str(tmp_path / "pstore"))
        assert reopened.read_stream_head_version("s") == 4
    finally:
        server.stop()


# ---------------------------------------------------------------------------
# Conditional requests — ConditionalRequestTests.cs + CacheControl.cs shapes


def _raw_get(base_url, path, headers=None):
    import urllib.error
    import urllib.request

    r = urllib.request.Request(base_url + path, headers=headers or {})
    try:
        with urllib.request.urlopen(r, timeout=10) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


@pytest.mark.parametrize("path_fmt, op", [
    ("/stream",
     lambda c: c.append_to_stream("stream-1", ExpectedVersion.NO_STREAM, msgs(1))),
    ("/streams/stream-1",
     lambda c: c.append_to_stream("stream-1", ExpectedVersion.NO_STREAM, msgs(1))),
    ("/streams/stream-1/metadata",
     lambda c: c.set_stream_metadata("stream-1", ExpectedVersion.NO_STREAM, max_count=1)),
], ids=["all-feed", "stream-feed", "metadata"])
def test_http_if_none_match_yields_304(duo, path_fmt, op):
    """ConditionalRequestTests.cs when_match: an unconditional GET carries
    an ETag; replaying it with If-None-Match returns 304 Not Modified."""
    _backend, client, _clock = duo
    op(client)
    status, headers, _body = _raw_get(client.base_url, path_fmt)
    assert status == 200
    etag = headers.get("ETag")
    assert etag is not None and etag.startswith('"') and etag.endswith('"')
    status2, headers2, body2 = _raw_get(
        client.base_url, path_fmt, {"If-None-Match": etag})
    assert status2 == 304
    assert body2 == b""
    assert headers2.get("ETag") == etag


def test_http_etag_invalidated_by_append(duo):
    """After the head advances, the old ETag no longer matches — the
    conditional GET returns a fresh 200 page with a new ETag."""
    _backend, client, _clock = duo
    client.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1))
    _s, h1, _b = _raw_get(client.base_url, "/stream")
    client.append_to_stream("s", 0, msgs(2))
    status, h2, _b = _raw_get(client.base_url, "/stream",
                              {"If-None-Match": h1["ETag"]})
    assert status == 200
    assert h2["ETag"] != h1["ETag"]


def test_http_cache_control_head_vs_interior_pages(duo):
    """CacheControl.cs: head pages are no-cache/must-revalidate; interior
    (immutable) all-feed pages are cacheable for a year and carry no
    ETag (AllStreamResource.cs:86-94)."""
    _backend, client, _clock = duo
    client.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2, 3, 4, 5))
    # head page (IsEnd)
    _s, head_h, _b = _raw_get(client.base_url, "/stream?d=f&position=0&m=100")
    assert head_h["Cache-Control"] == "max-age=0, no-cache, must-revalidate"
    assert "ETag" in head_h
    # interior page: 2 of 5 messages, not the end
    _s, mid_h, _b = _raw_get(client.base_url, "/stream?d=f&position=0&m=2")
    assert mid_h["Cache-Control"] == "max-age=31536000"
    assert "ETag" not in mid_h


def test_http_store_bugs_are_500_not_400(duo):
    """_guard maps only request-parsing failures to 400; a KeyError (or
    kin) escaping the store layer is a server fault → 500."""
    backend, client, _clock = duo

    def boom(*_a, **_k):
        raise KeyError("store internal bug")

    backend.read_all_forwards = boom
    status, _h, body = _raw_get(client.base_url, "/stream?d=f&p=0&m=20")
    assert status == 500
    assert b"KeyError" in body


def test_http_client_conditional_polling_uses_304(duo):
    """The client's conditional-GET cache: the steady-state head poll
    (an EMPTY page at the feed head — nothing in it can expire) is
    served via 304 with no body over the wire; content-bearing pages
    are deliberately never reused (max-age expiry can change them
    without moving the ETag). After an append the cached ETag stops
    matching and fresh content flows."""
    _backend, client, _clock = duo
    client.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(1, 2))
    p1 = client.read_all_forwards(0, 10)
    assert not client._etag_cache  # content-bearing page: not cached
    head_poll = lambda: client.read_all_forwards(p1.next_position, 10)  # noqa: E731
    e1 = head_poll()
    assert e1.messages == [] and client._etag_cache  # empty page cached
    e2 = head_poll()  # served via 304
    assert page_obs(e1) == page_obs(e2)
    client.append_to_stream("s", 1, msgs(3))
    p3 = head_poll()
    assert [m.position for m in p3.messages] == [2]
    # subscriptions keep working over the conditional path
    import threading

    got, done = [], threading.Event()

    def cb(m):
        got.append(m)
        if len(got) >= 4:
            done.set()

    from sqlstreamstore_spark.streaming import subscribe_to_all

    sub = subscribe_to_all(client, cb, poll_interval=0.05)
    client.append_to_stream("s", 2, msgs(4))
    assert done.wait(15), f"only {len(got)}"
    sub.dispose()
    assert [m.position for m in got] == [0, 1, 2, 3]


def test_http_server_over_jvmfree_parquet_store(tmp_path):
    """The complete no-JVM deployment: HAL server + HTTP client over a
    SparkParquetStreamStore opened with spark=None. Appends (including
    retention metadata), pages, conditional polling and a catch-up
    subscription all work without a SparkSession anywhere."""
    import threading

    from sqlstreamstore_spark.store import SparkParquetStreamStore
    from sqlstreamstore_spark.streaming import subscribe_to_all

    backend = SparkParquetStreamStore(None, str(tmp_path / "nojvm"))
    server = StreamStoreHttpServer(backend).start()
    try:
        client = HttpClientStreamStore(server.url)
        client.set_stream_metadata("hot", max_count=3)
        client.append_to_stream("hot", ExpectedVersion.ANY, msgs(1, 2, 3, 4, 5))
        page = client.read_stream_forwards("hot", 0, 10)
        assert [m.stream_version for m in page.messages] == [2, 3, 4]
        allp = client.read_all_forwards(0, 100)
        assert allp.is_end and len(allp.messages) >= 3

        got, done = [], threading.Event()

        def cb(m):
            got.append(m)
            if len(got) >= 2:
                done.set()

        sub = subscribe_to_all(client, cb, from_end=True, poll_interval=0.05)
        client.append_to_stream("live", ExpectedVersion.NO_STREAM, msgs(8, 9))
        assert done.wait(15), len(got)
        sub.dispose()
        assert [m.stream_id for m in got] == ["live", "live"]
    finally:
        server.stop()


def test_cors_preflight_and_headers():
    """AllowedMethodsMiddleware parity: OPTIONS answers the method set
    + header allowlist with origin *, and every response carries
    Access-Control-Allow-Origin (browser HAL clients)."""
    import urllib.request

    backend = InMemoryStreamStore()
    server = StreamStoreHttpServer(backend).start()
    req = urllib.request.Request(f"{server.url}/stream", method="OPTIONS")
    resp = urllib.request.urlopen(req)
    assert resp.status == 204
    # per-route method set (OptionsTests.cs: "/stream" is read-only)
    methods = {m.strip() for m in
               resp.headers["Access-Control-Allow-Methods"].split(",")}
    assert methods == {"GET", "HEAD", "OPTIONS"}
    assert "SSS-ExpectedVersion" in resp.headers["Access-Control-Allow-Headers"]
    req = urllib.request.Request(f"{server.url}/streams/x", method="OPTIONS")
    resp = urllib.request.urlopen(req)
    methods = {m.strip() for m in
               resp.headers["Access-Control-Allow-Methods"].split(",")}
    assert methods == {"GET", "HEAD", "POST", "DELETE", "OPTIONS"}
    assert resp.headers["Access-Control-Allow-Origin"] == "*"
    getr = urllib.request.urlopen(f"{server.url}/stream?d=f&position=0&m=1")
    assert getr.headers["Access-Control-Allow-Origin"] == "*"
    server.stop()


def test_unknown_verbs_get_405_with_allow():
    import urllib.error
    import urllib.request

    backend = InMemoryStreamStore()
    server = StreamStoreHttpServer(backend).start()
    try:
        req = urllib.request.Request(
            f"{server.url}/streams/s1", data=b"{}", method="PUT")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 405
        assert "POST" in e.value.headers["Allow"]
    finally:
        server.stop()


def test_http_canonical_url_redirects(duo):
    """Port of CanonicalUrlTests.cs: a feed GET whose query string is
    not the canonical `d=&p=&m=[&e=1]` serialization gets a 308 with
    the canonical Location; canonical requests are served directly."""
    import urllib.error
    import urllib.request

    _backend, client, _clock = duo
    client.append_to_stream("a-stream", ExpectedVersion.NO_STREAM, msgs(3))

    class NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):
            return None

    opener = urllib.request.build_opener(NoRedirect)

    def get(path):
        try:
            with opener.open(client.base_url + path, timeout=10) as resp:
                return resp.status, resp.headers.get("Location")
        except urllib.error.HTTPError as e:
            e.read()
            return e.code, e.headers.get("Location")

    # canonical forms pass straight through
    assert get("/stream?d=f&p=0&m=20")[0] == 200
    assert get("/stream?d=b&p=-1&m=20&e=1")[0] == 200
    assert get("/streams/a-stream?d=f&p=0&m=20")[0] == 200
    # permuted parameter order -> 308 onto the canonical form
    assert get("/stream?m=20&d=f&p=0") == (308, "/stream?d=f&p=0&m=20")
    assert get("/stream?p=0&e=1&d=f&m=20") == (308, "/stream?d=f&p=0&m=20&e=1")
    # e=0 is not canonical (prefetch off omits e entirely)
    assert get("/stream?d=f&p=0&m=20&e=0") == (308, "/stream?d=f&p=0&m=20")
    # defaulted/absent params -> canonical backwards-from-end form
    assert get("/stream") == (308, "/stream?d=b&p=-1&m=20")
    # bad numbers default per the reference's TryParse fallbacks
    assert get("/stream?d=f&p=xx&m=-5") == (308, "/stream?d=f&p=0&m=20")
    # p below End clamps to -1
    assert get("/stream?d=b&p=-9&m=20") == (308, "/stream?d=b&p=-1&m=20")
    # stream feeds redirect too, preserving the path
    assert get("/streams/a-stream?m=20&d=f&p=0") == (
        308, "/streams/a-stream?d=f&p=0&m=20")
    # the redirected-to URL itself serves (full loop works end to end)
    code, _ = get("/stream?d=b&p=-1&m=20")
    assert code == 200


def test_http_head_position_header_on_from_end_reads(duo):
    """HeadersTests.cs: an all-feed read from Position.End carries
    SSS-HeadPosition with the log head (-1 while empty)."""
    _backend, client, _clock = duo
    _s, h, _b = _raw_get(client.base_url, "/stream?d=b&p=-1&m=20&e=1")
    assert h.get("SSS-HeadPosition") == "-1"
    client.append_to_stream("a-stream", ExpectedVersion.NO_STREAM, msgs(*range(1, 11)))
    _s, h, _b = _raw_get(client.base_url, "/stream?d=b&p=-1&m=20&e=1")
    assert h.get("SSS-HeadPosition") == "9"
    # interior pages don't carry it
    _s, h, _b = _raw_get(client.base_url, "/stream?d=f&p=0&m=5")
    assert "SSS-HeadPosition" not in h


def test_http_docs_markdown_for_documented_rels(duo):
    """DocumentationTests.cs: every documented write relation serves
    markdown at /docs/{rel}; unknown rels 404; the index links the
    templated docs route."""
    import urllib.request

    _backend, client, _clock = duo
    for rel in ("append", "delete-stream", "delete-message", "metadata"):
        with urllib.request.urlopen(client.base_url + f"/docs/{rel}", timeout=10) as r:
            assert r.status == 200
            assert r.headers.get("Content-Type", "").startswith("text/markdown")
            assert r.read().decode().startswith(f"# {rel}")
    import json as _json
    _s, _h, raw = _raw_get(client.base_url, "/")
    idx = _json.loads(raw)
    assert idx["_links"]["streamStore:docs"]["templated"] is True
    import urllib.error
    try:
        urllib.request.urlopen(client.base_url + "/docs/nope", timeout=10)
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        e.read()
        assert e.code == 404


def test_http_content_negotiation_406(duo):
    """ClientErrorTests.cs: HAL routes only speak application/hal+json,
    docs only text/markdown; a non-matching Accept gets 406 with a
    problem body. */*, parameters, and absent headers all accept."""
    _backend, client, _clock = duo
    cases = [
        ("/stream?d=f&p=0&m=20", "text/plain", 406),
        ("/stream?d=f&p=0&m=20", "application/hal+json", 200),
        ("/stream?d=f&p=0&m=20", "application/hal+json; q=0.9", 200),
        ("/stream?d=f&p=0&m=20", "text/plain, */*", 200),
        ("/", "text/markdown", 406),
        ("/docs/append", "application/hal+json", 406),
        ("/docs/append", "text/markdown; charset=utf-8", 200),
        ("/docs/append", "*/*", 200),
    ]
    for path, accept, expected in cases:
        status, _h, body = _raw_get(client.base_url, path, {"Accept": accept})
        assert status == expected, (path, accept, status)
        if expected == 406:
            import json as _json
            assert _json.loads(body)["title"] == "Not Acceptable"
    # absent Accept header accepts anything
    assert _raw_get(client.base_url, "/stream?d=f&p=0&m=20")[0] == 200


def test_http_per_route_allow_and_head_everywhere(duo):
    """ClientErrorTests.cs method matrix: wrong verbs get 405 with the
    ROUTE's Allow set (+OPTIONS); HEAD works on every GET route and
    returns the GET response's headers with no body."""
    import urllib.error
    import urllib.request

    _backend, client, _clock = duo
    client.append_to_stream("a-stream", ExpectedVersion.NO_STREAM, msgs(1, 2))

    def send(method, path):
        r = urllib.request.Request(client.base_url + path, method=method)
        try:
            with urllib.request.urlopen(r, timeout=10) as resp:
                return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers), e.read()

    cases = [
        ("POST", "/stream?d=f&p=0&m=20", "GET, HEAD, OPTIONS"),
        ("DELETE", "/", "GET, HEAD, OPTIONS"),
        ("PUT", "/streams/a-stream", "GET, HEAD, POST, DELETE, OPTIONS"),
        ("DELETE", "/streams/a-stream/metadata", "GET, HEAD, POST, OPTIONS"),
        ("POST", "/docs/append", "GET, HEAD, OPTIONS"),
    ]
    for method, path, allow in cases:
        status, h, _b = send(method, path)
        assert status == 405, (method, path, status)
        assert h.get("Allow") == allow, (method, path, h.get("Allow"))
    # unknown routes are 404, not 405, regardless of verb
    assert send("PUT", "/nope")[0] == 404
    # HEAD mirrors GET headers with an empty body on feed + docs routes
    gs, gh, gb = send("GET", "/stream?d=f&p=0&m=20")
    hs, hh, hb = send("HEAD", "/stream?d=f&p=0&m=20")
    assert (hs, hb) == (gs, b"")
    assert hh.get("ETag") == gh.get("ETag")
    assert hh.get("Content-Length") == gh.get("Content-Length")
    assert send("HEAD", "/docs/append")[:1] == (200,)
    assert send("HEAD", "/streams/a-stream?d=f&p=0&m=20")[0] == 200
    # the bare head-position probe still works
    assert client.read_head_position() == 1


def test_http_head_docs_no_body(duo):
    import urllib.request

    _backend, client, _clock = duo
    r = urllib.request.Request(client.base_url + "/docs/append", method="HEAD")
    with urllib.request.urlopen(r, timeout=10) as resp:
        assert resp.status == 200
        assert int(resp.headers["Content-Length"]) > 0
        assert resp.read() == b""


def test_http_feed_navigation_links(duo):
    """StreamNavigationTests.cs shapes: first/last always; previous and
    next from the page's min/max key, absent on end pages and on the
    first/last pages themselves; stream feeds add the metadata rel."""
    import json as _json

    _backend, client, _clock = duo
    client.append_to_stream("s", ExpectedVersion.NO_STREAM, msgs(*range(1, 31)))

    def links(path):
        _s, _h, raw = _raw_get(client.base_url, path)
        return _json.loads(raw)["_links"]

    # a middle page of the all-feed (positions 10-19 of 30)
    l = links("/stream?d=f&p=10&m=10")
    assert l["first"]["href"] == "/stream?d=f&p=0&m=10"
    assert l["last"]["href"] == "/stream?d=b&p=-1&m=10"
    assert l["previous"]["href"] == "/stream?d=b&p=9&m=10"
    assert l["next"]["href"] == "/stream?d=f&p=20&m=10"
    assert l["streamStore:feed"]["href"] == l["self"]["href"]
    # the end page has no next/previous
    l = links("/stream?d=f&p=20&m=10")
    assert "next" not in l and "previous" not in l
    # stream feed: same shape + metadata rel, version-keyed
    l = links("/streams/s?d=f&p=10&m=10&e=1")
    assert l["previous"]["href"] == "/streams/s?d=b&p=9&m=10&e=1"
    assert l["next"]["href"] == "/streams/s?d=f&p=20&m=10&e=1"
    assert l["streamStore:metadata"]["href"] == "/streams/s/metadata"


def test_http_json_schemas_served_for_all_rels(duo):
    """SchemaSet.cs + AllJsonSchemasTests.cs parity: every relation
    serves a draft-07 JSON schema under Accept: application/schema+json
    (markdown otherwise — same resource, negotiated), the schema bytes
    are BOM-free, every schema pins $schema/title/additionalProperties,
    and the doc/schema rel sets coincide."""
    import json as _json

    from sqlstreamstore_spark.http.server import DOCS, SCHEMAS

    _backend, client, _clock = duo
    assert set(SCHEMAS) == set(DOCS) == {
        "append", "delete-stream", "delete-message", "metadata",
        "find", "feed-browser",
    }
    for rel in SCHEMAS:
        status, h, raw = _raw_get(
            client.base_url, f"/docs/{rel}",
            {"Accept": "application/schema+json"})
        assert status == 200, rel
        assert h.get("Content-Type", "").startswith("application/schema+json")
        assert not raw.startswith(b"\xef\xbb\xbf")  # byte_order_mark_not_present
        schema = _json.loads(raw)
        # json_schema_is_compatible_with_markdown_generator
        assert schema["$schema"] == "http://json-schema.org/draft-07/schema#"
        assert schema["title"]
        inner = schema["items"] if schema["type"] == "array" else schema
        assert inner["additionalProperties"] is False
        # markdown twin still served without the schema Accept
        status, h, raw = _raw_get(client.base_url, f"/docs/{rel}")
        assert status == 200 and h.get("Content-Type", "").startswith("text/markdown")
    # unknown rel 404s in both representations
    status, _h, _b = _raw_get(client.base_url, "/docs/nope",
                              {"Accept": "application/schema+json"})
    assert status == 404


def test_http_schema_accept_negotiation_precedence(duo):
    """schema+json explicitly in Accept wins; markdown or wildcard gets
    markdown; a docs Accept naming neither still 406es."""
    _backend, client, _clock = duo
    cases = [
        ("application/schema+json", 200, "application/schema+json"),
        ("application/schema+json, text/markdown", 200, "application/schema+json"),
        ("text/markdown", 200, "text/markdown"),
        ("*/*", 200, "text/markdown"),
        ("application/hal+json", 406, None),
    ]
    for accept, want_status, want_ctype in cases:
        status, h, _b = _raw_get(client.base_url, "/docs/metadata", {"Accept": accept})
        assert status == want_status, (accept, status)
        if want_ctype:
            assert h.get("Content-Type", "").startswith(want_ctype), accept


def test_http_single_message_resources(duo):
    """AllStreamMessageTests.cs + StreamMessageTests.cs parity: single
    $all message by position, single stream message by version (with
    -1 -> 307 to the head version, immutable-cache headers, 304 on
    If-None-Match, 404-with-body), and delete-by-version."""
    import json as _json
    import urllib.request

    backend, client, _clock = duo
    from sqlstreamstore_spark.schema import ExpectedVersion
    from sqlstreamstore_spark.store import NewStreamMessage

    import uuid as _uuid
    msgs = [NewStreamMessage(str(_uuid.UUID(int=900 + i)), "sm", f'{{"i":{i}}}')
            for i in range(3)]
    backend.append_to_stream("sm-stream", ExpectedVersion.ANY, msgs)
    base = client.base_url

    # single $all message by exact position
    head = backend.read_head_position()
    s, _h, raw = _raw_get(base, f"/stream/{head}")
    assert s == 200
    body = _json.loads(raw)
    assert body["position"] == head and body["jsonData"] == '{"i":2}'
    s, _h, _b = _raw_get(base, f"/stream/{head + 1000}")
    assert s == 404

    # single stream message by version: hit + immutable caching + 304
    s, h, raw = _raw_get(base, "/streams/sm-stream/1")
    assert s == 200
    body = _json.loads(raw)
    assert (body["streamVersion"], body["jsonData"]) == (1, '{"i":1}')
    assert h.get("ETag") == '"1"'
    assert h.get("Cache-Control") == "max-age=31536000"
    s, _h, _b = _raw_get(base, "/streams/sm-stream/1", {"If-None-Match": '"1"'})
    assert s == 304

    # version -1 redirects (307) to the resolved head version
    req = urllib.request.Request(base + "/streams/sm-stream/-1")

    class NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):
            return None

    opener = urllib.request.build_opener(NoRedirect)
    try:
        opener.open(req, timeout=10)
        raise AssertionError("expected 307")
    except urllib.error.HTTPError as e:
        e.read()
        assert e.code == 307
        assert e.headers.get("Location") == "/streams/sm-stream/2"

    # miss 404s WITH the {streamId, streamVersion} body
    s, _h, raw = _raw_get(base, "/streams/sm-stream/99")
    assert s == 404
    assert _json.loads(raw) == {"streamId": "sm-stream", "streamVersion": 99}
    s, _h, raw = _raw_get(base, "/streams/ghost/0")
    assert s == 404 and _json.loads(raw)["streamId"] == "ghost"

    # delete by version: message gone, other versions keep numbering
    req = urllib.request.Request(base + "/streams/sm-stream/1", method="DELETE")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 204
    s, _h, _b = _raw_get(base, "/streams/sm-stream/1")
    assert s == 404
    s, _h, raw = _raw_get(base, "/streams/sm-stream/2")
    assert s == 200 and _json.loads(raw)["streamVersion"] == 2
    # deleting an absent version is a no-op 204
    req = urllib.request.Request(base + "/streams/sm-stream/99", method="DELETE")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 204


def test_http_message_by_guid_and_per_route_options(duo):
    """OptionsTests.cs matrix + the canonical /streams/{id}/{guid}
    message-id route: GET serves the message, DELETE removes it, and
    OPTIONS advertises each route's own method set."""
    import json as _json
    import urllib.request
    import uuid as _uuid

    backend, client, _clock = duo
    from sqlstreamstore_spark.schema import ExpectedVersion
    from sqlstreamstore_spark.store import NewStreamMessage

    mid = str(_uuid.UUID(int=7777))
    backend.append_to_stream("gm", ExpectedVersion.ANY,
                             [NewStreamMessage(mid, "g", '{"g":1}')])
    base = client.base_url

    s, h, raw = _raw_get(base, f"/streams/gm/{mid}")
    assert s == 200
    body = _json.loads(raw)
    assert body["messageId"] == mid and h.get("ETag") == '"0"'
    s, _h, _b = _raw_get(base, f"/streams/gm/{_uuid.UUID(int=1)}")
    assert s == 404

    # per-route OPTIONS method sets (reference matrix)
    cases = [
        ("/stream", {"GET", "HEAD", "OPTIONS"}),
        ("/stream/123", {"GET", "HEAD", "OPTIONS"}),
        ("/streams/gm", {"GET", "HEAD", "POST", "DELETE", "OPTIONS"}),
        ("/streams/gm/0", {"GET", "HEAD", "DELETE", "OPTIONS"}),
        (f"/streams/gm/{mid}", {"GET", "HEAD", "DELETE", "OPTIONS"}),
        ("/streams/gm/metadata", {"GET", "HEAD", "POST", "OPTIONS"}),
        ("/docs/append", {"GET", "HEAD", "OPTIONS"}),
    ]
    for path, want in cases:
        req = urllib.request.Request(base + path, method="OPTIONS")
        with urllib.request.urlopen(req, timeout=10) as r:
            got = {m.strip() for m in
                   r.headers["Access-Control-Allow-Methods"].split(",")}
            assert got == want, (path, got)

    # DELETE by guid removes the message
    req = urllib.request.Request(base + f"/streams/gm/{mid}", method="DELETE")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 204
    s, _h, _b = _raw_get(base, f"/streams/gm/{mid}")
    assert s == 404


def test_http_client_read_message_by_id(duo):
    """Client-side point lookup over the single-message resource:
    hit returns the message (served via the store's stored-id index,
    no full-stream paging on a miss), 404 -> None."""
    backend, client, _clock = duo
    backend.append_to_stream("pl", ExpectedVersion.ANY, msgs(41, 42, 43))
    mid = str(uuid.UUID(int=42))
    m = client.read_message_by_id("pl", mid)
    assert m is not None
    assert (m.stream_id, m.stream_version, m.json_data) == ("pl", 1, '{"n":42}')
    assert client.read_message_by_id("pl", str(uuid.UUID(int=999))) is None
    assert client.read_message_by_id("absent", mid) is None
