"""Live-endpoint integration for the S1 HTTP keyset source (r8 verdict
missing-item #3): everything else exercises CursorSource through
injected FetchFns, so this suite is the one place the REAL code path —
``fetch_http_page`` → stdlib urlopen → JSON envelope parse →
``CursorSource.pages`` → ``ContactEtlJob.run`` — crosses an actual
socket. A stdlib http.server fixture plays the reference endpoint
(server.js:56-62: ``GET …?lastId=&limit=`` → ``{data, count}``),
including keyset semantics, an empty final page (F4 guard), a
500-then-success flap (the retry/backoff policy of sources/retry.py),
and a hard 404 (4xx must NOT retry).
"""

from __future__ import annotations

import json
import threading
from functools import partial
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.error import HTTPError
from urllib.parse import parse_qs, urlparse

import pytest

from etl_migrate_api_spark.pipelines.contact_job import ContactEtlJob
from etl_migrate_api_spark.sources.http_cursor import (
    CursorSource,
    fetch_http_page,
)

ROWS = [
    {"id": 1, "hn_code": "N1", "firstname": "a", "tel_no": "11,22"},
    {"id": 2, "hn_code": "N2", "firstname": "b", "tel_no": "33"},
    {"id": 3, "hn_code": "N2", "firstname": "b2", "tel_no": "44; 33"},
    {"id": 4, "hn_code": "N3", "firstname": "c", "tel_no": ""},
    {"id": 5, "hn_code": "N2", "firstname": "b3", "tel_no": "55/33"},
    {"id": 6, "hn_code": "N4", "firstname": "d", "tel_no": "66 , 66"},
]

BATCH_SCHEMA = "id bigint, hn_code string, firstname string, tel_no string"


class _ContactsHandler(BaseHTTPRequestHandler):
    """The reference's keyset endpoint: WHERE id > lastId LIMIT limit,
    served as the {data, count} envelope."""

    # injected per-server: mutable flap counter {remaining_500s: int}
    flaps: dict[str, int] = {}

    def log_message(self, *a):  # silence per-request stderr noise
        pass

    def do_GET(self):  # noqa: N802 (stdlib handler naming)
        u = urlparse(self.path)
        if u.path == "/flaky" and self.flaps.get("n", 0) > 0:
            self.flaps["n"] -= 1
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"transient")
            return
        if u.path not in ("/contacts", "/flaky"):
            self.send_response(404)
            self.end_headers()
            return
        q = parse_qs(u.query)
        last_id = int(q.get("lastId", ["0"])[0])
        limit = int(q.get("limit", ["1000"])[0])
        page = [r for r in ROWS if r["id"] > last_id][:limit]
        body = json.dumps({"data": page, "count": len(page)}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def live_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ContactsHandler)
    _ContactsHandler.flaps = {"n": 0}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_pages_over_a_real_socket(spark, live_server):
    """fetch_http_page drives real GETs; keyset pagination advances the
    cursor and the empty final page stops iteration."""
    src = CursorSource(
        spark,
        partial(fetch_http_page, f"{live_server}/contacts"),
        schema=BATCH_SCHEMA,
        limit=4,
    )
    pages = list(src.pages())
    assert [c for _, c in pages] == [4, 6]  # 4-row page, then 2-row page
    assert pages[0][0].count() == 4
    assert pages[1][0].count() == 2
    # resuming from a watermark re-reads only the tail (pure keyset)
    resumed = list(src.pages(last_id=4))
    assert [c for _, c in resumed] == [6]


def test_contact_job_end_to_end_over_http(spark, live_server, tmp_path):
    """The full S1→U2→K-sink pipeline with the source on a socket:
    same assertions as the injected-FetchFn golden test — the
    transport must be invisible to the fold/merge semantics."""
    src = CursorSource(
        spark,
        partial(fetch_http_page, f"{live_server}/contacts"),
        schema=BATCH_SCHEMA,
        limit=4,
    )
    res = ContactEtlJob(spark, src, str(tmp_path)).run()
    assert res.batches == 2
    assert res.last_id == 6
    assert res.insert_count == 4
    assert res.update_count == 2
    sink = {
        r["hn_code"]: r
        for r in ContactEtlJob(spark, src, str(tmp_path)).sink.read().collect()
    }
    assert sink["N2"]["tel_no"] == "33"
    assert sink["N2"]["tel_no2"] == "44"
    assert sink["N2"]["tel_no3"] == "55"
    assert sink["N4"]["tel_no"] == "66"


def test_500_then_success_retries(live_server):
    """Two 500s then a clean page: get_json's transient retry absorbs
    the flap (reference reconnect policy, redisClient.js:7-15) and the
    caller sees only the healthy payload."""
    _ContactsHandler.flaps["n"] = 2
    payload = fetch_http_page(f"{live_server}/flaky", 0, 4)
    assert len(payload["data"]) == 4
    assert _ContactsHandler.flaps["n"] == 0  # both 500s were consumed


def test_404_raises_immediately(live_server):
    """4xx is a caller bug: no retry, immediate raise."""
    with pytest.raises(HTTPError) as ei:
        fetch_http_page(f"{live_server}/nope", 0, 4)
    assert ei.value.code == 404
