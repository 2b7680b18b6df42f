"""HttpCursorDataSource end-to-end against a live in-process HTTP server
serving keyset pages (the reference's fetchContact contract)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

N_ROWS = 537  # deliberately not a multiple of page size


def _rows(last_id: int, limit: int):
    start = last_id + 1
    ids = [i for i in range(start, min(start + limit, N_ROWS + 1))]
    return [
        {"id": i, "hn_code": f"N{i % 50:03d}", "tel_no": f"p{i % 7},p{i % 11}"}
        for i in ids
    ]


class _Handler(BaseHTTPRequestHandler):
    # {url_path_with_query: times_failed} — /flaky pages 503 twice each
    # before serving (exercises the retry/backoff path end-to-end)
    fail_counts: dict[str, int] = {}

    def do_GET(self):
        q = parse_qs(urlparse(self.path).query)
        last_id = int(q.get("lastId", ["0"])[0])
        limit = int(q.get("limit", ["1000"])[0])
        if "flaky" in self.path:
            failed = self.fail_counts.get(self.path, 0)
            if failed < 2:
                self.fail_counts[self.path] = failed + 1
                self.send_error(503, "transient")
                return
        if "notfound" in self.path:
            self.send_error(404, "nope")
            return
        if "typed" in self.path:
            # heterogeneous typed rows for schema inference: score mixes
            # int and float (→ double), extra is absent early (→ still in
            # schema), tags/meta are nested (→ stringified), gone is
            # null-only (→ string)
            data = [
                {
                    "id": i,
                    "name": f"n{i}",
                    "score": i * 1.5 if i % 2 else i,
                    "active": i % 3 == 0,
                    "tags": [f"t{i % 3}", "x"],
                    "meta": {"k": i},
                    "gone": None,
                    **({"extra": i} if i > 2 else {}),
                }
                for i in range(last_id + 1, min(last_id + 1 + limit, 8))
            ]
            body = json.dumps({"data": data, "count": len(data)}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        data = _rows(last_id, limit)
        if "unsorted" in self.path:
            data = list(reversed(data))  # pages arrive id-descending
        if "stuck" in self.path and data:
            # misbehaving server: echoes the same page forever
            data = _rows(0, limit)
        body = json.dumps({"data": data, "count": len(data)}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence
        pass


@pytest.fixture(scope="module")
def http_server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/api/contactpoint"
    srv.shutdown()


def test_http_cursor_datasource_parallel_read(spark, http_server):
    from etl_migrate_api_spark.sources.datasource import HttpCursorDataSource

    spark.dataSource.register(HttpCursorDataSource)
    df = (
        spark.read.format("http_cursor")
        .option("base_url", http_server)
        .option("max_id", str(N_ROWS))
        .option("page_size", "100")
        .option("slices", "4")
        .schema("id bigint, hn_code string, tel_no string")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == N_ROWS  # exactly-once across partition boundaries
    assert {r["id"] for r in rows} == set(range(1, N_ROWS + 1))
    one = [r for r in rows if r["id"] == 123][0]
    assert one["hn_code"] == "N023" and one["tel_no"] == "p4,p2"


def test_http_cursor_unsorted_page_no_duplicates(spark, http_server):
    """A server returning id-DESCENDING pages must not re-fetch rows:
    the cursor advances by max(id), not the last row's id."""
    from etl_migrate_api_spark.sources.datasource import HttpCursorDataSource

    spark.dataSource.register(HttpCursorDataSource)
    df = (
        spark.read.format("http_cursor")
        .option("base_url", http_server + "/unsorted")
        .option("max_id", str(N_ROWS))
        .option("page_size", "100")
        .option("slices", "2")
        .schema("id bigint, hn_code string, tel_no string")
        .load()
    )
    rows = df.collect()
    assert len(rows) == N_ROWS
    assert {r["id"] for r in rows} == set(range(1, N_ROWS + 1))


def test_http_cursor_non_advancing_server_terminates(spark, http_server):
    """A server that echoes the same page forever must terminate (cursor
    non-advance guard), not loop."""
    from etl_migrate_api_spark.sources.datasource import HttpCursorDataSource

    spark.dataSource.register(HttpCursorDataSource)
    df = (
        spark.read.format("http_cursor")
        .option("base_url", http_server + "/stuck")
        .option("max_id", "400")
        .option("page_size", "100")
        .option("slices", "1")
        .schema("id bigint, hn_code string, tel_no string")
        .load()
    )
    rows = df.collect()  # finite because the reader stops on non-advance
    # exactly-once even though the server repeats the page: 100 ROWS,
    # not just 100 distinct ids (a set-compare would mask duplicates)
    assert len(rows) == 100
    assert {r["id"] for r in rows} == set(range(1, 101))


def test_flaky_server_retries_to_exact_rows(spark, http_server):
    """Every page 503s twice before serving; the retry/backoff in
    sources/retry.py (the reference's reconnect policy) must absorb the
    failures — exact row counts, no dupes, no dropped pages."""
    from etl_migrate_api_spark.sources.datasource import HttpCursorDataSource
    from etl_migrate_api_spark.sources.http_cursor import CursorSource, fetch_http_page

    # executor-parallel DataSource path
    spark.dataSource.register(HttpCursorDataSource)
    df = (
        spark.read.format("http_cursor")
        .option("base_url", http_server + "/flaky")
        .option("max_id", str(N_ROWS))
        .option("page_size", "100")
        .option("slices", "3")
        .schema("id bigint, hn_code string, tel_no string")
        .load()
    )
    rows = df.collect()
    assert len(rows) == N_ROWS
    assert {r["id"] for r in rows} == set(range(1, N_ROWS + 1))

    # driver-loop CursorSource path (fetch_http_page shares the policy)
    src = CursorSource(
        spark,
        fetch=lambda last_id, limit: fetch_http_page(
            http_server + "/flaky2", last_id, limit
        ),
        schema="id bigint, hn_code string, tel_no string",
        limit=200,
    )
    total = sum(df.count() for df, _ in src.pages(0))
    assert total == N_ROWS


def test_get_json_4xx_fails_fast_5xx_backs_off(http_server):
    """A 4xx is a caller bug: exactly one request, no retry. Transient
    5xx retries follow the reference's linear-capped backoff."""
    from urllib.error import HTTPError

    from etl_migrate_api_spark.sources.retry import backoff_seconds, get_json

    _Handler.fail_counts.clear()
    with pytest.raises(HTTPError) as ex:
        get_json(http_server + "/notfound?lastId=0&limit=1", sleep=lambda s: None)
    assert ex.value.code == 404

    slept: list[float] = []
    payload = get_json(
        http_server + "/flaky3?lastId=0&limit=5", sleep=slept.append
    )
    assert len(payload["data"]) == 5
    assert slept == [backoff_seconds(1), backoff_seconds(2)] == [0.1, 0.2]
    assert backoff_seconds(100) == 3.0  # cap


def test_http_cursor_requires_schema(spark, http_server):
    from etl_migrate_api_spark.sources.datasource import HttpCursorDataSource

    spark.dataSource.register(HttpCursorDataSource)
    with pytest.raises(Exception, match="schema"):
        spark.read.format("http_cursor").option("base_url", http_server).load().collect()


def test_http_cursor_schema_inference_opt_in(spark, http_server):
    """.option('infer_schema', 'true') samples one page and infers a
    flat spark.read.json-style schema: bool/bigint/double/string, with
    nested values stringified and keys absent from early rows included."""
    import json as _json

    from etl_migrate_api_spark.sources.datasource import HttpCursorDataSource

    spark.dataSource.register(HttpCursorDataSource)
    df = (
        spark.read.format("http_cursor")
        .option("base_url", http_server + "/typed")
        .option("infer_schema", "true")
        .option("max_id", "7")
        .option("page_size", "100")
        .option("slices", "1")
        .load()
    )
    assert dict(df.dtypes) == {
        "id": "bigint",
        "name": "string",
        "score": "double",  # int/float mix widened
        "active": "boolean",
        "tags": "string",  # nested list stringified
        "meta": "string",  # nested object stringified
        "gone": "string",  # null-only falls back to string
        "extra": "bigint",  # absent from rows 1-2, still inferred
    }
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 7
    assert rows[3]["score"] == 4.5 and rows[4]["score"] == 4.0
    assert rows[3]["active"] is True and rows[4]["active"] is False
    assert _json.loads(rows[5]["meta"]) == {"k": 5}
    assert _json.loads(rows[5]["tags"]) == ["t2", "x"]
    assert rows[1]["extra"] is None and rows[5]["extra"] == 5


def test_inference_type_ladder():
    from etl_migrate_api_spark.sources.datasource import _infer_field_type

    assert _infer_field_type([True, False, None]) == "boolean"
    assert _infer_field_type([1, 2, None]) == "bigint"
    assert _infer_field_type([1, 2.5]) == "double"
    assert _infer_field_type(["a", None]) == "string"
    assert _infer_field_type([None, None]) == "string"
    assert _infer_field_type([1, "a"]) == "string"  # mixed → string
    assert _infer_field_type([{"k": 1}]) == "string"  # nested → string
