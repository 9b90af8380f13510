from __future__ import annotations

import os
import sys
import threading

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from duckdb_extension_clickhouse_native_spark import get_spark

    s = get_spark(app_name="chsql-tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


class _MockCHHandler:
    """ClickHouse-HTTP-mock: executes the query in DuckDB and answers
    in Native format (SELECT ... FORMAT Native) or accepts Native
    INSERT bodies."""


@pytest.fixture(scope="session")
def mock_ch_server():
    import duckdb
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from duckdb_extension_clickhouse_native_spark.native import iter_blocks
    from duckdb_extension_clickhouse_native_spark.native.writer import (
        arrow_to_native_bytes,
    )

    state = {"inserted": []}
    con = duckdb.connect()
    con.execute("CREATE TABLE numbers AS SELECT range AS number FROM range(10000)")
    con.execute(
        "CREATE VIEW typed AS SELECT range AS i, CAST(range AS DOUBLE)/7 AS f, "
        "'row' || CAST(range AS VARCHAR) AS s, range % 2 = 0 AS b FROM range(100)"
    )
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            import io
            import urllib.parse

            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            qs = dict(
                urllib.parse.parse_qsl(urllib.parse.urlsplit(self.path).query)
            )
            try:
                if "query" in qs:  # INSERT with Native body
                    q = qs["query"]
                    assert q.upper().startswith("INSERT INTO")
                    table = q.split()[2]
                    rows = []
                    for blk in iter_blocks(io.BytesIO(body)):
                        rows.append(blk.to_record_batch())
                    with lock:
                        state["inserted"].append((table, rows))
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(b"")
                    return
                q = body.decode().strip()
                assert q.endswith("FORMAT Native"), q
                q = q[: -len("FORMAT Native")]
                with lock:
                    tbl = con.execute(q).fetch_arrow_table()
                payload = arrow_to_native_bytes(tbl)
                self.send_response(200)
                self.end_headers()
                self.wfile.write(payload)
            except Exception as e:  # pragma: no cover
                self.send_response(500)
                self.end_headers()
                self.wfile.write(str(e).encode())

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield {"url": f"http://127.0.0.1:{port}", "state": state}
    srv.shutdown()
