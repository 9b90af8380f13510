"""In-process stand-in for a ClickHouse server (HTTP interface,
``FORMAT Native`` responses), backed by DuckDB over the driver's
parquet tables.

Purpose: make the ``clickhouse_scan`` source (SURVEY.md §2.1 #11-15)
exercisable inside the driver's correctness gate without a live
ClickHouse — the conformance queries spin this up lazily and point
``spark.read.format("clickhouse_scan")`` at 127.0.0.1. The protocol
surface it emulates is exactly what the real server speaks publicly:
POST body ``<sql> FORMAT Native`` -> Native-framed typed blocks, and
``?query=INSERT INTO ...`` with a Native body for writes.

Only suitable for local[-mode] conformance runs; against a real
cluster you point the same DataSource at a real ClickHouse URL and
nothing else changes.
"""

from __future__ import annotations

import io
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

_SERVERS: dict[str, str] = {}
_LOCK = threading.Lock()

# the driver's table set — single source of truth in plans.base
from ..plans.base import TABLES  # noqa: E402


def build_handler(con, insert_hook=None, execute_inserts=True, query_hook=None):
    """Handler class factory over a DuckDB connection — the single
    implementation of the mock protocol (POST body ``<sql> FORMAT
    Native`` -> Native bytes; ``?query=INSERT INTO t`` + Native body ->
    insert). ``insert_hook(table, record_batches)`` runs after each
    INSERT (test fixtures record them); ``execute_inserts=False`` only
    records (for fixtures whose target tables aren't real)."""
    from ..native.codec import iter_blocks
    from ..native.writer import arrow_to_native_bytes

    qlock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            qs = dict(
                urllib.parse.parse_qsl(urllib.parse.urlsplit(self.path).query)
            )
            try:
                if "query" in qs and qs["query"].upper().startswith("INSERT"):
                    q = qs["query"]
                    table = q.split()[2].split("(")[0]
                    if "ROWBINARY" in q.upper():
                        from ..native.rowbinary import iter_rowbinary_blocks as _irb

                        block_iter = _irb(io.BytesIO(body))
                    elif "JSONCOMPACTEACHROW" in q.upper():
                        from ..native.jsoneachrow import (
                            iter_jsoncompact_blocks as _ijb,
                        )

                        block_iter = _ijb(io.BytesIO(body))
                    elif "JSONEACHROW" in q.upper():
                        # plain objects: not self-describing — derive
                        # the schema from the target table, as a real
                        # server does; a recording-only sink (table
                        # absent, execute_inserts=False) infers types
                        # from the JSON values instead
                        import json as _json

                        from ..native.jsoneachrow import (
                            iter_jsonobjects_blocks as _ijo,
                        )
                        from ..native.types import from_arrow as _fa, parse_type

                        try:
                            with qlock:
                                tschema = con.execute(
                                    f"SELECT * FROM {table} LIMIT 0"
                                ).fetch_arrow_table().schema
                            nt = [(f.name, _fa(f.type)) for f in tschema]
                        except Exception:
                            seen: dict = {}
                            for line in body.splitlines():
                                if not line.strip():
                                    continue
                                for k, v in _json.loads(line).items():
                                    if k in seen or v is None:
                                        continue
                                    seen[k] = (
                                        "Nullable(Bool)"
                                        if isinstance(v, bool)
                                        else "Nullable(Int64)"
                                        if isinstance(v, int)
                                        else "Nullable(Float64)"
                                        if isinstance(v, float)
                                        # quote_64bit_integers=1 (the
                                        # writer's lossless spelling)
                                        # sends Int64 as digit strings
                                        else "Nullable(Int64)"
                                        if isinstance(v, str)
                                        and v.lstrip("-").isdigit()
                                        else "Nullable(String)"
                                    )
                            nt = [
                                (k, parse_type(t)) for k, t in seen.items()
                            ]
                        block_iter = _ijo(io.BytesIO(body), nt)
                    elif "FORMAT VALUES" in q.upper():
                        # Values has no header: derive the schema from
                        # the target table, as a real server does; a
                        # recording-only sink infers Nullable types
                        # from the literal shapes instead
                        from ..native.valuesformat import (
                            iter_values_blocks as _ivb,
                            _parse_rows as _vpr,
                        )
                        from ..native.types import from_arrow as _fa, parse_type

                        try:
                            with qlock:
                                tschema = con.execute(
                                    f"SELECT * FROM {table} LIMIT 0"
                                ).fetch_arrow_table().schema
                            nt = [(f.name, _fa(f.type)) for f in tschema]
                        except Exception:
                            text = body.decode("utf-8")
                            shapes: list = []
                            for rec in _vpr(text):
                                if not shapes:
                                    shapes = [None] * len(rec)
                                for ci, (raw, was_q) in enumerate(rec):
                                    if shapes[ci] is not None:
                                        continue
                                    if was_q:
                                        shapes[ci] = "Nullable(String)"
                                    elif raw.upper() == "NULL":
                                        continue
                                    elif raw in ("true", "false"):
                                        shapes[ci] = "Nullable(Bool)"
                                    elif raw.lstrip("-").isdigit():
                                        shapes[ci] = "Nullable(Int64)"
                                    else:
                                        shapes[ci] = "Nullable(Float64)"
                            nt = [
                                (f"c{ci}", parse_type(t or "Nullable(String)"))
                                for ci, t in enumerate(shapes)
                            ]
                        block_iter = _ivb(io.BytesIO(body), nt)
                    elif "FORMAT TSKV" in q.upper():
                        # names in-band, types from the target table
                        # (fallback: everything Nullable(String) is
                        # wrong for ints — infer from value shapes the
                        # way the JSONEachRow branch does, but TSKV
                        # values are untyped text, so the recording
                        # sink infers Int64/Float64/Bool/String)
                        from ..native.textformats import (
                            iter_tskv_blocks as _itk,
                            tsv_unescape as _tun,
                            _split_tsv_line as _stl,
                            _split_tskv_field as _stf,
                        )
                        from ..native.types import from_arrow as _fa, parse_type

                        try:
                            with qlock:
                                tschema = con.execute(
                                    f"SELECT * FROM {table} LIMIT 0"
                                ).fetch_arrow_table().schema
                            nt = [(f.name, _fa(f.type)) for f in tschema]
                        except Exception:
                            seen: dict = {}
                            for line in body.decode("utf-8").splitlines():
                                if not line.strip():
                                    continue
                                for raw in _stl(line):
                                    k, v = _stf(raw)
                                    k = _tun(k.replace("\\=", "="))
                                    if k in seen or v == "\\N":
                                        continue
                                    v = _tun(v)
                                    if v in ("true", "false"):
                                        seen[k] = "Nullable(Bool)"
                                    elif v.lstrip("-").isdigit():
                                        seen[k] = "Nullable(Int64)"
                                    else:
                                        try:
                                            float(v)
                                            seen[k] = "Nullable(Float64)"
                                        except ValueError:
                                            seen[k] = "Nullable(String)"
                            nt = [
                                (k, parse_type(t)) for k, t in seen.items()
                            ]
                        block_iter = _itk(io.BytesIO(body), nt)
                    elif "TABSEPARATED" in q.upper():
                        from ..native.textformats import iter_tsv_blocks as _itb

                        block_iter = _itb(io.BytesIO(body))
                    elif "FORMAT CSV" in q.upper():
                        from ..native.textformats import iter_csv_blocks as _icb

                        block_iter = _icb(io.BytesIO(body))
                    elif "ARROWSTREAM" in q.upper():
                        from ..native.arrowwire import iter_arrow_blocks as _iab

                        block_iter = _iab(io.BytesIO(body))
                    elif "FORMAT PARQUET" in q.upper():
                        from ..native.arrowwire import iter_parquet_blocks as _ipb

                        block_iter = _ipb(io.BytesIO(body))
                    elif "FORMAT ORC" in q.upper():
                        from ..native.arrowwire import iter_orc_blocks as _iob

                        block_iter = _iob(io.BytesIO(body))
                    elif "FORMAT NPY" in q.upper():
                        # one nameless column: the name comes from the
                        # target table, as a real server resolves it
                        from ..native.npyformat import iter_npy_blocks as _inb
                        from ..native.types import from_arrow as _fa

                        with qlock:
                            tschema = con.execute(
                                f"SELECT * FROM {table} LIMIT 0"
                            ).fetch_arrow_table().schema
                        if len(tschema) != 1:
                            raise ValueError(
                                "FORMAT Npy INSERT requires a "
                                "single-column target table"
                            )
                        nt = [(f.name, _fa(f.type)) for f in tschema]
                        block_iter = _inb(io.BytesIO(body), nt)
                    else:
                        block_iter = iter_blocks(io.BytesIO(body))
                    import pyarrow as _pa

                    batches = []
                    with qlock:
                        for blk in block_iter:
                            rb = blk.to_record_batch()
                            batches.append(rb)
                            if execute_inserts:
                                # duckdb registers Tables, not bare
                                # RecordBatches (mock_tcp_server.py does
                                # the same wrap)
                                con.register(
                                    "_ins_batch", _pa.Table.from_batches([rb])
                                )
                                con.execute(
                                    f"INSERT INTO {table} SELECT * FROM _ins_batch"
                                )
                                con.unregister("_ins_batch")
                    if insert_hook is not None:
                        insert_hook(table, batches)
                    self.send_response(200)
                    self.end_headers()
                    return
                q = body.decode().strip()
                if query_hook is not None:
                    query_hook(q)
                fmt = "native"
                if q.endswith("FORMAT RowBinaryWithNamesAndTypes"):
                    q = q[: -len("FORMAT RowBinaryWithNamesAndTypes")]
                    fmt = "rowbinary"
                elif q.endswith("FORMAT JSONCompactEachRowWithNamesAndTypes"):
                    q = q[: -len("FORMAT JSONCompactEachRowWithNamesAndTypes")]
                    fmt = "jsoneachrow"
                elif q.endswith("FORMAT JSONEachRow"):
                    q = q[: -len("FORMAT JSONEachRow")]
                    fmt = "jsonobjects"
                elif q.endswith("FORMAT TabSeparatedWithNamesAndTypes"):
                    q = q[: -len("FORMAT TabSeparatedWithNamesAndTypes")]
                    fmt = "tsv"
                elif q.endswith("FORMAT CSVWithNamesAndTypes"):
                    q = q[: -len("FORMAT CSVWithNamesAndTypes")]
                    fmt = "csv"
                elif q.endswith("FORMAT ArrowStream"):
                    q = q[: -len("FORMAT ArrowStream")]
                    fmt = "arrowstream"
                elif q.endswith("FORMAT Parquet"):
                    q = q[: -len("FORMAT Parquet")]
                    fmt = "parquet"
                elif q.endswith("FORMAT Values"):
                    q = q[: -len("FORMAT Values")]
                    fmt = "values"
                elif q.endswith("FORMAT TSKV"):
                    q = q[: -len("FORMAT TSKV")]
                    fmt = "tskv"
                elif q.endswith("FORMAT ORC"):
                    q = q[: -len("FORMAT ORC")]
                    fmt = "orc"
                elif q.endswith("FORMAT Npy"):
                    q = q[: -len("FORMAT Npy")]
                    fmt = "npy"
                elif q.endswith("FORMAT Native"):
                    q = q[: -len("FORMAT Native")]
                with qlock:
                    tbl = con.execute(q).fetch_arrow_table()
                if fmt != "native":
                    import io as _io

                    import pyarrow as _pa

                    batches = tbl.to_batches()
                    if not batches:  # header must go out even for 0 rows
                        batches = [
                            _pa.RecordBatch.from_arrays(
                                [
                                    _pa.array([], type=f.type)
                                    for f in tbl.schema
                                ],
                                schema=tbl.schema,
                            )
                        ]
                    out = _io.BytesIO()
                    if fmt == "rowbinary":
                        from ..native.rowbinary import write_rowbinary

                        write_rowbinary(out, batches)
                    elif fmt == "tsv":
                        from ..native.textformats import write_tsv

                        write_tsv(out, batches)
                    elif fmt == "csv":
                        from ..native.textformats import write_csv

                        write_csv(out, batches)
                    elif fmt == "arrowstream":
                        from ..native.arrowwire import write_arrow

                        write_arrow(out, batches)
                    elif fmt == "parquet":
                        from ..native.arrowwire import write_parquet

                        write_parquet(out, batches)
                    elif fmt == "jsonobjects":
                        from ..native.jsoneachrow import write_jsonobjects

                        write_jsonobjects(out, batches)
                    elif fmt == "values":
                        from ..native.valuesformat import write_values

                        write_values(out, batches)
                    elif fmt == "tskv":
                        from ..native.textformats import write_tskv

                        write_tskv(out, batches)
                    elif fmt == "orc":
                        from ..native.arrowwire import write_orc

                        write_orc(out, batches)
                    elif fmt == "npy":
                        # real-server contract: a multi-column SELECT
                        # under FORMAT Npy is an error, surfaced as 500
                        from ..native.npyformat import write_npy

                        write_npy(out, batches)
                    else:
                        from ..native.jsoneachrow import write_jsoncompact

                        write_jsoncompact(out, batches)
                    payload = out.getvalue()
                else:
                    payload = arrow_to_native_bytes(tbl)
                self.send_response(200)
                self.end_headers()
                self.wfile.write(payload)
            except Exception as e:
                self.send_response(500)
                self.end_headers()
                self.wfile.write(str(e).encode())

        def log_message(self, *a):  # noqa: N802
            pass

    return Handler


def serve(handler) -> str:
    """Start a daemon ThreadingHTTPServer on an ephemeral port; returns
    its base URL."""
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{srv.server_address[1]}"


def mock_clickhouse_cluster(sf_dir: str, n_shards: int = 2) -> list[str]:
    """Start (once per process per (sf_dir, n)) ``n_shards`` DuckDB-
    backed mock servers, each holding a DISJOINT slice of every table
    (sharded by the table's first column, an integer key in all ten
    driver tables, ``(key % n + n) % n = shard``) — the ClickHouse
    Distributed/cluster() topology: the union of the shards is exactly
    the whole table.  Returns the shard base URLs."""
    import duckdb

    import pyarrow.parquet as _pq

    key = f"{sf_dir}|cluster{n_shards}"
    with _LOCK:
        if key in _SERVERS:
            return list(_SERVERS[key])
        urls = []
        for shard in range(n_shards):
            con = duckdb.connect()
            for t in TABLES:
                first = _pq.read_schema(f"{sf_dir}/{t}.parquet").names[0]
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM '{sf_dir}/{t}.parquet' "
                    f"WHERE ((CAST({first} AS BIGINT) % {n_shards}) "
                    f"+ {n_shards}) % {n_shards} = {shard}"
                )
            con.execute(
                "CREATE TABLE IF NOT EXISTS _ingest (k BIGINT, v VARCHAR)"
            )
            urls.append(serve(build_handler(con)))
        _SERVERS[key] = tuple(urls)
        return urls


def mock_clickhouse_url(sf_dir: str) -> str:
    """Start (once per process per sf_dir) a DuckDB-backed mock
    ClickHouse HTTP server over ``{sf_dir}/*.parquet``; returns its
    base URL."""
    with _LOCK:
        if sf_dir in _SERVERS:
            return _SERVERS[sf_dir]

        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        con.execute("CREATE TABLE IF NOT EXISTS _ingest (k BIGINT, v VARCHAR)")
        url = serve(build_handler(con))
        _SERVERS[sf_dir] = url
        return url
