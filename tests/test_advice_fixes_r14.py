"""Round-14 ADVICE regression pins.

1. url_table.py — the plain spellings 'CSV'/'TSV'/'RowBinary'/
   'JSONCompactEachRow' are HEADERLESS in ClickHouse; without a
   structure they must hit the named structure-needed refusal, never
   the WithNamesAndTypes decoders (which would eat data rows as a
   bogus header). WITH a structure they decode through the headerless
   decoders (new: RowBinary + JSONCompactEachRow plain forms).
2. url_table.py — the probe-schema memo is scoped to the DataSource
   INSTANCE (one probe per load()) instead of a process-global
   (url, fmt) dict, so the POST-then-GET store pattern never serves a
   stale schema to a later read (the global cache lived in Spark's
   persistent planner worker, unreachable from driver-side
   invalidation).
3. table_functions.py — the clickhouse_url UDTF emits every URL's rows
   in the FIRST stream's column order (realigned by name), and a URL
   with a different column SET raises a named error instead of
   silently misaligning values.
"""

from __future__ import annotations

import io
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.sources.url_table import (
    format_table,
    url_table,
)


def _serve(bodies: dict) -> str:
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            body = bodies.get(self.path)
            if body is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address
    return f"http://{host}:{port}"


def _serve_rw() -> tuple:
    store: dict = {}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            body = store.get(self.path)
            if body is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            store[self.path] = self.rfile.read(n)
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address
    return f"http://{host}:{port}", store


def _native_body(names=("k", "v")) -> bytes:
    """One Native block; pass names=('v','k') for a swapped layout."""
    from duckdb_extension_clickhouse_native_spark.native.codec import write_block
    from duckdb_extension_clickhouse_native_spark.native.types import parse_type

    cols = {
        "k": (pa.array([1, 2, 3], type=pa.int64()), "Int64"),
        "v": (pa.array(["a", "b", "c"]), "String"),
    }
    rb = pa.RecordBatch.from_arrays(
        [cols[n][0] for n in names], names=list(names)
    )
    buf = io.BytesIO()
    write_block(buf, rb, [parse_type(cols[n][1]) for n in names])
    return buf.getvalue()


# -- 1: plain spellings are structure-needed ---------------------------------


@pytest.mark.parametrize(
    "fmt", ["CSV", "TSV", "TabSeparated", "RowBinary", "JSONCompactEachRow"]
)
def test_plain_spellings_refused_without_structure(spark, fmt):
    # named refusal, NOT a confusing decode error from the
    # WithNamesAndTypes decoder eating data rows as a header
    with pytest.raises(Exception, match="not self-describing"):
        url_table(spark, "http://127.0.0.1:1/x", fmt).collect()
    with pytest.raises(ValueError, match="not self-describing"):
        format_table(spark, fmt, "1,2\n")


def test_plain_csv_headerless_data_named_error(spark):
    # the exact ADVICE repro: headerless CSV through plain 'CSV' used
    # to fail with "unsupported ClickHouse type: '2'"
    base = _serve({"/h.csv": b"1,2\n3,4\n"})
    with pytest.raises(Exception, match="not self-describing"):
        url_table(spark, f"{base}/h.csv", "CSV").collect()


def test_plain_rowbinary_with_structure(spark):
    # headerless RowBinary rows: Int64 LE + varint-length String
    body = b"".join(
        struct.pack("<q", k) + bytes([len(s)]) + s
        for k, s in [(1, b"a"), (2, b"bb"), (3, b"")]
    )
    base = _serve({"/r.bin": body})
    df = url_table(
        spark, f"{base}/r.bin", "RowBinary", structure="k Int64, v String"
    )
    assert sorted(map(tuple, df.collect())) == [(1, "a"), (2, "bb"), (3, "")]


def test_plain_jsoncompact_with_structure(spark):
    body = b'[1, "x"]\n[2, null]\n'
    base = _serve({"/j.json": body})
    df = url_table(
        spark,
        f"{base}/j.json",
        "JSONCompactEachRow",
        structure="k Int64, v Nullable(String)",
    )
    assert sorted(map(tuple, df.collect())) == [(1, "x"), (2, None)]


def test_plain_insert_refused_with_hint(spark):
    from duckdb_extension_clickhouse_native_spark.sources.url_table import (
        url_insert,
    )

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="WithNamesAndTypes"):
        url_insert(df, "http://127.0.0.1:1/x", "CSV")


# -- 2: schema cache dropped on url_insert -----------------------------------


def test_schema_cache_invalidated_on_insert(spark):
    from duckdb_extension_clickhouse_native_spark.sources.url_table import (
        url_insert,
    )

    base, store = _serve_rw()
    url = f"{base}/evolving"
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    url_insert(df1, url, "CSVWithNamesAndTypes")
    assert [f.name for f in url_table(spark, url, "CSVWithNamesAndTypes").schema.fields] == ["k", "v"]
    # second insert with a DIFFERENT schema to the same URL: the read
    # back must see the new schema, not the cached first probe
    df2 = spark.createDataFrame(
        [(0.5, 7, "z")], "score double, n long, label string"
    )
    url_insert(df2, url, "CSVWithNamesAndTypes")
    back = url_table(spark, url, "CSVWithNamesAndTypes")
    assert [f.name for f in back.schema.fields] == ["score", "n", "label"]
    assert [tuple(r) for r in back.collect()] == [(0.5, 7, "z")]


# -- 3: multi-URL column alignment -------------------------------------------


def test_udtf_multi_url_swapped_order_realigns(spark):
    base = _serve({"/a": _native_body(("k", "v")), "/b": _native_body(("v", "k"))})
    rows = spark.sql(
        f"SELECT k, v FROM clickhouse_url('{base}/a,{base}/b', 'Native')"
    ).collect()
    # 6 rows, every k is an int and every v a letter — no cross-column
    # swap from the second URL's reversed layout
    assert sorted(map(tuple, rows)) == [
        (1, "a"), (1, "a"), (2, "b"), (2, "b"), (3, "c"), (3, "c"),
    ]


def test_udtf_multi_url_different_columns_named_error(spark):
    from duckdb_extension_clickhouse_native_spark.native.codec import write_block
    from duckdb_extension_clickhouse_native_spark.native.types import parse_type

    other = io.BytesIO()
    write_block(
        other,
        pa.RecordBatch.from_arrays([pa.array([9], type=pa.int64())], names=["z"]),
        [parse_type("Int64")],
    )
    base = _serve({"/a": _native_body(), "/z": other.getvalue()})
    with pytest.raises(Exception, match="same column set"):
        spark.sql(
            f"SELECT * FROM clickhouse_url('{base}/a,{base}/z', 'Native')"
        ).collect()


def test_datasource_multi_url_swapped_order_realigns(spark):
    # same invariant through the scale path (clickhouse_url DataSource,
    # one partition per URL): partition 2's reversed stream layout is
    # realigned to the plan schema by name
    base = _serve({"/a": _native_body(("k", "v")), "/b": _native_body(("v", "k"))})
    df = url_table(spark, f"{base}/a,{base}/b", "Native")
    assert df.rdd.getNumPartitions() == 2
    assert sorted(map(tuple, df.collect())) == [
        (1, "a"), (1, "a"), (2, "b"), (2, "b"), (3, "c"), (3, "c"),
    ]
