"""Content-compression layer for url()/file()/s3() (r15, VERDICT r14
item 1): extension sniffing, explicit-method override, HTTP
Content-Encoding, streaming read/write for all six methods, and the
INTO OUTFILE export -> file()/url() reimport symmetry."""

from __future__ import annotations

import gzip
import io
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from duckdb_extension_clickhouse_native_spark.native.contentcodec import (
    compress_bytes,
    normalize_compression,
    open_compressed,
    open_compressed_write,
    resolve_compression,
    sniff_compression,
)

METHODS = ["gzip", "zstd", "brotli", "lz4", "bz2", "xz"]


@pytest.mark.parametrize("method", METHODS)
def test_roundtrip_read_and_readline(method):
    data = b"k,v\n1,1.5\n" * 1000
    z = compress_bytes(data, method)
    assert open_compressed(io.BytesIO(z), method).read() == data
    # line-oriented decoders need readline on the decompressed stream
    assert open_compressed(io.BytesIO(z), method).readline() == b"k,v\n"


@pytest.mark.parametrize("method", METHODS)
def test_write_half_matches_read_half(tmp_path, method):
    data = b"payload " * 5000
    p = str(tmp_path / f"x.{method}")
    w = open_compressed_write(p, method)
    w.write(data)
    w.close()
    raw = open(p, "rb").read()
    assert raw != data  # actually compressed
    assert open_compressed(io.BytesIO(raw), method).read() == data


def test_sniff_extensions():
    cases = {
        "data.csv.gz": "gzip",
        "data.csv.GZIP": "gzip",
        "x.native.zst": "zstd",
        "x.zstd": "zstd",
        "y.br": "brotli",
        "y.lz4": "lz4",
        "y.bz2": "bz2",
        "y.xz": "xz",
        "y.lzma": "xz",
        "plain.csv": "none",
        "noext": "none",
        # URL query/fragment stripped before sniffing
        "http://h/p/data.csv.gz?X-Amz-Signature=abc": "gzip",
        "http://h/p/data.csv.zst#frag": "zstd",
    }
    for path, want in cases.items():
        assert sniff_compression(path) == want, path


def test_resolve_precedence():
    # explicit option wins over everything
    assert resolve_compression("a.csv.gz", "none") == "none"
    assert resolve_compression("a.csv", "zst") == "zstd"
    # then the HTTP header
    assert resolve_compression("a.csv", None, "gzip") == "gzip"
    assert resolve_compression("a.csv", None, "identity") == "none"
    # then the extension
    assert resolve_compression("a.csv.br") == "brotli"
    assert resolve_compression("a.csv") == "none"


def test_named_refusals():
    with pytest.raises(ValueError, match="unsupported compression"):
        normalize_compression("snappy")
    with pytest.raises(ValueError, match="Content-Encoding"):
        resolve_compression("a.csv", None, "compress")


def test_outfile_exports_reimport_through_file(spark, tmp_path):
    """The r14 asymmetry closed: every extension INTO OUTFILE writes,
    file() reads back losslessly via auto-detection."""
    from duckdb_extension_clickhouse_native_spark.operators.outfile import (
        into_outfile,
    )
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        file_table,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "k bigint, s string, v double"
    )
    want = [(1, "a", 1.5), (2, "b", 2.5)]
    for ext in ["csv.gz", "csv.zst", "csv.br", "csv.lz4", "csv.bz2", "csv.xz"]:
        p = str(tmp_path / f"x.{ext}")
        n = into_outfile(df, p, "csv", truncate=True)
        assert n == 2
        back = file_table(spark, p, "CSVWithNamesAndTypes")
        assert sorted(tuple(r) for r in back.collect()) == want, ext


def test_native_format_compressed_through_file(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.operators.outfile import (
        into_outfile,
    )
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        file_table,
    )

    df = spark.createDataFrame([(7, "x"), (8, "y")], "a bigint, b string")
    p = str(tmp_path / "t.native.zst")
    into_outfile(df, p, "native", truncate=True)
    back = file_table(spark, p, "Native")
    assert sorted(tuple(r) for r in back.collect()) == [(7, "x"), (8, "y")]


def test_headerless_plus_compressed_composition(spark, tmp_path):
    """Transport compression composes with the structure-requiring
    plain spellings (the VERDICT item-1 'headerless+compressed' pin)."""
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        file_table,
    )

    p = str(tmp_path / "plain.csv.gz")
    with open(p, "wb") as f:
        f.write(gzip.compress(b"1,x\n2,y\n"))
    df = file_table(spark, p, "CSV", structure="k Int64, s String")
    assert sorted(tuple(r) for r in df.collect()) == [(1, "x"), (2, "y")]


def _serve(bodies: dict, headers: dict | None = None) -> str:
    hdrs = headers or {}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            body = bodies.get(self.path)
            if body is None:
                self.send_error(404)
                return
            self.send_response(200)
            for k, v in hdrs.get(self.path, {}).items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address
    return f"http://{host}:{port}"


def test_url_extension_sniff_and_content_encoding(spark):
    from duckdb_extension_clickhouse_native_spark.sources.url_table import (
        url_table,
    )

    base = _serve(
        {
            "/d.csv.zst": compress_bytes(b"k,v\n1,10\n2,20\n", "zstd"),
            "/enc.csv": gzip.compress(b"k,v\n3,30\n"),
        },
        headers={"/enc.csv": {"Content-Encoding": "gzip"}},
    )
    d1 = url_table(spark, f"{base}/d.csv.zst", "CSVWithNames")
    assert sorted(tuple(r) for r in d1.collect()) == [(1, 10), (2, 20)]
    # header beats the (absent) extension
    d2 = url_table(spark, f"{base}/enc.csv", "CSVWithNames")
    assert [tuple(r) for r in d2.collect()] == [(3, 30)]


def test_url_insert_compresses_by_extension(spark):
    """INSERT INTO FUNCTION url('.../x.csv.gz') posts a gzip body."""
    from duckdb_extension_clickhouse_native_spark.sources.url_table import (
        url_insert,
        url_table,
    )

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
    url = f"http://{host}:{port}/out.csv.gz"

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, s string")
    n = url_insert(df, url, "CSVWithNamesAndTypes")
    assert n == 2
    assert store["/out.csv.gz"][:2] == b"\x1f\x8b"  # real gzip on the wire
    back = url_table(spark, url, "CSVWithNamesAndTypes")
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_virtual_columns_url_and_file(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        file_table,
    )
    from duckdb_extension_clickhouse_native_spark.sources.url_table import (
        url_table,
    )

    p = str(tmp_path / "part1.csv")
    with open(p, "wb") as f:
        f.write(b"k,v\n1,10\n")
    df = file_table(spark, p, "CSVWithNames", virtual_columns=True)
    row = df.collect()[0]
    assert row["_path"] == p and row["_file"] == "part1.csv"
    assert df.columns == ["k", "v", "_path", "_file"]

    base = _serve({"/u/part2.csv": b"k,v\n2,20\n"})
    du = url_table(spark, f"{base}/u/part2.csv", "CSVWithNames",
                   virtual_columns=True)
    r = du.collect()[0]
    assert r["_file"] == "part2.csv" and r["_path"].startswith("http://")


def test_virtual_column_collision_refuses(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        file_table,
    )

    p = str(tmp_path / "clash.csv")
    with open(p, "wb") as f:
        f.write(b"_path,v\nx,1\n")
    with pytest.raises(Exception, match="virtual_columns"):
        file_table(spark, p, "CSVWithNames", virtual_columns=True).collect()


def test_url_headers_argument(spark):
    """ClickHouse url(..., headers('K'='v')): the headers option rides
    every GET (probe + partition reads); dict, JSON, and K=v forms."""
    from duckdb_extension_clickhouse_native_spark.sources.url_table import (
        parse_headers,
        url_table,
    )

    assert parse_headers({"A": "1"}) == {"A": "1"}
    assert parse_headers('{"A": "1", "B": "2"}') == {"A": "1", "B": "2"}
    assert parse_headers("A=1, B = x y") == {"A": "1", "B": "x y"}
    assert parse_headers(None) == {}
    with pytest.raises(ValueError, match="headers"):
        parse_headers("no-equals-here")

    seen: list = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            seen.append(self.headers.get("X-Auth-Token"))
            if self.headers.get("X-Auth-Token") != "sekrit":
                self.send_error(403)
                return
            body = b"k,v\n1,10\n"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    df = url_table(
        spark, f"{base}/t.csv", "CSVWithNames",
        headers={"X-Auth-Token": "sekrit"},
    )
    assert [tuple(r) for r in df.collect()] == [(1, 10)]
    assert seen and all(h == "sekrit" for h in seen)
    # without the header the server refuses -> named HTTP error
    with pytest.raises(Exception, match="403|Forbidden"):
        url_table(spark, f"{base}/t.csv", "CSVWithNames").collect()
