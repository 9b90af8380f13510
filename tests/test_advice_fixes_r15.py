"""Round-15 ADVICE regression pins.

1. url_table.py/file_table.py — WithNames formats WITHOUT a structure
   infer types per partition from each partition's OWN stream; a URL
   (or file) whose values infer differently from the plan schema
   (probed from the first element) must be CAST to the plan's types,
   not yielded as a mismatching Arrow batch (which surfaced as an
   opaque executor-side schema error).  Lossy direction (float stream
   against an int plan) refuses loudly via pyarrow's safe cast.
2. native_datasource.py — _pack_partitions docstring states the r14
   default (128 MiB ON, 0 = opt-out) and the chosen bin count is
   emitted (log line + last_pack_info) so host-dependent plan shapes
   are visible.
3. jsoneachrow.py — iter_jsoncompact_withnames_blocks with a declared
   structure runs _check_supported per type: an unsupported CHType is
   a named refusal, not a failure deep in value conversion.
4. url_table.py — the brace-aware top-level comma split is ONE shared
   helper (_split_top_level_commas) used by both expand_urls and
   expand_file_paths.
"""

from __future__ import annotations

import io
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


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


def test_withnames_partition_inference_casts_to_plan_schema(spark):
    """First URL infers Float64 for v; second (all-int values) infers
    Int64 on its own — its batches must cast to the plan's Float64."""
    from duckdb_extension_clickhouse_native_spark.sources.url_table import (
        url_table,
    )

    base = _serve(
        {
            "/a.csv": b"k,v\n1,1.5\n2,2.5\n",
            "/b.csv": b"k,v\n3,4\n5,6\n",
        }
    )
    df = url_table(spark, f"{base}/a.csv,{base}/b.csv", "CSVWithNames")
    assert dict(df.dtypes)["v"] == "double"
    rows = {(r["k"], r["v"]) for r in df.collect()}
    assert rows == {(1, 1.5), (2, 2.5), (3, 4.0), (5, 6.0)}


def test_withnames_lossy_partition_cast_refuses(spark):
    """Reverse direction: plan says Int64 (first URL all ints), a later
    URL carries non-integral floats — safe cast must refuse loudly."""
    from duckdb_extension_clickhouse_native_spark.sources.url_table import (
        url_table,
    )

    base = _serve(
        {
            "/a.csv": b"k,v\n1,10\n2,20\n",
            "/b.csv": b"k,v\n3,4.5\n",
        }
    )
    df = url_table(spark, f"{base}/a.csv,{base}/b.csv", "CSVWithNames")
    with pytest.raises(Exception, match="truncated|cast|convert"):
        df.collect()


def test_file_withnames_partition_inference_casts(spark, tmp_path):
    """Same contract through file(): two files, divergent inference."""
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        file_table,
    )

    (tmp_path / "a.csv").write_bytes(b"k,v\n1,1.5\n")
    (tmp_path / "b.csv").write_bytes(b"k,v\n2,7\n")
    df = file_table(spark, f"{tmp_path}/a.csv,{tmp_path}/b.csv", "CSVWithNames")
    assert dict(df.dtypes)["v"] == "double"
    assert {(r["k"], r["v"]) for r in df.collect()} == {(1, 1.5), (2, 7.0)}


def test_jsoncompact_withnames_structure_checks_supported():
    from duckdb_extension_clickhouse_native_spark.native.jsoneachrow import (
        iter_jsoncompact_withnames_blocks,
    )
    from duckdb_extension_clickhouse_native_spark.native.types import (
        UnsupportedTypeError,
    )
    from duckdb_extension_clickhouse_native_spark.sources.url_table import (
        parse_structure,
    )

    buf = io.BytesIO(b'["a","b"]\n[1,[2,"x"]]\n')
    nt = parse_structure("a Int64, b Variant(Int64, String)")
    with pytest.raises(UnsupportedTypeError, match="JSONCompactEachRow"):
        next(iter(iter_jsoncompact_withnames_blocks(buf, nt)))


def test_comma_split_helper_is_shared():
    from duckdb_extension_clickhouse_native_spark.sources import (
        file_table as ft,
        url_table as ut,
    )

    assert ft._split_top_level_commas is ut._split_top_level_commas
    assert ut._split_top_level_commas("a{1,2},b") == ["a{1,2}", "b"]
    assert ut.expand_urls("http://h/x{1,2}.csv,http://h/y.csv") == [
        "http://h/x1.csv",
        "http://h/x2.csv",
        "http://h/y.csv",
    ]


def test_pack_partitions_reports_bin_count(tmp_path, spark):
    """The chosen bin count is observable (last_pack_info) so the
    host-dependent plan shape isn't silent."""
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )
    from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
        ClickHouseNativeDataSource,
    )

    for i in range(4):
        write_native_file(
            str(tmp_path / f"p{i}.native"),
            pa.table({"x": pa.array([i], type=pa.int64())}),
        )
    ds = ClickHouseNativeDataSource(
        options={
            "path": str(tmp_path),
            "max_partition_bytes": str(128 * 1024 * 1024),
            "min_partitions": "2",
        }
    )
    rdr = ds.reader(ds.schema())
    parts = rdr.partitions()
    whole, packed, split = rdr.last_pack_info
    assert whole == 4 and split == 0
    assert packed == len(parts) and 1 <= packed <= 4
