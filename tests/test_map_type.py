"""Map(K, V) wire-format tests — serialized as Array(Tuple(K, V)):
offsets, key payload, value payload. Not supported anywhere in the
reference (README.md:140)."""

from __future__ import annotations

import io

import pyarrow as pa

from duckdb_extension_clickhouse_native_spark.native.codec import (
    decode_column,
    encode_column,
    iter_blocks,
    skip_column,
)
from duckdb_extension_clickhouse_native_spark.native.types import (
    from_arrow,
    parse_type,
    to_arrow,
)
from duckdb_extension_clickhouse_native_spark.native.writer import write_native_file

MAP_T = pa.map_(pa.string(), pa.int64())


def _roundtrip(vals):
    t = parse_type("Map(String, Int64)")
    arr = pa.array(vals, type=MAP_T)
    buf = io.BytesIO()
    encode_column(buf, t, arr)
    buf.seek(0)
    out = decode_column(buf, t, len(vals))
    assert buf.read() == b""
    return [dict(x) if x is not None else None for x in out.to_pylist()]


def test_map_roundtrip():
    vals = [{"a": 1, "b": 2}, {}, {"z": 99}]
    assert _roundtrip(vals) == vals


def test_map_null_becomes_empty():
    # ClickHouse has no Nullable(Map): nulls round-trip as empty maps
    assert _roundtrip([{"a": 1}, None, {"b": 2}]) == [{"a": 1}, {}, {"b": 2}]


def test_map_sliced_batch_roundtrip():
    arr = pa.array([{"a": 1}, {"b": 2}, {"c": 3}, {"d": 4, "e": 5}], type=MAP_T)
    t = parse_type("Map(String, Int64)")
    buf = io.BytesIO()
    encode_column(buf, t, arr.slice(1, 2))
    buf.seek(0)
    out = decode_column(buf, t, 2)
    assert [dict(x) for x in out.to_pylist()] == [{"b": 2}, {"c": 3}]


def test_map_skip_and_type_mapping():
    t = parse_type("Map(String, Float64)")
    assert to_arrow(t) == pa.map_(pa.string(), pa.float64())
    assert from_arrow(pa.map_(pa.string(), pa.float64())).name == "Map(String, Float64)"
    arr = pa.array([{"x": 1.5}], type=pa.map_(pa.string(), pa.float64()))
    buf = io.BytesIO()
    encode_column(buf, t, arr)
    buf.write(b"TAIL")
    buf.seek(0)
    skip_column(buf, t, 1)
    assert buf.read() == b"TAIL"


def test_map_through_spark_datasource(spark, tmp_path):
    tbl = pa.table(
        {
            "m": pa.array(
                [{"k1": 1, "k2": 2}, {"k1": 10}, {}] * 20, type=MAP_T
            ),
            "i": pa.array(list(range(60)), type=pa.int64()),
        }
    )
    p = str(tmp_path / "m.clickhouse")
    write_native_file(p, tbl, block_rows=17)
    df = spark.read.format("clickhouse_native").load(p)
    from pyspark.sql import functions as F

    got = df.select(
        F.element_at("m", "k1").alias("k1"), F.size("m").alias("sz")
    ).groupBy("k1", "sz").count().collect()
    as_map = {(r["k1"], r["sz"]): r["count"] for r in got}
    assert as_map == {(1, 2): 20, (10, 1): 20, (None, 0): 20}
    # full values survive
    blocks = list(iter_blocks(open(p, "rb")))
    assert sum(b.n_rows for b in blocks) == 60


def test_ipv4_ipv6_roundtrip():
    # the last §1.3 "not supported anywhere" entries (README.md:140)
    for ts, vals in [
        ("IPv4", ["1.2.3.4", "255.255.255.255", "0.0.0.0"]),
        ("IPv6", ["::1", "2001:db8::ff00:42:8329", "fe80::1"]),
    ]:
        t = parse_type(ts)
        arr = pa.array(vals, type=pa.string())
        buf = io.BytesIO()
        encode_column(buf, t, arr)
        buf.seek(0)
        assert decode_column(buf, t, len(vals)).to_pylist() == vals
