"""LowCardinality dictionary wire-format tests (the reference has no
support at all — README.md:140 leaves it unchecked; we implement the
public additional-keys serialization)."""

from __future__ import annotations

import io

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.native.codec import (
    decode_column,
    encode_column,
    skip_column,
)
from duckdb_extension_clickhouse_native_spark.native.types import from_arrow, parse_type
from duckdb_extension_clickhouse_native_spark.native.writer import (
    arrow_to_native_bytes,
)
from duckdb_extension_clickhouse_native_spark.native.codec import iter_blocks


def _roundtrip(type_str: str, values, arrow_type=None):
    t = parse_type(type_str)
    arr = pa.array(values, type=arrow_type)
    buf = io.BytesIO()
    encode_column(buf, t, arr)
    buf.seek(0)
    out = decode_column(buf, t, len(values))
    assert buf.read() == b""  # every byte consumed
    return out


def test_lc_string_roundtrip():
    vals = ["alpha", "beta", "alpha", "gamma", "beta", "alpha"]
    out = _roundtrip("LowCardinality(String)", vals)
    assert out.to_pylist() == vals


def test_lc_nullable_string_roundtrip():
    vals = ["x", None, "y", None, "x", "z"]
    out = _roundtrip("LowCardinality(Nullable(String))", vals)
    assert out.to_pylist() == vals


def test_lc_int_roundtrip():
    vals = [7, 7, 42, 7, 99, 42] * 10
    out = _roundtrip("LowCardinality(Int64)", vals, pa.int64())
    assert out.to_pylist() == vals


def test_lc_nulls_without_declared_nullable():
    # arrow array with nulls but type string says plain String: the
    # writer must still encode nulls via the index-0 placeholder
    t = parse_type("LowCardinality(Nullable(String))")
    arr = pa.array(["a", None, "b"])
    buf = io.BytesIO()
    encode_column(buf, t, arr)
    buf.seek(0)
    assert decode_column(buf, t, 3).to_pylist() == ["a", None, "b"]


def test_lc_wide_dictionary_u16_indices():
    # >255 distinct values forces 2-byte indices
    vals = [f"v{i}" for i in range(300)] * 2
    out = _roundtrip("LowCardinality(String)", vals)
    assert out.to_pylist() == vals


def test_lc_skip_column():
    t = parse_type("LowCardinality(String)")
    arr = pa.array(["a", "b", "a", "c"])
    buf = io.BytesIO()
    encode_column(buf, t, arr)
    tail = b"SENTINEL"
    buf.write(tail)
    buf.seek(0)
    skip_column(buf, t, 4)
    assert buf.read() == tail


def test_lc_type_name_and_from_arrow():
    t = parse_type("LowCardinality(Nullable(String))")
    assert t.name == "LowCardinality(Nullable(String))"
    d = pa.dictionary(pa.int32(), pa.string())
    ch = from_arrow(d)
    assert ch.base == "LowCardinality" and ch.inner.base == "String"


def test_lc_full_block_roundtrip_via_writer():
    # a table mixing LC and plain columns through the block writer
    dict_arr = pa.array(["red", "blue", "red", "green"] * 25).dictionary_encode()
    plain = pa.array(list(range(100)), type=pa.int64())
    batch = pa.record_batch([dict_arr, plain], names=["color", "n"])
    blob = arrow_to_native_bytes(pa.Table.from_batches([batch]), block_rows=40)
    blocks = list(iter_blocks(io.BytesIO(blob)))
    assert sum(b.n_rows for b in blocks) == 100
    got = pa.Table.from_batches([b.to_record_batch() for b in blocks])
    assert got.column("color").to_pylist() == dict_arr.cast(pa.string()).to_pylist()
    assert got.column("n").to_pylist() == plain.to_pylist()


def test_lc_block_writer_with_nulls_moves_nullable_inside():
    # Nullable may not wrap LowCardinality: the writer must emit
    # LowCardinality(Nullable(String)) for a null-bearing dict column
    dict_arr = pa.array(["a", None, "b", "a"]).dictionary_encode()
    batch = pa.record_batch([dict_arr], names=["c"])
    blob = arrow_to_native_bytes(pa.Table.from_batches([batch]))
    blocks = list(iter_blocks(io.BytesIO(blob)))
    assert blocks[0].columns[0].type_str == "LowCardinality(Nullable(String))"
    got = pa.Table.from_batches([b.to_record_batch() for b in blocks])
    assert got.column("c").to_pylist() == ["a", None, "b", "a"]


def test_lc_through_spark_datasource(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.native.types import parse_type
    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    t = pa.table(
        {
            "color": pa.array(["red", "blue", None, "red"] * 50),
            "n": pa.array(list(range(200)), type=pa.int64()),
        }
    )
    p = str(tmp_path / "lc.clickhouse")
    write_native_file(
        p,
        t,
        ch_types=[parse_type("LowCardinality(Nullable(String))"), parse_type("Int64")],
        block_rows=60,
    )
    df = spark.read.format("clickhouse_native").load(p)
    rows = df.groupBy("color").count().collect()
    got = {r["color"]: r["count"] for r in rows}
    assert got == {"red": 100, "blue": 50, None: 50}
    assert df.count() == 200


@pytest.mark.parametrize("bad_version", [0, 2, 99])
def test_lc_rejects_unknown_version(bad_version):
    import struct

    t = parse_type("LowCardinality(String)")
    buf = io.BytesIO(struct.pack("<Q", bad_version) + b"\x00" * 32)
    with pytest.raises(Exception):
        decode_column(buf, t, 4)
