"""Round-13 type long tail: Nested(...), Int128/UInt128/Int256/UInt256
(decimal128(38,0) carrier, loud overflow), JSON / Object('json')
(String carrier).  The reference placeholders all of these
(src/lib.rs:168-170); we decode them for real — these pins cover the
codec arms the `native_nested_scan` / `native_int128_scan` /
`native_json_scan` conformance entries drive end-to-end."""

from __future__ import annotations

import io

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.native import codec
from duckdb_extension_clickhouse_native_spark.native.types import (
    UnsupportedTypeError,
    parse_type,
    to_arrow,
)


def _roundtrip(batch: pa.RecordBatch, types) -> pa.RecordBatch:
    buf = io.BytesIO()
    eff = [
        codec._promote_nullable(t, batch.column(i)) for i, t in enumerate(types)
    ]
    codec.write_block(buf, batch, eff)
    data = buf.getvalue()
    # skip path must consume exactly the same bytes as decode
    b2 = io.BytesIO(data)
    ncols = codec.read_varuint(b2)
    nrows = codec.read_varuint(b2)
    for _ in range(ncols):
        codec.read_str(b2)
        ty = codec.read_str(b2)
        codec.skip_column(b2, parse_type(ty), nrows)
    assert b2.read() == b""
    buf.seek(0)
    return codec.read_block(buf).to_record_batch()


def test_parse_nested_named_fields():
    t = parse_type("Nested(k Int64, v Nullable(String))")
    assert t.base == "Nested"
    assert t.tuple_names == ["k", "v"]
    assert t.tuple_items[1].nullable
    assert to_arrow(t) == pa.list_(
        pa.struct([pa.field("k", pa.int64()), pa.field("v", pa.string())])
    )
    with pytest.raises(UnsupportedTypeError):
        parse_type("Nested(Int64, String)")  # names are mandatory


def test_nested_roundtrip_with_null_child():
    t = parse_type("Nested(k Int64, v String)")
    arr = pa.array(
        [[{"k": 1, "v": "a"}, {"k": 2, "v": None}], [], [{"k": 3, "v": "c"}]],
        type=to_arrow(t),
    )
    rb = pa.RecordBatch.from_arrays([arr], names=["n"])
    got = _roundtrip(rb, [t])
    assert got.column("n").to_pylist() == arr.to_pylist()


def test_bigint_roundtrip_all_widths():
    vals = {
        "Int128": [-(10**30), 0, 170141183460469231731687303715],
        "UInt128": [0, 10**37, 7],
        "Int256": [-(10**37), 5, 10**37],
        "UInt256": [0, 1, 10**37],
    }
    types = [parse_type(k) for k in vals]
    arrays = [
        pa.array(v, type=pa.decimal128(38, 0)) for v in vals.values()
    ]
    rb = pa.RecordBatch.from_arrays(arrays, names=list(vals))
    got = _roundtrip(rb, types)
    for name, v in vals.items():
        assert [int(x) for x in got.column(name).to_pylist()] == v


def test_bigint_overflow_raises_on_decode():
    # a genuine Int128 beyond 38 digits: 2^127 - 1 has 39 digits
    buf = io.BytesIO((2**127 - 1).to_bytes(16, "little", signed=True))
    with pytest.raises(ValueError, match="decimal128"):
        codec.decode_column(buf, parse_type("Int128"), 1)


def test_uint_bigint_rejects_negative_on_encode():
    arr = pa.array([-1], type=pa.decimal128(38, 0))
    with pytest.raises(ValueError, match="negative"):
        codec.encode_column(io.BytesIO(), parse_type("UInt128"), arr)


def test_json_and_object_spelling():
    assert parse_type("JSON").base == "JSON"
    assert parse_type("Object('json')").base == "JSON"
    with pytest.raises(UnsupportedTypeError):
        parse_type("Object('other')")
    t = parse_type("JSON")
    arr = pa.array(['{"a":1}', None, "[]"], type=pa.string())
    rb = pa.RecordBatch.from_arrays([arr], names=["j"])
    got = _roundtrip(rb, [t])
    assert got.column("j").to_pylist() == ['{"a":1}', None, "[]"]


def test_nested_scan_spark_schema(spark, tmp_path):
    import os

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    t = parse_type("Nested(k Int64, v String)")
    arr = pa.array([[{"k": 1, "v": "a"}]], type=to_arrow(t))
    tbl = pa.table({"n": arr})
    path = str(tmp_path / "nested")
    os.makedirs(path)
    write_native_file(
        os.path.join(path, "p.clickhouse"), tbl, ch_types=[t]
    )
    df = spark.read.format("clickhouse_native").load(path)
    # named field access must work in Spark
    assert df.selectExpr("n[0].k AS k").collect()[0]["k"] == 1
