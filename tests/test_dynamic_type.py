"""Dynamic type (r15, VERDICT r14 item 5): versioned self-describing
prefix over the r14 Variant machinery, surfaced type-erased as
struct<type: string, value: string> (a header-only bind cannot know the
member set — it lives in the data prefix)."""

from __future__ import annotations

import io

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.native.codec import (
    decode_column,
    encode_column,
    read_varuint,
    skip_column,
    write_varuint,
)
from duckdb_extension_clickhouse_native_spark.native.types import (
    UnsupportedTypeError,
    parse_type,
    to_arrow,
)

VALS = [
    {"type": "Int64", "value": "42"},
    {"type": "String", "value": "hello"},
    None,
    {"type": "Bool", "value": "true"},
    {"type": "Float64", "value": "1.5"},
    {"type": "Int64", "value": "-7"},
    {"type": "Date", "value": "2020-06-01"},
]


def _roundtrip(vals, type_str="Dynamic"):
    t = parse_type(type_str)
    arr = pa.array(vals, type=to_arrow(t))
    buf = io.BytesIO()
    encode_column(buf, t, arr)
    raw = buf.getvalue()
    back = decode_column(
        io.BytesIO(raw), t, len(vals), scrub_strings=False, lossy_uint64=False
    )
    return raw, back


def test_roundtrip_mixed_types():
    raw, back = _roundtrip(VALS)
    assert back.to_pylist() == VALS


def test_skip_consumes_exact_bytes():
    raw, _ = _roundtrip(VALS)
    buf = io.BytesIO(raw + b"SENTINEL")
    skip_column(buf, parse_type("Dynamic"), len(VALS))
    assert buf.read() == b"SENTINEL"


def test_all_null_and_empty():
    _, back = _roundtrip([None, None, None])
    assert back.to_pylist() == [None, None, None]
    _, back0 = _roundtrip([])
    assert back0.to_pylist() == []


def test_prefix_layout_is_versioned():
    """Pin the wire layout: UInt64 version=1, varuint max_types,
    varuint n, names, then the Variant body (mode 0 + discriminators
    over the SORTED name order)."""
    import struct

    raw, _ = _roundtrip(
        [{"type": "Int64", "value": "1"}, {"type": "Bool", "value": "true"}],
        "Dynamic(max_types=10)",
    )
    buf = io.BytesIO(raw)
    assert struct.unpack("<Q", buf.read(8))[0] == 1  # structure V1
    assert read_varuint(buf) == 10  # max_types from the spelling
    assert read_varuint(buf) == 2  # two member types
    names = []
    for _ in range(2):
        ln = read_varuint(buf)
        names.append(buf.read(ln).decode())
    assert names == ["Bool", "Int64"]  # canonical sorted order
    assert struct.unpack("<Q", buf.read(8))[0] == 0  # basic disc mode
    disc = buf.read(2)
    assert list(disc) == [1, 0]  # Int64 row -> 1, Bool row -> 0


def test_version_2_prefix_decodes():
    """V2 (no max_types field) is accepted on read."""
    import struct

    t = parse_type("Dynamic")
    buf = io.BytesIO()
    buf.write(struct.pack("<Q", 2))
    write_varuint(buf, 1)
    write_varuint(buf, len(b"Int64"))
    buf.write(b"Int64")
    buf.write(struct.pack("<Q", 0))
    buf.write(bytes([0, 255]))
    buf.write(struct.pack("<q", 99))
    back = decode_column(
        io.BytesIO(buf.getvalue()), t, 2,
        scrub_strings=False, lossy_uint64=False,
    )
    assert back.to_pylist() == [{"type": "Int64", "value": "99"}, None]


def test_unknown_version_refuses():
    import struct

    t = parse_type("Dynamic")
    buf = io.BytesIO(struct.pack("<Q", 7) + b"\x00" * 16)
    with pytest.raises(UnsupportedTypeError, match="version 7"):
        decode_column(buf, t, 1, scrub_strings=False, lossy_uint64=False)


def test_shared_variant_decodes_as_string():
    import struct

    t = parse_type("Dynamic")
    buf = io.BytesIO()
    buf.write(struct.pack("<Q", 1))
    write_varuint(buf, 32)
    write_varuint(buf, 1)
    nm = b"SharedVariant"
    write_varuint(buf, len(nm))
    buf.write(nm)
    buf.write(struct.pack("<Q", 0))
    buf.write(bytes([0]))
    write_varuint(buf, 3)
    buf.write(b"abc")
    back = decode_column(
        io.BytesIO(buf.getvalue()), t, 1,
        scrub_strings=False, lossy_uint64=False,
    )
    assert back.to_pylist() == [{"type": "SharedVariant", "value": "abc"}]


def test_nested_member_type_refuses():
    with pytest.raises(UnsupportedTypeError, match="scalar"):
        _roundtrip([{"type": "Array(Int64)", "value": "[1]"}])


def test_nullable_dynamic_refuses():
    with pytest.raises(UnsupportedTypeError, match="Nullable"):
        parse_type("Nullable(Dynamic)")


def test_max_types_spelling():
    t = parse_type("Dynamic(max_types=17)")
    assert t.fixed_len == 17 and t.name == "Dynamic(max_types=17)"
    with pytest.raises(UnsupportedTypeError, match="max_types"):
        parse_type("Dynamic(max_types=0)")
    with pytest.raises(UnsupportedTypeError, match="max_types"):
        parse_type("Dynamic(17)")


def test_value_without_type_tag_refuses():
    t = parse_type("Dynamic")
    arr = pa.array(
        [{"type": None, "value": "orphan"}], type=to_arrow(t)
    )
    with pytest.raises(ValueError, match="NULL type"):
        encode_column(io.BytesIO(), t, arr)


def test_native_file_roundtrip_and_column_skip(spark, tmp_path):
    """Full write -> header 'Dynamic' -> scan; pruning another column
    exercises the skip arm through the DataSource."""
    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    t_d = parse_type("Dynamic")
    tbl = pa.table(
        {
            "d": pa.array(VALS, type=to_arrow(t_d)),
            "k": pa.array(range(len(VALS)), type=pa.int64()),
        }
    )
    p = str(tmp_path / "dyn.clickhouse")
    write_native_file(p, tbl, ch_types=[t_d, parse_type("Int64")])
    df = spark.read.format("clickhouse_native").load(p)
    assert [
        (r["d"]["type"] if r["d"] else None) for r in df.orderBy("k").collect()
    ] == ["Int64", "String", None, "Bool", "Float64", "Int64", "Date"]
    # column pruning drives skip_column over the Dynamic payload
    only_k = (
        spark.read.format("clickhouse_native")
        .option("columns", "k")
        .load(p)
    )
    assert sorted(r["k"] for r in only_k.collect()) == list(range(len(VALS)))


def test_dynamic_type_and_element_helpers(spark, tmp_path):
    """dynamicType / dynamicElement as pure column expressions over the
    type-erased struct (ClickHouse subcolumn-access parity)."""
    from pyspark.sql import functions as F

    from duckdb_extension_clickhouse_native_spark.functions.dynamic import (
        dynamic_element,
        dynamic_type,
    )
    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    t_d = parse_type("Dynamic")
    tbl = pa.table(
        {
            "k": pa.array(range(len(VALS)), type=pa.int64()),
            "d": pa.array(VALS, type=to_arrow(t_d)),
        }
    )
    p = str(tmp_path / "dyn.clickhouse")
    write_native_file(p, tbl, ch_types=[parse_type("Int64"), t_d])
    df = spark.read.format("clickhouse_native").load(p)
    out = df.select(
        "k",
        dynamic_type("d").alias("t"),
        dynamic_element("d", "Int64").alias("i"),
        dynamic_element(F.col("d"), "Float64").alias("f"),
        dynamic_element("d", "Date").alias("dt"),
    ).orderBy("k")
    rows = out.collect()
    assert [r["t"] for r in rows] == [
        "Int64", "String", None, "Bool", "Float64", "Int64", "Date",
    ]
    assert [r["i"] for r in rows] == [42, None, None, None, None, -7, None]
    assert [r["f"] for r in rows] == [None, None, None, None, 1.5, None, None]
    assert str(rows[6]["dt"]) == "2020-06-01"
    assert dict(out.dtypes)["i"] == "bigint" and dict(out.dtypes)["f"] == "double"
    # named refusal for non-scalar member spellings
    with pytest.raises(Exception, match="scalar"):
        dynamic_element("d", "Array(Int64)")


def test_rowbinary_dynamic_roundtrip():
    """Dynamic in the RowBinary wire (r15): per-VALUE type-name prefix
    (varuint length 0 = NULL) + the value in that type's RowBinary
    form — same type-erased {type, value} carrier as the Native arm,
    same pyarrow-cast text rendering, so both wires agree exactly."""
    from duckdb_extension_clickhouse_native_spark.native.rowbinary import (
        iter_rowbinary_blocks,
        write_rowbinary,
    )

    t_d = parse_type("Dynamic")
    rb = pa.RecordBatch.from_arrays(
        [pa.array(VALS, type=to_arrow(t_d))], names=["d"]
    )
    buf = io.BytesIO()
    write_rowbinary(buf, [rb], [t_d])
    back = list(iter_rowbinary_blocks(io.BytesIO(buf.getvalue())))
    assert back[0].to_record_batch().column(0).to_pylist() == VALS


def test_rowbinary_dynamic_refusals():
    from duckdb_extension_clickhouse_native_spark.native.rowbinary import (
        write_rowbinary,
    )

    t_d = parse_type("Dynamic")
    orphan = pa.RecordBatch.from_arrays(
        [pa.array([{"type": None, "value": "x"}], type=to_arrow(t_d))],
        names=["d"],
    )
    with pytest.raises(ValueError, match="NULL type"):
        write_rowbinary(io.BytesIO(), [orphan], [t_d])
    nested = pa.RecordBatch.from_arrays(
        [pa.array([{"type": "Array(Int64)", "value": "[1]"}],
                  type=to_arrow(t_d))],
        names=["d"],
    )
    with pytest.raises(UnsupportedTypeError, match="scalar"):
        write_rowbinary(io.BytesIO(), [nested], [t_d])


def test_array_of_dynamic_roundtrips():
    """Array(Dynamic): the Dynamic prefix rides inline where the inner
    column's data begins, so nesting under Array works unchanged."""
    t = parse_type("Array(Dynamic)")
    vals = [
        [{"type": "Int64", "value": "1"}, None],
        [],
        [{"type": "String", "value": "x"}],
    ]
    arr = pa.array(vals, type=to_arrow(t))
    buf = io.BytesIO()
    encode_column(buf, t, arr)
    got = decode_column(
        io.BytesIO(buf.getvalue()), t, 3,
        scrub_strings=False, lossy_uint64=False,
    ).to_pylist()
    assert got == vals
