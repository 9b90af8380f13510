"""Variant(T1, ..., Tn) wire support (r14, closing VERDICT r13 missing
item 4's tractable half).

Public layout (cf. ClickHouse SerializationVariant basic mode, the
same stream clickhouse-connect reads): UInt64 mode prefix (0 = basic),
one UInt8 discriminator per row (255 = NULL, indices over the
CANONICAL variant order — ClickHouse sorts variants by type name),
then each variant's values dense in canonical order.  Arrow carrier:
a struct with one nullable field PER VARIANT named by the ClickHouse
type name, mirroring ClickHouse's `v.String` subcolumn access.
Dynamic stays a loud NAMED refusal (versioned self-describing prefix).
"""

from __future__ import annotations

import io

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.native.codec import (
    iter_blocks,
    read_str,
    read_varuint,
    skip_column,
    write_block,
)
from duckdb_extension_clickhouse_native_spark.native.types import (
    UnsupportedTypeError,
    parse_type,
    to_arrow,
)


def _roundtrip(t, vals):
    rb = pa.RecordBatch.from_arrays(
        [pa.array(vals, type=to_arrow(t))], names=["v"]
    )
    buf = io.BytesIO()
    write_block(buf, rb, [t])
    raw = buf.getvalue()
    back = list(iter_blocks(io.BytesIO(raw)))[0].to_record_batch()
    return raw, back.column(0).to_pylist()


def test_canonical_variant_order():
    # ClickHouse sorts variant types by name: both spellings are the
    # same type with the same discriminator assignment
    a = parse_type("Variant(UInt64, String)")
    b = parse_type("Variant(String, UInt64)")
    assert a.name == b.name == "Variant(String, UInt64)"
    assert [i.base for i in a.tuple_items] == ["String", "UInt64"]


def test_variant_roundtrip_with_nulls():
    t = parse_type("Variant(UInt64, String)")
    vals = [
        {"String": "hi", "UInt64": None},
        {"String": None, "UInt64": 7},
        None,  # NULL row -> discriminator 255
        {"String": "yo", "UInt64": None},
    ]
    raw, back = _roundtrip(t, vals)
    assert b"Variant(String, UInt64)" in raw
    assert back == [
        {"String": "hi", "UInt64": None},
        {"String": None, "UInt64": 7},
        {"String": None, "UInt64": None},  # NULL row: all fields null
        {"String": "yo", "UInt64": None},
    ]


def test_variant_nested_inner_types():
    t = parse_type("Variant(Array(Int64), String)")
    vals = [
        {"Array(Int64)": [1, 2, 3], "String": None},
        {"Array(Int64)": None, "String": "x"},
        {"Array(Int64)": [], "String": None},
    ]
    _raw, back = _roundtrip(t, vals)
    assert back == vals


def test_variant_skip_lands_at_eof():
    t = parse_type("Variant(UInt64, String)")
    vals = [{"String": "abc", "UInt64": None}, {"String": None, "UInt64": 1}]
    raw, _ = _roundtrip(t, vals)
    buf = io.BytesIO(raw)
    ncols = read_varuint(buf)
    nrows = read_varuint(buf)
    for _ in range(ncols):
        read_str(buf)
        ty = parse_type(read_str(buf))
        skip_column(buf, ty, nrows)
    assert buf.read() == b""


def test_variant_two_non_null_fields_refused():
    t = parse_type("Variant(UInt64, String)")
    rb = pa.RecordBatch.from_arrays(
        [pa.array([{"String": "x", "UInt64": 1}], type=to_arrow(t))],
        names=["v"],
    )
    with pytest.raises(ValueError, match="more than one non-null"):
        write_block(io.BytesIO(), rb, [t])


def test_variant_nullable_inner_refused():
    with pytest.raises(UnsupportedTypeError, match="255 discriminator"):
        parse_type("Variant(Nullable(String), UInt64)")
    # the outer wrap is equally invalid — and accepting it would read
    # a bogus null mask before the discriminators (stream desync)
    with pytest.raises(UnsupportedTypeError, match="already carries NULL"):
        parse_type("Nullable(Variant(String, UInt64))")


def test_variant_compact_mode_refused():
    t = parse_type("Variant(UInt64, String)")
    vals = [{"String": "x", "UInt64": None}]
    raw, _ = _roundtrip(t, vals)
    # flip the mode prefix (first 8 payload bytes after the two header
    # strings) to 1 (compact) — decode must refuse by name
    idx = raw.index(b"Variant(String, UInt64)") + len(
        b"Variant(String, UInt64)"
    )
    patched = raw[:idx] + b"\x01" + raw[idx + 1 :]
    with pytest.raises(UnsupportedTypeError, match="mode 0"):
        list(iter_blocks(io.BytesIO(patched)))


def test_variant_rowbinary_roundtrip():
    """RowBinary variant layout: per-row UInt8 discriminator (255 =
    NULL) + the value in that variant's own binary form."""
    from duckdb_extension_clickhouse_native_spark.native.rowbinary import (
        iter_rowbinary_blocks,
        write_rowbinary,
    )

    t = parse_type("Variant(UInt64, String)")
    vals = [
        {"String": "hi", "UInt64": None},
        {"String": None, "UInt64": 9},
        None,
    ]
    rb = pa.RecordBatch.from_arrays(
        [pa.array(vals, type=to_arrow(t))], names=["v"]
    )
    buf = io.BytesIO()
    write_rowbinary(buf, [rb], [t])
    back = list(iter_rowbinary_blocks(io.BytesIO(buf.getvalue())))
    got = back[0].to_record_batch().column(0).to_pylist()
    assert got == [
        {"String": "hi", "UInt64": None},
        {"String": None, "UInt64": 9},
        {"String": None, "UInt64": None},
    ]


def test_dynamic_parses_nullable_dynamic_refuses():
    # r15: Dynamic is DECODED now (tests/test_dynamic_type.py has the
    # full matrix); the refusal that remains is Nullable(Dynamic),
    # invalid in ClickHouse exactly like Nullable(Variant)
    t = parse_type("Dynamic")
    assert t.base == "Dynamic" and t.fixed_len == 32
    assert parse_type("Dynamic(max_types=10)").fixed_len == 10
    with pytest.raises(UnsupportedTypeError, match="Nullable"):
        parse_type("Nullable(Dynamic)")


def test_variant_scan_entry_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    name = "native_variant_scan"
    sdf = e.queries()[name](spark, sf)
    srows = sorted(map(tuple, sdf.collect()))
    orows = sorted(
        map(tuple, con.execute(e.oracle_sql()[name]).fetchall())
    )
    assert srows == orows and len(srows) >= 1
