"""Geo types + AggregateFunction refusal (r14, VERDICT r13 items 3/5).

Point/Ring/LineString/MultiLineString/Polygon/MultiPolygon are ALIASES
for nested Array/Tuple layouts with identical Native wire bytes (docs:
sql-reference/data-types/geo), so parse_type maps the names onto the
structural types the codec already decodes, keeping the geo spelling
for headers/DESCRIBE via CHType.display.  AggregateFunction(f, T)
state blobs are ClickHouse-internal — a loud NAMED refusal pointing at
the supported merge path, never the generic unsupported arm.
SimpleAggregateFunction(f, T) stores plain T values, so it decodes as
T (docs: data-types/simpleaggregatefunction).
"""

from __future__ import annotations

import io

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.native.types import (
    CHType,
    UnsupportedTypeError,
    parse_type,
    to_arrow,
)


def test_point_is_tuple_of_floats():
    t = parse_type("Point")
    assert t.base == "Tuple"
    assert [i.base for i in t.tuple_items] == ["Float64", "Float64"]
    assert t.name == "Point"  # display spelling survives
    assert to_arrow(t) == pa.struct(
        [pa.field("_1", pa.float64()), pa.field("_2", pa.float64())]
    )


@pytest.mark.parametrize(
    "name,depth",
    [("Ring", 1), ("LineString", 1), ("Polygon", 2),
     ("MultiLineString", 2), ("MultiPolygon", 3)],
)
def test_geo_nesting_depth(name, depth):
    t = parse_type(name)
    assert t.name == name
    for _ in range(depth):
        assert t.base == "Array"
        t = t.inner
    assert t.base == "Tuple"  # the Point at the bottom


def test_nullable_and_array_of_geo():
    t = parse_type("Nullable(Point)")
    assert t.nullable and t.name == "Point"
    arr = parse_type("Array(Point)")
    assert arr.base == "Array" and arr.inner.name == "Point"


def test_geo_native_roundtrip():
    """Write a block whose header literally spells 'Point'/'Ring',
    read it back byte-for-byte through the codec."""
    from duckdb_extension_clickhouse_native_spark.native.codec import (
        iter_blocks,
        write_block,
    )

    t_pt, t_ring = parse_type("Point"), parse_type("Ring")
    pts = [{"_1": 1.0, "_2": 2.0}, {"_1": -3.0, "_2": 4.5}]
    rings = [[pts[0], pts[1]], [pts[1]]]
    rb = pa.RecordBatch.from_arrays(
        [
            pa.array(pts, type=to_arrow(t_pt)),
            pa.array(rings, type=to_arrow(t_ring)),
        ],
        names=["pt", "ring"],
    )
    buf = io.BytesIO()
    write_block(buf, rb, [t_pt, t_ring])
    raw = buf.getvalue()
    assert b"\x05Point" in raw and b"\x04Ring" in raw
    blocks = list(iter_blocks(io.BytesIO(raw)))
    back = blocks[0].to_record_batch()
    assert back.column(0).to_pylist() == pts
    assert back.column(1).to_pylist() == rings


def test_aggregate_function_named_refusal():
    with pytest.raises(UnsupportedTypeError, match="agg_state_merge"):
        parse_type("AggregateFunction(uniq, String)")
    # reference-compat placeholder mode keeps the reference's behavior
    # (lib.rs:168-170): the column placeholders like any unknown type —
    # pinned in tests/test_unsupported_compat.py; strict mode (the
    # default) is where the NAMED refusal lives
    t = parse_type(
        "AggregateFunction(quantiles(0.5, 0.9), UInt64)",
        unsupported_as_varchar=True,
    )
    assert t.base == "Unsupported"


def test_simple_aggregate_function_decodes_as_inner():
    assert parse_type("SimpleAggregateFunction(sum, UInt64)").base == "UInt64"
    t = parse_type("SimpleAggregateFunction(anyLast, Map(String, UInt64))")
    assert t.base == "Map"
    assert [i.base for i in t.tuple_items] == ["String", "UInt64"]
    with pytest.raises(UnsupportedTypeError, match="SimpleAggregateFunction"):
        parse_type("SimpleAggregateFunction(sum)")


def test_display_does_not_leak_to_plain_types():
    assert parse_type("Tuple(Float64, Float64)").name == "Tuple(Float64, Float64)"
    assert CHType("Int64").name == "Int64"
