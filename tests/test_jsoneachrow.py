"""JSONCompactEachRowWithNamesAndTypes — the scan source's third wire
format (native/jsoneachrow.py).

Includes a recorded-text decode (the transcript-test discipline: the
wire lines are hand-written JSON literals in THIS file, pinning the
server's documented output spellings — quoted 64-bit ints, NaN/Inf as
null, NUL-padded FixedString — so a symmetric encode/decode bug in the
package codec cannot hide behind the mock's shared writer).
"""

from __future__ import annotations

import io
import math
import struct

import pytest
from hypothesis import given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.native.jsoneachrow import (
    iter_jsoncompact_blocks,
    write_jsoncompact,
)
from duckdb_extension_clickhouse_native_spark.native.types import (
    UnsupportedTypeError,
)


# -- recorded text (independent literals) -----------------------------------

RECORDED = b"""\
["id","name","score","tags","flag"]
["UInt64","String","Nullable(Float64)","Array(Int32)","Bool"]
["7","alpha",2.5,[1,2],true]
["8","",null,[],false]
"""


def test_recorded_text_decode():
    blocks = list(iter_jsoncompact_blocks(io.BytesIO(RECORDED)))
    rb = blocks[0].to_record_batch()
    assert rb.column("id").to_pylist() == [7, 8]
    assert rb.column("name").to_pylist() == ["alpha", ""]
    assert rb.column("score").to_pylist() == [2.5, None]
    assert rb.column("tags").to_pylist() == [[1, 2], []]
    assert rb.column("flag").to_pylist() == [True, False]


RECORDED_TEMPORAL = b"""\
["d","dt","dt64","dec","e"]
["Date","DateTime","DateTime64(3)","Decimal(18, 4)","Enum8('ok' = 1, 'bad' = 2)"]
["2024-03-01","2024-03-01 12:30:45","2024-03-01 12:30:45.125","12345.6789","ok"]
["1970-01-02","1970-01-01 00:00:01","1970-01-01 00:00:00.001",-1.5,2]
"""


def test_recorded_temporal_decimal_enum():
    """Date/DateTime strings, DateTime64 fractional digits, quoted AND
    unquoted Decimal spellings, enum names AND numeric bodies."""
    import datetime
    from decimal import Decimal

    rb = list(iter_jsoncompact_blocks(io.BytesIO(RECORDED_TEMPORAL)))[0].to_record_batch()
    assert rb.column("d").to_pylist() == [
        datetime.date(2024, 3, 1), datetime.date(1970, 1, 2)
    ]
    dts = rb.column("dt").to_pylist()
    assert dts[0] == datetime.datetime(2024, 3, 1, 12, 30, 45)
    assert dts[1] == datetime.datetime(1970, 1, 1, 0, 0, 1)
    dt64 = rb.column("dt64").to_pylist()
    assert dt64[0].microsecond == 125_000
    assert dt64[1] == datetime.datetime(1970, 1, 1, 0, 0, 0, 1000)
    assert rb.column("dec").to_pylist() == [
        Decimal("12345.6789"), Decimal("-1.5000")
    ]
    assert rb.column("e").to_pylist() == ["ok", "bad"]


RECORDED_MISC = b"""\
["u","a4","a6","fx","f32"]
["UUID","IPv4","IPv6","FixedString(6)","Float32"]
["01234567-89ab-cdef-fedc-ba9876543210","10.0.0.7","2001:db8::1","ab\\u0000\\u0000\\u0000\\u0000",null]
["00000000-0000-0000-0000-000000000000","0.0.0.0","::1","abcdef","-inf"]
"""


def test_recorded_uuid_ip_fixedstring_denormals():
    """UUID/IP as strings; FixedString NUL padding stripped; Float
    denormals both as null (server default) and the quoted spelling."""
    rb = list(iter_jsoncompact_blocks(io.BytesIO(RECORDED_MISC)))[0].to_record_batch()
    assert rb.column("u").to_pylist() == [
        "01234567-89ab-cdef-fedc-ba9876543210",
        "00000000-0000-0000-0000-000000000000",
    ]
    assert rb.column("a4").to_pylist() == ["10.0.0.7", "0.0.0.0"]
    assert rb.column("a6").to_pylist() == ["2001:db8::1", "::1"]
    assert rb.column("fx").to_pylist() == ["ab", "abcdef"]
    f = rb.column("f32").to_pylist()
    assert math.isnan(f[0]) and f[1] == float("-inf")


def test_unquoted_64bit_ints_accepted():
    rec = b'["x"]\n["Int64"]\n[-9007199254740993]\n["9007199254740993"]\n'
    rb = list(iter_jsoncompact_blocks(io.BytesIO(rec)))[0].to_record_batch()
    assert rb.column("x").to_pylist() == [-9007199254740993, 9007199254740993]


def test_unsupported_type_names_native_path():
    # Map/Tuple/LowCardinality joined the matrix in round 9; the
    # pointer now guards parseable-but-unpinned layouts only
    from duckdb_extension_clickhouse_native_spark.native.jsoneachrow import (
        _check_supported,
    )
    from duckdb_extension_clickhouse_native_spark.native.types import CHType

    with pytest.raises(UnsupportedTypeError, match="Native"):
        _check_supported(CHType("AggregateFunction"))


def test_ragged_row_rejected():
    bad = b'["a","b"]\n["Int32","Int32"]\n[1]\n'
    with pytest.raises(ValueError, match="2 columns"):
        list(iter_jsoncompact_blocks(io.BytesIO(bad)))


def test_lossy_uint64_wraps_like_native():
    rec = b'["x"]\n["UInt64"]\n["4294967295"]\n["18446744073709551615"]\n'
    rb = list(
        iter_jsoncompact_blocks(io.BytesIO(rec), lossy_uint64=True)
    )[0].to_record_batch()
    # same astype('int64').astype('int32') wrap the Native path applies
    assert rb.column("x").to_pylist() == [-1, -1]


# -- hypothesis round trip --------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-(2**62), 2**62),
            st.text(max_size=12),
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
            st.lists(st.integers(-(2**31), 2**31 - 1), max_size=5),
        ),
        max_size=30,
    )
)
def test_roundtrip_property(rows):
    import pyarrow as pa

    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.int64()),
            pa.array([r[1] for r in rows], pa.string()),
            pa.array([r[2] for r in rows], pa.float32()),
            pa.array([r[3] for r in rows], pa.list_(pa.int32())),
        ],
        names=["a", "b", "c", "d"],
    )
    buf = io.BytesIO()
    write_jsoncompact(buf, [batch])
    buf.seek(0)
    out = [b.to_record_batch() for b in iter_jsoncompact_blocks(buf)]
    got = pa.Table.from_batches(out) if out else None
    if not rows:
        assert got is None or got.num_rows == 0
        return
    assert got.column("a").to_pylist() == [r[0] for r in rows]
    assert got.column("b").to_pylist() == [r[1] for r in rows]
    assert got.column("d").to_pylist() == [r[3] for r in rows]
    exp_c = [r[2] for r in rows]
    got_c = got.column("c").to_pylist()
    assert [
        (x is None, None if x is None else struct.pack("<f", x))
        for x in got_c
    ] == [
        (x is None, None if x is None else struct.pack("<f", x))
        for x in exp_c
    ]


def test_temporal_roundtrip():
    """Date/DateTime64 through write -> read, incl. a pre-1970 Date32
    (negative epoch days must not mis-round)."""
    import datetime

    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.types import parse_type

    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(
                [datetime.date(1969, 12, 25), datetime.date(2024, 2, 29)],
                pa.date32(),
            ),
            pa.array(
                [
                    datetime.datetime(2024, 3, 1, 12, 30, 45, 125000),
                    datetime.datetime(1999, 12, 31, 23, 59, 59, 999000),
                ],
                pa.timestamp("us"),
            ),
        ],
        names=["d", "t"],
    )
    buf = io.BytesIO()
    write_jsoncompact(
        buf, [batch], ch_types=[parse_type("Date32"), parse_type("DateTime64(3)")]
    )
    text = buf.getvalue().decode()
    assert '"1969-12-25"' in text and '"2024-03-01 12:30:45.125"' in text
    buf.seek(0)
    rb = list(iter_jsoncompact_blocks(buf))[0].to_record_batch()
    assert rb.column("d").to_pylist() == batch.column("d").to_pylist()
    assert rb.column("t").to_pylist() == batch.column("t").to_pylist()


# -- through Spark against the HTTP mock ------------------------------------


def test_scan_jsoneachrow_matches_native(spark, mock_ch_server):
    url = mock_ch_server["url"]
    q = "SELECT i, f, s, b FROM typed WHERE i < 50"

    def load(fmt):
        return (
            spark.read.format("clickhouse_scan")
            .option("query", q)
            .option("url", url)
            .option("wire_format", fmt)
            .load()
        )

    native = {tuple(r) for r in load("native").collect()}
    jsonrows = {tuple(r) for r in load("jsoneachrow").collect()}
    assert jsonrows == native and len(jsonrows) == 50


def test_jsoneachrow_requires_http():
    from duckdb_extension_clickhouse_native_spark.sources.scan_datasource import (
        ClickHouseScanReader,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    with pytest.raises(ValueError, match="http"):
        ClickHouseScanReader(
            StructType([StructField("x", LongType())]),
            {"query": "SELECT 1", "url": "tcp://h:9000",
             "wire_format": "jsoneachrow"},
        )


def test_jsoneachrow_insert_roundtrip(spark, mock_ch_server):
    """Writer path: df.write over wire_format=jsoneachrow lands rows
    the mock records (decoded from the JSON body)."""
    import pandas as pd

    url = mock_ch_server["url"]
    state = mock_ch_server["state"]
    before = len(state["inserted"])
    df = spark.createDataFrame(
        pd.DataFrame({"x": [10, 20, 30], "name": ["a", "b", "c"]})
    ).coalesce(1)
    (
        df.write.format("clickhouse_scan")
        .option("table", "json_sink")
        .option("url", url)
        .option("wire_format", "jsoneachrow")
        .mode("append")
        .save()
    )
    new = state["inserted"][before:]
    assert new and new[0][0] == "json_sink"
    rows = []
    for _table, batches in new:
        for rb in batches:
            rows.extend(zip(rb.column("x").to_pylist(), rb.column("name").to_pylist()))
    assert sorted(rows) == [(10, "a"), (20, "b"), (30, "c")]


# -- malformed-stream robustness --------------------------------------------


def test_truncated_header_raises_eof():
    with pytest.raises(EOFError, match="header"):
        list(iter_jsoncompact_blocks(io.BytesIO(b'["a"]\n')))


def test_malformed_json_row_raises_cleanly():
    import json as _json

    bad = b'["a"]\n["Int32"]\n[1]\n[2,\n'
    with pytest.raises(_json.JSONDecodeError):
        list(iter_jsoncompact_blocks(io.BytesIO(bad)))


def test_trailing_blank_line_tolerated():
    ok = b'["a"]\n["Int32"]\n[1]\n\n'
    rb = list(iter_jsoncompact_blocks(io.BytesIO(ok)))[0].to_record_batch()
    assert rb.column("a").to_pylist() == [1]


# -- Map / Tuple / LowCardinality (round-9 completion of the matrix) --------

RECORDED_NESTED = b"""\
["m","t","lc","mi"]
["Map(String, Int64)","Tuple(Int64, String)","LowCardinality(String)","Map(Int64, String)"]
[{"a":"1","bb":"2"},["7","x"],"hello",{"5":"v"}]
[{},["-1",""],"hello",{}]
"""


def test_recorded_nested_decode():
    """Hand-written JSON literals pin the server conventions: Map as a
    JSON object (64-bit values still quoted; integer KEYS stringified),
    Tuple as an array, LowCardinality transparent."""
    blocks = list(iter_jsoncompact_blocks(io.BytesIO(RECORDED_NESTED)))
    rb = blocks[0].to_record_batch()
    assert rb.column("m").to_pylist() == [[("a", 1), ("bb", 2)], []]
    assert rb.column("t").to_pylist() == [
        {"_1": 7, "_2": "x"},
        {"_1": -1, "_2": ""},
    ]
    assert rb.column("lc").to_pylist() == ["hello", "hello"]
    assert rb.column("mi").to_pylist() == [[(5, "v")], []]


def test_nested_roundtrip_json():
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.types import parse_type

    types = [
        parse_type("Map(String, Int64)"),
        parse_type("Tuple(Int64, String)"),
        parse_type("Map(Int64, Float64)"),
    ]
    m = pa.array(
        [[("k", 1)], [], [("a", -5), ("b", 7)]],
        type=pa.map_(pa.string(), pa.int64()),
    )
    t = pa.array(
        [{"_1": 1, "_2": "a"}, {"_1": 2, "_2": ""}, {"_1": -3, "_2": "z"}],
        type=pa.struct([("_1", pa.int64()), ("_2", pa.string())]),
    )
    mi = pa.array(
        [[(1, 0.5)], [(2, -1.25), (3, 4.0)], []],
        type=pa.map_(pa.int64(), pa.float64()),
    )
    batch = pa.RecordBatch.from_arrays([m, t, mi], names=["m", "t", "mi"])
    buf = io.BytesIO()
    write_jsoncompact(buf, [batch], types)
    buf.seek(0)
    out = list(iter_jsoncompact_blocks(buf))[0].to_record_batch()
    assert out.column("m").to_pylist() == m.to_pylist()
    assert out.column("t").to_pylist() == t.to_pylist()
    assert out.column("mi").to_pylist() == mi.to_pylist()
