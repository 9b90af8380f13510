"""FORMAT Avro (r15, native/avroformat.py): Object Container File
reader + writer.  The reader is additionally pinned against a
HAND-BUILT byte fixture written from the Avro spec itself (zigzag
varints, block framing, union indices) — independent of the writer."""

from __future__ import annotations

import datetime
import io
import json
import struct
import zlib

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.native.avroformat import (
    _read_long,
    _write_long,
    iter_avro_blocks,
    write_avro,
)
from duckdb_extension_clickhouse_native_spark.native.types import (
    UnsupportedTypeError,
)


def test_zigzag_varint_spec_values():
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04
    for n, enc in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                   (-2, b"\x03"), (2, b"\x04"), (64, b"\x80\x01")]:
        b = io.BytesIO()
        _write_long(b, n)
        assert b.getvalue() == enc, n
        assert _read_long(io.BytesIO(enc)) == n


def _zz(n: int) -> bytes:
    b = io.BytesIO()
    _write_long(b, n)
    return b.getvalue()


def _avro_str(s: str) -> bytes:
    raw = s.encode()
    return _zz(len(raw)) + raw


def _hand_built_ocf(codec=b"null") -> bytes:
    """An OCF written from the SPEC, byte by byte: record of
    (id long, name [null,string], score double), 2 rows."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
        ],
    }
    out = io.BytesIO()
    out.write(b"Obj\x01")
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec,
    }
    out.write(_zz(len(meta)))
    for k, v in meta.items():
        out.write(_avro_str(k))
        out.write(_zz(len(v)) + v)
    out.write(_zz(0))
    sync = bytes(range(16))
    out.write(sync)
    payload = (
        _zz(7) + _zz(1) + _avro_str("alpha") + struct.pack("<d", 1.5)
        + _zz(-3) + _zz(0) + struct.pack("<d", -2.25)
    )
    if codec == b"deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate
    out.write(_zz(2))  # row count
    out.write(_zz(len(payload)))
    out.write(payload)
    out.write(sync)
    return out.getvalue()


def test_reader_against_hand_built_spec_bytes():
    blocks = list(iter_avro_blocks(io.BytesIO(_hand_built_ocf())))
    t = pa.Table.from_batches([b.to_record_batch() for b in blocks])
    assert t.to_pylist() == [
        {"id": 7, "name": "alpha", "score": 1.5},
        {"id": -3, "name": None, "score": -2.25},
    ]


def test_reader_deflate_codec():
    blocks = list(
        iter_avro_blocks(io.BytesIO(_hand_built_ocf(b"deflate")))
    )
    t = pa.Table.from_batches([b.to_record_batch() for b in blocks])
    assert t.column("id").to_pylist() == [7, -3]


def test_snappy_refuses_by_name():
    with pytest.raises(UnsupportedTypeError, match="snappy"):
        list(iter_avro_blocks(io.BytesIO(_hand_built_ocf(b"snappy"))))


def test_bad_magic_and_sync():
    with pytest.raises(ValueError, match="magic"):
        list(iter_avro_blocks(io.BytesIO(b"PK\x03\x04rest")))
    raw = bytearray(_hand_built_ocf())
    raw[-1] ^= 0xFF  # corrupt the trailing sync
    with pytest.raises(ValueError, match="sync"):
        list(iter_avro_blocks(io.BytesIO(bytes(raw))))


def test_general_union_refuses():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "u", "type": ["int", "string"]}],
    }
    out = io.BytesIO()
    out.write(b"Obj\x01")
    out.write(_zz(1))
    out.write(_avro_str("avro.schema"))
    enc = json.dumps(schema).encode()
    out.write(_zz(len(enc)) + enc)
    out.write(_zz(0))
    out.write(bytes(16))
    with pytest.raises(UnsupportedTypeError, match="union"):
        list(iter_avro_blocks(io.BytesIO(out.getvalue())))


def test_writer_reader_roundtrip_rich_types():
    batch = pa.record_batch(
        {
            "i": pa.array([1, None], type=pa.int64()),
            "s": pa.array(["x", None]),
            "d": pa.array([datetime.date(2024, 6, 1)] * 2, pa.date32()),
            "ts": pa.array(
                [datetime.datetime(2024, 6, 1, 12, 0, 0, 250000)] * 2,
                pa.timestamp("us"),
            ),
            "dec": pa.array(
                [None, __import__("decimal").Decimal("123.45")],
                pa.decimal128(10, 2),
            ),
            "arr": pa.array([[1, 2], []], pa.list_(pa.int64())),
            "m": pa.array(
                [{"a": 1.5}, {}], pa.map_(pa.string(), pa.float64())
            ),
        }
    )
    buf = io.BytesIO()
    assert write_avro(buf, [batch]) == 2
    blocks = list(iter_avro_blocks(io.BytesIO(buf.getvalue())))
    t = pa.Table.from_batches([b.to_record_batch() for b in blocks])
    got = t.to_pylist()
    assert got[0]["i"] == 1 and got[1]["i"] is None
    assert got[0]["d"] == datetime.date(2024, 6, 1)
    assert got[0]["ts"].microsecond == 250000
    assert got[1]["dec"] == __import__("decimal").Decimal("123.45")
    assert got[0]["arr"] == [1, 2] and got[0]["m"] == [("a", 1.5)]


def test_nested_record_decodes_as_named_struct():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {
                "name": "who",
                "type": {
                    "type": "record",
                    "name": "person",
                    "fields": [
                        {"name": "age", "type": "int"},
                        {"name": "tag", "type": "string"},
                    ],
                },
            }
        ],
    }
    out = io.BytesIO()
    out.write(b"Obj\x01")
    out.write(_zz(1))
    out.write(_avro_str("avro.schema"))
    enc = json.dumps(schema).encode()
    out.write(_zz(len(enc)) + enc)
    out.write(_zz(0))
    sync = bytes(16)
    out.write(sync)
    payload = _zz(33) + _avro_str("bob")
    out.write(_zz(1) + _zz(len(payload)) + payload + sync)
    blocks = list(iter_avro_blocks(io.BytesIO(out.getvalue())))
    t = pa.Table.from_batches([b.to_record_batch() for b in blocks])
    assert t.to_pylist() == [{"who": {"age": 33, "tag": "bob"}}]


def test_file_table_avro_and_outfile_roundtrip(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.operators.outfile import (
        into_outfile,
    )
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        file_table,
    )

    df = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", None)], "k long, s string, f double"
    )
    path = str(tmp_path / "x.avro")
    into_outfile(df, path, "avro", truncate=True)
    with open(path, "rb") as f:
        assert f.read(4) == b"Obj\x01"
    back = file_table(spark, path, "Avro")
    assert sorted(map(tuple, back.collect())) == [
        (1, "a", 0.5),
        (2, "b", None),
    ]
