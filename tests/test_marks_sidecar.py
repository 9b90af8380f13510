"""String-marks sidecar (native/marks.py, the ClickHouse .mrk
analogue) and the vectorized string wire encoder: byte-identity with
the row-loop paths on hostile boundary lengths, decode/skip identity
with and without marks, and the staleness guards (file-size check,
rows check, per-prefix verification with streaming fallback)."""

from __future__ import annotations

import io
import os

import numpy as np
import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.native.codec import (
    _decode_strings_from_lengths,
    _strings_wire_bytes,
    iter_blocks,
    read_file_schema,
    varint_widths,
    write_str,
)
from duckdb_extension_clickhouse_native_spark.native.marks import (
    MarksReader,
    MarksRecorder,
    marks_sidecar_path,
)
from duckdb_extension_clickhouse_native_spark.native.types import parse_type
from duckdb_extension_clickhouse_native_spark.native.writer import (
    write_native_file,
)

# lengths straddling every varint prefix-width boundary, plus empties,
# multi-byte UTF-8 and embedded NULs
HOSTILE = [
    "",
    "a",
    "x" * 126,
    "x" * 127,
    "y" * 128,
    "y" * 129,
    "é" * 64,  # 2-byte UTF-8: byte length 128 (2-byte prefix)
    "∑" * 100,  # 3-byte UTF-8
    "w" * 16383,
    "w" * 16384,
    "mid\x00null",
    "q" * 300,
    "",
]


def _row_loop_bytes(arr: pa.Array) -> bytes:
    buf = io.BytesIO()
    for v in arr:
        if isinstance(v, pa.BinaryScalar) and not isinstance(v, pa.StringScalar):
            write_str(buf, v.as_py() if v.is_valid else b"")
        else:
            write_str(buf, v.as_py() if v.is_valid else "")
    return buf.getvalue()


def test_vectorized_encoder_byte_identity_hostile():
    arr = pa.array(HOSTILE, type=pa.string())
    assert _strings_wire_bytes(arr) == _row_loop_bytes(arr)


def test_vectorized_encoder_large_string_and_binary():
    arr = pa.array(HOSTILE, type=pa.large_string())
    assert _strings_wire_bytes(arr) == _row_loop_bytes(arr)
    barr = pa.array([b"", b"\x00\xff" * 70, b"abc", b"z" * 16500], type=pa.binary())
    assert _strings_wire_bytes(barr) == _row_loop_bytes(barr)


def test_vectorized_encoder_sliced_array():
    arr = pa.array(HOSTILE, type=pa.string()).slice(3, 7)
    assert _strings_wire_bytes(arr) == _row_loop_bytes(arr)


def test_varint_widths_boundaries():
    lens = np.array([0, 127, 128, 16383, 16384, (1 << 21) - 1, 1 << 21], dtype=np.int64)
    assert varint_widths(lens).tolist() == [1, 1, 2, 2, 3, 3, 4]


def _write_fixture(tmp_path, rows=5000, block_rows=1024):
    p = os.path.join(str(tmp_path), "part-000.clickhouse")
    t = pa.table(
        {
            "id": pa.array(np.arange(rows, dtype=np.int64)),
            "txt": pa.array(
                [f"doc-{i % 11}-" + "x" * (i % 197) for i in range(rows)]
            ),
            "maybe": pa.array(
                [None if i % 7 == 0 else f"m{i}" for i in range(rows)]
            ),
        }
    )
    write_native_file(p, t, block_rows=block_rows)
    return p


def _decode_all(p, marks=None, columns=None):
    with open(p, "rb") as f:
        return [
            b.to_record_batch()
            for b in iter_blocks(f, columns=columns, marks_reader=marks)
        ]


def test_marks_written_and_decode_identity(tmp_path):
    p = _write_fixture(tmp_path)
    assert os.path.exists(marks_sidecar_path(p))
    mr = MarksReader.open(p)
    assert mr is not None
    with_marks = _decode_all(p, marks=mr)
    without = _decode_all(p)
    assert len(with_marks) == len(without) > 1
    for a, b in zip(with_marks, without):
        assert a.equals(b)


def test_marks_skip_projection_identity(tmp_path):
    p = _write_fixture(tmp_path)
    mr = MarksReader.open(p)
    with_marks = _decode_all(p, marks=mr, columns={"id"})
    without = _decode_all(p, columns={"id"})
    for a, b in zip(with_marks, without):
        assert a.equals(b)
        assert a.schema.names == ["id"]


def test_nullable_column_marks_decode_identity(tmp_path):
    # 'maybe' has nulls in every block -> recorded as Nullable(String)
    # wire marks (flag "n"); decode via the marks reader must agree
    # column-for-column, nulls included
    p = _write_fixture(tmp_path)
    mr = MarksReader.open(p)
    info = mr.block_at(0).col("maybe", 1024)
    assert info is not None and info[2] is True  # nullable wire flag
    with_marks = _decode_all(p, marks=mr)
    without = _decode_all(p)
    for a, b in zip(with_marks, without):
        assert a.column(2).equals(b.column(2))
        assert a.column(2).null_count > 0


def test_nullable_marks_skip_is_seek_and_identity(tmp_path):
    # projecting away the nullable string column goes through the
    # marks seek (wire bytes include the null mask) — the following
    # columns must still decode correctly
    rows = 2000
    p = os.path.join(str(tmp_path), "part-n.clickhouse")
    t = pa.table(
        {
            "m": pa.array(
                [
                    None if i % 5 == 0 else f"val-{i}-" + "z" * (i % 200)
                    for i in range(rows)
                ]
            ),
            "k": pa.array(np.arange(rows, dtype=np.int64)),
        }
    )
    write_native_file(p, t, block_rows=512)
    mr = MarksReader.open(p)
    assert mr is not None
    with_marks = _decode_all(p, marks=mr, columns={"k"})
    without = _decode_all(p, columns={"k"})
    for a, b in zip(with_marks, without):
        assert a.equals(b)
        assert a.schema.names == ["k"]


def test_stale_nullable_marks_fall_back(tmp_path):
    # corrupt a nullable column's recorded lengths: verification must
    # reject, restore the stream (mask bytes included) and the
    # streaming decode must produce the true rows
    rows = 256
    p = os.path.join(str(tmp_path), "part-sn.clickhouse")
    t = pa.table(
        {
            "m": pa.array(
                [None if i % 3 == 0 else f"x{i}" * (1 + i % 4) for i in range(rows)]
            )
        }
    )
    write_native_file(p, t, block_rows=rows)
    mr = MarksReader.open(p)
    lens = np.frombuffer(mr._lens, dtype="<u4").copy()
    nz = np.nonzero(lens)[0]
    assert lens[nz[0]] != lens[nz[1]]
    lens[nz[0]], lens[nz[1]] = lens[nz[1]], lens[nz[0]]
    mr._lens = lens.tobytes()
    corrupted = _decode_all(p, marks=mr)
    truth = _decode_all(p)
    for a, b in zip(corrupted, truth):
        assert a.equals(b)


def test_decode_from_lengths_short_stream_degrades():
    # a stale sidecar claiming more bytes than the stream holds must
    # return None with everything restored, not raise EOFError
    arr = pa.array(["abc", "defg"], type=pa.string())
    wire = _strings_wire_bytes(arr)
    buf = io.BytesIO(wire)
    huge = np.array([1000, 2000], dtype="<u4")
    out = _decode_strings_from_lengths(buf, 2, huge, scrub=False)
    assert out is None
    assert buf.read() == wire


def test_stale_marks_file_size_mismatch_refused(tmp_path):
    p = _write_fixture(tmp_path)
    with open(p, "ab") as f:
        f.write(b"")  # size unchanged -> still accepted
    assert MarksReader.open(p) is not None
    saved = open(marks_sidecar_path(p), "rb").read()
    _write_fixture(tmp_path, rows=4999)  # rewrites data, different size
    with open(marks_sidecar_path(p), "wb") as f:
        f.write(saved)
    assert MarksReader.open(p) is None  # file_bytes guard


def test_stale_marks_wrong_lengths_fall_back(tmp_path):
    """Same file size, same block offsets, but per-row lengths swapped
    between rows: the prefix verification must reject the marks and the
    streaming decode must produce the true values."""
    p = _write_fixture(tmp_path, rows=512, block_rows=512)
    mr = MarksReader.open(p)
    # corrupt the in-memory lens region: swap two entries of different
    # length (keeps totals equal so the wire size still matches)
    lens = np.frombuffer(mr._lens, dtype="<u4").copy()
    assert lens[1] != lens[2]
    lens[1], lens[2] = lens[2], lens[1]
    mr._lens = lens.tobytes()
    corrupted = _decode_all(p, marks=mr)
    truth = _decode_all(p)
    for a, b in zip(corrupted, truth):
        assert a.equals(b)  # fallback produced the true rows


def test_decode_from_lengths_restores_stream_on_mismatch():
    arr = pa.array(["abc", "defg", "hi"], type=pa.string())
    wire = _strings_wire_bytes(arr)
    buf = io.BytesIO(wire + b"TAIL")
    bad = np.array([4, 3, 2], dtype="<u4")  # swapped lengths
    out = _decode_strings_from_lengths(buf, 3, bad, scrub=False)
    assert out is None
    assert buf.read() == wire + b"TAIL"  # fully pushed back


def test_scrub_through_marks_path(tmp_path):
    p = os.path.join(str(tmp_path), "part-000.clickhouse")
    vals = ["clean", "nul\x00inside", "ok"]
    write_native_file(p, pa.table({"s": pa.array(vals)}), block_rows=10)
    mr = MarksReader.open(p)
    assert mr is not None
    with open(p, "rb") as f:
        blks = list(iter_blocks(f, marks_reader=mr, scrub_strings=True))
    got = blks[0].to_record_batch().column(0).to_pylist()
    assert got == ["clean", "nulinside", "ok"]


def test_read_file_schema_uses_marks_seek(tmp_path):
    p = _write_fixture(tmp_path)
    schema = read_file_schema(p)
    assert [n for n, _ in schema] == ["id", "txt", "maybe"]


def test_spark_scan_identity_with_marks(spark, tmp_path):
    """End-to-end through the DataSource: a marked directory scans to
    the same rows as the same data with the sidecars deleted."""
    import shutil

    d1 = os.path.join(str(tmp_path), "marked")
    os.makedirs(d1)
    rows = 4000
    t = pa.table(
        {
            "k": pa.array(np.arange(rows, dtype=np.int64)),
            "s": pa.array([f"v-{i % 13}-" + "y" * (i % 151) for i in range(rows)]),
        }
    )
    for i in range(4):
        write_native_file(
            os.path.join(d1, f"part-{i:03d}.clickhouse"),
            t.slice(i * 1000, 1000),
            block_rows=300,
        )
    d2 = os.path.join(str(tmp_path), "bare")
    shutil.copytree(d1, d2)
    for fn in os.listdir(d2):
        if fn.endswith(".marks"):
            os.remove(os.path.join(d2, fn))
    a = spark.read.format("clickhouse_native").load(d1)
    b = spark.read.format("clickhouse_native").load(d2)
    assert sorted(a.collect()) == sorted(b.collect())
    # projection (skip path) and a pushed string filter (prewhere path)
    assert sorted(a.select("k").collect()) == sorted(b.select("k").collect())
    fa = a.filter("s = 'v-1-y'").count()
    fb = b.filter("s = 'v-1-y'").count()
    assert fa == fb


def test_sink_writes_marks(spark, tmp_path):
    out = os.path.join(str(tmp_path), "sink-out")
    df = spark.range(2000).selectExpr(
        "id", "concat('row-', cast(id % 17 as string)) AS label"
    )
    df.coalesce(1).write.format("clickhouse_native").mode("overwrite").save(out)
    marks = [f for f in os.listdir(out) if f.endswith(".marks")]
    assert marks, "sink did not write a marks sidecar"
    back = spark.read.format("clickhouse_native").load(out)
    assert back.count() == 2000
    assert back.selectExpr("sum(length(label))").collect()[0][0] == df.selectExpr(
        "sum(length(label))"
    ).collect()[0][0]


def test_recorder_skips_compressed_sink():
    rec = MarksRecorder()
    rec.set_ch_types(["s"], [parse_type("String")])
    rec.on_block(-1, pa.record_batch([pa.array(["a"])], names=["s"]))
    assert rec.disabled
    assert rec.write("/nonexistent") is None


def test_compressed_file_has_no_marks(tmp_path):
    p = os.path.join(str(tmp_path), "part-c.clickhouse")
    write_native_file(
        p, pa.table({"s": pa.array(["a", "bb", "ccc"])}), compression="lz4"
    )
    assert not os.path.exists(marks_sidecar_path(p))
    assert MarksReader.open(p) is None
