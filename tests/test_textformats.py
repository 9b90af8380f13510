"""TabSeparatedWithNamesAndTypes + CSVWithNamesAndTypes — the scan
source's fourth and fifth wire formats (native/textformats.py).

Recorded-text decodes use hand-written wire literals (the transcript
discipline: escapes/quotes are typed here byte-for-byte from the
public format docs, so a symmetric encode/decode bug cannot hide
behind the mock's shared writer).  Hostile cases: tab/newline/
backslash inside strings, \\N vs "\\N" NULL disambiguation, quoted
newlines in CSV, NUL-padded FixedString, nan/inf floats.
"""

from __future__ import annotations

import io
import math

import pytest
from hypothesis import given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.native.textformats import (
    iter_csv_blocks,
    iter_tsv_blocks,
    write_csv,
    write_tsv,
)
from duckdb_extension_clickhouse_native_spark.native.types import (
    UnsupportedTypeError,
)

# -- recorded TSV (independent literals) ------------------------------------

RECORDED_TSV = (
    b"id\tname\tscore\tflag\n"
    b"UInt64\tString\tNullable(Float64)\tBool\n"
    b"7\ta\\tb\\nc\\\\d\t2.5\ttrue\n"
    b"8\t\t\\N\tfalse\n"
    b"9\t\\N\tnan\ttrue\n"  # the STRING field '\N'? no: unescaped \N IS NULL
)


def test_recorded_tsv_decode():
    blocks = list(iter_tsv_blocks(io.BytesIO(RECORDED_TSV)))
    rb = blocks[0].to_record_batch()
    assert rb.column("id").to_pylist() == [7, 8, 9]
    # \t \n \\ unescape inside the value; bare \N is NULL even for a
    # non-Nullable String column's wire text (server writes \N only for
    # Nullable, but the reader is permissive like the server's)
    assert rb.column("name").to_pylist() == ["a\tb\nc\\d", "", None]
    score = rb.column("score").to_pylist()
    assert score[0] == 2.5 and score[1] is None and math.isnan(score[2])
    assert rb.column("flag").to_pylist() == [True, False, True]


def test_recorded_tsv_escaped_backslash_N_is_string():
    # \\N on the wire = escaped backslash + N = the two-char string
    wire = b"s\nString\n\\\\N\n"
    rb = list(iter_tsv_blocks(io.BytesIO(wire)))[0].to_record_batch()
    assert rb.column("s").to_pylist() == ["\\N"]


RECORDED_TSV_TEMPORAL = (
    b"d\tdt\tdt64\tdec\te\n"
    b"Date\tDateTime\tDateTime64(3)\tDecimal(10, 2)\t"
    b"Enum8('red' = 1, 'blue' = 2)\n"
    b"2024-03-05\t2024-03-05 06:07:08\t2024-03-05 06:07:08.250\t"
    b"12.34\tred\n"
)


def test_recorded_tsv_temporal_decimal_enum():
    import datetime as dt
    from decimal import Decimal

    rb = list(iter_tsv_blocks(io.BytesIO(RECORDED_TSV_TEMPORAL)))[0].to_record_batch()
    assert rb.column("d").to_pylist() == [dt.date(2024, 3, 5)]
    ts = rb.column("dt").to_pylist()[0]
    assert (ts.year, ts.hour, ts.second) == (2024, 6, 8)
    ts64 = rb.column("dt64").to_pylist()[0]
    assert ts64.microsecond == 250_000
    assert rb.column("dec").to_pylist() == [Decimal("12.34")]
    assert rb.column("e").to_pylist() == ["red"]


# -- recorded CSV -----------------------------------------------------------

RECORDED_CSV = (
    b'"id","name","score","flag"\n'
    b'"UInt64","String","Nullable(Float64)","Bool"\n'
    b'7,"with ""quotes"" and, comma",2.5,true\n'
    b'8,"multi\nline",\\N,false\n'
    b'9,"\\N",-inf,true\n'  # QUOTED "\N" is the 2-char string, not NULL
)


def test_recorded_csv_decode():
    blocks = list(iter_csv_blocks(io.BytesIO(RECORDED_CSV)))
    rb = blocks[0].to_record_batch()
    assert rb.column("id").to_pylist() == [7, 8, 9]
    assert rb.column("name").to_pylist() == [
        'with "quotes" and, comma',
        "multi\nline",
        "\\N",
    ]
    score = rb.column("score").to_pylist()
    assert score[0] == 2.5 and score[1] is None
    assert score[2] == float("-inf")
    assert rb.column("flag").to_pylist() == [True, False, True]


def test_csv_unquoted_strings_accepted():
    wire = b'"s","n"\n"String","Int32"\nplain,5\n'
    rb = list(iter_csv_blocks(io.BytesIO(wire)))[0].to_record_batch()
    assert rb.column("s").to_pylist() == ["plain"]
    assert rb.column("n").to_pylist() == [5]


# -- shared semantics -------------------------------------------------------


def test_unsupported_type_names_native_path():
    wire = b"a\nArray(Int32)\n[1,2]\n"
    with pytest.raises(UnsupportedTypeError, match="FORMAT Native"):
        list(iter_tsv_blocks(io.BytesIO(wire)))
    wire_csv = b'"a"\n"Map(String, Int32)"\n"{}"\n'
    with pytest.raises(UnsupportedTypeError, match="FORMAT Native"):
        list(iter_csv_blocks(io.BytesIO(wire_csv)))


def test_ragged_rows_rejected():
    with pytest.raises(ValueError, match="declares"):
        list(iter_tsv_blocks(io.BytesIO(b"a\tb\nInt32\tInt32\n1\n")))
    with pytest.raises(ValueError, match="declares"):
        list(iter_csv_blocks(io.BytesIO(b'"a","b"\n"Int32","Int32"\n1\n')))


def test_truncated_header_raises_eof():
    with pytest.raises(EOFError, match="header"):
        list(iter_tsv_blocks(io.BytesIO(b"a\n")))
    with pytest.raises(EOFError, match="header"):
        list(iter_csv_blocks(io.BytesIO(b'"a"\n')))


def test_trailing_blank_line_tolerated():
    rb = list(iter_tsv_blocks(io.BytesIO(b"a\nInt32\n1\n\n")))[0].to_record_batch()
    assert rb.column("a").to_pylist() == [1]
    rb = list(iter_csv_blocks(io.BytesIO(b'"a"\n"Int32"\n1\n\n')))[0].to_record_batch()
    assert rb.column("a").to_pylist() == [1]


def test_lossy_uint64_wraps_like_native():
    big = 2**63 + 5
    wire = f"x\nUInt64\n{big}\n".encode()
    rb = list(iter_tsv_blocks(io.BytesIO(wire), lossy_uint64=True))[0].to_record_batch()
    # the reference's i32 wrap (lib.rs:336-344)
    assert rb.column("x").to_pylist() == [((big & 0xFFFFFFFF) ^ 0x80000000) - 0x80000000]


# -- round trips ------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(-(2**31), 2**31 - 1),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), min_codepoint=0, max_codepoint=0x2FF
                ),
                max_size=12,
            ),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, width=64),
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_roundtrip_property(rows):
    import pyarrow as pa

    rb = pa.RecordBatch.from_arrays(
        [
            pa.array([r[0] for r in rows], type=pa.int32()),
            pa.array([r[1] for r in rows], type=pa.string()),
            pa.array([r[2] for r in rows], type=pa.float64()),
        ],
        names=["i", "s", "f"],
    )
    for writer, reader in ((write_tsv, iter_tsv_blocks), (write_csv, iter_csv_blocks)):
        buf = io.BytesIO()
        writer(buf, [rb])
        buf.seek(0)
        out = list(reader(buf))[0].to_record_batch()
        assert out.column("i").to_pylist() == [r[0] for r in rows]
        assert out.column("s").to_pylist() == [r[1] for r in rows]
        assert out.column("f").to_pylist() == [r[2] for r in rows]


def test_roundtrip_denormals_and_hostile_strings():
    import pyarrow as pa

    strings = ["tab\there", "nl\nhere", "back\\slash", '"q,uo"te"', "\\N", ""]
    floats = [float("nan"), float("inf"), float("-inf"), 0.1, -0.0, 1e300]
    n = max(len(strings), len(floats))
    strings += [""] * (n - len(strings))
    floats += [0.0] * (n - len(floats))
    rb = pa.RecordBatch.from_arrays(
        [pa.array(strings), pa.array(floats)], names=["s", "f"]
    )
    for writer, reader in ((write_tsv, iter_tsv_blocks), (write_csv, iter_csv_blocks)):
        buf = io.BytesIO()
        writer(buf, [rb])
        buf.seek(0)
        out = list(reader(buf))[0].to_record_batch()
        assert out.column("s").to_pylist() == strings
        got_f = out.column("f").to_pylist()
        for g, e in zip(got_f, floats):
            assert (math.isnan(g) and math.isnan(e)) or g == e


# -- Spark end-to-end (mock server) -----------------------------------------


def test_scan_textformats_match_native(spark, mock_ch_server):
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
    assert {tuple(r) for r in load("tsv").collect()} == native
    assert {tuple(r) for r in load("csv").collect()} == native
    assert len(native) == 50


def test_textformats_require_http():
    from duckdb_extension_clickhouse_native_spark.sources.scan_datasource import (
        ClickHouseScanReader,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    for fmt in ("tsv", "csv"):
        with pytest.raises(ValueError, match="http"):
            ClickHouseScanReader(
                StructType([StructField("x", LongType())]),
                {"query": "SELECT 1", "url": "tcp://h:9000", "wire_format": fmt},
            )


def test_textformat_insert_roundtrip(spark, mock_ch_server):
    """Writer path: df.write over wire_format=tsv/csv lands rows the
    mock records (decoded from the text body)."""
    import pandas as pd

    url = mock_ch_server["url"]
    state = mock_ch_server["state"]
    for fmt, sink in (("tsv", "tsv_sink"), ("csv", "csv_sink")):
        before = len(state["inserted"])
        df = spark.createDataFrame(
            pd.DataFrame({"x": [10, 20], "name": ["a\tb", 'c"d']})
        ).coalesce(1)
        (
            df.write.format("clickhouse_scan")
            .option("table", sink)
            .option("url", url)
            .option("wire_format", fmt)
            .mode("append")
            .save()
        )
        new = state["inserted"][before:]
        assert new and new[0][0] == sink
        rows = []
        for _table, batches in new:
            for rb in batches:
                rows.extend(
                    zip(rb.column("x").to_pylist(), rb.column("name").to_pylist())
                )
        assert sorted(rows) == [(10, "a\tb"), (20, 'c"d')]
