"""FORMAT Values — the scan source's ninth wire format
(native/valuesformat.py).

Recorded-text decodes use hand-written wire literals (the transcript
discipline: quoting/escaping typed here byte-for-byte from the public
format docs, so a symmetric encode/decode bug cannot hide behind the
mock's shared writer).  Hostile cases: escaped and doubled single
quotes, backslash escapes, bare NULL vs quoted 'NULL', nan/inf floats,
whitespace and newlines between rows, a trailing semicolon (the
INSERT-statement spelling).
"""

from __future__ import annotations

import io
import math

import pytest
from hypothesis import given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.native.types import (
    UnsupportedTypeError,
    parse_type,
)
from duckdb_extension_clickhouse_native_spark.native.valuesformat import (
    iter_values_blocks,
    write_values,
)


def _nt(*pairs):
    return [(n, parse_type(t)) for n, t in pairs]


RECORDED = (
    b"(7,'a\\tb\\nc\\\\d',2.5,true),\n"
    b"(8,'',NULL,false) , (9,'it''s \\'fine\\'',nan,true),\n"
    b"(-10,'NULL',inf,false);"
)


def test_recorded_values_decode():
    nt = _nt(
        ("id", "Int64"),
        ("name", "String"),
        ("score", "Nullable(Float64)"),
        ("flag", "Bool"),
    )
    blocks = list(iter_values_blocks(io.BytesIO(RECORDED), nt))
    rb = blocks[0].to_record_batch()
    assert rb.column("id").to_pylist() == [7, 8, 9, -10]
    # \t \n \\ unescape; '' and \' both spell a single quote; a QUOTED
    # 'NULL' is the four-char string, only the bare keyword is SQL NULL
    assert rb.column("name").to_pylist() == [
        "a\tb\nc\\d",
        "",
        "it's 'fine'",
        "NULL",
    ]
    score = rb.column("score").to_pylist()
    assert score[0] == 2.5 and score[1] is None
    assert math.isnan(score[2]) and score[3] == float("inf")
    assert rb.column("flag").to_pylist() == [True, False, True, False]


def test_recorded_values_temporal_decimal_enum():
    nt = _nt(
        ("d", "Date"),
        ("ts", "DateTime64(6)"),
        ("dec", "Decimal(12, 4)"),
        ("e", "Enum8('lo' = -1, 'hi' = 2)"),
    )
    wire = (
        b"('2024-02-29','2024-02-29 23:59:59.000125','-12.3400','lo'),"
        b"('1970-01-01','1970-01-01 00:00:00.000000','0.0001','hi')"
    )
    rb = list(iter_values_blocks(io.BytesIO(wire), nt))[0].to_record_batch()
    import datetime as dt
    from decimal import Decimal

    assert rb.column("d").to_pylist() == [
        dt.date(2024, 2, 29),
        dt.date(1970, 1, 1),
    ]
    assert rb.column("ts").to_pylist()[0] == dt.datetime(
        2024, 2, 29, 23, 59, 59, 125
    )
    assert rb.column("dec").to_pylist() == [
        Decimal("-12.3400"),
        Decimal("0.0001"),
    ]
    assert rb.column("e").to_pylist() == ["lo", "hi"]


def test_ragged_row_rejected():
    nt = _nt(("a", "Int64"), ("b", "Int64"))
    with pytest.raises(ValueError, match="2 values|1 values"):
        list(iter_values_blocks(io.BytesIO(b"(1,2),(3)"), nt))


def test_unterminated_string_rejected():
    nt = _nt(("s", "String"))
    with pytest.raises(ValueError, match="unterminated"):
        list(iter_values_blocks(io.BytesIO(b"('abc"), nt))


def test_unsupported_type_names_native_path():
    nt = _nt(("a", "Array(Int64)"))
    with pytest.raises(UnsupportedTypeError, match="Native"):
        list(iter_values_blocks(io.BytesIO(b"([1,2])"), nt))


def test_empty_body_is_zero_rows():
    nt = _nt(("a", "Int64"))
    assert list(iter_values_blocks(io.BytesIO(b""), nt)) == []
    assert list(iter_values_blocks(io.BytesIO(b"  \n "), nt)) == []


def test_write_values_escaping_and_null():
    import pyarrow as pa

    batch = pa.record_batch(
        {
            "i": pa.array([1, None], type=pa.int64()),
            "s": pa.array(["it's\n\\x", "NULL"], type=pa.string()),
            "f": pa.array([float("nan"), 1.5], type=pa.float64()),
        }
    )
    buf = io.BytesIO()
    rows = write_values(buf, [batch])
    assert rows == 2
    text = buf.getvalue().decode()
    assert text == "(1,'it\\'s\\n\\\\x',nan),(NULL,'NULL',1.5)"


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.one_of(st.none(), st.text(max_size=40)),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, allow_infinity=True, width=64),
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_values_roundtrip(rows):
    import pyarrow as pa

    batch = pa.record_batch(
        {
            "i": pa.array([r[0] for r in rows], type=pa.int64()),
            "s": pa.array([r[1] for r in rows], type=pa.string()),
            "f": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )
    buf = io.BytesIO()
    write_values(buf, [batch])
    buf.seek(0)
    nt = _nt(
        ("i", "Int64"),
        ("s", "Nullable(String)"),
        ("f", "Nullable(Float64)"),
    )
    got = list(iter_values_blocks(buf, nt))
    assert len(got) == 1
    rb = got[0].to_record_batch()
    assert rb.column("i").to_pylist() == [r[0] for r in rows]
    assert rb.column("s").to_pylist() == [r[1] for r in rows]
    assert rb.column("f").to_pylist() == [r[2] for r in rows]


def test_values_insert_roundtrip(spark, mock_ch_server):
    """Writer path: df.write over wire_format=values lands rows the
    mock records (decoded from the literal-tuple body via the
    shape-inference fallback — the sink table does not exist)."""
    import pandas as pd

    url = mock_ch_server["url"]
    state = mock_ch_server["state"]
    before = len(state["inserted"])
    df = spark.createDataFrame(
        pd.DataFrame({"x": [10, 20], "name": ["it's", "a,b)c"]})
    ).coalesce(1)
    (
        df.write.format("clickhouse_scan")
        .option("table", "values_sink")
        .option("url", url)
        .option("wire_format", "values")
        .mode("append")
        .save()
    )
    new = state["inserted"][before:]
    assert new and new[0][0] == "values_sink"
    rows = []
    for _table, batches in new:
        for rb in batches:
            cols = [rb.column(i).to_pylist() for i in range(rb.num_columns)]
            rows.extend(zip(*cols))
    assert sorted(rows) == [(10, "it's"), (20, "a,b)c")]
