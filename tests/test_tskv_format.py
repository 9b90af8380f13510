"""FORMAT TSKV — the scan source's tenth wire format
(native/textformats.py TSKV section). Recorded-literal transcripts
per the transcript discipline; hostile cases: '=' inside values and
ESCAPED '=' inside names, tab/newline escapes, \\N vs missing keys,
unknown-key skipping, shuffled field order."""

from __future__ import annotations

import io

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.native.textformats import (
    iter_tskv_blocks,
    write_tskv,
)
from duckdb_extension_clickhouse_native_spark.native.types import parse_type


def _nt(*pairs):
    return [(n, parse_type(t)) for n, t in pairs]


RECORDED = (
    b"id=7\tname=a\\tb=c\tscore=2.5\n"
    b"score=\\N\tid=8\tname=\n"  # shuffled order; explicit NULL; empty string
    b"id=9\textra=zzz\n"  # missing name/score -> NULL; unknown key skipped
)


def test_recorded_tskv_decode():
    nt = _nt(
        ("id", "Int64"),
        ("name", "Nullable(String)"),
        ("score", "Nullable(Float64)"),
    )
    rb = list(iter_tskv_blocks(io.BytesIO(RECORDED), nt))[0].to_record_batch()
    assert rb.column("id").to_pylist() == [7, 8, 9]
    # value '=' needs no escaping: split happens at the FIRST '='
    assert rb.column("name").to_pylist() == ["a\tb=c", "", None]
    assert rb.column("score").to_pylist() == [2.5, None, None]


def test_escaped_equals_in_name():
    nt = _nt(("a=b", "Int64"),)
    rb = list(
        iter_tskv_blocks(io.BytesIO(b"a\\=b=42\n"), nt)
    )[0].to_record_batch()
    assert rb.column("a=b").to_pylist() == [42]


def test_field_without_equals_rejected():
    nt = _nt(("a", "Int64"),)
    with pytest.raises(ValueError, match="without '='"):
        list(iter_tskv_blocks(io.BytesIO(b"novalue\n"), nt))


def test_write_tskv_escapes_name_and_value():
    batch = pa.record_batch(
        {
            "k=x": pa.array([1], type=pa.int64()),
            "s": pa.array(["a\tb\nc"]),
        }
    )
    buf = io.BytesIO()
    assert write_tskv(buf, [batch]) == 1
    assert buf.getvalue() == b"k\\=x=1\ts=a\\tb\\nc\n"


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.one_of(st.none(), st.text(max_size=30)),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_tskv_roundtrip(rows):
    batch = pa.record_batch(
        {
            "i": pa.array([r[0] for r in rows], type=pa.int64()),
            "s": pa.array([r[1] for r in rows], type=pa.string()),
        }
    )
    buf = io.BytesIO()
    write_tskv(buf, [batch])
    buf.seek(0)
    nt = _nt(("i", "Int64"), ("s", "Nullable(String)"))
    rb = list(iter_tskv_blocks(buf, nt))[0].to_record_batch()
    assert rb.column("i").to_pylist() == [r[0] for r in rows]
    assert rb.column("s").to_pylist() == [r[1] for r in rows]


def test_tskv_insert_roundtrip(spark, mock_ch_server):
    import pandas as pd

    url = mock_ch_server["url"]
    state = mock_ch_server["state"]
    before = len(state["inserted"])
    df = spark.createDataFrame(
        pd.DataFrame({"x": [1, 2], "name": ["k=v", "a\tb"]})
    ).coalesce(1)
    (
        df.write.format("clickhouse_scan")
        .option("table", "tskv_sink")
        .option("url", url)
        .option("wire_format", "tskv")
        .mode("append")
        .save()
    )
    new = state["inserted"][before:]
    assert new and new[0][0] == "tskv_sink"
    rows = []
    for _t, batches in new:
        for rb in batches:
            names = rb.schema.names
            xi, ni = names.index("x"), names.index("name")
            rows.extend(
                zip(rb.column(xi).to_pylist(), rb.column(ni).to_pylist())
            )
    assert sorted(rows) == [(1, "k=v"), (2, "a\tb")]
