"""Randomized cross-format differential: hypothesis generates small
typed tables (random schema shapes over the shared scalar matrix,
random NULL placement, hostile strings), writes them through EVERY
wire codec's write half, reads them back with the matching read half,
and requires bit-identical values — the randomized complement of the
fixed hostile matrix in test_wire_format_matrix.py.

Native is included via arrow_to_native_bytes/iter_blocks, so this
also fuzzes the round-9 recursive nullability promotion.
"""

from __future__ import annotations

import io
import math

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.native.codec import iter_blocks
from duckdb_extension_clickhouse_native_spark.native.jsoneachrow import (
    iter_jsoncompact_blocks,
    write_jsoncompact,
)
from duckdb_extension_clickhouse_native_spark.native.rowbinary import (
    iter_rowbinary_blocks,
    write_rowbinary,
)
from duckdb_extension_clickhouse_native_spark.native.textformats import (
    iter_csv_blocks,
    iter_tsv_blocks,
    write_csv,
    write_tsv,
)
from duckdb_extension_clickhouse_native_spark.native.writer import (
    arrow_to_native_bytes,
)

# column kind -> (arrow type, value strategy)
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=10,
)
_KINDS = {
    "i32": (pa.int32(), st.integers(-(2**31), 2**31 - 1)),
    "i64": (pa.int64(), st.integers(-(2**63), 2**63 - 1)),
    "f64": (pa.float64(), st.floats(width=64, allow_nan=False)),
    "str": (pa.string(), _TEXT),
    "bool": (pa.bool_(), st.booleans()),
    "date": (pa.date32(), st.integers(-30000, 30000)),
}


@st.composite
def _tables(draw):
    kinds = draw(
        st.lists(st.sampled_from(sorted(_KINDS)), min_size=1, max_size=4)
    )
    n = draw(st.integers(min_value=1, max_value=12))
    arrays, names = [], []
    for idx, kind in enumerate(kinds):
        typ, vals = _KINDS[kind]
        nullable = draw(st.booleans())
        col = [
            None if (nullable and draw(st.booleans())) else draw(vals)
            for _ in range(n)
        ]
        arrays.append(pa.array(col, type=typ))
        names.append(f"c{idx}_{kind}")
    return pa.RecordBatch.from_arrays(arrays, names=names)


def _values(rb: pa.RecordBatch):
    def nv(x):
        if isinstance(x, float) and math.isnan(x):
            return "NaN"
        return x

    return [[nv(v) for v in rb.column(i).to_pylist()] for i in range(rb.num_columns)]


def _native_roundtrip(batch):
    data = arrow_to_native_bytes(pa.Table.from_batches([batch]))
    blocks = list(iter_blocks(io.BytesIO(data)))
    return pa.Table.from_batches([b.to_record_batch() for b in blocks]).combine_chunks()


_FORMATS = [
    ("native", None, None),
    ("rowbinary", write_rowbinary, iter_rowbinary_blocks),
    ("jsoneachrow", write_jsoncompact, iter_jsoncompact_blocks),
    ("tsv", write_tsv, iter_tsv_blocks),
    ("csv", write_csv, iter_csv_blocks),
]


@settings(max_examples=60, deadline=None)
@given(batch=_tables())
def test_five_formats_roundtrip_random_tables(batch):
    expected = _values(batch)
    for name, writer, reader in _FORMATS:
        if name == "native":
            out = _native_roundtrip(batch)
            got = [
                [
                    "NaN" if isinstance(v, float) and math.isnan(v) else v
                    for v in out.column(i).to_pylist()
                ]
                for i in range(out.num_columns)
            ]
        else:
            buf = io.BytesIO()
            writer(buf, [batch])
            buf.seek(0)
            rb = list(reader(buf))[0].to_record_batch()
            got = _values(rb)
        # date32 comes back as datetime.date from some codecs and as
        # day-int from others' intermediate — normalize via arrow cast
        norm_exp, norm_got = [], []
        for i in range(batch.num_columns):
            t = batch.schema.field(i).type
            if pa.types.is_date32(t):
                norm = lambda col: [
                    v.toordinal() - 719163 if hasattr(v, "toordinal") else v
                    for v in col
                ]
                norm_exp.append(norm(expected[i]))
                norm_got.append(norm(got[i]))
            else:
                norm_exp.append(expected[i])
                norm_got.append(got[i])
        assert norm_got == norm_exp, name
