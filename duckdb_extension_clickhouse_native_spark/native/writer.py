"""ClickHouse Native file writer.

The reference is read-only (no writer exists in
/root/reference — SURVEY.md §2.1 'Sinks: none'); this writer is the
natural completion: it lets ``df.write.format("clickhouse_native")``
produce files ``clickhouse-local`` can read back, and generates all
of our round-trip test fixtures.
"""

from __future__ import annotations

import io
from typing import BinaryIO, Iterable, Optional

import pyarrow as pa

from .codec import write_block
from .types import CHType, from_arrow

DEFAULT_BLOCK_ROWS = 65_409  # clickhouse's default max_block_size


def _ch_types_for_schema(
    schema: pa.Schema, ch_types: Optional[list[CHType]] = None
) -> list[CHType]:
    if ch_types is not None:
        return ch_types
    # nullability is decided per block from actual null counts (ClickHouse
    # Nullable cannot wrap Array; arrays always write dense)
    return [from_arrow(f.type) for f in schema]


def write_native_stream(
    buf: BinaryIO,
    batches: Iterable[pa.RecordBatch],
    *,
    ch_types: Optional[list[CHType]] = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    schema: Optional[pa.Schema] = None,
) -> int:
    """Write record batches as Native blocks; returns rows written.

    An empty input with a known ``schema`` still writes one header-only
    0-row block (as ClickHouse itself does for empty results) so
    readers can recover the schema.
    """
    total = 0
    wrote_any = False
    types: Optional[list[CHType]] = ch_types
    for batch in batches:
        if types is None:
            types = _ch_types_for_schema(batch.schema)
        if batch.num_rows == 0 and not wrote_any:
            _write_block_with_nullable_names(buf, batch, types)
            wrote_any = True
            continue
        start = 0
        while start < batch.num_rows:
            piece = batch.slice(start, block_rows)
            _write_block_with_nullable_names(buf, piece, types)
            start += piece.num_rows
            total += piece.num_rows
            wrote_any = True
    if not wrote_any and schema is not None:
        types = types or _ch_types_for_schema(schema)
        empty = pa.RecordBatch.from_arrays(
            [pa.array([], type=f.type) for f in schema], schema=schema
        )
        _write_block_with_nullable_names(buf, empty, types)
    return total


def _write_block_with_nullable_names(
    buf: BinaryIO, batch: pa.RecordBatch, types: list[CHType]
) -> None:
    # codec.write_block owns the nullable/LowCardinality naming rules
    write_block(buf, batch, types)


def write_native_file(
    path: str,
    table: pa.Table | pa.RecordBatch,
    *,
    ch_types: Optional[list[CHType]] = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    compression: Optional[str] = None,
) -> int:
    """``compression``: None (plain Native), or 'lz4'/'zstd'/'none' to
    wrap the stream in ClickHouse compressed frames (compress.py)."""
    if isinstance(table, pa.RecordBatch):
        batches: list[pa.RecordBatch] = [table]
        schema = table.schema
    else:
        batches = table.to_batches(max_chunksize=block_rows)
        schema = table.schema
    types = _ch_types_for_schema(schema, ch_types)
    with open(path, "wb") as f:
        buf: BinaryIO = io.BufferedWriter(f, buffer_size=1 << 20)
        if compression is not None:
            from .compress import CompressedWriter

            comp = CompressedWriter(buf, method=compression)
            n = write_native_stream(
                comp, batches, ch_types=types, block_rows=block_rows, schema=schema
            )
            comp.flush()
        else:
            n = write_native_stream(
                buf, batches, ch_types=types, block_rows=block_rows, schema=schema
            )
        buf.flush()
    return n


def arrow_to_native_bytes(
    table: pa.Table | pa.RecordBatch,
    *,
    ch_types: Optional[list[CHType]] = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
) -> bytes:
    buf = io.BytesIO()
    if isinstance(table, pa.RecordBatch):
        batches = [table]
        schema = table.schema
    else:
        batches = table.to_batches(max_chunksize=block_rows)
        schema = table.schema
    types = _ch_types_for_schema(schema, ch_types)
    write_native_stream(buf, batches, ch_types=types, block_rows=block_rows, schema=schema)
    return buf.getvalue()
