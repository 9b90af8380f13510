"""ClickHouse Native file writer.

The reference is read-only (no writer exists in
/root/reference — SURVEY.md §2.1 'Sinks: none'); this writer is the
natural completion: it lets ``df.write.format("clickhouse_native")``
produce files ``clickhouse-local`` can read back, and generates all
of our round-trip test fixtures.
"""

from __future__ import annotations

import io
import os
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
    on_block=None,
) -> int:
    """Write record batches as Native blocks; returns rows written.

    An empty input with a known ``schema`` still writes one header-only
    0-row block (as ClickHouse itself does for empty results) so
    readers can recover the schema.

    ``on_block(offset, piece)`` is invoked with ``buf.tell()`` before
    each data block — callers use it to build the per-block stats
    index (only meaningful on uncompressed, tell()-able sinks).
    """
    total = 0
    wrote_any = False
    types: Optional[list[CHType]] = ch_types
    for batch in batches:
        if types is None:
            types = _ch_types_for_schema(batch.schema)
        if batch.num_rows == 0 and not wrote_any:
            if on_block is not None:
                on_block(buf.tell(), batch)
            _write_block_with_nullable_names(buf, batch, types)
            wrote_any = True
            continue
        start = 0
        while start < batch.num_rows:
            piece = batch.slice(start, block_rows)
            if on_block is not None:
                on_block(buf.tell(), piece)
            _write_block_with_nullable_names(buf, piece, types)
            start += piece.num_rows
            total += piece.num_rows
            wrote_any = True
    if not wrote_any and schema is not None:
        types = types or _ch_types_for_schema(schema)
        empty = pa.RecordBatch.from_arrays(
            [pa.array([], type=f.type) for f in schema], schema=schema
        )
        if on_block is not None:
            on_block(buf.tell(), empty)
        _write_block_with_nullable_names(buf, empty, types)
    return total


def _write_block_with_nullable_names(
    buf: BinaryIO, batch: pa.RecordBatch, types: list[CHType]
) -> None:
    # codec.write_block owns the nullable/LowCardinality naming rules
    write_block(buf, batch, types)


def stats_sidecar_path(data_path: str) -> str:
    """``part-000.clickhouse`` -> ``_part-000.clickhouse.stats.json`` in
    the same directory. The leading underscore keeps the sidecar out of
    every directory listing (``resolve_paths`` skips ``_``-files), like
    ``_SUCCESS``."""
    d, base = os.path.split(data_path)
    return os.path.join(d, f"_{base}.stats.json")


_STR_STATS_MAX = 64


def _truncated_string_stats(mn: str, mx: str) -> tuple[str, Optional[str]]:
    """Cap sidecar string stats like parquet writers: min truncates
    freely downward (a prefix sorts <= the original); max truncates and
    bumps the final codepoint so it stays an upper bound. Returns
    (min, max-or-None); None means no valid bounded max exists and the
    caller should drop the column. Long-text columns (documents.text)
    would otherwise embed two full document bodies per file in the
    sidecar that planning json.load()s for every file on every query."""
    if len(mn) > _STR_STATS_MAX:
        mn = mn[:_STR_STATS_MAX]
    if len(mx) > _STR_STATS_MAX:
        prefix = mx[:_STR_STATS_MAX]
        for i in range(len(prefix) - 1, -1, -1):
            c = ord(prefix[i])
            if c < 0x10FFFF:
                c += 1
                if 0xD800 <= c <= 0xDFFF:  # not a valid scalar codepoint
                    c = 0xE000
                return mn, prefix[:i] + chr(c)
        return mn, None
    return mn, mx


def _column_stats(table: pa.Table | pa.RecordBatch) -> dict:
    """Per-column min/max/null-count for JSON-representable scalar
    types (int/float/string) — the file-level pruning index the scan's
    ``partitions()`` uses to skip whole files against pushed filters
    (the Native-format analogue of parquet footer statistics)."""
    import math

    import pyarrow.compute as pc

    cols = {}
    arrs = (
        {f.name: table.column(i) for i, f in enumerate(table.schema)}
        if isinstance(table, pa.Table)
        else {f.name: table.column(i) for i, f in enumerate(table.schema)}
    )
    for name, arr in arrs.items():
        t = arr.type
        if not (
            pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_string(t)
        ):
            continue
        nulls = arr.null_count
        if len(arr) == nulls:
            cols[name] = {"min": None, "max": None, "nulls": nulls}
            continue
        if pa.types.is_floating(t):
            # Arrow min_max silently SKIPS NaN, but under Spark SQL
            # semantics NaN sorts above every double — a NaN-blind max
            # would let 'col > v' pruning drop files whose NaN rows
            # match. Omit the column entirely when any NaN is present
            # (conservative: no stats -> file never skipped). Also keeps
            # non-RFC Infinity tokens out of the JSON sidecar.
            if bool(pc.any(pc.is_nan(arr)).as_py()):
                continue
        mm = pc.min_max(arr)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        if isinstance(mn, float) and not (math.isfinite(mn) and math.isfinite(mx)):
            continue
        if isinstance(mn, str):
            mn, mx = _truncated_string_stats(mn, mx)
            if mx is None:
                continue
        cols[name] = {"min": mn, "max": mx, "nulls": nulls}
    return cols


class BlockStatsRecorder:
    """Shared per-block sidecar index builder (write_native_file and
    the DataSource sink): records EVERY physical block — header-only
    0-row blocks included, because the reader's ``n_blocks`` counts
    physical blocks — and maintains the file-level merge of the
    per-block stats. The merge is NaN-sound: a column that
    ``_column_stats`` omitted for any non-empty block (NaN present,
    or an unconstructible string bound) is dropped from the file
    level too — keeping a partial min/max would let pruning drop
    files whose unaccounted rows match."""

    def __init__(
        self,
        bloom_columns: tuple = (),
        ngram_columns: tuple = (),
        set_columns: tuple = (),
        token_columns: tuple = (),
    ) -> None:
        self.blocks: list[dict] = []
        self.merged: dict = {}
        self.rows = 0
        self._dropped: set = set()
        # set(N) skip index (native/setindex.py): the column's complete
        # distinct-value list when it stays under the cap — evaluates
        # ANY pushable predicate at plan time; dropped past the cap
        # (conservative: no index, no pruning)
        self._set_cols = tuple(set_columns)
        self._set_vals: dict[str, set] = {c: set() for c in self._set_cols}
        self._set_dropped: set = set()
        # bloom skip index (native/bloomindex.py): distinct type-tagged
        # values per indexed column, accumulated across blocks; a
        # column hitting an unsupported type or the distinct cap drops
        # its index (conservative — no index, no pruning)
        self._bloom_cols = tuple(bloom_columns)
        self._bloom_vals: dict[str, set] = {c: set() for c in self._bloom_cols}
        self._bloom_dropped: set = set()
        # ngrambf skip index: union of codepoint 3-grams across the
        # column's string values — prunes substring predicates
        self._ngram_cols = tuple(ngram_columns)
        self._ngram_vals: dict[str, set] = {c: set() for c in self._ngram_cols}
        self._ngram_dropped: set = set()
        # tokenbf skip index: union of word tokens — prunes
        # token-delimited string predicates (hasToken semantics)
        self._token_cols = tuple(token_columns)
        self._token_vals: dict[str, set] = {c: set() for c in self._token_cols}
        self._token_dropped: set = set()

    def _set_on_block(self, piece: pa.RecordBatch) -> None:
        if not self._set_cols or piece.num_rows == 0:
            return
        from .setindex import SET_MAX_DISTINCT, set_index_value

        import pyarrow.compute as pc

        names = set(piece.schema.names)
        for col in self._set_cols:
            if col in self._set_dropped:
                continue
            if col not in names:
                self._set_dropped.add(col)
                continue
            acc = self._set_vals[col]
            arr = piece.column(piece.schema.get_field_index(col))
            for v in pc.unique(arr).to_pylist():
                if v is None:
                    continue
                sv = set_index_value(v)
                if sv is None:  # unsupported type: drop the index
                    self._set_dropped.add(col)
                    break
                acc.add(sv)
            if len(acc) > SET_MAX_DISTINCT:
                self._set_dropped.add(col)
        for col in self._set_dropped:
            self._set_vals.pop(col, None)

    def _bloom_on_block(self, piece: pa.RecordBatch) -> None:
        self._set_on_block(piece)
        if (
            not self._bloom_cols
            and not self._ngram_cols
            and not self._token_cols
        ) or piece.num_rows == 0:
            return
        from .bloomindex import (
            MAX_DISTINCT,
            string_ngrams,
            string_tokens,
            value_bytes,
        )

        import pyarrow.compute as pc

        names = set(piece.schema.names)
        for col in self._bloom_cols:
            if col in self._bloom_dropped:
                continue
            if col not in names:
                self._bloom_dropped.add(col)
                continue
            acc = self._bloom_vals[col]
            arr = piece.column(piece.schema.get_field_index(col))
            for v in pc.unique(arr).to_pylist():
                if v is None:
                    continue
                b = value_bytes(v)
                if b is None:  # unsupported type: drop the index
                    self._bloom_dropped.add(col)
                    break
                acc.add(b)
            if len(acc) > MAX_DISTINCT:
                self._bloom_dropped.add(col)
        for col in self._bloom_dropped:
            self._bloom_vals.pop(col, None)
        for col in self._ngram_cols:
            if col in self._ngram_dropped:
                continue
            if col not in names:
                self._ngram_dropped.add(col)
                continue
            acc = self._ngram_vals[col]
            arr = piece.column(piece.schema.get_field_index(col))
            if not pa.types.is_string(arr.type):
                self._ngram_dropped.add(col)  # strings only
                continue
            for v in pc.unique(arr).to_pylist():
                if v is None:
                    continue
                acc |= string_ngrams(v)
            if len(acc) > MAX_DISTINCT:
                self._ngram_dropped.add(col)
        for col in self._ngram_dropped:
            self._ngram_vals.pop(col, None)
        for col in self._token_cols:
            if col in self._token_dropped:
                continue
            if col not in names:
                self._token_dropped.add(col)
                continue
            acc = self._token_vals[col]
            arr = piece.column(piece.schema.get_field_index(col))
            if not pa.types.is_string(arr.type):
                self._token_dropped.add(col)  # strings only
                continue
            for v in pc.unique(arr).to_pylist():
                if v is None:
                    continue
                acc |= string_tokens(v)
            if len(acc) > MAX_DISTINCT:
                self._token_dropped.add(col)
        for col in self._token_dropped:
            self._token_vals.pop(col, None)

    def on_block(self, offset: int, piece: pa.RecordBatch) -> None:
        self._bloom_on_block(piece)
        st = _column_stats(piece)
        self.blocks.append(
            {"offset": int(offset), "rows": int(piece.num_rows), "columns": st}
        )
        self.rows += int(piece.num_rows)
        if piece.num_rows == 0:
            return
        for name in list(self.merged):
            if name not in st:
                del self.merged[name]
                self._dropped.add(name)
        for name, c in st.items():
            if name in self._dropped:
                continue
            cur = self.merged.get(name)
            if cur is None:
                if self.rows == piece.num_rows:
                    self.merged[name] = dict(c)
                else:
                    self._dropped.add(name)  # absent from an earlier block
                continue
            cur["nulls"] += c["nulls"]
            if c["min"] is not None and (cur["min"] is None or c["min"] < cur["min"]):
                cur["min"] = c["min"]
            if c["max"] is not None and (cur["max"] is None or c["max"] > cur["max"]):
                cur["max"] = c["max"]

    def sidecar(self, path: str) -> dict:
        side = {"rows": self.rows, "columns": self.merged}
        if self.blocks:
            side["blocks"] = self.blocks
            side["file_bytes"] = os.path.getsize(path)
        blooms = {}
        ngrams = {}
        tokens = {}
        if self._bloom_vals or self._ngram_vals or self._token_vals:
            from .bloomindex import build_bloom

            for col, vals in self._bloom_vals.items():
                bl = build_bloom(vals)
                if bl is not None:
                    blooms[col] = bl
            for col, vals in self._ngram_vals.items():
                bl = build_bloom(vals)
                if bl is not None:
                    ngrams[col] = bl
            for col, vals in self._token_vals.items():
                bl = build_bloom(vals)
                if bl is not None:
                    tokens[col] = bl
        if blooms:
            side["bloom"] = blooms
        if ngrams:
            side["ngrambf"] = ngrams
        if tokens:
            side["tokenbf"] = tokens
        if self._set_vals:
            setix = {
                col: sorted(vals)
                for col, vals in self._set_vals.items()
                if vals
            }
            if setix:
                side["set"] = setix
        return side


# SAMPLE clause support (ClickHouse `SAMPLE k [OFFSET m]`, docs:
# sql-reference/statements/select/sample): the sampling key is hashed
# with TWO rounds of the Lehmer/MINSTD map h = h * A mod M — a
# BIJECTION on [1, M), so the sample is uniform, deterministic, and
# nested (SAMPLE 0.2 is a superset of SAMPLE 0.1, the ClickHouse
# consistency guarantee). ONE round is a bijection too but maps small
# sequential keys to small hashes (x*A stays far below M for
# x < M/A ~ 44k — a SAMPLE 0.1 of such keys returns 0 rows); the
# second round wraps every realistic key range thousands of times
# (measured octile skew < 0.03% on 150k sequential keys). A and M are
# SQL-expressible in both engines with no BIGINT overflow
# ((M-1) * A < 2^63 at every intermediate), unlike a 64-bit mixer.
SAMPLE_HASH_M = 2147483647  # 2^31 - 1 (prime)
SAMPLE_HASH_A = 48271  # MINSTD multiplier
SAMPLE_HASH_COLUMN = "_sample_hash"


def sample_hash_sql(col: str) -> str:
    """The hash as engine-portable SQL (Spark and DuckDB evaluate this
    identically on BIGINT inputs) — for oracles and ad-hoc checks."""
    m, a = SAMPLE_HASH_M, SAMPLE_HASH_A
    return (
        f"((((CAST({col} AS BIGINT) % {m}) + {m}) % {m}) "
        f"* {a} % {m}) * {a} % {m}"
    )


def _with_sample_hash(
    table: pa.Table | pa.RecordBatch, sample_by: str
) -> pa.Table:
    """Materialize ``_sample_hash`` from the sampling key and sort the
    rows by it, so each written block covers a contiguous hash range —
    that contiguity is what makes the reader's SAMPLE prune BLOCK
    RANGES via the ordinary min/max sidecar instead of reading and
    filtering everything (ClickHouse gets the same effect by requiring
    the sample expression inside the primary key)."""
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(table, pa.RecordBatch):
        table = pa.Table.from_batches([table])
    if sample_by not in table.schema.names:
        raise ValueError(f"sample_by column {sample_by!r} not in table")
    col = table.column(sample_by)
    if col.null_count:
        raise ValueError(
            f"sample_by column {sample_by!r} has nulls; the sampling "
            "key must be total (ClickHouse requires the same)"
        )
    if not pa.types.is_integer(col.type):
        raise ValueError(
            f"sample_by column {sample_by!r} must be an integer key"
        )
    x = col.cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    m = np.int64(SAMPLE_HASH_M)
    a = np.int64(SAMPLE_HASH_A)
    h = ((x % m + m) % m) * a % m * a % m
    table = table.append_column(
        SAMPLE_HASH_COLUMN, pa.array(h, type=pa.int64())
    )
    return table.take(pc.sort_indices(table.column(SAMPLE_HASH_COLUMN)))


def write_native_file(
    path: str,
    table: pa.Table | pa.RecordBatch,
    *,
    ch_types: Optional[list[CHType]] = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    compression: Optional[str] = None,
    stats: bool = True,
    index_bloom: Optional[list] = None,
    index_ngrambf: Optional[list] = None,
    index_set: Optional[list] = None,
    index_tokenbf: Optional[list] = None,
    sample_by: Optional[str] = None,
) -> int:
    """``compression``: None (plain Native), or 'lz4'/'zstd'/'none' to
    wrap the stream in ClickHouse compressed frames (compress.py).
    ``stats=True`` also writes a ``_<name>.stats.json`` min/max sidecar
    enabling file-level predicate skipping at scan planning;
    ``index_bloom=[cols]`` adds a bloom skip index per listed column
    (native/bloomindex.py — equality/IN pruning on scattered values
    min/max cannot prove absent); ``sample_by='key'`` materializes a
    sorted ``_sample_hash`` column enabling the reader's SAMPLE
    clause with block-range pruning."""
    if sample_by:
        table = _with_sample_hash(table, sample_by)
    if isinstance(table, pa.RecordBatch):
        batches: list[pa.RecordBatch] = [table]
        schema = table.schema
    else:
        batches = table.to_batches(max_chunksize=block_rows)
        schema = table.schema
    types = _ch_types_for_schema(schema, ch_types)
    rec = (
        BlockStatsRecorder(
            tuple(index_bloom or ()),
            tuple(index_ngrambf or ()),
            tuple(index_set or ()),
            tuple(index_tokenbf or ()),
        )
        if (stats and compression is None)
        else None
    )
    mrec = None
    if rec is not None:
        from .marks import MarksRecorder

        mrec = MarksRecorder()
        mrec.set_ch_types(schema.names, types)

    def _on_block(offset: int, piece: pa.RecordBatch) -> None:
        rec.on_block(offset, piece)
        mrec.on_block(offset, piece)

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
                buf,
                batches,
                ch_types=types,
                block_rows=block_rows,
                schema=schema,
                on_block=_on_block if rec else None,
            )
        buf.flush()
    # string-column marks (native/marks.py): the per-row lengths the
    # writer just serialized, so readers skip the varint walk. When
    # nothing was recorded (stats off, compression, no eligible column)
    # any PRE-EXISTING sidecar from an earlier write of the same path
    # must go — a stale-but-size-matching sidecar would pass the
    # file_bytes guard and misdirect the unwanted-column seeks.
    if mrec is None or mrec.write(path) is None:
        from .marks import marks_sidecar_path

        try:
            os.remove(marks_sidecar_path(path))
        except OSError:
            pass
    if stats:
        import json

        if rec is not None:
            # per-block index (the parquet row-group analogue): lets
            # the scan prune BLOCK RANGES inside one file, not just
            # whole files; file-level stats are the recorder's merge —
            # one stats pass over the data, not two
            side = rec.sidecar(path)
        else:
            side = {"rows": int(table.num_rows), "columns": _column_stats(table)}
        tmp = stats_sidecar_path(path) + ".tmp"
        with open(tmp, "w") as sf:
            json.dump(side, sf)
        os.replace(tmp, stats_sidecar_path(path))
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
